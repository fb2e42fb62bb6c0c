"""SPMD parallelism over a jax.sharding.Mesh (replaces the reference's
NCCL DDP, SURVEY.md section 5.8)."""
