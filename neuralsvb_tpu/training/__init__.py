"""Runtime/trainer layer (L7): optax optimizers, jitted per-optimizer train
steps, checkpoint IO, SPMD data parallelism over a device mesh."""
