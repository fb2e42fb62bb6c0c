"""Device-mesh helpers.

The reference does single-node data parallelism over NCCL (reference:
utils/trainer.py:441-466) with per-rank batch slices
(tasks/tts/tts.py:93-96). TPU-natively we build a 1-D ``data`` mesh over all
chips, shard the global batch on it and replicate params; XLA GSPMD inserts
the gradient all-reduce over ICI. A second ``model`` axis is plumbed through
for future tensor sharding (models here are 20-40M params so DP suffices).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: str = "", devices=None) -> Mesh:
    """mesh_shape: '' (all devices -> 1-D data axis) or 'data:N' or
    'data:N,model:M'."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if not mesh_shape:
        return Mesh(devices, ("data",))
    axes, dims = [], []
    for part in mesh_shape.split(","):
        name, dim = part.split(":")
        axes.append(name.strip())
        dims.append(int(dim))
    return Mesh(devices[: int(np.prod(dims))].reshape(dims), tuple(axes))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Put array leaves of a batch dict onto the mesh, sharded on 'data'.
    Non-array entries (strings, ids) pass through on host."""
    bs = batch_sharding(mesh)

    def put(x):
        if isinstance(x, np.ndarray) and x.ndim >= 1:
            return jax.device_put(x, bs)
        return x
    return {k: put(v) for k, v in batch.items()}


def replicate_state(state, mesh: Mesh):
    return jax.device_put(state, replicated(mesh))


def trim_batch_to_multiple(batch_idxs: list, n: int) -> list:
    """Trim an index batch to a multiple of the data-parallel degree.
    (The reference drops indivisible batches, tts.py:93-96; trimming keeps
    more data on small sets.)"""
    keep = (len(batch_idxs) // n) * n
    return batch_idxs[:keep]
