"""Device-mesh helpers.

The reference does single-node data parallelism over NCCL (reference:
utils/trainer.py:441-466) with per-rank batch slices
(tasks/tts/tts.py:93-96). TPU-natively we build a ``data`` (x optional
``model``) mesh over all chips and let XLA GSPMD insert the collectives:

- batch sharded on ``data`` -> gradient all-reduce over ICI (replaces DDP);
- with ``mesh_shape: 'data:N,model:M'``, large parameter matrices are
  tensor-sharded on their output feature dim across ``model``
  (Megatron-style column split; GSPMD adds the activation all-gathers /
  reduce-scatters). Models here are 20-40M params so DP alone suffices on
  real pods, but the TP path keeps memory-per-chip flat as dims grow.
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
        mesh = Mesh(devices, ("data",))
    else:
        axes, dims = [], []
        for part in mesh_shape.split(","):
            name, dim = part.split(":")
            axes.append(name.strip())
            dims.append(int(dim))
        mesh = Mesh(devices[: int(np.prod(dims))].reshape(dims), tuple(axes))
    _warm_collectives(mesh)
    return mesh


_warmed_cliques: set = set()


def _warm_collectives(mesh: Mesh) -> None:
    """Establish the mesh's cross-host collective channels NOW, while
    processes are still in lockstep.

    The first cross-host collective a process executes performs a
    30-second-deadline rendezvous (KV exchange + TCP pair connect for
    XLA:CPU's Gloo backend); the resulting context is cached per device
    clique and reused by every later computation. Deferring that first
    collective until it occurs naturally — typically inside training step
    1, after minutes of per-host compiles whose durations can skew — makes
    the rendezvous time out (measured: a 90 s skew reliably fails cold and
    succeeds warmed; tests/test_multihost.py hit exactly this). So on
    multi-process setups we run one tiny all-device all-reduce at mesh
    construction, when all hosts are microseconds apart."""
    if jax.process_count() <= 1:
        return
    key = tuple(int(d.id) for d in mesh.devices.flat)
    if key in _warmed_cliques:
        return
    s = NamedSharding(mesh, P(mesh.axis_names[0]))
    n = mesh.devices.shape[0]
    local = np.zeros((max(n, 1), 1), np.float32)
    x = jax.make_array_from_process_local_data(s, local, local.shape)
    float(jax.device_get(jax.jit(lambda a: a.sum())(x)))  # all-reduce
    _warmed_cliques.add(key)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """[K, B, ...] stacks for the K-step scan cycle: steps replicated,
    batch dim sharded on 'data'."""
    return NamedSharding(mesh, P(None, "data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def process_local_rows(x: np.ndarray, axis: int = 0) -> np.ndarray:
    """This process's contiguous block of a GLOBAL batch array.

    Multi-host contract: every host's identically-seeded loader collates the
    SAME full global batch (identical values and padding — per-host
    collation of disjoint row subsets could pad to different lengths and
    desynchronize shapes across hosts); each host then contributes its
    1/process_count contiguous row block. The global row order follows the
    mesh's process-ordered device list, so block p belongs to process p.
    SPMD replacement for the reference's per-rank ``x[rank::world]`` slicing
    (reference: tasks/tts/tts.py:93-96)."""
    world = jax.process_count()
    if world <= 1:
        return x
    n = x.shape[axis]
    assert n % world == 0, (
        f"global batch dim {n} not divisible by process_count {world}; "
        "the loader trims batches to a multiple of the mesh size")
    rows = n // world
    p = jax.process_index()
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(p * rows, (p + 1) * rows)
    return x[tuple(sl)]


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Put array leaves of a GLOBAL batch dict onto the mesh, sharded on
    'data'. Non-array entries (strings, ids) pass through on host.

    Multi-host (``jax.distributed.initialize`` via NSVB_MULTIHOST): every
    process passes the same full global batch; its local contiguous row
    block (``process_local_rows``) is carved out here and the global array
    is assembled with ``jax.make_array_from_process_local_data``."""
    bs = batch_sharding(mesh)
    multihost = jax.process_count() > 1

    def put(x):
        if isinstance(x, np.ndarray) and x.ndim >= 1:
            if multihost:
                return jax.make_array_from_process_local_data(
                    bs, process_local_rows(x))
            return jax.device_put(x, bs)
        return x
    return {k: put(v) for k, v in batch.items()}


def _tp_size(mesh: Mesh) -> int:
    return dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)


def param_sharding(leaf, mesh: Mesh, min_size: int = 4096) -> NamedSharding:
    """Shape-based tensor-parallel rule: matrices/kernels with a large,
    model-divisible output (last) dim are column-sharded on 'model';
    everything else (biases, norms, scalars, small tables) replicates."""
    tp = _tp_size(mesh)
    shape = getattr(leaf, "shape", ())
    size = int(np.prod(shape)) if shape else 0
    if (tp > 1 and len(shape) >= 2 and size >= min_size
            and shape[-1] % tp == 0):
        spec = [None] * (len(shape) - 1) + ["model"]
        return NamedSharding(mesh, P(*spec))
    return replicated(mesh)


def put_global(x, s: NamedSharding):
    """Place one host value onto a (possibly multi-host) sharding.

    Single-process this is ``jax.device_put``. Multi-host, ``device_put`` of
    a host value onto a global sharding first runs a cross-process equality
    assert — one ``process_allgather`` (a Gloo/ICI collective) PER LEAF,
    which for a whole state tree is hundreds of collectives and a Gloo
    connect-timeout hazard when hosts are skewed by long compiles (seen in
    tests/test_multihost.py). Every host passes the same full value here
    (the SPMD contract ``shard_batch`` documents), so we skip the check and
    build the global array from process-local data directly:
    ``global_shape == local_data.shape`` makes each host carve out its own
    devices' shards — no collective, no value exchange."""
    if jax.process_count() > 1:
        arr = np.asarray(x)
        return jax.make_array_from_process_local_data(s, arr, arr.shape)
    return jax.device_put(x, s)


def replicate_state(state, mesh: Mesh, min_size: int | None = None):
    """Place a state tree on the mesh: replicated under pure DP; with a
    'model' axis, large param/optimizer leaves are tensor-sharded by
    ``param_sharding`` (optimizer moments mirror the param tree shapes, so
    the same shape rule aligns them)."""
    if _tp_size(mesh) <= 1:
        rep = replicated(mesh)
        return jax.tree_util.tree_map(lambda x: put_global(x, rep), state)
    if min_size is None:
        from ..hparams import hparams
        min_size = int(hparams.get("tp_min_param_size") or 4096)
    return jax.tree_util.tree_map(
        lambda x: put_global(x, param_sharding(x, mesh, min_size)), state)


def trim_batch_to_multiple(batch_idxs: list, n: int) -> list:
    """Trim an index batch to a multiple of the data-parallel degree.
    (The reference drops indivisible batches, tts.py:93-96; trimming keeps
    more data on small sets.)"""
    keep = (len(batch_idxs) // n) * n
    return batch_idxs[:keep]
