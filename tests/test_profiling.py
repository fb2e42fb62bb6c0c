"""Profiling utilities: the xplane device-busy parser and its CPU fallback.

The bench methodology (bench.py, VERDICT r2 #1) derives every device-time
number from ``device_busy_from_xplane``; these tests pin its contract on
whatever backend the suite runs on (CPU here: JAX's profiler emits only a
"/host:CPU" plane, exercising the host-fallback branch that keeps
``device_ms`` columns meaningful when the TPU relay is down)."""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_device_busy_from_xplane_nonempty():
    from neuralsvb_tpu.utils.profiling import (device_busy_from_xplane,
                                               profiler_trace)

    @jax.jit
    def f(x):
        return (x @ x).sum()

    x = jnp.asarray(np.random.RandomState(0).randn(256, 256), jnp.float32)
    float(f(x))  # compile outside the trace
    trace_dir = tempfile.mkdtemp(prefix="nsvb_xplane_test_")
    try:
        with profiler_trace(trace_dir):
            float(f(x))
            float(f(x))
    except Exception as exc:  # backend without profiler support
        pytest.skip(f"profiler unsupported here: {exc}")
    busy = device_busy_from_xplane(trace_dir)
    # CPU traces have no TPU/GPU plane; the host fallback must still
    # report busy time instead of silently returning {} (review r3)
    assert busy, "device_busy_from_xplane returned {} for a real trace"
    assert all(v > 0 for v in busy.values())
    assert all(v < 60 for v in busy.values())  # seconds, not ps


def test_merged_span_seconds_overlap():
    """Nested/overlapping events (fusions containing sub-ops) must be
    interval-merged, not duration-summed."""
    from neuralsvb_tpu.utils.profiling import _merged_span_seconds

    class Ev:
        def __init__(self, off, dur):
            self.offset_ps = off
            self.duration_ps = dur

    class Line:
        # [0,10] contains [2,5]; [20,30] overlaps [25,40]; total = 10+20 ps
        events = [Ev(0, 10), Ev(2, 3), Ev(20, 10), Ev(25, 15)]

    assert _merged_span_seconds(Line()) == pytest.approx(30e-12)
