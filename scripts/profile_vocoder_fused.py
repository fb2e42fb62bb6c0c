"""Fused-vs-unfused vocoder resblock profile on the live TPU.

Usage: python scripts/profile_vocoder_fused.py [n_frames]

Two sections:
1. op-level: each upsample stage's 3-tower ResBlock cluster, XLA unfused vs
   the Pallas kernel (ops/fused_resblock.py) across tile sizes Tt — picks
   the fastest Tt per stage.
2. end-to-end: the flagship HiFiGAN-NSF generator with fuse_resblocks
   off/on, f32 and bf16 — the BENCH vocoder_rtf path.

Prints one JSON line per measurement.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402
from neuralsvb_tpu.models.hifigan import HifiGanGenerator, ResBlock1  # noqa: E402
from neuralsvb_tpu.ops.fused_resblock import fused_resblock_cluster  # noqa: E402
from neuralsvb_tpu.utils.profiling import relay_rtt_seconds  # noqa: E402

KS = (3, 7, 11)
DILS = ((1, 3, 5), (1, 3, 5), (1, 3, 5))


def measure(fn, args, iters=8, rtt=None):
    if rtt is None:
        rtt = relay_rtt_seconds()
    jfn = jax.jit(fn)
    zero = jnp.float32(0.0)
    carry = zero
    for _ in range(2):
        carry = jfn(*args, carry)
    float(jax.device_get(carry))
    return bench._measure(
        lambda i, c: jfn(*args, zero if c is None else c),
        lambda c: float(jax.device_get(c)), iters, rtt)


def stage_cluster_bench(T, C, n_frames, rtt):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, T, C).astype(np.float32) * 0.1)
    params = []
    for r, k in enumerate(KS):
        m = ResBlock1(C, k, DILS[r])
        params.append(m.init(jax.random.PRNGKey(r), x)["params"])
    params = tuple(params)

    def unfused(x, carry):
        cur = x + carry * 0.0
        outs = []
        for r, k in enumerate(KS):
            outs.append(ResBlock1(C, k, DILS[r]).apply(
                {"params": params[r]}, cur))
        return jnp.sum((sum(outs) / 3).astype(jnp.float32))

    m0 = measure(unfused, (x,), rtt=rtt)
    print(json.dumps({"stage": f"T{T}xC{C}", "kind": "xla_unfused",
                      "wall_ms": round(m0["wall_s"] * 1e3, 2),
                      "dev_ms": round(m0["device_s"] * 1e3, 2)}), flush=True)

    for Tt in (1024, 2048, 4096):
        if Tt > T:
            continue
        for mm in ("bfloat16", "float32"):
            def fused(x, carry, Tt=Tt, mm=mm):
                y = fused_resblock_cluster(
                    x + carry * 0.0, params, KS, DILS, Tt=Tt,
                    mm_dtype=jnp.dtype(mm), interpret=False)
                return jnp.sum(y.astype(jnp.float32))
            try:
                m1 = measure(fused, (x,), rtt=rtt)
                print(json.dumps(
                    {"stage": f"T{T}xC{C}", "kind": f"pallas_Tt{Tt}_{mm}",
                     "wall_ms": round(m1["wall_s"] * 1e3, 2),
                     "dev_ms": round(m1["device_s"] * 1e3, 2)}), flush=True)
            except Exception as e:
                print(json.dumps(
                    {"stage": f"T{T}xC{C}", "kind": f"pallas_Tt{Tt}_{mm}",
                     "error": f"{type(e).__name__}: {e}"[:160]}), flush=True)


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    rtt = relay_rtt_seconds()
    print(json.dumps({"rtt_ms": round(rtt * 1e3, 2),
                      "device": str(jax.devices()[0])}), flush=True)

    # stage shapes of the flagship (rates 8,8,2; C0=512): after upsample i
    # the time length is n_frames * prod(rates[:i+1])
    for (mult, C) in ((8, 256), (64, 128), (128, 64)):
        stage_cluster_bench(n_frames * mult, C, n_frames, rtt)

    # end-to-end generator: bench's native fuse knob (same params/flops
    # either way)
    for fuse in ("off", "on"):
        for dtype in ("float32", "bfloat16"):
            try:
                m = bench.bench_vocoder_rtf(n_frames=n_frames, iters=6,
                                            dtype=dtype, rtt=rtt, fuse=fuse)
                print(json.dumps(
                    {"kind": f"generator_fuse_{fuse}_{dtype}",
                     "wall_ms": round(m["wall_s"] * 1e3, 2),
                     "dev_ms": round(m["device_s"] * 1e3, 2),
                     "rtf_dev": round(m["device_s"] / m["audio_sec"], 5)}),
                    flush=True)
            except Exception as e:
                print(json.dumps({"kind": f"generator_fuse_{fuse}_{dtype}",
                                  "error": f"{type(e).__name__}: {e}"[:160]}),
                      flush=True)


if __name__ == "__main__":
    main()
