"""Benchmark: HiFiGAN-NSF vocoder RTF per chip (mel -> wav), the BASELINE.md
north-star metric (<0.05 RTF per v5e chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = target_rtf / measured_rtf (>1 = beats the 0.05 target).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

TARGET_RTF = 0.05
SR = 22050
HOP = 128


def bench_vocoder_rtf(n_frames: int = 2048, iters: int = 10, warmup: int = 3):
    import jax
    from neuralsvb_tpu.models.hifigan import HifiGanGenerator

    model = HifiGanGenerator(
        upsample_rates=(8, 8, 2), upsample_kernel_sizes=(16, 16, 4),
        upsample_initial_channel=512, use_pitch_embed=True,
        audio_sample_rate=SR)
    rng = np.random.RandomState(0)
    mel = (rng.randn(1, n_frames, 80).astype(np.float32) - 2.0)
    f0 = np.full((1, n_frames), 220.0, np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "noise": jax.random.PRNGKey(1)},
                           mel[:, :8], f0[:, :8])
    params = variables["params"]

    @jax.jit
    def run(params, mel, f0, key):
        return model.apply({"params": params}, mel, f0, rngs={"noise": key})

    key = jax.random.PRNGKey(2)
    for _ in range(warmup):
        run(params, mel, f0, key).block_until_ready()
    t0 = time.perf_counter()
    for i in range(iters):
        run(params, mel, f0, jax.random.fold_in(key, i)).block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    audio_sec = n_frames * HOP / SR
    return dt / audio_sec, audio_sec, dt


def main():
    rtf, audio_sec, dt = bench_vocoder_rtf()
    result = {
        "metric": "hifigan_nsf_vocoder_rtf_per_chip",
        "value": round(rtf, 6),
        "unit": "rtf",
        "vs_baseline": round(TARGET_RTF / rtf, 3),
        "detail": {"audio_sec_per_call": round(audio_sec, 3),
                   "compute_sec_per_call": round(dt, 4),
                   "device": str(__import__("jax").devices()[0])},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
