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


def bench_e2e_svb(n_frames: int = 1536, iters: int = 5, warmup: int = 2,
                  batch: int = 1):
    """Full a2p path: MleSVBVAE forward (a2a+p2p+a2p) + HiFiGAN-NSF vocoding
    of the a2p mel (BASELINE.json config #4). ``batch`` utterances per call —
    bs=1 matches the reference's serving mode; bs>1 amortizes the per-dispatch
    host overhead and is the production-throughput number."""
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _batch, _flagship_hparams
    from neuralsvb_tpu.hparams import hparams
    from neuralsvb_tpu.models.hifigan import HifiGanGenerator
    from neuralsvb_tpu.models.svb_vae import SVBVAE

    hp = _flagship_hparams()
    hparams.update({k: v for k, v in hp.items() if k not in hparams})
    model = SVBVAE(dict_size=100, variant="mle")
    b = _batch(batch, n_frames, n_frames)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, b["mels"], b["prof_mels"], b["pitch"],
                           b["prof_pitch"], b["multi_spk_emb"][:, 0],
                           b["a2p_f0_alignment"],
                           concurrent_ways=("a2a", "p2p", "a2p"))
    batch_stats = variables.get("batch_stats", {})
    voc = HifiGanGenerator(upsample_rates=(8, 8, 2),
                           upsample_kernel_sizes=(16, 16, 4),
                           upsample_initial_channel=512, use_pitch_embed=True)
    f0 = np.full((batch, n_frames), 220.0, np.float32)
    voc_vars = voc.init({"params": jax.random.PRNGKey(3),
                         "noise": jax.random.PRNGKey(4)},
                        b["mels"][:, :8], f0[:, :8])

    @jax.jit
    def e2e(params, voc_params, mels, prof_mels, pitch, prof_pitch, spk, align,
            f0, key):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          mels, prof_mels, pitch, prof_pitch, spk, align,
                          concurrent_ways=("a2a", "p2p", "a2p"),
                          rngs={"noise": key})
        return voc.apply({"params": voc_params}, out["a2p"]["mel_out"], f0,
                         rngs={"noise": key})

    args = (variables["params"], voc_vars["params"], b["mels"], b["prof_mels"],
            b["pitch"], b["prof_pitch"], b["multi_spk_emb"][:, 0],
            b["a2p_f0_alignment"], f0)
    key = jax.random.PRNGKey(5)
    for _ in range(warmup):
        e2e(*args, key).block_until_ready()
    t0 = time.perf_counter()
    for i in range(iters):
        e2e(*args, jax.random.fold_in(key, i)).block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    audio_sec = n_frames * HOP / SR
    return batch / dt, dt / (audio_sec * batch), audio_sec


def bench_train_step(n_frames: int = 1536, batch: int = 12, iters: int = 5):
    """NSVB adversarial training step time at flagship dims (BASELINE.md row
    'NSVB adversarial training step time'): one fused phase-2 iteration
    (generator+discriminator in a single dispatch) and one phase-3 latent-map
    step. Reports wall ms/iter, device-busy ms/iter (xplane trace; None if
    profiling is unavailable on the backend), and audio-seconds/step."""
    import tempfile

    import jax
    from __graft_entry__ import _batch, _flagship_hparams
    from neuralsvb_tpu.hparams import hparams
    from neuralsvb_tpu.utils.profiling import (device_busy_from_xplane,
                                               profiler_trace)

    hp = _flagship_hparams()
    hp.update(mesh_shape="data:1", phase_2_steps=10 ** 6)
    hparams.clear()
    hparams.update(hp)
    from neuralsvb_tpu.tasks.svb_vae_task import SVBVAEMleTask
    task = SVBVAEMleTask()
    task.build_model()
    b = _batch(batch, n_frames, n_frames)
    b["nsamples"] = batch
    audio_sec_per_step = batch * n_frames * HOP / SR

    def cycle(step):
        for opt in range(task.num_optimizers):
            task.training_step(b, step, opt)

    out = {}
    for name, step in [("phase2", 5), ("phase3", 10 ** 6 + 5)]:
        cycle(step)  # compile
        jax.block_until_ready(task.state)
        # wall from an UNPROFILED loop (profiler start/stop costs seconds on
        # remote backends and must not pollute the number) ...
        wall_t0 = time.perf_counter()
        for _ in range(iters):
            cycle(step)
        jax.block_until_ready(task.state)
        wall = (time.perf_counter() - wall_t0) / iters
        # ... device busy from a separate short profiled run
        busy = {}
        try:
            trace_dir = tempfile.mkdtemp(prefix="nsvb_bench_")
            with profiler_trace(trace_dir):
                cycle(step)
                jax.block_until_ready(task.state)
            busy = device_busy_from_xplane(trace_dir)
        except Exception:  # profiling unsupported on this backend
            pass
        dev = max((v for k, v in busy.items() if "host" not in k.lower()),
                  default=max(busy.values(), default=0.0))
        out[f"train_{name}_wall_ms"] = round(wall * 1e3, 1)
        out[f"train_{name}_device_ms"] = round(dev * 1e3, 1) if dev else None
        out[f"train_{name}_audio_sec_per_step"] = round(audio_sec_per_step, 1)

    # fused K-step cycle (one lax.scan dispatch per K iterations) — the
    # production dispatch mode (steps_per_dispatch hparam). Steady-state
    # wall over several back-to-back windows: the async dispatch overlaps
    # window N+1's host pack + transfer with window N's device compute.
    K = iters
    n_calls = 3
    for name, step in [("phase2", 5), ("phase3", 10 ** 6 + 5)]:
        batches = [b] * K
        task.training_cycle(batches, step)  # compile + first transfer
        jax.block_until_ready(task.state)
        t0 = time.perf_counter()
        for c in range(n_calls):
            task.training_cycle(batches, step + (c + 1) * K)
        jax.block_until_ready(task.state)
        wall = (time.perf_counter() - t0) / (K * n_calls)
        out[f"train_{name}_cycle_wall_ms"] = round(wall * 1e3, 1)
    return out


def bench_binarize(n_pairs: int = 3, dur_s: float = 5.0):
    """Offline binarize throughput (BASELINE.md row 'Binarize throughput'):
    the full para process_item hot path — STFT+mel x2, F0 tracking x2,
    EHSADTW a2p alignment — on synthetic paired vibrato tones. Reports
    audio-seconds packed per wall-second per worker (the pipeline scales
    linearly over binarize workers).

    Runs in a CPU subprocess: binarize workers are CPU processes in
    production (data/multiprocess.py pins them), while this parent process
    has already initialized the TPU backend — measuring through it would
    time the tunnel, not the pipeline."""
    import os
    import subprocess
    import sys

    if os.environ.get("NSVB_BINBENCH_CHILD") != "1":
        env = dict(os.environ, NSVB_BINBENCH_CHILD="1", NSVB_PLATFORM="cpu")
        code = (f"import sys; sys.path.insert(0, {os.getcwd()!r}); "
                f"import bench; print(bench.bench_binarize("
                f"{n_pairs}, {dur_s}))")
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=600)
        if r.returncode != 0:
            raise RuntimeError(r.stderr.strip().splitlines()[-1][:200])
        return float(r.stdout.strip().splitlines()[-1])

    import tempfile

    from neuralsvb_tpu.data.binarizer import PopBuTFyENBinarizer
    from neuralsvb_tpu.hparams import hparams, load_config_recursive
    from neuralsvb_tpu.ops.audio import save_wav

    cfg = load_config_recursive(
        "egs/datasets/audio/PopBuTFy/para_bin.yaml")
    saved = dict(hparams)
    hparams.update(cfg)
    tmp = tempfile.mkdtemp(prefix="nsvb_binbench_")
    hparams["binary_data_dir"] = tmp
    rng = np.random.RandomState(0)
    t = np.arange(int(SR * dur_s)) / SR
    pairs = []
    for i in range(n_pairs):
        fns = []
        for tech in ("Amateur", "Professional"):
            f0 = 220 + 30 * np.sin(2 * np.pi * (5 + i) * t)
            wav = (0.3 * np.sin(2 * np.pi * np.cumsum(f0) / SR)
                   + 0.01 * rng.randn(len(t))).astype(np.float32)
            fn = f"{tmp}/{tech}_{i}.wav"
            save_wav(wav, fn, SR)
            fns.append(fn)
        pairs.append(tuple(fns))
    bargs = {"with_f0": True}
    # warm (jit the DSP kernels once)
    PopBuTFyENBinarizer.process_item("w", pairs[0][0], 0, pairs[0][1], bargs)
    t0 = time.perf_counter()
    audio = 0.0
    for i, (a_fn, p_fn) in enumerate(pairs):
        res = PopBuTFyENBinarizer.process_item(f"it{i}", a_fn, 0, p_fn, bargs)
        audio += res["sec"] + res["prof_sec"]
    wall = time.perf_counter() - t0
    hparams.clear()
    hparams.update(saved)
    return audio / wall


def main():
    rtf, audio_sec, dt = bench_vocoder_rtf()
    utt_per_sec, e2e_rtf, e2e_audio = bench_e2e_svb()
    utt_per_sec_b8, e2e_rtf_b8, _ = bench_e2e_svb(iters=3, warmup=2, batch=8)
    try:
        train = bench_train_step()
    except Exception as e:  # noqa: BLE001 — never lose the primary metric
        train = {"train_bench_error": f"{type(e).__name__}: {e}"[:200]}
    try:
        train["binarize_audio_sec_per_sec_per_worker"] = round(
            bench_binarize(), 2)
    except Exception as e:  # noqa: BLE001
        train["binarize_bench_error"] = f"{type(e).__name__}: {e}"[:200]
    result = {
        "metric": "hifigan_nsf_vocoder_rtf_per_chip",
        "value": round(rtf, 6),
        "unit": "rtf",
        "vs_baseline": round(TARGET_RTF / rtf, 3),
        "detail": {"audio_sec_per_call": round(audio_sec, 3),
                   "compute_sec_per_call": round(dt, 4),
                   "e2e_svb_utterances_per_sec": round(utt_per_sec, 2),
                   "e2e_svb_rtf": round(e2e_rtf, 6),
                   "e2e_svb_utterances_per_sec_b8": round(utt_per_sec_b8, 2),
                   "e2e_svb_rtf_b8": round(e2e_rtf_b8, 6),
                   "e2e_utt_audio_sec": round(e2e_audio, 2),
                   **train,
                   "device": str(__import__("jax").devices()[0])},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
