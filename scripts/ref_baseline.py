#!/usr/bin/env python
"""Measure the PyTorch reference on THIS box (CPU) to anchor BASELINE.md's
comparison column (VERDICT r2 #7).

The reference's released checkpoints cannot be fetched here (zero egress)
and no GPU exists, so these are torch-CPU numbers on random-init weights at
the shipped architecture dims — clearly labeled as such. They are not
GPU-representative; they exercise the actual reference code path (the same
modules the parity suite imports) and turn BASELINE.md's "measure ref"
placeholders into data.

Usage:  python scripts/ref_baseline.py [--frames 2048] [--train-frames 512]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SR, HOP = 22050, 128


def _stub_missing():
    # shared stub list — keep in one place (the module object survives the
    # sys.path surgery in main(); only the import below must happen first)
    from neuralsvb_tpu.convert.ref_env import stub_missing_ref_deps
    stub_missing_ref_deps()


def bench_ref_vocoder(torch, hifigan_mod, n_frames, iters=3, warmup=1):
    """Reference HiFiGAN-NSF generator forward (modules/hifigan/hifigan.py:
    104-178) at the shipped dims: mel [1, T, 80] + f0 -> wav [T*128]."""
    from utils.hparams import hparams as rhp
    rhp.update(audio_sample_rate=SR, use_pitch_embed=True)
    cfg = dict(resblock="1", upsample_rates=[8, 8, 2],
               upsample_kernel_sizes=[16, 16, 4],
               upsample_initial_channel=512,
               resblock_kernel_sizes=[3, 7, 11],
               resblock_dilation_sizes=[[1, 3, 5]] * 3,
               audio_num_mel_bins=80, use_pitch_embed=True,
               audio_sample_rate=SR)
    torch.manual_seed(0)
    model = hifigan_mod.HifiGanGenerator(cfg).eval()
    mel = torch.randn(1, 80, n_frames) - 2.0
    f0 = torch.full((1, n_frames), 220.0)
    with torch.no_grad():
        for _ in range(warmup):
            model(mel, f0=f0)
        t0 = time.perf_counter()
        for _ in range(iters):
            model(mel, f0=f0)
        dt = (time.perf_counter() - t0) / iters
    audio_sec = n_frames * HOP / SR
    return dict(ref_vocoder_cpu_ms_per_call=round(dt * 1e3, 1),
                ref_vocoder_cpu_rtf=round(dt / audio_sec, 5),
                ref_vocoder_audio_sec=round(audio_sec, 2))


def bench_ref_train_step(torch, svb_vae_mod, n_frames, batch, iters=2):
    """One reference MleSVBVAE generator step: forward over a2a+p2p+a2p,
    mel L1 loss, backward, AdamW step (the phase-2 generator pass of
    tasks/singing/svb_vae_task.py:596-636 without the task scaffolding)."""
    from utils.hparams import hparams as rhp
    torch.manual_seed(0)
    model = svb_vae_mod.MleSVBVAE(100)
    model.vc_asr.eval()
    for p in model.vc_asr.parameters():
        p.requires_grad = False
    opt = torch.optim.AdamW(
        [p for n, p in model.named_parameters()
         if "vc_asr" not in n and "z_mapping_function" not in n], lr=1e-4)
    B, T = batch, n_frames
    mel_a = torch.randn(B, T, 80) - 2.0
    mel_p = torch.randn(B, T, 80) - 2.0
    pitch = torch.randint(1, 255, (B, T))
    spk = torch.randn(B, 256)
    align = torch.clamp(torch.arange(T), 0, T - 1)[None].repeat(B, 1)

    def step():
        out = model(amateur_mel=mel_a, prof_mel=mel_p, amateur_pitch=pitch,
                    prof_pitch=pitch, amateur_spk_id=spk, prof_spk_id=spk,
                    a2p_alignment=align, concurrent_ways=["a2a", "p2p"])
        loss = sum((out[w]["mel_out"] - (mel_p if w != "a2a" else mel_a))
                   .abs().mean() for w in ("a2a", "p2p"))
        loss = loss + 0.001 * sum(out[w]["kl"].mean() for w in ("a2a", "p2p"))
        opt.zero_grad()
        loss.backward()
        opt.step()

    step()  # warmup (allocs)
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = (time.perf_counter() - t0) / iters
    audio_sec = B * T * HOP / SR
    return dict(ref_train_gen_step_cpu_ms=round(dt * 1e3, 1),
                ref_train_cpu_ms_per_audio_sec=round(dt * 1e3 / audio_sec, 1),
                ref_train_batch=B, ref_train_frames=T,
                ref_train_audio_sec=round(audio_sec, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2048)
    ap.add_argument("--train-frames", type=int, default=512)
    ap.add_argument("--train-batch", type=int, default=2)
    args = ap.parse_args()

    _stub_missing()
    for name in list(sys.modules):
        if name.split(".")[0] in ("tasks", "data_gen", "utils", "modules"):
            del sys.modules[name]
    sys.path = [p for p in sys.path
                if os.path.abspath(p or os.getcwd()) != REPO]
    sys.path.insert(0, REF)

    import torch
    torch.set_num_threads(os.cpu_count() or 1)
    from utils.hparams import hparams as rhp
    rhp.update(hidden_size=256, audio_num_mel_bins=80, latent_size=16,
               fvae_enc_dec_hidden=64, fvae_kernel_size=5,
               fvae_enc_n_layers=8, fvae_dec_n_layers=4,
               asr_enc_layers=2, asr_dec_layers=2, asr_last_norm=False,
               asr_enc_type="conformer", mel_strides=[2, 1, 1], dropout=0.1,
               frames_multiple=4, num_heads=2, dec_ffn_kernel_size=9,
               ffn_act="gelu", ffn_padding="SAME", audio_sample_rate=SR,
               use_pitch_embed=True, use_spk_embed=True)
    import modules.hifigan.hifigan as hifigan_mod
    import modules.voice_conversion.svb_vae as svb_vae_mod

    out = {"host": "1-core CPU (torch-CPU, random init; no GPU/ckpts here)"}
    out.update(bench_ref_vocoder(torch, hifigan_mod, args.frames))
    out.update(bench_ref_train_step(torch, svb_vae_mod, args.train_frames,
                                    args.train_batch))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
