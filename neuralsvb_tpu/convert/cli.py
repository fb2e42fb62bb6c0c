"""Checkpoint conversion CLI: released PyTorch artifacts -> our msgpack
format.

Usage:
  python -m neuralsvb_tpu.convert.cli --kind hifigan --ckpt <torch.ckpt> \
      --out checkpoints/1012_hifigan_all_songs_nsf/params.msgpack
  python -m neuralsvb_tpu.convert.cli --kind svbvae_mle --ckpt <1030 ckpt> \
      --out checkpoints/my_exp   # writes model_ckpt_steps_<N>.ckpt
"""

from __future__ import annotations

import argparse
import os
import re

from flax import serialization


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", required=True,
                    choices=["hifigan", "pwg", "svbvae_mle", "ge2e"])
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--fvae_enc_layers", type=int, default=8)
    ap.add_argument("--fvae_dec_layers", type=int, default=4)
    ap.add_argument("--asr_enc_layers", type=int, default=2)
    ap.add_argument("--asr_dec_layers", type=int, default=2)
    ap.add_argument("--upsample_rates", default="8,8,2",
                    help="comma list; vocoder architecture of the torch ckpt")
    ap.add_argument("--upsample_kernel_sizes", default="16,16,4")
    ap.add_argument("--upsample_initial_channel", type=int, default=512)
    args = ap.parse_args()

    from . import torch2jax as c
    if args.kind == "hifigan":
        from ..models.hifigan import HifiGanGenerator
        model = HifiGanGenerator(
            upsample_rates=tuple(int(x) for x in
                                 args.upsample_rates.split(",")),
            upsample_kernel_sizes=tuple(int(x) for x in
                                        args.upsample_kernel_sizes.split(",")),
            upsample_initial_channel=args.upsample_initial_channel)
        params = c.convert_hifigan(args.ckpt, model)
        payload = serialization.msgpack_serialize(
            serialization.to_state_dict(params))
    elif args.kind == "pwg":
        from ..models.pwg import ParallelWaveGANGenerator
        model = ParallelWaveGANGenerator()
        params = c.convert_pwg(args.ckpt, model)
        payload = serialization.msgpack_serialize(
            serialization.to_state_dict(params))
    elif args.kind == "ge2e":
        params = c.convert_ge2e(args.ckpt)
        payload = serialization.msgpack_serialize(
            serialization.to_state_dict(params))
    else:  # svbvae_mle -> full train-state checkpoint
        params, stats = c.convert_svbvae_mle(
            args.ckpt, args.fvae_enc_layers, args.fvae_dec_layers,
            args.asr_enc_layers, args.asr_dec_layers)
        m = re.search(r"steps_(\d+)", os.path.basename(args.ckpt))
        step = int(m.group(1)) if m else 0
        state = {"params": params, "batch_stats": stats}
        payload = serialization.msgpack_serialize(serialization.to_state_dict(
            {"epoch": 0, "global_step": step, "checkpoint_callback_best": None,
             "state": state}))
        if os.path.isdir(args.out) or not args.out.endswith(".ckpt"):
            os.makedirs(args.out, exist_ok=True)
            args.out = os.path.join(args.out, f"model_ckpt_steps_{step}.ckpt")
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "wb") as f:
        f.write(payload)
    print(f"| Wrote {args.out}")


if __name__ == "__main__":
    main()
