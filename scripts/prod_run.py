#!/usr/bin/env python
"""Production-run artifact: a few hundred REAL `Trainer.fit` steps on the
attached accelerator with the flagship recipe exactly as shipped
(`device_data_cache: auto`, `cache_ppg: true`, `steps_per_dispatch: 4`,
`vae_global_mle_eng.yaml`) over binarized data — loss trajectory + measured
ms/step for the README "Status" bullet (VERDICT r4 #5).

Synthetic paired data (detuned-sine amateur vs harmonically rich
professional takes, the convergence-test recipe at longer durations) is
binarized through the real CLI pipeline (SaveSpkEmb + PopBuTFyENSpkEM),
then trained with the real Trainer:

  phase A: fit to --steps updates (covers the phase-2 -> phase-3
           transition via shortened phase_2_steps; cold compiles included);
  phase B: auto-resume the same work dir for --extra more updates and time
           THAT segment wall-clock — warm steady-state ms/step of the
           actual production loop (loader + logging + dispatch included).

Usage: python scripts/prod_run.py [--steps 300] [--extra 100] [--p2 200]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

SR = 22050
AMATEUR = (1.0,)
PROF = (1.0, 0.6, 0.45, 0.3, 0.2)


def _tone(freq, dur, seed, harmonics):
    rng = np.random.RandomState(seed)
    t = np.arange(int(SR * dur)) / SR
    vib = freq * (1 + 0.02 * np.sin(2 * np.pi * 5.5 * t))
    phase = 2 * np.pi * np.cumsum(vib) / SR
    wav = sum(a * np.sin((i + 1) * phase) for i, a in enumerate(harmonics))
    wav = 0.25 * wav / max(1e-6, np.abs(wav).max())
    return (wav + 0.005 * rng.randn(len(t))).astype(np.float32)


def make_data(root):
    from neuralsvb_tpu.ops.audio import save_wav
    data_dir = os.path.join(root, "processed", "data", "p1")
    os.makedirs(data_dir, exist_ok=True)
    songs = [("Female1", "SongA", 220.0), ("Female1", "SongB", 262.0),
             ("Female1", "SongD", 196.0), ("Male6", "SongC", 165.0)]
    for spk, song, freq in songs:
        for idx in range(3):
            dur = 6.0 + 0.8 * idx  # ~1000-1200 mel frames per take
            save_wav(_tone(freq * 1.03, dur, idx, AMATEUR),
                     f"{data_dir}/{spk}#singing#{song}_Amateur_{idx}.wav", SR)
            save_wav(_tone(freq, dur * 0.97, idx + 9, PROF),
                     f"{data_dir}/{spk}#singing#{song}_Professional_{idx}.wav",
                     SR)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--extra", type=int, default=100)
    ap.add_argument("--p2", type=int, default=200,
                    help="shortened phase_2_steps (covers the 2->3 "
                         "transition inside --steps)")
    ap.add_argument("--root", default="checkpoints/prod_r5_data")
    args = ap.parse_args()

    from neuralsvb_tpu.hparams import (hparams_scope, load_config_recursive,
                                       set_hparams)
    root = os.path.abspath(args.root)
    common = {
        "processed_data_dir": f"{root}/processed",
        "binary_data_dir": f"{root}/binary",
        "spk_emb_data_dir": f"{root}/spk_emb",
        "test_prefixes": ["Male6#singing#"],
        "ds_workers": 1, "ge2e_ckpt": "",
    }
    if not os.path.isdir(f"{root}/binary"):
        print("| prod_run: generating + binarizing synthetic paired data")
        make_data(root)
        bin_cfg = load_config_recursive(
            "egs/datasets/audio/PopBuTFy/para_bin.yaml")
        bin_cfg.update(common)
        from neuralsvb_tpu.data.binarizer import (PopBuTFyENSpkEMBinarizer,
                                                  SaveSpkEmb)
        with hparams_scope(new=bin_cfg):
            SaveSpkEmb().process()
            PopBuTFyENSpkEMBinarizer().process()

    # the SHIPPED flagship recipe; only schedule lengths + data paths are
    # overridden (device_data_cache/cache_ppg/steps_per_dispatch stay as
    # vae_global_mle_eng.yaml ships them)
    overrides = dict(common)
    overrides.update(
        phase_2_steps=args.p2, max_updates=args.steps,
        val_check_interval=10 ** 9, valid_infer_interval=10 ** 9,
        num_sanity_val_steps=0, num_ckpt_keep=2, tb_log_interval=20,
        pretrain_asr_ckpt="", vocoder_ckpt="", num_test_samples=0,
        endless_ds=True,
    )
    hp_str = ",".join(f"{k}={v}" for k, v in overrides.items())

    def fit(max_updates, tag):
        # the REAL CLI path: set_hparams + BaseTask.start() (auto-resumes
        # from the work dir's latest checkpoint, exactly like
        # `python tasks/run.py --config ... --exp_name prod_r5_mle`)
        cfg = set_hparams(
            config="egs/datasets/audio/PopBuTFy/vae_global_mle_eng.yaml",
            exp_name="prod_r5_mle",
            hparams_str=hp_str + f",max_updates={max_updates}",
            print_hparams=False)
        assert cfg["device_data_cache"] == "auto" and cfg["cache_ppg"] \
            and int(cfg["steps_per_dispatch"]) == 4, "recipe drifted"
        with hparams_scope(new=cfg):
            from neuralsvb_tpu.tasks.svb_vae_task import SVBVAEMleTask
            t0 = time.perf_counter()
            SVBVAEMleTask.start()
            dt = time.perf_counter() - t0
        print(json.dumps({"tag": tag, "wall_s": round(dt, 1),
                          "to_step": int(max_updates)}), flush=True)
        return dt

    print(f"| prod_run phase A: fit to {args.steps} steps "
          f"(cold compiles included)")
    fit(args.steps, "phaseA_cold")
    print(f"| prod_run phase B: resume +{args.extra} steps (warm steady "
          f"state = the honest production ms/step)")
    dt = fit(args.steps + args.extra, "phaseB_warm")
    print(json.dumps({
        "tag": "summary",
        "warm_ms_per_step_incl_resume": round(1e3 * dt / max(args.extra, 1),
                                              1),
        "steps_timed": args.extra}), flush=True)

    # loss trajectory from the run's own TensorBoard scalars
    try:
        from tensorboard.backend.event_processing.event_accumulator import \
            EventAccumulator
        logs_root = "checkpoints/prod_r5_mle/lightning_logs"
        traj = {}
        for ver in sorted(os.listdir(logs_root)):
            acc = EventAccumulator(os.path.join(logs_root, ver))
            acc.Reload()
            for tag in acc.Tags().get("scalars", []):
                for ev in acc.Scalars(tag):
                    traj.setdefault(tag, []).append((ev.step, ev.value))
        for tag in sorted(traj):
            pts = sorted(traj[tag])
            if len(pts) >= 2 and not tag.startswith("lr"):
                print(json.dumps({
                    "tag": f"traj/{tag}", "first": round(pts[0][1], 4),
                    "first_step": pts[0][0], "last": round(pts[-1][1], 4),
                    "last_step": pts[-1][0]}), flush=True)
    except Exception as e:  # noqa: BLE001 — trajectory is best-effort
        print(f"| prod_run: TB trajectory unavailable ({e})")


if __name__ == "__main__":
    main()
