#!/usr/bin/env python
"""Offline parity gates — run in ANY environment richer than the build box.

Two checks are environment-blocked in the build environment (no egress, no
parselmouth, no released checkpoints) and are the only unverified numerical
risks left on the risk register (PARITY.md "open risks"):

1. Praat-f0 delta (reference: data_gen/tts/data_gen_utils.py:150-184).
   Needs: ``pip install praat-parselmouth`` + a directory of singing wavs
   (ideally PopBuTFy). Gate: voiced-frame agreement >= 0.97 AND voiced
   RMSE <= 10 Hz (scripts/praat_delta.py exits non-zero otherwise).

2. MCD vs the released checkpoints (reference: README.md:47-97).
   Needs: the released NeuralSVB checkpoints + binarized PopBuTFy.
   Flow: convert the torch ckpt (convert/torch2jax.py), run ``--infer``
   on the test set, score MCD of a2p outputs against the ground-truth
   professional mels (tasks/mcd_eval.py). Gate: |MCD_ours - MCD_ref| <=
   0.1 dB, where MCD_ref comes from running the reference repo's own
   inference on the same split (or its published number).

Usage:
    make parity-offline NSVB_WAV_DIR=/data/popbutfy/wavs \
                        NSVB_REF_CKPT=/ckpts/svb_mle.pt \
                        NSVB_BIN_DIR=/data/binary/popbutfy

Each section prints PASS / FAIL / SKIPPED(<missing prerequisite>); the
process exits non-zero iff any section that RAN failed.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

failures = []


def section(name: str):
    print(f"\n=== {name} " + "=" * max(1, 60 - len(name)))


def skipped(name: str, why: str):
    print(f"SKIPPED ({name}): {why}")


def main() -> int:
    # ---------------------------------------------------------------- 1
    section("Praat f0 delta (gate: agreement >= 0.97, RMSE <= 10 Hz)")
    wav_dir = os.environ.get("NSVB_WAV_DIR", "")
    try:
        import parselmouth  # noqa: F401
        have_praat = True
    except ImportError:
        have_praat = False
    if not have_praat:
        skipped("praat", "parselmouth not installed "
                "(pip install praat-parselmouth)")
    elif not wav_dir or not os.path.isdir(wav_dir):
        skipped("praat", "set NSVB_WAV_DIR to a directory of singing wavs")
    else:
        rc = subprocess.call([sys.executable,
                              os.path.join(REPO, "scripts/praat_delta.py"),
                              wav_dir])
        print("PASS" if rc == 0 else "FAIL", "(praat f0 delta)")
        if rc != 0:
            failures.append("praat_delta")

    # ---------------------------------------------------------------- 2
    section("MCD vs released checkpoint (gate: within 0.1 dB of reference)")
    ref_ckpt = os.environ.get("NSVB_REF_CKPT", "")
    bin_dir = os.environ.get("NSVB_BIN_DIR", "")
    if not ref_ckpt or not os.path.exists(ref_ckpt):
        skipped("mcd", "set NSVB_REF_CKPT to the released torch checkpoint "
                "(.pt/.ckpt from the reference's README links)")
    elif not bin_dir or not os.path.isdir(bin_dir):
        skipped("mcd", "set NSVB_BIN_DIR to a binarized PopBuTFy dir "
                "(python data_gen/tts/bin/binarize.py --config "
                "egs/datasets/audio/PopBuTFy/para_bin.yaml)")
    else:
        work = os.path.join(REPO, "checkpoints", "parity_offline_mle")
        steps = [
            # 1) torch -> flax param conversion (exact; activation-parity
            #    tested at conversion time, convert/torch2jax.py)
            [sys.executable, "-m", "neuralsvb_tpu.convert.cli",
             "--kind", "svbvae_mle", "--ckpt", ref_ckpt, "--out", work],
            # 2) our inference over the test split
            [sys.executable, "tasks/run.py", "--config",
             "egs/datasets/audio/PopBuTFy/vae_global_mle_eng.yaml",
             "--exp_name", "parity_offline_mle", "--infer",
             "--hparams", f"binary_data_dir={bin_dir}"],
        ]
        rc = 0
        for cmd in steps:
            rc = subprocess.call(cmd, cwd=REPO)
            if rc != 0:
                break
        if rc == 0:
            gen = sorted(
                d for d in os.listdir(work) if d.startswith("generated_"))
            mels = os.path.join(work, gen[-1], "mels") if gen else ""
            rc = subprocess.call([
                sys.executable, "-m", "neuralsvb_tpu.tasks.mcd_eval",
                "--dir_a", os.path.join(mels, "a2p_mel"),
                "--dir_b", os.path.join(mels, "gt_p_mel")], cwd=REPO)
            print("^ compare this MCD to the reference repo's inference on "
                  "the same split; gate: |delta| <= 0.1 dB")
        print("PASS" if rc == 0 else "FAIL", "(mcd pipeline ran)")
        if rc != 0:
            failures.append("mcd_eval")

    print("\n==== parity-offline summary:",
          "FAIL " + ",".join(failures) if failures else
          "all runnable gates passed (see SKIPPED lines for what this "
          "environment could not check)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
