"""MCD parity harness: mel-cepstral distortion between two generated-mel
directories (BASELINE.md north star: a2p mels within 0.1 dB MCD of the
PyTorch reference on the packed test set).

Usage:
  python -m neuralsvb_tpu.tasks.mcd_eval --dir_a <ours>/mels/a2p_mel \
      --dir_b <reference>/mels/a2p_mel
Matches files by basename; prints per-file and mean MCD.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from ..utils.metrics import mel_cepstral_distortion


def evaluate_dirs(dir_a: str, dir_b: str, n_mfcc: int = 13):
    files_a = {os.path.basename(f): f for f in glob.glob(os.path.join(dir_a, "*.npy"))}
    files_b = {os.path.basename(f): f for f in glob.glob(os.path.join(dir_b, "*.npy"))}
    common = sorted(set(files_a) & set(files_b))
    if not common:
        raise SystemExit(f"no common .npy files between {dir_a} and {dir_b}")
    mcds = []
    for name in common:
        a = np.load(files_a[name])
        b = np.load(files_b[name])
        mcd = mel_cepstral_distortion(a, b, n_mfcc)
        mcds.append(mcd)
        print(f"| {name}: MCD {mcd:.4f} dB (T {len(a)} vs {len(b)})")
    mean = float(np.mean(mcds))
    print(f"| mean MCD over {len(common)} items: {mean:.4f} dB")
    return mean


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir_a", required=True)
    ap.add_argument("--dir_b", required=True)
    ap.add_argument("--n_mfcc", type=int, default=13)
    args = ap.parse_args()
    evaluate_dirs(args.dir_a, args.dir_b, args.n_mfcc)
