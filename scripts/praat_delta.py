#!/usr/bin/env python
"""Quantify the f0 delta between our JAX pitch tracker and Praat.

The binarizer's F0 comes from ``neuralsvb_tpu.ops.pitch.get_pitch`` (JAX
autocorrelation + Viterbi, Praat-parameter-matched: voicing 0.6, floor 80,
ceiling 750); the reference uses parselmouth/Praat
(reference: data_gen/tts/data_gen_utils.py:150-184). parselmouth cannot be
installed in the build environment (no egress), so the residual delta is an
open risk — ESPECIALLY at voicing boundaries, because ``pitch > 0`` drives
every nonpadding mask downstream (reference: svb_vae.py:84).

Run this ANYWHERE parselmouth exists to close the gap:

    pip install praat-parselmouth
    python scripts/praat_delta.py /path/to/wavs [--hop 128] [--sr 22050]

Reports, per file and aggregate:
- voiced-frame agreement (fraction of frames where both trackers agree on
  voiced/unvoiced) — the mask-parity number;
- boundary disagreement (voicing flips within ±2 frames of a Praat voicing
  edge) — where mask mismatches concentrate;
- voiced-f0 RMSE and median |delta| in Hz and in cents (frames voiced under
  both trackers) — the pitch-accuracy number.

Exit code 1 if voiced agreement < 0.97 or voiced RMSE > 10 Hz.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def praat_f0(wav: np.ndarray, sr: int, hop: int) -> np.ndarray:
    """Praat autocorrelation f0 with the reference's exact parameters
    (reference: data_gen/tts/data_gen_utils.py:158-171)."""
    import parselmouth
    return parselmouth.Sound(wav, sr).to_pitch_ac(
        time_step=hop / sr, voicing_threshold=0.6,
        pitch_floor=80, pitch_ceiling=750).selected_array["frequency"]


def compare_file(fn: str, sr: int, hop: int):
    from neuralsvb_tpu.ops.audio import load_wav
    from neuralsvb_tpu.ops.pitch import track_pitch

    wav, _ = load_wav(fn, sr)
    ours = np.asarray(track_pitch(wav, sr, hop))
    theirs = praat_f0(wav, sr, hop)
    n = min(len(ours), len(theirs))
    ours, theirs = ours[:n], theirs[:n]

    v_ours, v_theirs = ours > 0, theirs > 0
    agree = float((v_ours == v_theirs).mean())

    # voicing edges in the Praat track; disagreements within +/-2 frames
    edges = np.flatnonzero(np.diff(v_theirs.astype(np.int8)) != 0)
    near_edge = np.zeros(n, bool)
    for e in edges:
        near_edge[max(e - 2, 0):e + 3] = True
    boundary_mismatch = float((v_ours != v_theirs)[near_edge].mean()) \
        if near_edge.any() else 0.0

    both = v_ours & v_theirs
    if both.any():
        d = ours[both] - theirs[both]
        rmse = float(np.sqrt((d ** 2).mean()))
        med = float(np.median(np.abs(d)))
        cents = 1200 * np.log2(ours[both] / theirs[both])
        med_cents = float(np.median(np.abs(cents)))
    else:
        rmse = med = med_cents = float("nan")
    return dict(frames=n, voiced_agree=agree,
                boundary_mismatch=boundary_mismatch,
                voiced_rmse_hz=rmse, voiced_med_hz=med,
                voiced_med_cents=med_cents)


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("wav_dir", help="folder of .wav/.mp3 files")
    ap.add_argument("--sr", type=int, default=22050)
    ap.add_argument("--hop", type=int, default=128)
    ap.add_argument("--limit", type=int, default=0, help="max files")
    args = ap.parse_args()

    try:
        import parselmouth  # noqa: F401
    except ImportError:
        print("parselmouth is not installed; run "
              "`pip install praat-parselmouth` in an environment with "
              "egress and re-run. (This harness exists precisely because "
              "the build environment cannot install it.)")
        return 2

    fns = sorted(sum((glob.glob(os.path.join(args.wav_dir, p),
                                recursive=True)
                      for p in ("*.wav", "*.mp3", "**/*.wav", "**/*.mp3")),
                     []))
    fns = list(dict.fromkeys(fns))
    if args.limit:
        fns = fns[:args.limit]
    if not fns:
        print(f"no wav/mp3 files under {args.wav_dir}")
        return 2

    rows = []
    for fn in fns:
        r = compare_file(fn, args.sr, args.hop)
        rows.append(r)
        print(f"{os.path.basename(fn)[:48]:48s} agree={r['voiced_agree']:.4f} "
              f"edge_miss={r['boundary_mismatch']:.4f} "
              f"rmse={r['voiced_rmse_hz']:.2f}Hz "
              f"med={r['voiced_med_cents']:.1f}c")

    w = np.asarray([r["frames"] for r in rows], np.float64)

    def wmean(k):
        # renormalize weights over non-NaN rows: nansum over the raw
        # weights would pull the aggregate toward 0 (a file with zero
        # mutually-voiced frames has rmse = NaN, not rmse = 0) and could
        # flip FAIL to PASS
        vals = np.asarray([r[k] for r in rows], np.float64)
        m = ~np.isnan(vals)
        return float((w[m] * vals[m]).sum() / w[m].sum()) if m.any() \
            else float("nan")

    agg = {k: wmean(k) for k in rows[0] if k != "frames"}
    n_nan = int(np.isnan([r["voiced_rmse_hz"] for r in rows]).sum())
    print("\nAGGREGATE (frame-weighted): "
          f"voiced_agree={agg['voiced_agree']:.4f} "
          f"boundary_mismatch={agg['boundary_mismatch']:.4f} "
          f"voiced_rmse={agg['voiced_rmse_hz']:.2f}Hz "
          f"median={agg['voiced_med_cents']:.1f} cents"
          + (f" ({n_nan} file(s) with NO mutually-voiced frames — "
             f"tracker red flag, counted as failure)" if n_nan else ""))
    # a file where the two trackers share no voiced frames at all is itself
    # a failure of the gate this harness enforces, not missing data
    ok = (n_nan == 0 and agg["voiced_agree"] >= 0.97
          and agg["voiced_rmse_hz"] <= 10.0)
    print("PASS" if ok else "FAIL (voiced_agree < 0.97, RMSE > 10 Hz, "
                            "or a file with no mutually-voiced frames)")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
