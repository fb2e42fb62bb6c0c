"""Offline DTW alignment-accuracy harness
(reference: tasks/singing/pitch_alignment_task.py:41-140).

Evaluates every aligner over a packed split: accuracy = fraction of frames
where the aligned amateur mel2ph matches the professional mel2ph (the
de-facto alignment metric, reference: shape_aware_dtw.py:174-179). Items
without mel2ph fall back to an f0-agreement proxy (voiced/unvoiced match of
the aligned f0 vs the professional f0), so the harness also runs on packed
sets without text alignments.

Usage: ``python -m neuralsvb_tpu.tasks.pitch_alignment_task --config <yaml>
[--hparams "align_funcs=EHSADTW|SADTW,align_split=test"]``
"""

from __future__ import annotations

import os
from multiprocessing.pool import ThreadPool

import numpy as np

from ..hparams import hparams, set_hparams
from ..ops import dtw as dtw_ops

THRESHOLD = 0.3


def item_accuracy(item, func_name: str):
    f0_a = np.asarray(item["f0"], np.float64)
    f0_p = np.asarray(item["prof_f0"], np.float64)
    fn = dtw_ops.ALIGN_FUNCS[func_name]
    if "mel2ph" in item and "prof_mel2ph" in item:
        m2p_a = np.asarray(item["mel2ph"])
        aligned, alignment = fn(f0_a, f0_p, m2p_a)
        tgt = np.asarray(item["prof_mel2ph"])[: len(aligned)]
        acc = float((aligned[: len(tgt)] == tgt).mean())
    else:
        _aligned_f0, alignment = fn(f0_a, f0_p, f0_a)
        aligned_f0 = f0_a[alignment]
        tgt = f0_p[: len(aligned_f0)]
        acc = float(((aligned_f0 > 0) == (tgt > 0)).mean())
    return acc


def evaluate(split: str = "test", func_names=("EHSADTW",), n_workers: int = 8):
    from ..data.indexed_dataset import IndexedDataset
    ds = IndexedDataset(os.path.join(hparams["binary_data_dir"], split))
    results = {}
    pool = ThreadPool(n_workers)
    for name in func_names:
        accs = pool.map(lambda i: item_accuracy(ds[i], name), range(len(ds)))
        accs = np.asarray(accs)
        results[name] = {
            "avg": float(accs.mean()), "max": float(accs.max()),
            "min": float(accs.min()),
            "n_below_threshold": int((accs < THRESHOLD).sum()),
        }
        print(f"| {name} [{split}] avg={results[name]['avg']:.4f} "
              f"max={results[name]['max']:.4f} min={results[name]['min']:.4f} "
              f"bad(<{THRESHOLD})={results[name]['n_below_threshold']}")
    pool.close()
    pool.join()
    return results


if __name__ == "__main__":
    set_hparams()
    funcs = hparams.get("align_funcs", "EHSADTW")
    evaluate(hparams.get("align_split", "test"), tuple(funcs.split("|")))
