"""Token-budget dynamic batching + TPU bucketed padding.

``batch_by_size`` reproduces the fairseq-style batcher the reference uses
(reference: utils/__init__.py:152-217): batches are built over size-sorted
shuffled indices until ``max_tokens`` (= batch_size * max_len) or
``max_sentences``.

For XLA's static-shape world the *collate* pads each batch's time axis up to
a bucket boundary (multiple of ``bucket_quant`` frames), so the number of
distinct compiled shapes stays small (SURVEY.md section 5.7).
"""

from __future__ import annotations

import sys
from typing import List, Sequence

import numpy as np


def _is_batch_full(batch, num_tokens, max_tokens, max_sentences):
    if len(batch) == 0:
        return False
    if len(batch) == max_sentences:
        return True
    return num_tokens > max_tokens


def batch_by_size(indices, num_tokens_fn, max_tokens=None, max_sentences=None,
                  required_batch_size_multiple=1) -> List[List[int]]:
    max_tokens = max_tokens if max_tokens is not None else sys.maxsize
    max_sentences = max_sentences if max_sentences is not None else sys.maxsize
    bsz_mult = required_batch_size_multiple

    sample_len = 0
    sample_lens: list = []
    batch: list = []
    batches: list = []
    for idx in indices:
        idx = int(idx)
        n = num_tokens_fn(idx)
        sample_lens.append(n)
        sample_len = max(sample_len, n)
        assert sample_len <= max_tokens, \
            f"sample at {idx} of size {sample_len} > max_tokens {max_tokens}"
        num_tokens = (len(batch) + 1) * sample_len
        if _is_batch_full(batch, num_tokens, max_tokens, max_sentences):
            mod_len = max(bsz_mult * (len(batch) // bsz_mult), len(batch) % bsz_mult)
            batches.append(batch[:mod_len])
            batch = batch[mod_len:]
            sample_lens = sample_lens[mod_len:]
            sample_len = max(sample_lens) if sample_lens else 0
        batch.append(idx)
    if batch:
        batches.append(batch)
    return batches


def ordered_indices(sizes, shuffle: bool, sort_by_len: bool = True,
                    rng: np.random.RandomState | None = None) -> np.ndarray:
    """reference: tasks/base_task.py:83-92."""
    rng = rng or np.random
    if shuffle:
        indices = rng.permutation(len(sizes))
        if sort_by_len:
            indices = indices[np.argsort(np.array(sizes)[indices], kind="mergesort")]
    else:
        indices = np.arange(len(sizes))
    return indices


def round_up(x: int, quant: int) -> int:
    return ((x + quant - 1) // quant) * quant


def collate_1d(values: Sequence[np.ndarray], pad_value=0, max_len=None,
               bucket_quant: int = 1, dtype=None) -> np.ndarray:
    size = max(len(v) for v in values) if max_len is None else max_len
    size = round_up(size, bucket_quant)
    first = np.asarray(values[0])
    out = np.full((len(values), size), pad_value,
                  dtype=dtype or first.dtype)
    for i, v in enumerate(values):
        out[i, : len(v)] = v
    return out


def collate_2d(values: Sequence[np.ndarray], pad_value=0.0, max_len=None,
               bucket_quant: int = 1, dtype=None) -> np.ndarray:
    size = max(len(v) for v in values) if max_len is None else max_len
    size = round_up(size, bucket_quant)
    first = np.asarray(values[0])
    out = np.full((len(values), size, first.shape[1]), pad_value,
                  dtype=dtype or first.dtype)
    for i, v in enumerate(values):
        out[i, : len(v)] = v
    return out
