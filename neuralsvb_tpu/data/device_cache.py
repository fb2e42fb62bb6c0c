"""Device-resident feature cache: pin the binarized training features in
device HBM once, assemble padded batches ON DEVICE from index vectors.

Why: the per-step host->device batch transfer is the training wall-time
bottleneck on interconnect-bound setups (measured on the target chip's
remote relay: ~22-35 MB/s effective, so the flagship 6 MB/step packed-f16
batch costs ~5x the 38 ms step's device compute; scripts/profile_dispatch.py).
A typical binarized SVB dataset (mel80 f16 + pitch/alignment i16 + spk
embeds) is ~100 MB per audio-hour — it FITS in a TPU's HBM. So instead of
re-shipping feature windows every step, ship the dataset once and send only
``[B] int32`` item indices per step (tens of bytes): the wall collapses to
device compute + dispatch.

This replaces the reference's per-batch ``move_to_cuda`` host->device copy
(reference: utils/trainer.py:288-295, utils/__init__.py:80) with a
TPU-idiomatic design: one resident buffer + on-device gather, which XLA
fuses into the training step.

Layout: features are flattened along time into flat buffers with per-item
(offset, length); batch assembly is a row-gather + padding mask, traced
inside the training step (no extra dispatch):

    rows  = offsets[idxs][:, None] + min(arange(T), lengths[idxs]-1)
    valid = arange(T) < lengths[idxs]
    mels  = mel_flat[rows] * valid            # [B, T, 80], 0.0-padded

Dtypes mirror the packed wire format (f16 mels / i16 indices,
tasks/svb_vae_task.py _WIRE_DTYPES) so cached and streamed training are
bit-identical. Padding semantics mirror ``collate_1d/2d`` (0-padding), and
items are cached AFTER the dataset's __getitem__ (max_frames crop,
frames_multiple floor, pitch normalization), so the assembled batch equals
the host-collated one exactly (tests/test_device_cache.py).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# feature name -> (item key, flat storage dtype, time side 'a'|'p', ndim)
_SPEC = {
    "mels": ("mel", np.float16, "a", 2),
    "prof_mels": ("prof_mel", np.float16, "p", 2),
    "pitch": ("pitch", np.int16, "a", 1),
    "prof_pitch": ("prof_pitch", np.int16, "p", 1),
    "a2p_f0_alignment": ("a2p_f0_alignment", np.int16, "p", 1),
}


def estimate_cache_mb(dataset, with_ppg: bool = False,
                      ppg_hidden: int = 256, ppg_stride: int = 2) -> float:
    """Pre-build size estimate from the dataset's size table (mel frame
    counts, upper bound max(T_a, T_p) per item): bytes/frame = 80*2 (mel)
    + 2 (pitch) per side + 2 (alignment, prof side) + spk embeds, plus the
    optional frozen-ASR PPG rows (f16 [T/stride, H] per side)."""
    sizes = np.asarray(getattr(dataset, "sizes", []), np.int64)
    if sizes.size == 0:
        return 0.0
    per_frame = 2 * (80 * 2 + 2) + 2
    if with_ppg:
        per_frame += 2 * (ppg_hidden * 2) // ppg_stride
    spk = len(sizes) * 5 * 256 * 4
    return float(sizes.sum() * per_frame + spk) / 1e6


class DeviceFeatureCache:
    """Immutable device-resident feature store for one dataset split.

    ``ppg_stride`` records the stride the PPG rows were BUILT with; batch
    assembly must use it (not ambient hparams re-read at trace time, which
    may have changed under an ``hparams_scope`` or a second in-process task
    by then)."""

    def __init__(self, arrays: Dict[str, jax.Array], n_items: int,
                 ppg_stride: int = 2):
        self.arrays = arrays
        self.n_items = n_items
        self.ppg_stride = ppg_stride

    @classmethod
    def build(cls, dataset, sharding=None, budget_mb: float = 4096.0,
              verbose: bool = True, ppg_fn=None, ppg_stride: int = 2,
              ppg_hidden: int = 256) -> Optional["DeviceFeatureCache"]:
        """Iterate the dataset once (host), flatten, upload once.

        Returns None (caller falls back to wire streaming) when the
        estimated size exceeds ``budget_mb`` or items lack the SVB paired
        keys. ``sharding`` places the buffers (replicated on the mesh under
        data parallelism).

        ``ppg_fn`` (optional): batched frozen-ASR content extractor
        ``[B, T, 80] f32 -> [B, ceil(T/ppg_stride), H]`` (padding rows must
        come back exactly zero — the VCASR conformer masks them, see
        tests/test_device_cache.py). When given, per-item PPG rows are
        precomputed once here and cached alongside the features, so training
        steps skip the (frozen, stop-gradient) ASR forward entirely — the
        profiler's largest single per-step cost after the VAE itself
        (scripts/profile_train.py --top-ops: the [B,4,T/2,T/2] rel-pos
        attention chain)."""
        est = estimate_cache_mb(dataset, with_ppg=ppg_fn is not None,
                                ppg_hidden=ppg_hidden, ppg_stride=ppg_stride)
        if est > budget_mb:
            if verbose:
                print(f"| device cache: estimated {est:.0f} MB exceeds "
                      f"budget {budget_mb:.0f} MB; streaming batches instead")
            return None
        n = len(dataset)
        if n == 0:
            return None
        probe = dataset[0]
        if any(probe.get(k) is None for k, *_ in
               [(v[0],) for v in _SPEC.values()]) \
                or probe.get("multi_spk_emb") is None:
            if verbose:
                print("| device cache: dataset items lack paired SVB keys; "
                      "streaming batches instead")
            return None

        parts = {k: [] for k in _SPEC}
        a_lens, p_lens, spk = [], [], []
        for i in range(n):
            s = dataset[i]
            if s.get("id") != i:
                # batches address the cache by their "id" field; a dataset
                # that remaps ids (e.g. BaseConcatDataset members emit
                # member-local ids) would gather the wrong items
                if verbose:
                    print("| device cache: dataset ids are not global "
                          "indices; streaming batches instead")
                return None
            a_lens.append(len(s["mel"]))
            p_lens.append(len(s["prof_mel"]))
            spk.append(np.asarray(s["multi_spk_emb"], np.float32))
            for name, (key, dt, _side, _nd) in _SPEC.items():
                v = np.asarray(s[key])
                if dt == np.int16 and v.size and (
                        v.max() > 32767 or v.min() < -32768):
                    raise ValueError(
                        f"device cache: '{key}' exceeds int16 range "
                        f"(max_frames > 32767?); disable device_data_cache")
                parts[name].append(v.astype(dt))
        a_lens = np.asarray(a_lens, np.int32)
        p_lens = np.asarray(p_lens, np.int32)
        host = {
            "a_offsets": np.concatenate([[0], np.cumsum(a_lens)[:-1]]
                                        ).astype(np.int32),
            "a_lengths": a_lens,
            "p_offsets": np.concatenate([[0], np.cumsum(p_lens)[:-1]]
                                        ).astype(np.int32),
            "p_lengths": p_lens,
            "multi_spk_emb": np.stack(spk),
        }
        for name in _SPEC:
            host[name] = np.concatenate(parts[name], axis=0)
        if ppg_fn is not None:
            for side, mels, lens in (("a", parts["mels"], a_lens),
                                     ("p", parts["prof_mels"], p_lens)):
                flat, offs, plens = _build_ppg(ppg_fn, mels, lens, ppg_stride)
                host[f"ppg_{side}"] = flat
                host[f"ppg_{side}_offsets"] = offs
                host[f"ppg_{side}_lengths"] = plens
        total_mb = sum(v.nbytes for v in host.values()) / 1e6
        if total_mb > budget_mb:
            if verbose:
                print(f"| device cache: actual {total_mb:.0f} MB exceeds "
                      f"budget {budget_mb:.0f} MB; streaming batches instead")
            return None

        if sharding is not None:
            if jax.process_count() > 1:
                from ..parallel.mesh import put_global
                put = lambda v: put_global(v, sharding)
            else:
                put = lambda v: jax.device_put(v, sharding)
        else:
            put = jax.device_put
        arrays = {k: put(v) for k, v in host.items()}
        if verbose:
            print(f"| device cache: {n} items, {total_mb:.1f} MB resident "
                  f"in HBM; batches assemble on-device from [B]-int32 "
                  f"indices")
        return cls(arrays, n, ppg_stride=ppg_stride)


def _build_ppg(ppg_fn, mels, lens, stride: int, chunk: int = 8):
    """Run the frozen-ASR extractor over per-item mels (f16 rows, the same
    values the cached training step would decode) in fixed-shape chunks —
    one padded shape for the whole build, so the remote backend compiles the
    conformer ONCE. Returns (flat f16 [sum(ceil(L/stride)), H], offsets,
    lengths)."""
    n = len(mels)
    T = int(np.asarray(lens).max())
    T += (-T) % 64  # one static shape; exact-length PPG is pad-invariant
    out, plens = [], np.asarray([-(-int(l) // stride) for l in lens],
                                np.int32)
    for c0 in range(0, n, chunk):
        items = mels[c0:c0 + chunk]
        buf = np.zeros((chunk, T, items[0].shape[-1]), np.float32)
        for j, m in enumerate(items):
            buf[j, : len(m)] = m.astype(np.float32)
        ppg = np.asarray(ppg_fn(buf))
        for j in range(len(items)):
            out.append(ppg[j, : plens[c0 + j]].astype(np.float16))
    offs = np.concatenate([[0], np.cumsum(plens)[:-1]]).astype(np.int32)
    return np.concatenate(out, axis=0), offs, plens


def _gather_side(flat, offs, lens, T: int):
    """[B]-indexed row gather with 0-padding beyond each item's length."""
    ar = jnp.arange(T, dtype=jnp.int32)
    rows = offs[:, None] + jnp.minimum(ar[None, :], lens[:, None] - 1)
    valid = ar[None, :] < lens[:, None]  # [B, T]
    return flat[rows], valid


def assemble_batch(cache: Dict[str, jax.Array], idxs, emb_idx,
                   T_a: int, T_p: int,
                   ppg_stride: Optional[int] = None) -> Dict[str, jax.Array]:
    """Traced on-device equivalent of the host collate + wire decode:
    returns the training batch dict (f32 mels, i32 indices, f32 spk_emb)
    for items ``idxs`` padded to static (T_a, T_p).

    ``ppg_stride`` must be the stride the cache's PPG rows were built with
    (DeviceFeatureCache.ppg_stride, threaded through the step meta); the
    ambient-hparams fallback exists only for direct callers."""
    idxs = idxs.astype(jnp.int32)
    a_off = cache["a_offsets"][idxs]
    a_len = cache["a_lengths"][idxs]
    p_off = cache["p_offsets"][idxs]
    p_len = cache["p_lengths"][idxs]

    mels, va = _gather_side(cache["mels"], a_off, a_len, T_a)
    pitch, _ = _gather_side(cache["pitch"], a_off, a_len, T_a)
    prof_mels, vp = _gather_side(cache["prof_mels"], p_off, p_len, T_p)
    prof_pitch, _ = _gather_side(cache["prof_pitch"], p_off, p_len, T_p)
    align, _ = _gather_side(cache["a2p_f0_alignment"], p_off, p_len, T_p)
    out = {
        "mels": mels.astype(jnp.float32) * va[..., None],
        "prof_mels": prof_mels.astype(jnp.float32) * vp[..., None],
        "pitch": jnp.where(va, pitch.astype(jnp.int32), 0),
        "prof_pitch": jnp.where(vp, prof_pitch.astype(jnp.int32), 0),
        "a2p_f0_alignment": jnp.where(vp, align.astype(jnp.int32), 0),
        "spk_emb": cache["multi_spk_emb"][idxs, emb_idx],
    }
    if "ppg_a" in cache:
        # precomputed frozen-ASR content rows; padded rows 0 matches the
        # in-graph VCASR (masked output, see _build_ppg)
        stride = ppg_stride
        if stride is None:  # direct-caller fallback (tests)
            from ..hparams import hparams
            stride = 1
            for s in hparams.get("mel_strides", (2, 1, 1)):
                stride *= int(s)
        for side, T in (("a", T_a), ("p", T_p)):
            po = cache[f"ppg_{side}_offsets"][idxs]
            pl = cache[f"ppg_{side}_lengths"][idxs]
            ppg, vv = _gather_side(cache[f"ppg_{side}"], po, pl,
                                   -(-T // stride))
            out[f"ppg_{side}"] = ppg.astype(jnp.float32) * vv[..., None]
    return out
