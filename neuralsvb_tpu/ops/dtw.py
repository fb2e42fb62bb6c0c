"""DTW / alignment suite (layer L4).

Re-implements every aligner the reference ships
(reference: modules/voice_conversion/dtw/*):

- :func:`align_from_distances` — monotonic DTW alignment; DP + backtrace run
  in the native C++ kernel (neuralsvb_tpu/native/dtw.cpp), with a numpy
  fallback. Semantics match dtw/align.py:8-37.
- :func:`SADTW` / :func:`EHSADTW` — shape-aware DTW over f0-slope histograms
  (dtw/shape_aware_dtw.py:18-115, dtw/enhance_sadtw.py:18-114). The O(T*48*W)
  pure-python histogram loop of the reference is vectorized over time here.
- :func:`NaiveDTW` / :func:`ZMNaiveDTW` / :func:`NNaiveDTW` (dtw/naive_dtw.py),
  :func:`LoNDTW` (dtw/local_norm_dtw.py), :func:`NInterpo` (dtw/naive_interpo.py).
- :func:`dtw_dp_jax` — on-device DP via a min-plus row recurrence solved with
  cumulative sums + cumulative minima (each row is O(T) of parallel work
  instead of a sequential scalar loop), for batched accuracy evaluation.
"""

from __future__ import annotations

import numpy as np

from ..native import dtw_align_native

# --------------------------------------------------------------------------
# Core DP + backtrace
# --------------------------------------------------------------------------


def time_warp_np(costs: np.ndarray) -> np.ndarray:
    """Reference DP table (numpy fallback): dtw[0,0]=0, first row/col inf."""
    S, T = costs.shape
    dtw = np.zeros_like(costs, dtype=np.float64)
    dtw[0, 1:] = np.inf
    dtw[1:, 0] = np.inf
    for i in range(1, S):
        row = dtw[i]
        prev = dtw[i - 1]
        for j in range(1, T):
            row[j] = costs[i, j] + min(prev[j], row[j - 1], prev[j - 1])
    return dtw


def _backtrace(dtw: np.ndarray) -> np.ndarray:
    rows, cols = dtw.shape
    results = np.zeros(rows, dtype=np.int64)
    i, j = rows - 1, cols - 1
    while i > 0 and j > 0:
        results[i] = j
        # tie order matches Python min over [(i-1,j), (i,j-1), (i-1,j-1)]
        up, left, diag = dtw[i - 1, j], dtw[i, j - 1], dtw[i - 1, j - 1]
        if up <= left and up <= diag:
            i -= 1
        elif left <= diag:
            j -= 1
        else:
            i, j = i - 1, j - 1
    return results


def align_from_distances(distance_matrix: np.ndarray) -> np.ndarray:
    """For each row of ``distance_matrix`` return the matched column index
    under the monotonic DTW path (reference: dtw/align.py:19-37)."""
    distance_matrix = np.asarray(distance_matrix, dtype=np.float32)
    res = dtw_align_native(distance_matrix)
    if res is not None:
        return res[0].astype(np.int64)
    return _backtrace(time_warp_np(distance_matrix))


# --------------------------------------------------------------------------
# Shape-aware histogram costs (vectorized)
# --------------------------------------------------------------------------

_TAN30 = 0.57735
_TAN60 = 1.73205

_SADTW_WINDOWS = {
    128: [[-128, -64], [-64, -32], [-32, -16], [-16, -8], [-8, 0],
          [0, 8], [8, 16], [16, 32], [32, 64], [64, 128]],
    64: [[-64, -32], [-32, -16], [-16, -8], [-8, 0],
         [0, 8], [8, 16], [16, 32], [32, 64]],
    32: [[-32, -16], [-16, -8], [-8, 0], [0, 8], [8, 16], [16, 32]],
}
_EHSADTW_WINDOWS = {
    128: _SADTW_WINDOWS[128],
    64: [[-64, -48], [-48, -32], [-32, -16], [-16, 0],
         [0, 16], [16, 32], [32, 48], [48, 64]],
    32: _SADTW_WINDOWS[32],
}
# EHSADTW down-weights slopes from far windows (enhance_sadtw.py:49-54)
_EH_WEIGHTS = {0: 0.5, 7: 0.5, 1: 0.75, 6: 0.75, 2: 0.9, 5: 0.9}

N_REGIONS = 6


def f0_shape_histogram(f0: np.ndarray, max_window: int = 64, scale_factor: float = 1.0,
                       enhanced: bool = False, normalize: bool = True) -> np.ndarray:
    """Per-frame histogram of local f0 slopes -> [T, n_windows * 6].

    Vectorized over time: for each window and in-window offset ``d`` the
    slope classification of all frames is computed at once.
    """
    f0 = np.asarray(f0, dtype=np.float64).reshape(-1)
    T = len(f0)
    windows = (_EHSADTW_WINDOWS if enhanced else _SADTW_WINDOWS)[max_window]
    hist = np.zeros((T, len(windows) * N_REGIONS), dtype=np.float64)

    for w_idx, (wl, wr) in enumerate(windows):
        li = int(wl * scale_factor)
        ri = int(wr * scale_factor)
        if li == 0:
            li = 1
        weight = _EH_WEIGHTS.get(w_idx, 1.0) if enhanced else 1.0
        for d in range(li, ri):
            if d == 0:
                continue
            if d > 0:
                ts = np.arange(0, T - d)
            else:
                ts = np.arange(-d, T)
            if len(ts) == 0:
                continue
            diff = f0[ts + d] - f0[ts]
            tan = np.abs(diff / d) * weight
            pos = diff >= 0
            region = np.where(tan < _TAN30, np.where(pos, 2, 3),
                              np.where(tan < _TAN60, np.where(pos, 1, 4),
                                       np.where(pos, 0, 5)))
            cols = w_idx * N_REGIONS + region
            np.add.at(hist, (ts, cols), 1.0)

    if normalize:
        totals = hist.sum(1, keepdims=True)
        hist = np.divide(hist, totals, out=np.zeros_like(hist), where=totals > 0)
    return hist


def chi2_dist(hist_a: np.ndarray, hist_b: np.ndarray, chunk: int = 512) -> np.ndarray:
    """0.5 * (b - a)^2 / (a + b + 1e-8), summed over bins -> [S, T].
    Chunked over rows to bound the [S, T, M] intermediate."""
    a = np.asarray(hist_a, dtype=np.float32)
    b = np.asarray(hist_b, dtype=np.float32)
    S = a.shape[0]
    out = np.empty((S, b.shape[0]), dtype=np.float32)
    for s0 in range(0, S, chunk):
        aa = a[s0:s0 + chunk][:, None, :]
        d = 0.5 * (b[None] - aa) ** 2 / (b[None] + aa + 1e-8)
        out[s0:s0 + chunk] = d.sum(-1)
    return out


def _dtw_from_cost(cost_st: np.ndarray, inputs: np.ndarray):
    """cost_st: [S, T]. Returns (inputs gathered to the T timeline, alignment)."""
    alignment = align_from_distances(cost_st.T)
    return np.asarray(inputs)[alignment], alignment


def SADTW(src, tgt, inputs):
    """Shape-aware DTW (reference: shape_aware_dtw.py:108-115)."""
    sh = f0_shape_histogram(src, normalize=True)
    th = f0_shape_histogram(tgt, normalize=True, scale_factor=len(tgt) / len(src))
    return _dtw_from_cost(chi2_dist(sh, th), inputs)


def EHSADTW(src, tgt, inputs):
    """Enhanced shape-aware DTW, the binarizer's default aligner
    (reference: enhance_sadtw.py:107-114, binarize_para.py:168)."""
    sh = f0_shape_histogram(src, normalize=True, enhanced=True)
    th = f0_shape_histogram(tgt, normalize=True, enhanced=True,
                            scale_factor=len(tgt) / len(src))
    return _dtw_from_cost(chi2_dist(sh, th), inputs)


def _euclid_dist(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = np.atleast_2d(np.asarray(a, np.float64).T).T  # [S, H]
    b = np.atleast_2d(np.asarray(b, np.float64).T).T
    if a.ndim == 1:
        a, b = a[:, None], b[:, None]
    d2 = (a ** 2).sum(-1)[:, None] + (b ** 2).sum(-1)[None, :] - 2 * a @ b.T
    return np.sqrt(np.maximum(d2, 0))


def NaiveDTW(src, tgt, inputs):
    return _dtw_from_cost(_euclid_dist(src, tgt), inputs)


def ZMNaiveDTW(src, tgt, inputs):
    src = np.asarray(src, np.float64)
    tgt = np.asarray(tgt, np.float64)
    return _dtw_from_cost(_euclid_dist(src - src.mean(), tgt - tgt.mean()), inputs)


def NNaiveDTW(src, tgt, inputs):
    src = np.asarray(src, np.float64)
    tgt = np.asarray(tgt, np.float64)
    src = (src - src.mean()) / (src.std() + 1e-8)
    tgt = (tgt - tgt.mean()) / (tgt.std() + 1e-8)
    return _dtw_from_cost(_euclid_dist(src, tgt), inputs)


def get_local_context(f0: np.ndarray, max_window: int = 32) -> np.ndarray:
    """[T] -> [T, 2*max_window] zero-padded sliding windows
    (reference: local_norm_dtw.py:17-31)."""
    f0 = np.asarray(f0, np.float64).reshape(-1)
    T = len(f0)
    out = np.zeros((T, 2 * max_window))
    for k, d in enumerate(range(-max_window, max_window)):
        lo, hi = max(0, -d), min(T, T - d)
        out[lo:hi, k] = f0[lo + d:hi + d]
    return out


def LoNDTW(src, tgt, inputs):
    ls = get_local_context(src)
    lt = get_local_context(tgt)
    ls = ls - ls.mean(-1, keepdims=True)
    lt = lt - lt.mean(-1, keepdims=True)
    return _dtw_from_cost(_euclid_dist(ls, lt), inputs)


def NInterpo(src, tgt, inputs, amateur_mel2ph=None, amateur_mel=None):
    """Nearest-neighbor time interpolation baseline
    (reference: naive_interpo.py:17-26)."""
    S, T = len(src), len(tgt)
    idx = np.minimum((np.arange(T) * S // T), S - 1)
    output = np.asarray(inputs)[idx]
    aligned_mel2ph = np.asarray(amateur_mel2ph)[idx] if amateur_mel2ph is not None else None
    aligned_mel = np.asarray(amateur_mel)[idx] if amateur_mel is not None else None
    return output, aligned_mel2ph, aligned_mel


ALIGN_FUNCS = {
    "SADTW": SADTW, "EHSADTW": EHSADTW, "NaiveDTW": NaiveDTW,
    "ZMNaiveDTW": ZMNaiveDTW, "NNaiveDTW": NNaiveDTW, "LoNDTW": LoNDTW,
}


# --------------------------------------------------------------------------
# On-device DP (JAX): min-plus row recurrence
# --------------------------------------------------------------------------

def dtw_dp_jax(cost):
    """DTW DP table on device. cost: [S, T] -> dtw table [S, T].

    Row recurrence x[j] = c[j] + min(m[j], x[j-1]) (m = min of the two
    upper predecessors) unrolls to x[j] = P[j] + cummin(m - P_shift), with
    P the running prefix sum of the row costs — cumulative ops XLA runs as
    parallel scans instead of a length-T sequential loop.
    """
    import jax
    import jax.numpy as jnp

    cost = jnp.asarray(cost, jnp.float32)
    S, T = cost.shape
    big = jnp.float32(1e30)

    first_row = jnp.concatenate([jnp.zeros((1,)), jnp.full((T - 1,), big)])

    def row_step(prev, crow):
        # prev: dtw row i-1. dtw[i, 0] is inf (big); solve j >= 1 in closed form:
        #   x[j] = c[j] + min(m[j], x[j-1]),  m[j] = min(prev[j], prev[j-1])
        # => x[j] = min_{1<=k<=j} ( sum_{l=k..j} c[l] + m[k] )
        #        = P1[j] + cummin(m1 - P1_shifted)
        up = prev[1:]
        diag = prev[:-1]
        m1 = jnp.minimum(up, diag)          # [T-1], j = 1..T-1
        c1 = crow[1:]
        P1 = jnp.cumsum(c1)
        P1s = jnp.concatenate([jnp.zeros((1,)), P1[:-1]])
        run = jax.lax.associative_scan(jnp.minimum, m1 - P1s)
        x = jnp.concatenate([jnp.full((1,), big), P1 + run])
        x = jnp.minimum(x, big)
        return x, x

    _, rows = jax.lax.scan(row_step, first_row, cost[1:])
    return jnp.concatenate([first_row[None], rows], axis=0)
