"""DTW suite tests: native C++ DP vs numpy spec, vectorized histograms vs a
scalar reference implementation, JAX min-plus DP vs numpy table."""

import numpy as np
import pytest

from neuralsvb_tpu.ops import dtw as D


def _rand_cost(s, t, seed=0):
    return np.random.RandomState(seed).rand(s, t).astype(np.float32)


def test_native_matches_numpy_dp():
    cost = _rand_cost(40, 55)
    table = D.time_warp_np(cost)
    ref_path = D._backtrace(table)
    res = D.align_from_distances(cost)
    np.testing.assert_array_equal(res, ref_path)
    # path is monotone non-decreasing from index 1 on
    assert (np.diff(res[1:]) >= 0).all()


def test_native_lib_builds():
    from neuralsvb_tpu.native import dtw_align_native
    out = dtw_align_native(_rand_cost(10, 12, 1))
    assert out is not None, "native DTW kernel failed to build"
    path, total = out
    assert path.shape == (10,) and np.isfinite(total)


def _slow_hist(f0, windows, weights, normalize=True, scale=1.0):
    """Scalar spec of the slope histogram (shape_aware_dtw.py:18-73)."""
    T = len(f0)
    hist = np.zeros((T, len(windows) * 6))
    for t in range(T):
        total = 0
        for w, (wl, wr) in enumerate(windows):
            li, ri = int(wl * scale), int(wr * scale)
            if li == 0:
                li = 1
            for i in range(max(0, li + t), min(T, ri + t)):
                if i == t:
                    continue
                tan = (f0[i] - f0[t]) / (i - t) * weights.get(w, 1.0)
                a = abs(tan)
                if a < 0.57735:
                    r = 2 if f0[i] - f0[t] >= 0 else 3
                elif a < 1.73205:
                    r = 1 if f0[i] - f0[t] >= 0 else 4
                else:
                    r = 0 if f0[i] - f0[t] >= 0 else 5
                hist[t, w * 6 + r] += 1
                total += 1
        if normalize and total:
            hist[t] /= total
    return hist


@pytest.mark.parametrize("enhanced,scale", [(False, 1.0), (True, 1.0), (True, 1.37)])
def test_histogram_matches_scalar_spec(enhanced, scale):
    rng = np.random.RandomState(3)
    f0 = rng.rand(90) * 200 + 100
    windows = (D._EHSADTW_WINDOWS if enhanced else D._SADTW_WINDOWS)[64]
    weights = D._EH_WEIGHTS if enhanced else {}
    ref = _slow_hist(f0, windows, weights, scale=scale)
    ours = D.f0_shape_histogram(f0, enhanced=enhanced, scale_factor=scale)
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_ehsadtw_identity():
    t = np.arange(300)
    f0 = 220 + 50 * np.sin(2 * np.pi * t / 60)
    out, align = D.EHSADTW(f0, f0, f0)
    # aligning a signal to itself stays near the diagonal
    assert np.abs(align - np.arange(300)).mean() < 3
    assert out.shape == f0.shape


def test_ehsadtw_time_stretch():
    t = np.arange(200)
    src = 220 + 50 * np.sin(2 * np.pi * t / 50)
    tgt = 220 + 50 * np.sin(2 * np.pi * np.arange(300) / 75)  # same shape, 1.5x len
    out, align = D.EHSADTW(src, tgt, src)
    assert len(align) == 300
    assert (np.diff(align[1:]) >= 0).all()
    # alignment approximately follows the 2/3 slope
    mid = align[50:250]
    slope = np.polyfit(np.arange(len(mid)), mid, 1)[0]
    assert 0.45 < slope < 0.9, slope


def test_naive_variants_run():
    rng = np.random.RandomState(0)
    src = rng.rand(50) * 100 + 100
    tgt = rng.rand(70) * 100 + 100
    for name, fn in D.ALIGN_FUNCS.items():
        out, align = fn(src, tgt, src)
        assert len(align) == 70, name
        assert out.shape == (70,), name
    out, m2p, mel = D.NInterpo(src, tgt, src, np.arange(50), np.tile(src[:, None], (1, 4)))
    assert out.shape == (70,) and m2p.shape == (70,) and mel.shape == (70, 4)


def test_dtw_dp_jax_matches_numpy():
    cost = _rand_cost(30, 45, 7)
    table_np = D.time_warp_np(cost)
    table_j = np.asarray(D.dtw_dp_jax(cost))
    finite = np.isfinite(table_np)
    np.testing.assert_allclose(table_j[finite], table_np[finite], rtol=1e-5, atol=1e-4)
    assert (table_j[~finite] >= 1e29).all()


def test_pitch_viterbi_native_matches_numpy():
    """C++ pitch Viterbi path == the vectorized-numpy DP in ops/pitch.py."""
    from neuralsvb_tpu.native import pitch_viterbi_native
    rng = np.random.RandomState(3)
    T, K = 200, 12
    freqs = rng.uniform(80, 600, (T, K)).astype(np.float32)
    freqs[rng.rand(T, K) < 0.2] = 0.0  # unvoiced candidates
    strengths = rng.rand(T, K).astype(np.float32)
    native = pitch_viterbi_native(freqs, strengths, 0.35, 0.14)
    if native is None:
        import pytest
        pytest.skip("native lib unavailable")
    # numpy reference DP (mirrors ops/pitch.py fallback)
    score = strengths[0].astype(np.float64).copy()
    backptr = np.zeros((T, K), np.int32)
    prev_f = freqs[0]
    for t in range(1, T):
        f = freqs[t]
        both = (prev_f[:, None] > 0) & (f[None, :] > 0)
        jump = np.abs(np.log2(np.maximum(prev_f[:, None], 1e-6) /
                              np.maximum(f[None, :], 1e-6)))
        trans = np.where(both, 0.35 * jump,
                         np.where((prev_f[:, None] > 0) != (f[None, :] > 0),
                                  0.14, 0.0))
        total = score[:, None] - trans
        backptr[t] = total.argmax(0)
        score = total.max(0) + strengths[t]
        prev_f = f
    path = np.zeros(T, np.int32)
    path[-1] = int(score.argmax())
    for t in range(T - 1, 0, -1):
        path[t - 1] = backptr[t, path[t]]
    np.testing.assert_array_equal(np.asarray(native), path)
