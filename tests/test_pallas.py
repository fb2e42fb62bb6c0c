"""Pallas chi-square kernel vs the numpy reference implementation."""

import numpy as np

from neuralsvb_tpu.ops.dtw import chi2_dist
from neuralsvb_tpu.ops.pallas_kernels import chi2_dist_jnp, chi2_dist_pallas


def _hists(s, t, m=48, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.rand(s, m).astype(np.float32)
    b = rng.rand(t, m).astype(np.float32)
    a /= a.sum(1, keepdims=True)
    b /= b.sum(1, keepdims=True)
    return a, b


def test_chi2_pallas_interpret_matches_numpy():
    a, b = _hists(70, 150)
    ref = chi2_dist(a, b)
    out = np.asarray(chi2_dist_pallas(a, b, interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_chi2_jnp_blocked_matches_numpy():
    a, b = _hists(300, 130, seed=2)
    ref = chi2_dist(a, b)
    out = np.asarray(chi2_dist_jnp(a, b))
    np.testing.assert_allclose(out, ref, atol=1e-5)
