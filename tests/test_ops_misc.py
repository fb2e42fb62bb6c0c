"""SSIM / pitch-utils / CWT tests."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from neuralsvb_tpu.ops import cwt as cwt_ops
from neuralsvb_tpu.ops.pitch_utils import (F0_BIN, denorm_f0, f0_to_coarse, norm_f0,
                                           norm_interp_f0)
from neuralsvb_tpu.ops.ssim import ssim


def _torch_ssim(img1, img2, window_size=11):
    """Independent torch implementation of windowed SSIM (standard formula)."""
    sigma = 1.5
    g = torch.exp(-((torch.arange(window_size).float() - window_size // 2) ** 2)
                  / (2 * sigma ** 2))
    g = (g / g.sum()).unsqueeze(1)
    w2d = (g @ g.t()).unsqueeze(0).unsqueeze(0)
    pad = window_size // 2
    mu1 = F.conv2d(img1, w2d, padding=pad)
    mu2 = F.conv2d(img2, w2d, padding=pad)
    s11 = F.conv2d(img1 * img1, w2d, padding=pad) - mu1 ** 2
    s22 = F.conv2d(img2 * img2, w2d, padding=pad) - mu2 ** 2
    s12 = F.conv2d(img1 * img2, w2d, padding=pad) - mu1 * mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    return (((2 * mu1 * mu2 + C1) * (2 * s12 + C2))
            / ((mu1 ** 2 + mu2 ** 2 + C1) * (s11 + s22 + C2))).mean(1)


def test_ssim_matches_torch():
    rng = np.random.RandomState(0)
    a = rng.rand(2, 1, 40, 80).astype(np.float32) + 6.0
    b = a + 0.1 * rng.randn(2, 1, 40, 80).astype(np.float32)
    ours = np.asarray(ssim(a, b, size_average=False))
    ref = _torch_ssim(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    # f32 E[x^2]-E[x]^2 cancellation costs a few e-4 between implementations
    np.testing.assert_allclose(ours, ref, atol=2e-3)
    np.testing.assert_allclose(np.asarray(ssim(a, a)), 1.0, atol=1e-5)


def test_f0_to_coarse():
    f0 = np.array([0.0, 50.0, 100.0, 440.0, 1100.0, 2000.0])
    c = f0_to_coarse(f0)
    assert c.min() >= 1 and c.max() <= F0_BIN - 1
    assert c[0] == 1 and c[1] == 1  # fmin maps to bin 1
    assert c[-1] == F0_BIN - 1  # above fmax clamps
    assert (np.diff(c[1:]) >= 0).all()  # monotone
    # jax agrees
    import jax.numpy as jnp
    cj = np.asarray(f0_to_coarse(jnp.asarray(f0)))
    np.testing.assert_array_equal(c, cj)


def test_norm_interp_denorm_roundtrip():
    hp = {"pitch_norm": "standard", "f0_mean": 220.0, "f0_std": 60.0, "use_uv": True}
    f0 = np.array([0, 0, 200, 230, 0, 260, 0], dtype=np.float64)
    f0n, uv = norm_interp_f0(f0, hp)
    assert uv.tolist() == [1, 1, 0, 0, 1, 0, 1]
    # voiced frames roundtrip through denorm
    den = denorm_f0(f0n, uv, hp)
    np.testing.assert_allclose(den[[2, 3, 5]], f0[[2, 3, 5]], atol=1e-4)
    assert (den[uv > 0] == 0).all()
    # interpolated frame 4 lies between neighbors
    mid = norm_f0(np.array([230.0, 260.0]), None, hp)
    assert mid.min() <= f0n[4] <= mid.max()


def test_cwt_shapes_and_inverse():
    t = np.arange(200)
    f0 = 220 + 40 * np.sin(2 * np.pi * t / 50) + 10 * np.sin(2 * np.pi * t / 13)
    f0[:10] = 0
    f0[50:60] = 0
    uv, lf0 = cwt_ops.get_cont_lf0(f0)
    assert (lf0 > 0).all()
    W, scales = cwt_ops.get_lf0_cwt((lf0 - lf0.mean()) / lf0.std())
    assert W.shape == (200, 10) and len(scales) == 10
    norm, mean, std = cwt_ops.norm_scale(W)
    rec = cwt_ops.inverse_cwt(W[None], scales)[0]
    # inverse approximately tracks the (normalized) original contour
    tgt = (lf0 - lf0.mean()) / lf0.std()
    corr = np.corrcoef(rec, tgt)[0, 1]
    assert corr > 0.8, corr


def test_world_mcep_helpers():
    """WORLD/mcep helpers (reference: utils/pitch_utils.py:17-127)."""
    from neuralsvb_tpu.ops.pitch_utils import (b2mc, formant_enhancement,
                                               mc2b, to_f0, to_lf0)
    f0 = np.array([0.0, 120.0, 0.0, 440.0], np.float64)
    lf0 = to_lf0(f0.copy())
    assert lf0[0] == -1.0e10 and np.isclose(lf0[1], np.log(120.0))
    back = to_f0(lf0)
    np.testing.assert_allclose(back, f0, rtol=1e-9)

    rng = np.random.RandomState(0)
    mc = rng.randn(5, 60)
    # mc2b/b2mc are exact inverses
    np.testing.assert_allclose(b2mc(mc2b(mc)), mc, atol=1e-12)
    # beta=0 formant enhancement is the identity
    np.testing.assert_allclose(formant_enhancement(mc.copy(), 0.0, 22050),
                               mc, atol=1e-12)
    out = formant_enhancement(mc.copy(), 0.3, 22050)
    assert out.shape == mc.shape and np.isfinite(out).all()
    assert not np.allclose(out, mc)


def test_binary_dilation_matches_scipy_convention():
    """The scipy-free dilation in trim_long_silences must spread voiced
    windows exactly like scipy.ndimage.binary_dilation with a size-k
    element: k//2 LEFT, (k-1)//2 right (even k is asymmetric; scipy
    centers the element at k//2)."""
    pytest.importorskip("scipy")
    from scipy.ndimage import binary_dilation
    rng = np.random.RandomState(3)
    for k in (4, 11, 12, 13):
        a = rng.rand(40) < 0.2
        want = binary_dilation(a, np.ones(k, bool))
        half_l, half_r = k // 2, (k - 1) // 2  # audio.py convention
        got = np.zeros_like(a)
        for i in np.flatnonzero(a):
            got[max(0, i - half_l): i + half_r + 1] = True
        np.testing.assert_array_equal(got, want, err_msg=f"k={k}")


def test_trim_long_silences_pipeline():
    """Pipeline semantics of the webrtcvad-substitute VAD (reference:
    data_gen_utils.py:27-90): long internal silences are removed, speech
    and short inter-phrase gaps survive, the mask covers the raw length,
    and trimmed == wav[mask]."""
    from neuralsvb_tpu.ops.audio import trim_long_silences
    sr = 22050
    rng = np.random.RandomState(0)

    def speech(dur):  # harmonic-rich voiced burst with shimmer
        t = np.arange(int(sr * dur)) / sr
        f0 = 180 * (1 + 0.05 * np.sin(2 * np.pi * 4 * t))
        ph = 2 * np.pi * np.cumsum(f0) / sr
        s = sum(np.sin(k * ph) / k for k in range(1, 6))
        return (0.3 * s * (0.7 + 0.3 * np.sin(2 * np.pi * 3 * t))
                ).astype(np.float32)

    def sil(dur):  # near-silence with faint noise floor
        return (1e-4 * rng.randn(int(sr * dur))).astype(np.float32)

    wav = np.concatenate([
        sil(1.5), speech(1.0), sil(0.15), speech(1.0), sil(2.0), speech(1.0),
        sil(1.5)])
    trimmed, mask, out_sr = trim_long_silences(wav, sr)
    assert out_sr == sr and mask.shape == wav.shape
    np.testing.assert_array_equal(trimmed, wav[mask])
    # the 2 s internal and 1.5 s edge silences must mostly go...
    assert len(trimmed) < len(wav) - int(1.5 * sr)
    # ...while every speech segment survives (~>=90% of speech samples kept)
    speech_len = 3 * int(sr * 1.0)
    assert mask.sum() >= 0.9 * speech_len
    # the short 0.15 s gap sits inside a dilated voiced region: find the
    # gap's sample range and require it kept
    g0 = int(sr * (1.5 + 1.0))
    g1 = g0 + int(sr * 0.15)
    assert mask[g0:g1].mean() > 0.9


def test_trim_long_silences_keeps_pause_free_audio():
    """A continuously-voiced clip has no internal silence to estimate a
    noise floor from; the detector must fail OPEN (keep everything), not
    zero the SNR of speech against itself and drop the whole utterance."""
    from neuralsvb_tpu.ops.audio import trim_long_silences
    sr = 22050
    t = np.arange(int(sr * 3.0)) / sr
    f0 = 220 * (1 + 0.04 * np.sin(2 * np.pi * 5 * t))  # vibrato singing
    ph = 2 * np.pi * np.cumsum(f0) / sr
    wav = (0.3 * sum(np.sin(k * ph) / k for k in range(1, 6))).astype(np.float32)
    trimmed, mask, _ = trim_long_silences(wav, sr)
    assert mask.mean() > 0.95 and len(trimmed) >= 0.95 * len(wav)
    # a constant tone is the degenerate no-dynamic-range case
    tone = (0.2 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    _, mask_tone, _ = trim_long_silences(tone, sr)
    assert mask_tone.all()


def test_trim_long_silences_drops_silence_only_clip():
    """All-silence/noise clips also have < 15 dB dynamic range, but must be
    TRIMMED, not kept — the fail-open is gated on an absolute energy floor
    (webrtcvad reports no speech on silence-only input)."""
    from neuralsvb_tpu.ops.audio import trim_long_silences
    sr = 22050
    rng = np.random.RandomState(0)
    noise = (1e-4 * rng.randn(int(sr * 3.0))).astype(np.float32)
    _, mask, _ = trim_long_silences(noise, sr)
    assert mask.mean() < 0.05
