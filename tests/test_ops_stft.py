"""STFT/mel frontend tests. Cross-check against torch.stft (independent
implementation) and internal numpy<->JAX consistency."""

import numpy as np
import pytest
import torch

from neuralsvb_tpu.ops.mel_filters import hz_to_mel_slaney, mel_filterbank, mel_to_hz_slaney
from neuralsvb_tpu.ops.stft import (hann_window, istft_np, log_mel_np, make_log_mel_fn,
                                    pad_wav_to_frames, process_wav_np, stft_mag_np)

HP = dict(audio_sample_rate=22050, fft_size=512, hop_size=128, win_size=512,
          audio_num_mel_bins=80, fmin=50, fmax=11025)


def _rand_wav(n=22050, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / 22050.0
    wav = 0.4 * np.sin(2 * np.pi * 220 * t) + 0.1 * rng.randn(n)
    return wav.astype(np.float32)


def test_stft_matches_torch():
    wav = _rand_wav(3000)
    ours = stft_mag_np(wav, 512, 128, 512)
    ref = torch.stft(torch.from_numpy(wav).double(), n_fft=512, hop_length=128,
                     win_length=512, window=torch.from_numpy(hann_window(512)),
                     center=True, pad_mode="constant", return_complex=True)
    ref_mag = ref.abs().numpy()
    assert ours.shape == ref_mag.shape
    np.testing.assert_allclose(ours, ref_mag, atol=1e-8)


def test_mel_filterbank_properties():
    basis = mel_filterbank(22050, 512, 80, 50, 11025)
    assert basis.shape == (80, 257)
    # every filter is nonnegative and has support
    assert (basis >= 0).all()
    assert (basis.sum(1) > 0).all()
    # slaney scale roundtrip
    f = np.array([50.0, 440.0, 1000.0, 5000.0, 11025.0])
    np.testing.assert_allclose(mel_to_hz_slaney(hz_to_mel_slaney(f)), f, rtol=1e-10)
    # known slaney values: linear below 1 kHz
    np.testing.assert_allclose(hz_to_mel_slaney(np.array([200.0]))[0], 3.0)
    np.testing.assert_allclose(hz_to_mel_slaney(np.array([1000.0]))[0], 15.0)


def test_log_mel_jax_matches_np():
    wav = _rand_wav(22050)
    mel_np = log_mel_np(wav, sample_rate=22050, fft_size=512, hop_size=128,
                        win_size=512, num_mels=80, fmin=50, fmax=11025)
    fn = make_log_mel_fn(HP)
    mel_j = np.asarray(fn(wav[None]))[0]
    assert mel_np.shape == mel_j.shape == (1 + 22050 // 128, 80)
    # np path is float64, jax path float32: ~3e-3 agreement in log10 space
    np.testing.assert_allclose(mel_np, mel_j, atol=8e-3)


def test_process_wav_contract():
    wav = _rand_wav(10000)
    wav_out, mel = process_wav_np(wav, HP)
    assert mel.shape[1] == 80
    assert len(wav_out) == mel.shape[0] * HP["hop_size"]


def test_pad_wav_to_frames():
    wav = np.zeros(1000, np.float32)
    out = pad_wav_to_frames(wav, 512, 128)
    assert len(out) % 128 == 0
    assert len(out) == (1 + 1000 // 128) * 128


def test_istft_roundtrip():
    wav = _rand_wav(4096)
    from neuralsvb_tpu.ops.audio import _stft_complex
    spec = _stft_complex(wav, 512, 128, 512)
    rec = istft_np(spec, 128, 512)
    n = min(len(rec), len(wav))
    # ignore edges where COLA is incomplete
    np.testing.assert_allclose(rec[256:n - 256], wav[256:n - 256], atol=1e-6)


def _mel_filterbank_scalar(sr, n_fft, n_mels, fmin, fmax):
    """Independent scalar-loop Slaney filterbank construction (per-filter
    triangle evaluation straight from the Slaney Auditory Toolbox spec),
    cross-checking the vectorized production builder in ops/mel_filters.py."""
    n_bins = 1 + n_fft // 2
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = np.linspace(hz_to_mel_slaney(np.array([fmin]))[0],
                          hz_to_mel_slaney(np.array([fmax]))[0], n_mels + 2)
    centers = mel_to_hz_slaney(mel_pts)
    out = np.zeros((n_mels, n_bins))
    for m in range(n_mels):
        lo, mid, hi = centers[m], centers[m + 1], centers[m + 2]
        for k, f in enumerate(fft_freqs):
            if lo < f < mid:
                tri = (f - lo) / (mid - lo)
            elif mid <= f < hi:
                tri = (hi - f) / (hi - mid)
            elif f == mid:
                tri = 1.0
            else:
                tri = 0.0
            out[m, k] = tri * 2.0 / (hi - lo)
    return out


def test_mel_filterbank_matches_independent_construction():
    got = mel_filterbank(22050, 512, 80, 50, 11025, dtype=np.float64)
    want = _mel_filterbank_scalar(22050, 512, 80, 50, 11025)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_mel_filterbank_partition_of_unity():
    # Exact analytic invariant of Slaney triangles: before area
    # normalization, adjacent filters cross-fade linearly, so at any FFT
    # frequency strictly between the first and last triangle centers the
    # unnormalized weights sum to exactly 1.
    basis = mel_filterbank(22050, 512, 80, 50, 11025, dtype=np.float64)
    mel_pts = np.linspace(hz_to_mel_slaney(np.array([50.0]))[0],
                          hz_to_mel_slaney(np.array([11025.0]))[0], 82)
    centers = mel_to_hz_slaney(mel_pts)
    enorm = 2.0 / (centers[2:] - centers[:-2])
    unnorm = basis / enorm[:, None]
    fft_freqs = np.linspace(0.0, 11025.0, 257)
    interior = (fft_freqs > centers[1]) & (fft_freqs < centers[-2])
    np.testing.assert_allclose(unnorm.sum(0)[interior], 1.0, atol=1e-12)
