"""Continuous wavelet transform of log-f0 (Mexican-hat mother wavelet).

Replaces the reference's pycwt dependency (reference: utils/cwt.py:12-146)
with a self-contained FFT implementation: DOG(m=2) mother, dt=0.005, dj=1,
s0=2*dt, J=9 -> 10 scales. Off by default in SVB configs (``with_f0cwt``)
but part of the FastSpeech2 lineage surface.
"""

from __future__ import annotations

import numpy as np
from scipy.special import gamma as _gamma

CWT_DT = 0.005
CWT_DJ = 1.0
CWT_J = 9


def convert_continuous_f0(f0: np.ndarray):
    """Fill unvoiced gaps by edge-extension + linear interpolation.
    Returns (uv flags, continuous f0)."""
    f0 = np.copy(np.asarray(f0, dtype=np.float64))
    uv = np.float32(f0 != 0)
    if (f0 == 0).all():
        return uv, f0
    nz = np.where(f0 != 0)[0]
    f0[: nz[0]] = f0[nz[0]]
    f0[nz[-1]:] = f0[nz[-1]]
    nz = np.where(f0 != 0)[0]
    cont = np.interp(np.arange(len(f0)), nz, f0[nz])
    return uv, cont


def get_cont_lf0(f0: np.ndarray):
    uv, cont = convert_continuous_f0(f0)
    return uv, np.log(cont)


def _mexican_hat_psi_ft(w: np.ndarray) -> np.ndarray:
    """Fourier transform of the DOG(m=2) mother wavelet (pycwt convention)."""
    m = 2
    return -(1j * w) ** m / np.sqrt(_gamma(m + 0.5)) * np.exp(-(w ** 2) / 2)


def cwt_mexican_hat(signal: np.ndarray, dt: float = CWT_DT, dj: float = CWT_DJ,
                    s0: float = 2 * CWT_DT, J: int = CWT_J):
    """Continuous wavelet transform; returns (W [J+1, n], scales [J+1])."""
    signal = np.asarray(signal, dtype=np.float64)
    n0 = len(signal)
    N = int(2 ** np.ceil(np.log2(n0)))
    sig_ft = np.fft.fft(signal, n=N)
    w_k = 2 * np.pi * np.fft.fftfreq(N, dt)
    scales = s0 * 2.0 ** (dj * np.arange(J + 1))
    sj = scales[:, None]
    norm = np.sqrt(sj * np.abs(w_k[1]) * N)
    psi_ft_bar = norm * np.conjugate(_mexican_hat_psi_ft(sj * w_k[None, :]))
    W = np.fft.ifft(sig_ft[None, :] * psi_ft_bar, axis=1)
    return W[:, :n0], scales


def get_lf0_cwt(lf0: np.ndarray):
    """Returns (real CWT [n, J+1], scales [J+1]) — reference layout."""
    W, scales = cwt_mexican_hat(np.squeeze(lf0))
    return np.real(W).T, scales


def norm_scale(wavelet_lf0: np.ndarray):
    mean = wavelet_lf0.mean(0)[None, :]
    std = wavelet_lf0.std(0)[None, :]
    return (wavelet_lf0 - mean) / std, mean, std


def inverse_cwt(wavelet_lf0, scales):
    """Approximate inverse; works on numpy or jax arrays.
    wavelet_lf0: [B, T, n_scales]."""
    import jax.numpy as jnp
    xp = jnp if not isinstance(wavelet_lf0, np.ndarray) else np
    b = (xp.arange(len(scales), dtype=xp.float32)[None, None, :] + 1 + 2.5) ** (-2.5)
    rec = (wavelet_lf0 * b).sum(-1)
    mean = rec.mean(-1, keepdims=True)
    std = rec.std(-1, keepdims=True)
    return (rec - mean) / std


def cwt2f0(cwt_spec, mean, std, cwt_scales):
    """Invert normalized CWT back to f0 in Hz. cwt_spec: [B, T, n_scales]."""
    import jax.numpy as jnp
    xp = jnp if not isinstance(cwt_spec, np.ndarray) else np
    f0 = inverse_cwt(cwt_spec, cwt_scales)
    f0 = f0 * std[:, None] + mean[:, None]
    return xp.exp(f0)


def cwt2f0_norm(cwt_spec, mean, std, mel2ph, hp):
    """Decoded ground-truth f0 from a (normalized) CWT spectrum, renormalized
    for the pitch embed (reference: modules/fastspeech/fs2.py:239-244):
    inverse CWT -> denorm by utterance stats -> exp -> pad to mel length with
    the last frame -> norm_f0."""
    import jax.numpy as jnp
    from .pitch_utils import norm_f0
    xp = jnp if not isinstance(cwt_spec, np.ndarray) else np
    scales = (2 * CWT_DT) * 2.0 ** (CWT_DJ * np.arange(CWT_J + 1))
    f0 = cwt2f0(cwt_spec, mean, std, scales)  # [B, T']
    T = mel2ph.shape[1]
    if f0.shape[1] < T:
        pad = xp.repeat(f0[:, -1:], T - f0.shape[1], axis=1)
        f0 = xp.concatenate([f0, pad], 1)
    return norm_f0(f0[:, :T], None, hp)
