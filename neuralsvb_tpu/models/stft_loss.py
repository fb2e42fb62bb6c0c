"""Multi-resolution STFT losses for vocoder training
(reference: modules/parallel_wavegan/losses/stft_loss.py, 153 LoC):
spectral-convergence + log-STFT-magnitude at several analysis resolutions.
All resolutions evaluate inside one jitted program.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stft import hann_window

DEFAULT_RESOLUTIONS = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))


def stft_magnitude(x: jax.Array, fft_size: int, hop: int, win: int) -> jax.Array:
    """x: [B, N] -> magnitude [B, T, n_bins] (centered, reflect pad)."""
    pad = fft_size // 2
    y = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (y.shape[1] - fft_size) // hop
    window = jnp.asarray(hann_window(win, np.float32))
    if win < fft_size:
        lpad = (fft_size - win) // 2
        window = jnp.pad(window, (lpad, fft_size - win - lpad))
    idx = hop * jnp.arange(n_frames)[:, None] + jnp.arange(fft_size)[None, :]
    frames = y[:, idx] * window[None, None, :]
    spec = jnp.fft.rfft(frames, fft_size, axis=-1)
    return jnp.sqrt(jnp.clip(jnp.abs(spec) ** 2, 1e-7, None))


def spectral_convergence(mag_hat, mag):
    return jnp.linalg.norm(mag - mag_hat) / jnp.maximum(jnp.linalg.norm(mag), 1e-7)


def log_stft_magnitude(mag_hat, mag):
    return jnp.abs(jnp.log(mag) - jnp.log(mag_hat)).mean()


def stft_loss(y_hat: jax.Array, y: jax.Array, fft_size=1024, hop=120, win=600):
    mag_hat = stft_magnitude(y_hat, fft_size, hop, win)
    mag = stft_magnitude(y, fft_size, hop, win)
    return spectral_convergence(mag_hat, mag), log_stft_magnitude(mag_hat, mag)


def multi_resolution_stft_loss(y_hat: jax.Array, y: jax.Array,
                               resolutions: Sequence[Tuple[int, int, int]]
                               = DEFAULT_RESOLUTIONS):
    """Returns (sc_loss, mag_loss), each averaged over resolutions."""
    sc_total, mag_total = 0.0, 0.0
    for fft_size, hop, win in resolutions:
        sc, mag = stft_loss(y_hat, y, fft_size, hop, win)
        sc_total += sc
        mag_total += mag
    n = len(resolutions)
    return sc_total / n, mag_total / n
