"""Autocorrelation f0 tracker (Praat-style ac method + Viterbi smoothing).

Replaces the reference's parselmouth/Praat dependency (reference:
data_gen/tts/data_gen_utils.py:150-184 ``get_pitch``): the environment has
no Praat, so this JAX implementation IS the extraction path, designed after
Boersma (1993):

1. frames of ``periods_per_window/f0_min`` seconds at the analysis hop,
   hann-windowed, mean-removed;
2. normalized autocorrelation via rFFT, divided by the window's own
   autocorrelation (Boersma's correction) and r(0);
3. top-K local maxima in the valid lag band as voiced candidates with
   parabolic interpolation; an unvoiced candidate whose strength follows
   Praat's voicing/silence threshold formula;
4. Viterbi over candidates with octave-jump and voiced/unvoiced costs
   (a ``lax.scan``), backtrace on host.

``get_pitch`` reproduces the reference's framing contract: left pad of
2*pad_size frames (8 for hop 128), length reconciled to the mel length,
plus ``f0_to_coarse`` quantization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .pitch_utils import f0_to_coarse
from .stft import hann_window

K_CANDIDATES = 15


@functools.partial(jax.jit, static_argnames=("sr", "hop", "f0_min", "f0_max",
                                             "frame_len", "voicing_threshold",
                                             "silence_threshold", "octave_cost"))
def _pitch_candidates(wav, *, sr, hop, f0_min, f0_max, frame_len,
                      voicing_threshold=0.45, silence_threshold=0.03,
                      octave_cost=0.01):
    """wav [N] -> (freqs [T, K], strengths [T, K]); slot K-1 is unvoiced."""
    N = wav.shape[0]
    T = 1 + N // hop
    fft_n = int(2 ** np.ceil(np.log2(2 * frame_len)))
    half = frame_len // 2
    padded = jnp.pad(wav, (half, frame_len))
    idx = jnp.arange(frame_len)[None, :] + hop * jnp.arange(T)[:, None]
    frames = padded[idx]                                    # [T, L]
    window = jnp.asarray(hann_window(frame_len, np.float32))
    frames = (frames - frames.mean(-1, keepdims=True)) * window

    global_peak = jnp.max(jnp.abs(wav)) + 1e-12
    local_peak = jnp.max(jnp.abs(frames), -1)               # [T]

    # normalized autocorrelation of signal / window (Boersma's trick)
    spec = jnp.fft.rfft(frames, fft_n)
    ac = jnp.fft.irfft(spec * jnp.conj(spec), fft_n)[:, : frame_len]
    r = ac / (ac[:, :1] + 1e-12)
    wspec = jnp.fft.rfft(window, fft_n)
    wac = jnp.fft.irfft(wspec * jnp.conj(wspec), fft_n)[: frame_len]
    rw = wac / (wac[0] + 1e-12)
    rnorm = r / jnp.maximum(rw[None, :], 1e-3)              # [T, L]

    lag_min = max(2, int(sr / f0_max))
    lag_max = min(frame_len - 2, int(sr / f0_min))
    lags = jnp.arange(frame_len)
    band = (lags >= lag_min) & (lags <= lag_max)

    # local maxima within the band
    is_peak = (rnorm[:, 1:-1] > rnorm[:, :-2]) & (rnorm[:, 1:-1] >= rnorm[:, 2:])
    is_peak = jnp.pad(is_peak, ((0, 0), (1, 1)))
    score = jnp.where(band[None, :] & is_peak, rnorm, -jnp.inf)

    top_vals, top_lags = jax.lax.top_k(score, K_CANDIDATES - 1)  # [T, K-1]

    # parabolic refinement of lag and strength
    tl = jnp.clip(top_lags, 1, frame_len - 2)
    y0 = jnp.take_along_axis(rnorm, tl - 1, 1)
    y1 = jnp.take_along_axis(rnorm, tl, 1)
    y2 = jnp.take_along_axis(rnorm, tl + 1, 1)
    denom = y0 - 2 * y1 + y2
    delta = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (y0 - y2) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    ref_lag = tl + delta
    ref_val = y1 - 0.25 * (y0 - y2) * delta
    freqs = sr / jnp.maximum(ref_lag, 1.0)
    valid = jnp.isfinite(top_vals) & (freqs >= f0_min) & (freqs <= f0_max)

    # Praat's octave cost: favors higher-frequency candidates
    strength = ref_val - octave_cost * jnp.log2(f0_min * ref_lag / sr)
    strength = jnp.where(valid, strength, -1e9)

    # unvoiced candidate strength (Praat formula)
    unvoiced = voicing_threshold + jnp.maximum(
        0.0, 2.0 - (local_peak / global_peak) /
        (silence_threshold / (1 + voicing_threshold)))
    freqs = jnp.concatenate([freqs, jnp.zeros((T, 1))], 1)
    strengths = jnp.concatenate([strength, unvoiced[:, None]], 1)
    return freqs, strengths


def track_pitch(wav: np.ndarray, sr: int, hop: int, f0_min: float = 80.0,
                f0_max: float = 750.0, voicing_threshold: float = 0.6,
                periods_per_window: float = 3.0) -> np.ndarray:
    """wav [N] -> f0 [1 + N // hop] in Hz (0 where unvoiced)."""
    wav = np.asarray(wav, np.float32)
    frame_len = int(round(periods_per_window / f0_min * sr))
    freqs, strengths = _pitch_candidates(
        jnp.asarray(wav), sr=sr, hop=hop, f0_min=f0_min, f0_max=f0_max,
        frame_len=frame_len, voicing_threshold=voicing_threshold)
    freqs = np.asarray(freqs)
    strengths = np.asarray(strengths)
    T, K = freqs.shape

    # Viterbi on host (small T*K^2): C++ kernel when available, else the
    # equivalent vectorized-numpy DP below
    octave_jump_cost, vuv_cost = 0.35, 0.14
    from ..native import pitch_viterbi_native
    path_native = pitch_viterbi_native(freqs, strengths,
                                       octave_jump_cost, vuv_cost)
    if path_native is not None:
        return freqs[np.arange(T), path_native]
    score = strengths[0].copy()
    backptr = np.zeros((T, K), np.int32)
    prev_f = freqs[0]
    for t in range(1, T):
        f = freqs[t]
        both = (prev_f[:, None] > 0) & (f[None, :] > 0)
        jump = np.abs(np.log2(np.maximum(prev_f[:, None], 1e-6) /
                              np.maximum(f[None, :], 1e-6)))
        trans = np.where(both, octave_jump_cost * jump,
                         np.where((prev_f[:, None] > 0) != (f[None, :] > 0),
                                  vuv_cost, 0.0))
        total = score[:, None] - trans
        backptr[t] = total.argmax(0)
        score = total.max(0) + strengths[t]
        prev_f = f
    path = np.zeros(T, np.int32)
    path[-1] = int(score.argmax())
    for t in range(T - 1, 0, -1):
        path[t - 1] = backptr[t, path[t]]
    return freqs[np.arange(T), path]


def get_pitch(wav: np.ndarray, mel: np.ndarray, hp: dict):
    """Reference framing contract (data_gen_utils.py:150-184):
    returns (f0 [len(mel)], pitch_coarse [len(mel)])."""
    hop = hp["hop_size"]
    sr = hp["audio_sample_rate"]
    if hop == 128:
        pad_size = 4
    elif hop == 256:
        pad_size = 2
    else:
        raise AssertionError(f"unsupported hop {hop}")
    # analyze with the same frame budget Praat produces: interior frames only
    f0_full = track_pitch(wav, sr, hop)
    keep = max(len(mel) - 2 * pad_size, 0)
    f0 = f0_full[:keep] if len(f0_full) >= keep else f0_full
    lpad = pad_size * 2
    rpad = max(len(mel) - len(f0) - lpad, 0)
    f0 = np.pad(f0, (lpad, rpad))
    delta_l = len(mel) - len(f0)
    assert abs(delta_l) <= 8, (len(mel), len(f0))
    if delta_l > 0:
        f0 = np.concatenate([f0, [f0[-1]] * delta_l])
    f0 = f0[: len(mel)]
    return f0, f0_to_coarse(f0)
