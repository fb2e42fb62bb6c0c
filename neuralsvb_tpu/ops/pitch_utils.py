"""Pitch utilities: coarse quantization, normalization, unvoiced interpolation.

Behavioral parity with the reference (reference: utils/pitch_utils.py:130-196):
256 mel-scaled bins over 50-1100 Hz, ``standard``/``log`` normalization, and
linear interpolation through unvoiced regions. numpy versions for the data
pipeline; JAX versions for on-device use.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

F0_BIN = 256
F0_MAX = 1100.0
F0_MIN = 50.0
F0_MEL_MIN = 1127 * np.log(1 + F0_MIN / 700)
F0_MEL_MAX = 1127 * np.log(1 + F0_MAX / 700)


def f0_to_coarse(f0):
    """Quantize f0 (Hz) into bins 1..255; 0 stays bin 1 only via the mel<=1 clamp
    (padding frames with f0=0 map to bin 1 in the reference as well)."""
    xp = jnp if isinstance(f0, jnp.ndarray) and not isinstance(f0, np.ndarray) else np
    f0 = xp.asarray(f0)
    f0_mel = 1127 * xp.log(1 + f0 / 700)
    scaled = (f0_mel - F0_MEL_MIN) * (F0_BIN - 2) / (F0_MEL_MAX - F0_MEL_MIN) + 1
    f0_mel = xp.where(f0_mel > 0, scaled, f0_mel)
    f0_mel = xp.where(f0_mel <= 1, 1.0, f0_mel)
    f0_mel = xp.where(f0_mel > F0_BIN - 1, float(F0_BIN - 1), f0_mel)
    if xp is np:
        coarse = np.rint(f0_mel).astype(np.int64)
        assert coarse.size == 0 or (coarse.max() <= 255 and coarse.min() >= 1), \
            (coarse.max(), coarse.min())
        return coarse
    return jnp.rint(f0_mel).astype(jnp.int32)


def norm_f0(f0, uv, hp: dict):
    xp = jnp if isinstance(f0, jnp.ndarray) and not isinstance(f0, np.ndarray) else np
    if hp["pitch_norm"] == "standard":
        f0 = (f0 - hp["f0_mean"]) / hp["f0_std"]
    elif hp["pitch_norm"] == "log":
        f0 = xp.log2(f0 + 1e-8)
    if uv is not None and hp.get("use_uv", True):
        f0 = xp.where(uv > 0, 0.0, f0)
    return f0


def norm_interp_f0(f0: np.ndarray, hp: dict):
    """Normalize then linearly interpolate through unvoiced frames.
    Returns (f0_norm, uv) as float arrays (numpy only; host-side op)."""
    f0 = np.asarray(f0, dtype=np.float64).copy()
    uv = f0 == 0
    f0 = norm_f0(f0, uv, hp)
    if uv.sum() == len(f0):
        f0[uv] = 0
    elif uv.sum() > 0:
        f0[uv] = np.interp(np.where(uv)[0], np.where(~uv)[0], f0[~uv])
    return f0.astype(np.float32), uv.astype(np.float32)


def denorm_f0(f0, uv, hp: dict, pitch_padding=None, min_val=None, max_val=None):
    xp = jnp if isinstance(f0, jnp.ndarray) and not isinstance(f0, np.ndarray) else np
    f0 = xp.asarray(f0)
    if hp["pitch_norm"] == "standard":
        f0 = f0 * hp["f0_std"] + hp["f0_mean"]
    elif hp["pitch_norm"] == "log":
        f0 = 2 ** f0
    lo = 0.0 if min_val is None else min_val
    hi = F0_MAX if max_val is None else max_val
    f0 = xp.clip(f0, lo, hi)
    if uv is not None and hp.get("use_uv", True):
        f0 = xp.where(xp.asarray(uv) > 0, 0.0, f0)
    if pitch_padding is not None:
        f0 = xp.where(pitch_padding, 0.0, f0)
    return f0
