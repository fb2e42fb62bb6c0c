"""NSF (neural source-filter) excitation modules.

Re-design of the reference source modules (reference:
modules/parallel_wavegan/models/source.py:7-137,352-399): a harmonic sine
bank driven by upsampled f0 with cumulative-phase integration, uv gating and
noise, merged to a single excitation by a Linear+tanh.

The phase integral is a single ``jnp.cumsum`` over the waveform length —
a parallel scan under XLA rather than a sequential loop. The mod-1 wrap
trick of the reference (to bound the cumsum argument) is reproduced to keep
float32 phase error bounded on minute-long clips.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class SineGen(nn.Module):
    samp_rate: int
    harmonic_num: int = 0
    sine_amp: float = 0.1
    noise_std: float = 0.003
    voiced_threshold: float = 0.0

    def _f02sine(self, f0_values, rng):
        """f0_values: [B, L, dim] -> sines [B, L, dim]."""
        rad = (f0_values / self.samp_rate) % 1.0
        # random initial phase for overtones (fundamental stays 0)
        rand_ini = jax.random.uniform(rng, (f0_values.shape[0], f0_values.shape[2]))
        rand_ini = rand_ini.at[:, 0].set(0.0)
        rad = rad.at[:, 0, :].add(rand_ini)
        # bounded cumulative phase: subtract 1 wherever the running sum wraps
        tmp_over_one = jnp.cumsum(rad, 1) % 1.0
        wraps = (tmp_over_one[:, 1:] - tmp_over_one[:, :-1]) < 0
        shift = jnp.pad(-wraps.astype(rad.dtype), ((0, 0), (1, 0), (0, 0)))
        return jnp.sin(jnp.cumsum(rad + shift, axis=1) * 2 * jnp.pi)

    @nn.compact
    def __call__(self, f0):
        """f0: [B, L, 1] (0 = unvoiced) -> (sine_waves, uv, noise)."""
        B, L, _ = f0.shape
        harmonics = jnp.arange(1, self.harmonic_num + 2, dtype=f0.dtype)
        f0_buf = f0 * harmonics[None, None, :]
        k1, k2 = jax.random.split(self.make_rng("noise"))
        sine_waves = self._f02sine(f0_buf, k1) * self.sine_amp
        uv = (f0 > self.voiced_threshold).astype(f0.dtype)
        noise_amp = uv * self.noise_std + (1 - uv) * self.sine_amp / 3
        noise = noise_amp * jax.random.normal(k2, sine_waves.shape, sine_waves.dtype)
        sine_waves = sine_waves * uv + noise
        return sine_waves, uv, noise


class SourceModuleHnNSF(nn.Module):
    """SineGen -> Linear(harmonics -> 1) -> tanh, plus a noise branch
    (reference: source.py:352-399)."""
    sampling_rate: int
    harmonic_num: int = 0
    sine_amp: float = 0.1
    add_noise_std: float = 0.003
    voiced_threshold: float = 0.0

    @nn.compact
    def __call__(self, x):
        sine_wavs, uv, _ = SineGen(self.sampling_rate, self.harmonic_num,
                                   self.sine_amp, self.add_noise_std,
                                   self.voiced_threshold, name="l_sin_gen")(x)
        sine_merge = jnp.tanh(nn.Dense(1, name="l_linear")(sine_wavs))
        noise = jax.random.normal(self.make_rng("noise"), uv.shape) * self.sine_amp / 3
        return sine_merge, noise, uv
