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
    flag_for_pulse: bool = False  # phase-reset mode for PulseGen

    def _f02sine(self, f0_values, rng):
        """f0_values: [B, L, dim] -> sines [B, L, dim]."""
        rad = (f0_values / self.samp_rate) % 1.0
        # random initial phase for overtones (fundamental stays 0)
        rand_ini = jax.random.uniform(rng, (f0_values.shape[0], f0_values.shape[2]))
        rand_ini = rand_ini.at[:, 0].set(0.0)
        rad = rad.at[:, 0, :].add(rand_ini)
        if not self.flag_for_pulse:
            # bounded cumulative phase: subtract 1 wherever the running sum
            # wraps
            tmp_over_one = jnp.cumsum(rad, 1) % 1.0
            wraps = (tmp_over_one[:, 1:] - tmp_over_one[:, :-1]) < 0
            shift = jnp.pad(-wraps.astype(rad.dtype), ((0, 0), (1, 0), (0, 0)))
            return jnp.sin(jnp.cumsum(rad + shift, axis=1) * 2 * jnp.pi)
        # pulse mode (reference: source.py:74-102): reset the phase integral
        # at the start of every voiced segment so the first voiced step is
        # cos(0). The reference's per-batch python loop becomes a
        # carry-forward of the cumsum value at segment boundaries (cumsum is
        # nondecreasing since rad >= 0, so a running max carries it).
        uv = self._f02uv(f0_values)
        uv_next = jnp.concatenate(
            [uv[:, 1:], jnp.ones_like(uv[:, :1])], axis=1)
        u_loc = (uv < 1) & (uv_next > 0)  # last step of unvoiced segments
        c = jnp.cumsum(rad, axis=1)
        carried = jax.lax.associative_scan(
            jnp.maximum, jnp.where(u_loc, c, 0.0), axis=1)
        i_phase = c - carried
        return jnp.cos(i_phase * 2 * jnp.pi)

    def _f02uv(self, f0):
        return (f0 > self.voiced_threshold).astype(f0.dtype)

    @nn.compact
    def __call__(self, f0):
        """f0: [B, L, 1] (0 = unvoiced) -> (sine_waves, uv, noise)."""
        B, L, _ = f0.shape
        harmonics = jnp.arange(1, self.harmonic_num + 2, dtype=f0.dtype)
        f0_buf = f0 * harmonics[None, None, :]
        k1, k2 = jax.random.split(self.make_rng("noise"))
        sine_waves = self._f02sine(f0_buf, k1) * self.sine_amp
        uv = self._f02uv(f0)
        noise_amp = uv * self.noise_std + (1 - uv) * self.sine_amp / 3
        noise = noise_amp * jax.random.normal(k2, sine_waves.shape, sine_waves.dtype)
        sine_waves = sine_waves * uv + noise
        return sine_waves, uv, noise


class PulseGen(nn.Module):
    """Pulse-train source: local maxima of a phase-reset sine in voiced
    regions (reference: source.py:140-203). Unused by the shipped HiFiGAN
    path; part of the NSF source API surface."""
    samp_rate: int
    pulse_amp: float = 0.1
    noise_std: float = 0.003
    voiced_threshold: float = 0.0

    @nn.compact
    def __call__(self, f0):
        sine_wav, uv, noise = SineGen(
            self.samp_rate, harmonic_num=0, sine_amp=self.pulse_amp,
            noise_std=0.0, voiced_threshold=self.voiced_threshold,
            flag_for_pulse=True, name="l_sinegen")(f0)
        pure_sine = sine_wav - noise
        sine_prev = jnp.concatenate(
            [pure_sine[:, -1:], pure_sine[:, :-1]], axis=1)
        uv_prev = jnp.concatenate([jnp.zeros_like(uv[:, :1]), uv[:, :-1]],
                                  axis=1)
        sine_next = jnp.concatenate(
            [pure_sine[:, 1:], pure_sine[:, :1]], axis=1)
        uv_next = jnp.concatenate([uv[:, 1:], jnp.zeros_like(uv[:, :1])],
                                  axis=1)
        loc = (((pure_sine > sine_prev) & (pure_sine > sine_next)
                & (uv_prev > 0) & (uv_next > 0) & (uv > 0))
               | ((uv_prev < 1) & (uv > 0))).astype(f0.dtype)
        pulse_train = pure_sine * loc
        pulse_noise = jax.random.normal(
            self.make_rng("noise"), pure_sine.shape) * self.noise_std
        pulse_train = pulse_train + pulse_noise * loc + pulse_noise * (1 - uv)
        return pulse_train, sine_wav, uv, pulse_noise


def signals_conv1d(signal, system_ir):
    """Convolve [B, L1, D] signal with a [L2, D] impulse response per dim,
    left-padded (reference: source.py:206-246 SignalsConv1d)."""
    pad = system_ir.shape[0] - 1
    out = []
    for d in range(signal.shape[-1]):
        s = jnp.pad(signal[:, :, d], ((0, 0), (pad, 0)))
        # jnp.convolve flips the kernel itself (true convolution) — the
        # reference flips manually because torch conv1d is a correlation
        ir = system_ir[:, d]
        out.append(jax.vmap(lambda x: jnp.convolve(x, ir, mode="valid"))(s))
    return jnp.stack(out, axis=-1)


class CyclicNoiseGen(nn.Module):
    """Cyclic noise source: exponentially decayed noise burst convolved with
    a pulse train (reference: source.py:249-307 CyclicNoiseGen_v1). Runs
    eagerly — the decay-filter length depends on mean F0 (a data-dependent
    shape), matching the reference; not intended for jit."""
    samp_rate: int
    noise_std: float = 0.003
    voiced_threshold: float = 0.0

    @nn.compact
    def __call__(self, f0s, beta):
        pulse_train, sine_wav, uv, noise = PulseGen(
            self.samp_rate, pulse_amp=1.0, noise_std=self.noise_std,
            voiced_threshold=self.voiced_threshold, name="l_pulse")(f0s)
        pure_pulse = pulse_train - noise
        if bool((uv < 1).all()):  # all unvoiced (eager-only data dependence)
            cyc_noise = jnp.zeros_like(sine_wav)
        else:
            f0mean = f0s[uv > 0].mean()
            length = int(4.6 * self.samp_rate / float(f0mean))
            t = jnp.arange(length, dtype=jnp.float32)[:, None]
            beta_s = jnp.reshape(jnp.asarray(beta), ())
            decay = jnp.exp(-t * f0mean / beta_s / self.samp_rate)
            burst = jax.random.normal(self.make_rng("noise"),
                                      t.shape) * self.noise_std * decay
            cyc_noise = signals_conv1d(pure_pulse, burst)
        cyc_noise = cyc_noise + noise * (1.0 - uv)
        return cyc_noise, pulse_train, sine_wav, uv, noise


class SourceModuleCycNoise(nn.Module):
    """Cyclic-noise source module (reference: source.py:310-349)."""
    sampling_rate: int
    noise_std: float = 0.003
    voiced_threshold: float = 0.0

    @nn.compact
    def __call__(self, f0_upsamped, beta):
        cyc, _, _, uv, _ = CyclicNoiseGen(
            self.sampling_rate, self.noise_std, self.voiced_threshold,
            name="l_cyc_gen")(f0_upsamped, beta)
        noise = jax.random.normal(self.make_rng("noise"),
                                  uv.shape) * self.noise_std / 3
        return cyc, noise, uv


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
