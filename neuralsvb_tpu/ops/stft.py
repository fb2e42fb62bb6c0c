"""STFT + log-mel frontend.

Replaces the reference's librosa pipeline (reference:
data_gen/tts/data_gen_utils.py:93-147 ``process_utterance`` and
vocoders/pwg.py:105-122 ``wav2spec``): centered STFT with *constant* (zero)
padding, hann window, magnitude spectrogram, Slaney mel basis matmul and a
``log10(max(eps, .))`` compression.

Two implementations share the same constants:

- :func:`log_mel_np` — numpy, used by the offline binarizer workers (CPU).
- :func:`log_mel_jax` / :func:`make_log_mel_fn` — jitted JAX, a single fused
  XLA program (frame gather -> window multiply -> rFFT -> |.| -> mel matmul
  on the MXU -> log10) for the on-device fast path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .mel_filters import mel_filterbank


def hann_window(win_size: int, dtype=np.float64) -> np.ndarray:
    """Periodic (fftbins=True) hann window, matching scipy/librosa."""
    n = np.arange(win_size, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_size)
    return w.astype(dtype)


def n_frames_for(n_samples: int, hop_size: int) -> int:
    """Number of centered-STFT frames for a signal of ``n_samples``."""
    return 1 + n_samples // hop_size


def pad_wav_to_frames(wav: np.ndarray, fft_size: int, hop_size: int) -> np.ndarray:
    """Right-pad the wav to a whole number of hops then truncate to
    ``n_frames * hop`` samples (reference: utils/audio.py:67-76 +
    data_gen_utils.py:137-139)."""
    n_frames = n_frames_for(len(wav), hop_size)
    pad = (len(wav) // hop_size + 1) * hop_size - len(wav)
    wav = np.pad(wav, (0, pad), mode="constant")
    return wav[: n_frames * hop_size]


# ---------------------------------------------------------------------------
# numpy path (binarize workers)
# ---------------------------------------------------------------------------

def stft_mag_np(wav: np.ndarray, fft_size: int, hop_size: int, win_size: int) -> np.ndarray:
    """Centered magnitude STFT with zero padding -> [n_bins, T]."""
    pad = fft_size // 2
    y = np.pad(np.asarray(wav, dtype=np.float64), (pad, pad), mode="constant")
    n_frames = 1 + (len(y) - fft_size) // hop_size
    window = hann_window(win_size)
    if win_size < fft_size:
        lpad = (fft_size - win_size) // 2
        window = np.pad(window, (lpad, fft_size - win_size - lpad))
    idx = np.arange(fft_size)[None, :] + hop_size * np.arange(n_frames)[:, None]
    frames = y[idx] * window[None, :]
    spec = np.fft.rfft(frames, n=fft_size, axis=-1)
    return np.abs(spec).T  # [n_bins, T]


def log_mel_np(wav: np.ndarray, *, sample_rate: int, fft_size: int, hop_size: int,
               win_size: int, num_mels: int, fmin: float, fmax: float,
               eps: float = 1e-10) -> np.ndarray:
    """log10-mel spectrogram, shape [T, num_mels] (reference layout after .T)."""
    spc = stft_mag_np(wav, fft_size, hop_size, win_size)  # [n_bins, T]
    basis = mel_filterbank(sample_rate, fft_size, num_mels, fmin, fmax, dtype=np.float64)
    mel = basis @ spc
    return np.log10(np.maximum(eps, mel)).T.astype(np.float32)


def process_wav_np(wav: np.ndarray, hp: dict):
    """Reference ``process_utterance``/``wav2spec`` contract:
    returns (padded wav [T*hop], mel [T, 80])."""
    mel = log_mel_np(
        wav, sample_rate=hp["audio_sample_rate"], fft_size=hp["fft_size"],
        hop_size=hp["hop_size"], win_size=hp["win_size"],
        num_mels=hp["audio_num_mel_bins"], fmin=hp["fmin"], fmax=hp["fmax"],
        eps=float(hp.get("wav2spec_eps", 1e-10)))
    wav = pad_wav_to_frames(np.asarray(wav, np.float32), hp["fft_size"], hp["hop_size"])
    return wav[: mel.shape[0] * hp["hop_size"]], mel


# ---------------------------------------------------------------------------
# JAX path (device, fused by XLA)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("fft_size", "hop_size", "win_size",
                                             "sample_rate", "num_mels", "fmin", "fmax", "eps"))
def log_mel_jax(wav: jax.Array, *, sample_rate: int, fft_size: int, hop_size: int,
                win_size: int, num_mels: int, fmin: float, fmax: float,
                eps: float = 1e-10) -> jax.Array:
    """Batched fused log-mel: wav [B, N] -> mel [B, T, num_mels].

    Static shapes only: T = 1 + N // hop. Framing is expressed as a strided
    gather that XLA lowers to an efficient slice loop; the mel projection is
    one [B*T, n_bins] x [n_bins, n_mels] matmul on the MXU.
    """
    if wav.ndim == 1:
        wav = wav[None]
    B, N = wav.shape
    pad = fft_size // 2
    y = jnp.pad(wav.astype(jnp.float32), ((0, 0), (pad, pad)))
    n_frames = 1 + N // hop_size

    window = jnp.asarray(hann_window(win_size, np.float32))
    if win_size < fft_size:
        lpad = (fft_size - win_size) // 2
        window = jnp.pad(window, (lpad, fft_size - win_size - lpad))

    starts = hop_size * jnp.arange(n_frames)
    idx = starts[:, None] + jnp.arange(fft_size)[None, :]
    frames = y[:, idx] * window[None, None, :]          # [B, T, fft]
    spec = jnp.fft.rfft(frames, n=fft_size, axis=-1)
    mag = jnp.abs(spec)                                  # [B, T, n_bins]

    basis = jnp.asarray(mel_filterbank(sample_rate, fft_size, num_mels, fmin, fmax))
    mel = jnp.einsum("btf,mf->btm", mag, basis,
                     preferred_element_type=jnp.float32)
    return jnp.log10(jnp.maximum(eps, mel))


def make_log_mel_fn(hp: dict):
    """Bind hparams into a jitted wav [B, N] -> mel [B, T, 80] function."""
    kwargs = dict(sample_rate=hp["audio_sample_rate"], fft_size=hp["fft_size"],
                  hop_size=hp["hop_size"], win_size=hp["win_size"],
                  num_mels=hp["audio_num_mel_bins"], fmin=float(hp["fmin"]),
                  fmax=float(hp["fmax"]), eps=float(hp.get("wav2spec_eps", 1e-10)))
    return functools.partial(log_mel_jax, **kwargs)


def istft_np(spec: np.ndarray, hop_size: int, win_size: int) -> np.ndarray:
    """Inverse STFT (complex spec [n_bins, T]) with hann synthesis window and
    COLA normalization; used by griffin-lim and spectral denoising."""
    n_fft = (spec.shape[0] - 1) * 2
    frames = np.fft.irfft(spec.T, n=n_fft, axis=-1)  # [T, n_fft]
    window = hann_window(win_size)
    if win_size < n_fft:
        lpad = (n_fft - win_size) // 2
        window = np.pad(window, (lpad, n_fft - win_size - lpad))
    T = frames.shape[0]
    out_len = n_fft + hop_size * (T - 1)
    out = np.zeros(out_len)
    wsum = np.zeros(out_len)
    for t in range(T):
        s = t * hop_size
        out[s:s + n_fft] += frames[t] * window
        wsum[s:s + n_fft] += window ** 2
    out = out / np.maximum(wsum, 1e-10)
    return out[n_fft // 2: -(n_fft // 2)]


def mel_spectrogram_hifigan(y: np.ndarray, hp: dict, center: bool = False):
    """HiFiGAN-style torch-mel frontend (reference:
    modules/hifigan/mel_utils.py:45-80): clamp to [-1,1], reflect-pad by
    (n_fft - hop)/2, uncentered STFT with a zero-padded hann(win_size)
    window, Slaney mel, natural-log compression with 1e-5 clip.

    y: [B, L] or [L] float waveform -> [B, num_mels, T'] (reference layout).
    The alternate frontend the reference keeps around for official HiFiGAN
    checkpoints (usage commented out at vocoders/hifigan.py:71-76)."""
    from .mel_filters import mel_filterbank

    n_fft = hp["fft_size"]
    hop = hp["hop_size"]
    win = hp["win_size"]
    y = np.atleast_2d(np.asarray(y, np.float32))
    y = np.clip(y, -1.0, 1.0)
    pad = int((n_fft - hop) / 2)
    y = np.pad(y, ((0, 0), (pad, pad)), mode="reflect")

    window = np.zeros(n_fft)
    lpad = (n_fft - win) // 2
    window[lpad:lpad + win] = hann_window(win)

    if center:
        y = np.pad(y, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    n_frames = 1 + (y.shape[1] - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = y[:, idx] * window  # [B, T', n_fft]
    spec = np.abs(np.fft.rfft(frames, axis=-1))  # [B, T', n_fft//2+1]
    spec = np.sqrt(spec ** 2 + 1e-9)
    basis = mel_filterbank(hp["audio_sample_rate"], n_fft,
                           hp["audio_num_mel_bins"], hp["fmin"], hp["fmax"])
    mel = np.einsum("mf,btf->bmt", basis, spec)
    return np.log(np.clip(mel, 1e-5, None)).astype(np.float32)
