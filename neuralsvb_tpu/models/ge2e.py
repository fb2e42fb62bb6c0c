"""GE2E speaker encoder (Resemblyzer VoiceEncoder equivalent).

The reference packs 256-d speaker embeddings from Resemblyzer's pretrained
GE2E LSTM during binarization (reference: data_gen/singing/binarize_para.py:46,125).
This is the JAX port: 40-mel power spectrogram at 16 kHz (25 ms window,
10 ms hop) -> 3-layer LSTM(256) -> Linear -> ReLU -> L2 normalize; utterance
embedding = normalized mean over 50%-overlapping 160-frame partials.

The LSTM runs as a ``flax.linen.RNN`` scan; all partials are embedded in one
batched forward (one XLA program) instead of a python loop.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mel_filters import mel_filterbank

GE2E_SR = 16000
GE2E_N_FFT = 400
GE2E_HOP = 160
GE2E_N_MELS = 40
PARTIAL_FRAMES = 160
HIDDEN = 256


def wav_to_mel40(wav: np.ndarray, sr: int = GE2E_SR) -> np.ndarray:
    """Power mel spectrogram [T, 40] (librosa melspectrogram semantics:
    power=2, slaney filterbank, centered reflect pad)."""
    if sr != GE2E_SR:
        from ..ops.audio import resample
        wav = resample(wav, sr, GE2E_SR)
    # librosa melspectrogram uses pad_mode='constant' default in old versions;
    # Resemblyzer used defaults => reflect in modern librosa. Edge effects are
    # negligible for utterance-level embeddings; use reflect.
    n = len(wav)
    pad = GE2E_N_FFT // 2
    y = np.pad(np.asarray(wav, np.float64), (pad, pad), mode="reflect")
    from ..ops.stft import hann_window
    window = hann_window(GE2E_N_FFT)
    n_frames = 1 + (len(y) - GE2E_N_FFT) // GE2E_HOP
    idx = np.arange(GE2E_N_FFT)[None, :] + GE2E_HOP * np.arange(n_frames)[:, None]
    spec = np.abs(np.fft.rfft(y[idx] * window[None, :], axis=-1)) ** 2
    basis = mel_filterbank(GE2E_SR, GE2E_N_FFT, GE2E_N_MELS, 0.0, GE2E_SR / 2,
                           dtype=np.float64)
    return (spec @ basis.T).astype(np.float32)  # [T, 40]


class VoiceEncoder(nn.Module):
    hidden: int = HIDDEN
    n_layers: int = 3

    @nn.compact
    def __call__(self, mels):
        """mels: [B, T, 40] -> embeddings [B, 256] (L2-normalized)."""
        h = mels
        final_h = None
        for i in range(self.n_layers):
            rnn = nn.RNN(nn.OptimizedLSTMCell(self.hidden), name=f"lstm_{i}",
                         return_carry=True)
            (carry_c, carry_h), h = rnn(h)
            final_h = carry_h
        e = nn.Dense(self.hidden, name="linear")(final_h)
        e = nn.relu(e)
        return e / jnp.linalg.norm(e, axis=-1, keepdims=True).clip(1e-5)


def compute_partial_slices(n_frames: int, partial_frames: int = PARTIAL_FRAMES,
                           overlap: float = 0.5, min_coverage: float = 0.75):
    """Start indices of overlapping partials covering the utterance."""
    step = max(1, int(round(partial_frames * (1 - overlap))))
    starts = list(range(0, max(n_frames - partial_frames, 0) + 1, step))
    if not starts:
        starts = [0]
    last_end = starts[-1] + partial_frames
    if n_frames - (starts[-1] + step) >= min_coverage * partial_frames and \
            last_end < n_frames:
        starts.append(n_frames - partial_frames)
    return starts


class SpeakerEncoder:
    """Host-side wrapper with param loading + jitted batched partial embedding."""

    def __init__(self, params=None, seed: int = 0):
        self.model = VoiceEncoder()
        if params is None:
            dummy = jnp.zeros((1, PARTIAL_FRAMES, GE2E_N_MELS))
            params = self.model.init(jax.random.PRNGKey(seed), dummy)["params"]
        self.params = params
        self._jitted = jax.jit(lambda p, m: self.model.apply({"params": p}, m))

    def embed_utterance(self, wav: np.ndarray, sr: int = GE2E_SR) -> np.ndarray:
        mel = wav_to_mel40(wav, sr)
        T = mel.shape[0]
        if T < PARTIAL_FRAMES:
            mel = np.pad(mel, ((0, PARTIAL_FRAMES - T), (0, 0)))
            T = PARTIAL_FRAMES
        starts = compute_partial_slices(T)
        partials = np.stack([mel[s:s + PARTIAL_FRAMES] for s in starts])
        embeds = np.asarray(self._jitted(self.params, jnp.asarray(partials)))
        mean = embeds.mean(0)
        return mean / max(np.linalg.norm(mean), 1e-5)
