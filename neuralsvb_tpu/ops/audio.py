"""Host-side audio IO and DSP helpers (reference: utils/audio.py).

No librosa in this environment: wav IO via scipy, mp3/other formats decoded
through ffmpeg when present (reference decodes mp3 with librosa.load,
data_gen/tts/base_binarizer.py:38). Resampling is polyphase (scipy.signal).
"""

from __future__ import annotations

import os
import shutil
import subprocess
from fractions import Fraction

import numpy as np
from scipy import signal as sps
from scipy.io import wavfile

from .stft import istft_np, stft_mag_np


def save_wav(wav: np.ndarray, path: str, sr: int, norm: bool = False) -> None:
    wav = np.asarray(wav, dtype=np.float64)
    if norm and np.abs(wav).max() > 0:
        wav = wav / np.abs(wav).max()
    wavfile.write(path, sr, (wav * 32767).astype(np.int16))


def resample(wav: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    if orig_sr == target_sr:
        return wav
    frac = Fraction(target_sr, orig_sr).limit_denominator(1000)
    return sps.resample_poly(wav, frac.numerator, frac.denominator).astype(np.float32)


def load_wav(path: str, sr: int | None = None) -> tuple[np.ndarray, int]:
    """Load any audio file to float32 mono at ``sr`` (ffmpeg fallback for
    non-wav formats)."""
    ext = os.path.splitext(path)[1].lower()
    if ext != ".wav":
        if shutil.which("ffmpeg") is None:
            raise RuntimeError(f"need ffmpeg to decode {ext} files: {path}")
        out_sr = sr or 22050
        cmd = ["ffmpeg", "-v", "error", "-i", path, "-f", "f32le", "-ac", "1",
               "-ar", str(out_sr), "pipe:1"]
        raw = subprocess.check_output(cmd)
        return np.frombuffer(raw, dtype=np.float32).copy(), out_sr
    file_sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        wav = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        wav = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        wav = (data.astype(np.float32) - 128.0) / 128.0
    else:
        wav = data.astype(np.float32)
    if wav.ndim > 1:
        wav = wav.mean(-1)
    if sr is not None and file_sr != sr:
        wav = resample(wav, file_sr, sr)
        file_sr = sr
    return wav, file_sr


def amp_to_db(x: np.ndarray) -> np.ndarray:
    return 20 * np.log10(np.maximum(1e-5, x))


def db_to_amp(x: np.ndarray) -> np.ndarray:
    return 10.0 ** (x * 0.05)


def normalize(S: np.ndarray, hp: dict) -> np.ndarray:
    return (S - hp["min_level_db"]) / -hp["min_level_db"]


def denormalize(D: np.ndarray, hp: dict) -> np.ndarray:
    return (D * -hp["min_level_db"]) + hp["min_level_db"]


def griffin_lim(S: np.ndarray, hp: dict, angles: np.ndarray | None = None) -> np.ndarray:
    """Griffin-Lim phase reconstruction from a magnitude spectrogram
    [n_bins, T] (reference: utils/audio.py:35-42)."""
    fft_size, hop, win = hp["fft_size"], hp["hop_size"], hp["win_size"]
    if angles is None:
        angles = np.exp(2j * np.pi * np.random.rand(*S.shape))
    S = np.abs(S).astype(np.complex128)
    y = istft_np(S * angles, hop, win)
    for _ in range(hp.get("griffin_lim_iters", 60)):
        spec = stft_mag_np(y, fft_size, hop, win)
        # re-estimate phase from the reconstructed signal
        full = _stft_complex(y, fft_size, hop, win)
        T = min(S.shape[1], full.shape[1])
        angles = np.exp(1j * np.angle(full[:, :T]))
        y = istft_np(S[:, :T] * angles, hop, win)
        del spec
    return y


def _stft_complex(wav: np.ndarray, fft_size: int, hop_size: int, win_size: int) -> np.ndarray:
    from .stft import hann_window
    pad = fft_size // 2
    y = np.pad(np.asarray(wav, dtype=np.float64), (pad, pad), mode="constant")
    n_frames = 1 + (len(y) - fft_size) // hop_size
    window = hann_window(win_size)
    if win_size < fft_size:
        lpad = (fft_size - win_size) // 2
        window = np.pad(window, (lpad, fft_size - win_size - lpad))
    idx = np.arange(fft_size)[None, :] + hop_size * np.arange(n_frames)[:, None]
    return np.fft.rfft(y[idx] * window[None, :], n=fft_size, axis=-1).T


def denoise_spectral_subtract(wav: np.ndarray, hp: dict, v: float = 0.1) -> np.ndarray:
    """Spectral-subtraction denoise (reference: vocoders/vocoder_utils.py:7-15)."""
    spec = _stft_complex(wav, hp["fft_size"], hp["hop_size"], hp["win_size"])
    mag = np.clip(np.abs(spec) - v, 0, None)
    return istft_np(mag * np.exp(1j * np.angle(spec)), hp["hop_size"], hp["win_size"])


def trim_long_silences(wav: np.ndarray, sr: int, top_db: float = 35.0,
                       frame_ms: float = 30.0, max_sil_ms: float = 400.0):
    """Energy-based VAD trim of long internal silences — replacement for the
    reference's webrtcvad path (reference: data_gen_utils.py:27-90; webrtcvad
    is unavailable here). Returns (trimmed wav, keep mask, sr)."""
    wav = np.asarray(wav, np.float32)
    frame = max(1, int(sr * frame_ms / 1000))
    n = len(wav) // frame
    if n == 0:
        return wav, np.ones(len(wav), bool), sr
    e = (wav[: n * frame].reshape(n, frame) ** 2).mean(-1)
    ref = max(e.max(), 1e-10)
    db = 10 * np.log10(np.maximum(e / ref, 1e-10))
    voiced = db > -top_db
    # keep short silences, drop runs longer than max_sil_ms
    max_run = max(1, int(max_sil_ms / frame_ms))
    keep_f = voiced.copy()
    i = 0
    while i < n:
        if not voiced[i]:
            j = i
            while j < n and not voiced[j]:
                j += 1
            if j - i <= max_run:
                keep_f[i:j] = True
            i = j
        else:
            i += 1
    mask = np.repeat(keep_f, frame)
    mask = np.pad(mask, (0, len(wav) - len(mask)), constant_values=True)
    return wav[mask], mask, sr
