"""Parallel WaveGAN inference wrapper (reference: vocoders/pwg.py:53-137).

``spec2wav`` feeds z ~ N(0,1) of length T*hop plus the (context-padded) mel
through the jitted PWG WaveNet. ``wav2spec`` is THE mel frontend used by
binarization (reference: vocoders/pwg.py:105-122).
"""

from __future__ import annotations

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from ..hparams import hparams as global_hparams
from ..models.pwg import ParallelWaveGANGenerator
from ..ops import audio as audio_ops
from ..ops.pitch_utils import f0_to_coarse
from ..ops.stft import process_wav_np, stft_mag_np
from .base import BaseVocoder, register_vocoder
from .hifigan import pick_bucket


def load_pwg(base_dir: str, hp: dict):
    config = dict(hp)
    for cfg_name in ("config.yaml", "config.yml"):
        p = os.path.join(base_dir, cfg_name)
        if os.path.exists(p):
            with open(p) as f:
                config.update(yaml.safe_load(f) or {})
            break
    gen_params = (config.get("generator_params") or {})
    model = ParallelWaveGANGenerator(
        layers=gen_params.get("layers", 30),
        stacks=gen_params.get("stacks", 3),
        residual_channels=gen_params.get("residual_channels", 64),
        gate_channels=gen_params.get("gate_channels", 128),
        skip_channels=gen_params.get("skip_channels", 64),
        aux_channels=gen_params.get("aux_channels", 80),
        aux_context_window=gen_params.get("aux_context_window", 2),
        upsample_scales=tuple((gen_params.get("upsample_params") or {})
                              .get("upsample_scales", (4, 4, 4, 4))),
        use_pitch_embed=gen_params.get("use_pitch_embed", False),
    )
    params, scaler = None, None
    native = os.path.join(base_dir, "params.msgpack")
    if os.path.exists(native):
        from flax import serialization
        variables = _init(model)
        with open(native, "rb") as f:
            params = serialization.from_bytes(variables["params"], f.read())
    else:
        torch_ckpts = sorted(glob.glob(os.path.join(base_dir, "*.ckpt"))) + \
            sorted(glob.glob(os.path.join(base_dir, "*.pkl")))
        if torch_ckpts:
            from ..convert.torch2jax import convert_pwg
            params = convert_pwg(torch_ckpts[-1], model)
            scaler = _load_official_stats(base_dir, torch_ckpts[-1],
                                          config.get("format", "hdf5"))
    return model, params, config, scaler


def _load_official_stats(base_dir, ckpt_path, fmt):
    """Official ParallelWaveGAN checkpoints (no 'state_dict' key) come with a
    feature scaler in stats.h5 (mean/scale) or stats.npy; custom checkpoints
    don't use one (reference: vocoders/pwg.py:28-38, read_hdf5 at
    modules/parallel_wavegan/utils/utils.py:39-63)."""
    import torch
    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        return None  # custom format: features are already log-mels, no scaler
    h5 = os.path.join(base_dir, "stats.h5")
    npy = os.path.join(base_dir, "stats.npy")
    if fmt == "hdf5" and os.path.exists(h5):
        import h5py
        with h5py.File(h5, "r") as f:
            return (np.asarray(f["mean"], np.float32),
                    np.asarray(f["scale"], np.float32))
    if os.path.exists(npy):
        stats = np.load(npy)
        return (np.asarray(stats[0], np.float32),
                np.asarray(stats[1], np.float32))
    return None


def _init(model):
    ctx = model.aux_context_window
    hop = int(np.prod(model.upsample_scales))
    z = jnp.zeros((1, 8 * hop, 1))
    c = jnp.zeros((1, 8 + 2 * ctx, model.aux_channels))
    p = jnp.zeros((1, 8), jnp.int32) if model.use_pitch_embed else None
    return model.init(jax.random.PRNGKey(0), z, c, p)


@register_vocoder
class PWG(BaseVocoder):
    def __init__(self, hp: dict | None = None):
        hp = hp if hp is not None else dict(global_hparams)
        self.hp = hp
        base_dir = hp.get("vocoder_ckpt", "")
        self.model, self.params, self.config, self.scaler = load_pwg(base_dir, hp)
        if self.params is None:
            print(f"| WARNING: no PWG checkpoint under '{base_dir}'; random init.")
            self.params = _init(self.model)["params"]
        self._jitted = jax.jit(
            lambda params, z, c, p: self.model.apply({"params": params}, z, c, p))
        self._rng = jax.random.PRNGKey(4321)

    def spec2wav(self, mel, f0=None, **kwargs):
        mel = np.asarray(mel, np.float32)
        if self.scaler is not None:  # official-ckpt feature normalization
            mean, scale = self.scaler
            mel = (mel - mean) / scale
        T = mel.shape[0]
        hop = int(np.prod(self.model.upsample_scales))
        ctx = self.model.aux_context_window
        Tb = pick_bucket(T)
        c = np.pad(mel, ((ctx, Tb - T + ctx), (0, 0)), mode="edge")
        self._rng, sub = jax.random.split(self._rng)
        z = jax.random.normal(sub, (1, Tb * hop, 1))
        p = None
        if self.model.use_pitch_embed and f0 is not None:
            p = np.pad(f0_to_coarse(np.asarray(f0)), (0, Tb - T))[None]
        wav = self._jitted(self.params, z, c[None], p)
        return np.asarray(wav)[0][: T * hop]

    @staticmethod
    def wav2spec(wav_fn, return_linear=False):
        hp = dict(global_hparams)
        if isinstance(wav_fn, str):
            wav, _ = audio_ops.load_wav(wav_fn, sr=hp["audio_sample_rate"])
        else:
            wav = np.asarray(wav_fn, np.float32)
        wav_out, mel = process_wav_np(wav, hp)
        if return_linear:
            from ..ops.audio import amp_to_db, normalize
            spc = stft_mag_np(wav_out, hp["fft_size"], hp["hop_size"], hp["win_size"])
            spc = normalize(amp_to_db(spc), hp)
            return wav_out, mel, spc.T.astype(np.float32)
        return wav_out, mel

    @staticmethod
    def wav2mfcc(wav_fn):
        """13 MFCCs + deltas (reference: vocoders/pwg.py:124-137)."""
        hp = dict(global_hparams)
        wav, _ = audio_ops.load_wav(wav_fn, sr=hp["audio_sample_rate"])
        from ..ops.mel_filters import mel_filterbank
        from scipy.fftpack import dct
        spc = stft_mag_np(wav, hp["fft_size"], hp["hop_size"], hp["win_size"])
        basis = mel_filterbank(hp["audio_sample_rate"], hp["fft_size"], 128, 0,
                               hp["audio_sample_rate"] / 2, dtype=np.float64)
        mel_db = 10 * np.log10(np.maximum(1e-10, basis @ spc))
        mfcc = dct(mel_db, axis=0, type=2, norm="ortho")[:13]
        d1 = np.gradient(mfcc, axis=1)
        d2 = np.gradient(d1, axis=1)
        return np.concatenate([mfcc, d1, d2]).T
