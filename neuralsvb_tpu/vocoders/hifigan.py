"""HiFiGAN-NSF inference wrapper (reference: vocoders/hifigan.py:17-76).

``spec2wav`` runs the whole mel->wav generator as ONE jitted XLA program.
Frame counts are padded to a small set of static buckets so repeated calls
hit the compile cache instead of recompiling per utterance length
(SURVEY.md section 5.7: bucketed static shapes replace dynamic shapes).

Checkpoint loading order:
1. ``<vocoder_ckpt>/params.msgpack`` — our native flax serialization;
2. newest ``<vocoder_ckpt>/model_ckpt_steps_*.ckpt`` torch file via the
   torch->jax converter (convert/torch2jax.py);
3. otherwise random init (smoke mode) with a loud warning.
"""

from __future__ import annotations

import glob
import os
import re

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from ..hparams import hparams as global_hparams
from ..models.hifigan import HifiGanGenerator
from ..ops import audio as audio_ops
from ..ops.stft import process_wav_np
from .base import BaseVocoder, register_vocoder

BUCKETS = (128, 256, 512, 1024, 2048, 4096, 8192)


def pick_bucket(t: int) -> int:
    for b in BUCKETS:
        if t <= b:
            return b
    return ((t + 1023) // 1024) * 1024


def load_hifigan(base_dir: str, hp: dict):
    """Returns (model, params, config_dict)."""
    config = dict(hp)
    cfg_path = os.path.join(base_dir, "config.yaml")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            config.update(yaml.safe_load(f) or {})
    model = HifiGanGenerator(
        upsample_rates=tuple(config.get("upsample_rates", (8, 8, 2, 2))),
        upsample_kernel_sizes=tuple(config.get("upsample_kernel_sizes", (16, 16, 4, 4))),
        upsample_initial_channel=config.get("upsample_initial_channel", 512),
        resblock=str(config.get("resblock", "1")),
        resblock_kernel_sizes=tuple(config.get("resblock_kernel_sizes", (3, 7, 11))),
        resblock_dilation_sizes=tuple(tuple(d) for d in
                                      config.get("resblock_dilation_sizes",
                                                 ((1, 3, 5),) * 3)),
        use_pitch_embed=config.get("use_pitch_embed", True),
        audio_sample_rate=config.get("audio_sample_rate", 22050),
        num_mels=config.get("audio_num_mel_bins", 80),
        fuse_resblocks=str(config.get("fuse_resblocks", "auto")),
    )
    params = None
    native = os.path.join(base_dir, "params.msgpack")
    if os.path.exists(native):
        from flax import serialization
        mel = jnp.zeros((1, 8, model.num_mels))
        f0 = jnp.zeros((1, 8))
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "noise": jax.random.PRNGKey(1)}, mel, f0)
        with open(native, "rb") as f:
            params = serialization.from_bytes(variables["params"], f.read())
        print(f"| Loaded HifiGAN params from {native}")
    else:
        torch_ckpts = sorted(
            glob.glob(os.path.join(base_dir, "model_ckpt_steps_*.ckpt")),
            key=lambda x: int(re.findall(r"steps_(\d+)\.ckpt", x)[0]))
        if torch_ckpts:
            from ..convert.torch2jax import convert_hifigan
            params = convert_hifigan(torch_ckpts[-1], model)
            print(f"| Converted HifiGAN params from {torch_ckpts[-1]}")
    return model, params, config


@register_vocoder
class HifiGAN(BaseVocoder):
    def __init__(self, hp: dict | None = None):
        hp = hp if hp is not None else dict(global_hparams)
        self.hp = hp
        base_dir = hp.get("vocoder_ckpt", "")
        self.model, self.params, self.config = load_hifigan(base_dir, hp)
        if self.params is None:
            print(f"| WARNING: no HifiGAN checkpoint under '{base_dir}'; "
                  "using random init (smoke mode).")
            mel = jnp.zeros((1, 8, self.model.num_mels))
            f0 = jnp.zeros((1, 8))
            self.params = self.model.init(
                {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
                mel, f0)["params"]
        self._jitted = jax.jit(self._forward)
        self._rng = jax.random.PRNGKey(1234)

    def _forward(self, params, mel, f0, rng):
        # vocoder_compute_dtype: bfloat16 (falls back to the global
        # compute_dtype) halves the HBM traffic of the bandwidth-bound
        # upsample/resblock chain; params stay f32 at rest and are cast
        # in-program. f0 stays f32 — the NSF phase cumsum needs it (the
        # generator casts the sine source to mel.dtype after synthesis).
        cdt = self.hp.get("vocoder_compute_dtype",
                          self.hp.get("compute_dtype"))
        if cdt == "bfloat16":
            params = jax.tree_util.tree_map(
                lambda p: p.astype(jnp.bfloat16)
                if p.dtype == jnp.float32 else p, params)
            mel = mel.astype(jnp.bfloat16)
        wav = self.model.apply({"params": params}, mel, f0,
                               rngs={"noise": rng})
        return wav.astype(jnp.float32)

    def spec2wav(self, mel, f0=None, **kwargs):
        """mel: [T, 80] numpy; f0: [T] Hz or None -> wav [T*hop] numpy."""
        mel = np.asarray(mel, np.float32)
        T = mel.shape[0]
        hop = int(np.prod(self.model.upsample_rates))
        Tb = pick_bucket(T)
        mel_p = np.pad(mel, ((0, Tb - T), (0, 0)))
        if f0 is None:
            f0 = np.zeros(T, np.float32)
        f0_p = np.pad(np.asarray(f0, np.float32), (0, Tb - T))
        self._rng, sub = jax.random.split(self._rng)
        wav = self._jitted(self.params, mel_p[None], f0_p[None], sub)
        wav = np.asarray(wav)[0][: T * hop]
        if self.hp.get("vocoder_denoise_c", 0.0) > 0:
            wav = audio_ops.denoise_spectral_subtract(
                wav, self.hp, v=self.hp["vocoder_denoise_c"])
        return wav

    @staticmethod
    def wav2spec(wav_fn, return_linear=False):
        hp = dict(global_hparams)
        if isinstance(wav_fn, str):
            wav, _ = audio_ops.load_wav(wav_fn, sr=hp["audio_sample_rate"])
        else:
            wav = np.asarray(wav_fn, np.float32)
        wav_out, mel = process_wav_np(wav, hp)
        if return_linear:
            from ..ops.stft import stft_mag_np
            from ..ops.audio import amp_to_db, normalize
            spc = stft_mag_np(wav_out, hp["fft_size"], hp["hop_size"], hp["win_size"])
            spc = normalize(amp_to_db(spc), hp)
            return wav_out, mel, spc.T.astype(np.float32)
        return wav_out, mel
