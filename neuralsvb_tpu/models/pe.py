"""Neural pitch extractor: mel -> (f0, uv) prediction
(reference: modules/fastspeech/pe.py:44-74). Used at inference when
``pe_enable`` replaces ground-truth f0 (off in shipped SVB configs)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.pitch_utils import denorm_f0
from .common import ConvStacks, Prenet
from .tts_modules import PitchPredictor


class PitchExtractor(nn.Module):
    hidden_size: int = 256
    conv_layers: int = 2
    predictor_hidden: int = -1
    predictor_kernel: int = 5
    f0_mean: float = 220.0
    f0_std: float = 60.0
    pitch_norm: str = "standard"
    use_uv: bool = True

    @nn.compact
    def __call__(self, mel, train: bool = False):
        ret = {}
        _, h = Prenet(self.hidden_size, strides=[1, 1, 1],
                      name="mel_prenet")(mel, train=train)
        if self.conv_layers > 0:
            h = ConvStacks(n_layers=self.conv_layers, n_chans=self.hidden_size,
                           odim=self.hidden_size, name="mel_encoder")(h, train=train)
        ph = self.predictor_hidden if self.predictor_hidden > 0 else self.hidden_size
        pred = PitchPredictor(5, ph, 2, self.predictor_kernel, 0.1,
                              name="pitch_predictor")(h, train=train)
        ret["pitch_pred"] = pred
        pitch_padding = jnp.abs(mel).sum(-1) == 0
        hp = {"pitch_norm": self.pitch_norm, "f0_mean": self.f0_mean,
              "f0_std": self.f0_std, "use_uv": self.use_uv}
        ret["f0_denorm_pred"] = denorm_f0(
            pred[:, :, 0], (pred[:, :, 1] > 0) if self.use_uv else None,
            hp, pitch_padding=pitch_padding)
        return ret
