"""FastSpeech2: text -> mel with duration/pitch/energy predictors.

Re-design of the reference model (reference: modules/fastspeech/fs2.py:21-255)
in flax. The SVB configs use ground-truth durations and f0
(``use_gt_dur/use_gt_f0``); inference with predicted durations requires a
static ``max_frames`` (bucketed) for the length regulator.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.pitch_utils import denorm_f0, f0_to_coarse
from .common import ConvStacks, Embedding, dense
from .tts_modules import (DurationPredictor, EnergyPredictor, FastspeechDecoder,
                          FastspeechEncoder, PitchPredictor, length_regulator)


class FastSpeech2(nn.Module):
    dict_size: int
    hidden_size: int = 256
    enc_layers: int = 4
    dec_layers: int = 4
    enc_ffn_kernel_size: int = 9
    dec_ffn_kernel_size: int = 9
    num_heads: int = 2
    out_dims: int = 80
    decoder_type: str = "fft"  # 'fft' | 'conv'
    use_spk_id: bool = False
    use_spk_embed: bool = False
    num_spk: int = 100
    use_pitch_embed: bool = True
    use_energy_embed: bool = False
    use_uv: bool = True
    pitch_type: str = "frame"
    predictor_hidden: int = -1
    predictor_kernel: int = 5
    predictor_layers: int = 2
    dur_predictor_kernel: int = 3
    dur_predictor_layers: int = 2
    predictor_dropout: float = 0.5
    predictor_grad: float = 0.0
    dropout: float = 0.1
    cwt_hidden_size: int = 128
    cwt_std_scale: float = 0.8
    # hparams needed by denorm_f0
    f0_mean: float = 220.0
    f0_std: float = 60.0
    pitch_norm: str = "standard"

    def _hp(self):
        return {"pitch_norm": self.pitch_norm, "f0_mean": self.f0_mean,
                "f0_std": self.f0_std, "use_uv": self.use_uv}

    @nn.compact
    def __call__(self, txt_tokens, mel2ph=None, spk_embed=None, f0=None, uv=None,
                 energy=None, infer: bool = False, max_frames: Optional[int] = None,
                 train: bool = False):
        ret = {}
        H = self.hidden_size
        ph = self.predictor_hidden if self.predictor_hidden > 0 else H
        encoder_out = FastspeechEncoder(
            self.dict_size, H, self.enc_layers, self.enc_ffn_kernel_size,
            self.num_heads, self.dropout, name="encoder")(txt_tokens, train=train)
        src_nonpadding = (txt_tokens > 0).astype(encoder_out.dtype)[:, :, None]

        if self.use_spk_embed and spk_embed is not None:
            spk = dense(H, name="spk_embed_proj")(spk_embed)[:, None, :]
        elif self.use_spk_id and spk_embed is not None:
            spk = Embedding(self.num_spk + 1, H, name="spk_embed_proj")(
                spk_embed)[:, None, :]
        else:
            spk = 0.0

        # duration
        dur_inp = (encoder_out + spk) * src_nonpadding
        dur_inp = jax.lax.stop_gradient(dur_inp) + self.predictor_grad * (
            dur_inp - jax.lax.stop_gradient(dur_inp))
        dur_pred = DurationPredictor(
            self.dur_predictor_layers, ph, self.dur_predictor_kernel,
            self.predictor_dropout, name="dur_predictor")(
            dur_inp, txt_tokens == 0, train=train)
        ret["dur"] = dur_pred
        if mel2ph is None:
            dur = DurationPredictor.out2dur(dur_pred)
            mel2ph = jax.lax.stop_gradient(
                length_regulator(dur, txt_tokens == 0, max_len=max_frames))
        ret["mel2ph"] = mel2ph

        # expand to frame rate via mel2ph gather (0 = padding)
        dec_src = jnp.pad(encoder_out, ((0, 0), (1, 0), (0, 0)))
        decoder_inp = jnp.take_along_axis(dec_src, mel2ph[:, :, None], 1)
        tgt_nonpadding = (mel2ph > 0).astype(decoder_inp.dtype)[:, :, None]
        ret["decoder_inp_origin"] = decoder_inp

        pitch_inp = (decoder_inp + spk) * tgt_nonpadding
        if self.use_pitch_embed:
            decoder_inp = decoder_inp + self._add_pitch(
                pitch_inp, f0, uv, mel2ph, ret, ph, train)
        if self.use_energy_embed:
            decoder_inp = decoder_inp + self._add_energy(pitch_inp, energy, ret,
                                                         ph, train)
        ret["decoder_inp"] = decoder_inp = (decoder_inp + spk) * tgt_nonpadding

        if self.decoder_type == "fft":
            x = FastspeechDecoder(H, self.dec_layers, self.dec_ffn_kernel_size,
                                  self.num_heads, self.dropout,
                                  name="decoder")(decoder_inp, train=train)
        else:
            x = ConvStacks(n_layers=self.dec_layers, n_chans=H, odim=H,
                           name="decoder")(decoder_inp, train=train)
        ret["mel_out"] = dense(self.out_dims, name="mel_out")(x) * tgt_nonpadding
        return ret

    def _add_pitch(self, decoder_inp, f0, uv, mel2ph, ret, ph, train):
        decoder_inp = jax.lax.stop_gradient(decoder_inp) + self.predictor_grad * (
            decoder_inp - jax.lax.stop_gradient(decoder_inp))
        pitch_padding = mel2ph == 0
        if self.pitch_type == "cwt":
            return self._add_pitch_cwt(decoder_inp, f0, uv, mel2ph, ret, ph, train)
        pitch_pred = PitchPredictor(
            self.predictor_layers, ph, 2 if self.pitch_type == "frame" else 1,
            self.predictor_kernel, self.predictor_dropout,
            name="pitch_predictor")(decoder_inp, train=train)
        ret["pitch_pred"] = pitch_pred
        if f0 is None:
            f0 = pitch_pred[:, :, 0]
        if self.use_uv and uv is None:
            uv = pitch_pred[:, :, 1] > 0
        f0_denorm = denorm_f0(f0, uv, self._hp(), pitch_padding=pitch_padding)
        ret["f0_denorm"] = f0_denorm
        pitch = f0_to_coarse(f0_denorm)
        return Embedding(300, self.hidden_size, 0, name="pitch_embed")(pitch)

    def _add_pitch_cwt(self, decoder_inp, f0, uv, mel2ph, ret, ph, train):
        """CWT-domain f0 prediction (reference: fs2.py:205-231 + cwt2f0_norm):
        predict the 10-scale wavelet spectrum (+uv) and per-utterance f0
        mean/std, invert to a normalized f0 contour."""
        from ..ops.cwt import CWT_DT, CWT_DJ, CWT_J
        import numpy as _np
        h = dense(self.cwt_hidden_size, name="cwt_in")(decoder_inp)
        cwt_out_dims = 10 + (1 if self.use_uv else 0)
        cwt_out = PitchPredictor(self.predictor_layers, ph, cwt_out_dims,
                                 self.predictor_kernel, self.predictor_dropout,
                                 name="cwt_predictor")(h, train=train)
        ret["cwt"] = cwt_out
        stats_in = decoder_inp[:, 0, :]
        sh = dense(self.cwt_hidden_size, name="cwt_stats_0")(stats_in)
        sh = jax.nn.relu(sh)
        sh = dense(self.cwt_hidden_size, name="cwt_stats_1")(sh)
        sh = jax.nn.relu(sh)
        stats = dense(2, name="cwt_stats_2")(sh)
        ret["f0_mean"], ret["f0_std"] = stats[:, 0], stats[:, 1]
        if f0 is None:
            from ..ops.cwt import inverse_cwt
            scales = (2 * CWT_DT) * 2.0 ** (CWT_DJ * _np.arange(CWT_J + 1))
            f0_rec = inverse_cwt(cwt_out[:, :, :10], scales)
            std = ret["f0_std"] * self.cwt_std_scale
            lf0 = f0_rec * std[:, None] + ret["f0_mean"][:, None]
            from ..ops.pitch_utils import norm_f0 as _norm_f0
            f0 = _norm_f0(jnp.exp(lf0), None, self._hp())
            if self.use_uv:
                uv = cwt_out[:, :, -1] > 0
        f0 = f0[:, : mel2ph.shape[1]]
        pitch_padding = mel2ph == 0
        f0_denorm = denorm_f0(f0, uv if self.use_uv else None, self._hp(),
                              pitch_padding=pitch_padding)
        ret["f0_denorm"] = f0_denorm
        pitch = f0_to_coarse(f0_denorm)
        return Embedding(300, self.hidden_size, 0, name="pitch_embed")(pitch)

    def _add_energy(self, decoder_inp, energy, ret, ph, train):
        decoder_inp = jax.lax.stop_gradient(decoder_inp) + self.predictor_grad * (
            decoder_inp - jax.lax.stop_gradient(decoder_inp))
        energy_pred = EnergyPredictor(
            self.predictor_layers, ph, 1, self.predictor_kernel,
            self.predictor_dropout, name="energy_predictor")(
            decoder_inp, train=train)[..., 0]
        ret["energy_pred"] = energy_pred
        if energy is None:
            energy = energy_pred
        energy_q = jnp.clip((energy * 256 // 4).astype(jnp.int32), 0, 255)
        return Embedding(256, self.hidden_size, 0, name="energy_embed")(energy_q)
