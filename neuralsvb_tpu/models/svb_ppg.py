"""PPG regression models: VCPPG (speech voice conversion), SVBPPG (+tech
embedding) and the parallel-data variants used by the SVBPara task family.

Re-design of the reference models (reference:
modules/voice_conversion/vc_ppg.py:7-102, svb_ppg.py:8-259) in flax:
conditions (pitch ConvStacks, frozen-ASR PPG upsampled, speaker
ref-encoder/embedding, optional energy + tech embeddings) fused by one
Linear, then a conv (or FFT) decoder with a linear mel head.

``ParaSVBPPG`` gathers the PPG through the DTW ``conversion_alignment``;
``ParaPPGPreExp`` gathers the raw mel before the ASR; ``ParaAlignedPPG``
repeats the PPG x stride, gathers, then average-pools back
(reference: svb_ppg.py:78-80,128-131,178-196).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .asr import VCASR
from .common import ConvGlobalStacks, ConvStacks, Embedding, dense
from .svb_vae import CondUpsampler
from .tts_modules import FastspeechDecoder


class VCPPG(nn.Module):
    dict_size: int
    hidden_size: int = 256
    num_mel_bins: int = 80
    mel_strides: Sequence[int] = (2, 1, 1)
    asr_enc_layers: int = 2
    asr_dec_layers: int = 2
    asr_last_norm: bool = False
    ref_enc_out: int = 256  # must stay 256 when mixing the multi_spk_emb
                            # path with the ref-encoder path (both feed the
                            # same encoded_embed_proj; reference uses 256)
    use_energy: bool = True
    use_spk_id: bool = False
    num_spk: int = 100
    use_tech: bool = False
    num_techs: int = 3
    decoder_type: str = "conv"
    dec_layers: int = 4
    dec_ffn_kernel_size: int = 9
    num_heads: int = 2
    dropout: float = 0.05
    ref_attn: bool = False      # banded reference attention over timbre mel
    asr_enc_type: str = "conformer"  # conformer | conv
    para: bool = False          # gather PPG through conversion_alignment
    pre_exp: bool = False       # gather raw mel before the ASR
    aligned_asr: bool = False   # repeat/gather/pool inside the ASR

    def setup(self):
        H = self.hidden_size
        self.pitch_embed = Embedding(300, H, 0)
        self.pitch_encoder = ConvStacks(n_layers=3, n_chans=H, odim=H)
        self.vc_asr = VCASR(self.dict_size, H, self.asr_enc_layers,
                            self.asr_dec_layers, self.mel_strides,
                            asr_enc_type=self.asr_enc_type,
                            asr_last_norm=self.asr_last_norm)
        self.upsample_layer = CondUpsampler(H, self.mel_strides)
        if self.use_energy:
            self.energy_embed = Embedding(256, H, 0)
        if self.use_spk_id:
            self.spk_embed = Embedding(self.num_spk, self.ref_enc_out)
        else:
            self.ref_encoder = ConvGlobalStacks(n_chans=self.ref_enc_out,
                                                odim=self.ref_enc_out)
        if self.use_tech:
            self.tech_embed = Embedding(self.num_techs, H)
        if self.ref_attn:
            from .common import MultiheadAttention
            self.ref_attn_kv_encoder = ConvStacks(
                n_layers=5, n_chans=H, odim=H, strides=[2, 2, 2, 1, 1],
                res=False, norm="none")
            self.ref_attn_mha = MultiheadAttention(4)
        self.encoded_embed_proj = dense(H)
        if self.decoder_type == "fft":
            self.decoder = FastspeechDecoder(H, self.dec_layers,
                                             self.dec_ffn_kernel_size,
                                             self.num_heads, self.dropout)
        else:
            self.decoder = ConvStacks(n_layers=self.dec_layers, n_chans=H,
                                      odim=H, dropout=self.dropout)
        self.mel_out = dense(self.num_mel_bins)

    # ------------------------------------------------------------------
    def _ppg(self, mels_content, conversion_alignment, T, train):
        """Frozen-ASR content features, optionally aligned to the target
        timeline."""
        stride = int(np.prod(self.mel_strides))
        if self.pre_exp and conversion_alignment is not None:
            mels_content = jnp.take_along_axis(
                mels_content, conversion_alignment[:, :, None], 1)
            conversion_alignment = None
        if self.aligned_asr and conversion_alignment is not None:
            # realignment happens inside the ASR (models/asr.py, the
            # AlignedVCASR equivalent of reference svb_ppg.py:178-196)
            h = jax.lax.stop_gradient(
                self.vc_asr(mels_content,
                            conversion_alignment=conversion_alignment,
                            train=False,
                            exact_lengths=not train)["h_content"])  # [B, T/st, H]
        else:
            h = jax.lax.stop_gradient(
                self.vc_asr(mels_content, train=False,
                            exact_lengths=not train)["h_content"])
        h = self.upsample_layer(h, train=train)
        if self.para and not self.aligned_asr and conversion_alignment is not None:
            h = h[:, : mels_content.shape[1]]
            h = jnp.take_along_axis(h, conversion_alignment[:, :, None], 1)
        return h[:, :T]

    def __call__(self, mels_content=None, mels_timbre=None, pitch=None,
                 energy=None, spk_ids=None, tech_ids=None,
                 conversion_alignment=None, infer: bool = False,
                 train: bool = False):
        ret: Dict[str, Any] = {}
        T = pitch.shape[1]
        embeds = []
        h_pitch = self.pitch_encoder(self.pitch_embed(pitch), train=train)
        ret["h_pitch"] = h_pitch
        embeds.append(h_pitch)
        h_content = self._ppg(mels_content, conversion_alignment, T, train)
        # right-pad if alignment made it shorter than T
        if h_content.shape[1] < T:
            h_content = jnp.pad(h_content,
                                ((0, 0), (0, T - h_content.shape[1]), (0, 0)))
        ret["h_content"] = h_content
        embeds.append(h_content)
        if self.use_energy and energy is not None:
            e = jnp.clip((energy * 256 // 4).astype(jnp.int32), 0, 255)
            h_energy = self.energy_embed(e)
            ret["h_energy"] = h_energy
            embeds.append(h_energy)
        if self.use_spk_id:
            h_style = jnp.repeat(self.spk_embed(spk_ids)[:, None, :], T, 1)
        elif self.para and spk_ids is not None and spk_ids.ndim == 3:
            # parallel task passes multi_spk_emb [B, K, 256]; take slot 0
            h_style = jnp.repeat(spk_ids[:, :1, :], T, 1)
        else:
            h_style = jnp.repeat(
                self.ref_encoder(mels_timbre, train=train)[:, None, :], T, 1)
        ret["h_style"] = h_style
        embeds.append(h_style)
        if self.use_tech and tech_ids is not None:
            embeds.append(jnp.repeat(self.tech_embed(tech_ids)[:, None, :], T, 1))

        ret["dec_inputs"] = dec_inputs = self.encoded_embed_proj(
            jnp.concatenate(embeds, -1))
        if self.ref_attn and not self.use_spk_id:
            # banded (|t - 8k| < 32) attention over the stride-8 timbre mel
            # (reference: vc_ppg.py:76-102 build_attn_mask)
            kv = self.ref_attn_kv_encoder(mels_timbre, train=train)  # [B, T/8, H]
            q_len, kv_len = dec_inputs.shape[1], kv.shape[1]
            band = (jnp.arange(q_len)[:, None]
                    - 8 * jnp.arange(kv_len)[None, :])
            attn_mask = jnp.where((band < 32) & (band > -32), 0.0, -1e9)
            attn, _ = self.ref_attn_mha(dec_inputs, kv, kv,
                                        attn_mask=attn_mask[None, None],
                                        train=train)
            dec_inputs = dec_inputs + attn
        nonpadding = (pitch > 0).astype(dec_inputs.dtype)[:, :, None]
        x = self.decoder(dec_inputs, train=train)
        ret["mel_out"] = self.mel_out(x) * nonpadding
        return ret

    def train_vc_asr(self, mels, tokens, conversion_alignment=None,
                     with_hidden: bool = False, train: bool = False):
        """Teacher-forced ASR logits (+ optionally h_content with gradient,
        for the ParaPPGConstraint loss, reference: svb_ppg.py:247-258).

        pre_exp gathers the raw mel before the ASR (svb_ppg.py:117-175);
        aligned_asr variants realign the encoder output inside the ASR
        before the CE decoder (svb_ppg.py:178-196)."""
        if self.pre_exp and conversion_alignment is not None:
            mels = jnp.take_along_axis(mels, conversion_alignment[:, :, None], 1)
            conversion_alignment = None
        prev_tokens = jnp.pad(tokens[:, :-1], ((0, 0), (1, 0)))
        out = self.vc_asr(
            mels, prev_tokens,
            conversion_alignment=(conversion_alignment
                                  if self.aligned_asr else None),
            train=train)
        if with_hidden:
            return out["tokens"], out["h_content"]
        return out["tokens"]


class SVBPPG(VCPPG):
    """+ technique embedding (reference: svb_ppg.py:8-61)."""
    use_tech: bool = True


class ParaSVBPPG(SVBPPG):
    """PPG gathered through the DTW alignment (reference: svb_ppg.py:63-114)."""
    para: bool = True


class ParaPPGPreExp(ParaSVBPPG):
    """Raw mel gathered before the ASR (reference: svb_ppg.py:117-175)."""
    pre_exp: bool = True


class ParaAlignedPPG(ParaSVBPPG):
    """PPG repeated x stride, gathered, avg-pooled (reference: svb_ppg.py:178-249)."""
    aligned_asr: bool = True


class ParaPPGConstraint(ParaAlignedPPG):
    """train_vc_asr returns h_content for the constraint loss."""
