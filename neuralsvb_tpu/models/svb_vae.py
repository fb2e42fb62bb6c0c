"""SVB VAE model family: SVBVAE (frame latent), GlobalSVBVAE (global latent,
mean/scale mapping), MleSVBVAE (global latent, single z-mapping trained by
MLE) and the tech-prior variants.

Re-design of the reference models (reference:
modules/voice_conversion/svb_vae.py:13-478) as one Flax module parameterized
by ``variant``. Layout is [B, T, C]; ways (a2a/p2p/a2p) are *static*
arguments, so each training phase compiles to its own fused XLA program —
the host-side phase machine of the reference (svb_vae_task.py:587-595)
becomes a static specialization instead of python branching per step.

Conditions per way: pitch embedding -> ConvStacks, frozen-ASR PPG upsampled
x2 (stop_gradient), projected speaker embedding broadcast over time; fused by
one Linear (``encoded_embed_proj``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .asr import VCASR
from .common import BatchNorm1d, ConvStacks, Embedding, dense
from .fvae import (FVAE, GlobalLatentMap, LatentMap, gaussian_kl, normal_log_prob)


class CondUpsampler(nn.Module):
    """Nearest x-scale upsample + conv + ReLU + BN per stride > 1, then a final
    k=5 conv (reference: svb_vae.py:38-45)."""
    hidden_size: int
    mel_strides: Sequence[int] = (2, 1, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        # padded frames (all-zero, like every masked module output) are
        # re-zeroed after each conv so stacked kernels see the implicit
        # zero-padding of an unpadded run (padding-invariance)
        mask = (jnp.abs(x).sum(-1, keepdims=True) > 0).astype(x.dtype)
        for i, scale in enumerate(s for s in self.mel_strides if s > 1):
            x = jnp.repeat(x, scale, axis=1)
            mask = jnp.repeat(mask, scale, axis=1)
            k = scale * 2 + 1
            x = nn.Conv(self.hidden_size, (k,), padding=[(scale, scale)],
                        name=f"conv_{i}")(x)
            x = nn.relu(x)
            x = BatchNorm1d(name=f"bn_{i}")(x, train=train)
            x = x * mask
        return nn.Conv(self.hidden_size, (5,), padding=[(2, 2)],
                       name="conv_out")(x) * mask


class SVBVAE(nn.Module):
    """variant: 'local' | 'global' | 'mle' (| 'tech_mle')."""
    dict_size: int
    hidden_size: int = 256
    num_mel_bins: int = 80
    latent_size: int = 128
    fvae_hidden: int = 192
    fvae_kernel: int = 5
    fvae_enc_layers: int = 8
    fvae_dec_layers: int = 4
    frames_multiple: int = 4
    mel_strides: Sequence[int] = (2, 1, 1)
    asr_enc_layers: int = 2
    asr_dec_layers: int = 2
    asr_last_norm: bool = False
    variant: str = "mle"  # local | global | mle | tech_mle | seg_tech_mle
    use_prior_glow: bool = False
    use_remat: bool = False  # rematerialize WN stacks under grad

    def setup(self):
        H = self.hidden_size
        self.pitch_embed = Embedding(300, H, 0)
        self.pitch_encoder = ConvStacks(n_layers=3, n_chans=H, odim=H)
        self.vc_asr = VCASR(self.dict_size, H, self.asr_enc_layers,
                            self.asr_dec_layers, self.mel_strides,
                            asr_last_norm=self.asr_last_norm)
        self.upsample_layer = CondUpsampler(H, self.mel_strides)
        self.spk_embed_proj = dense(H)
        self.encoded_embed_proj = dense(H)
        self.vae_model = FVAE(
            in_out_channels=self.num_mel_bins, hidden_channels=self.fvae_hidden,
            latent_size=self.latent_size, kernel_size=self.fvae_kernel,
            enc_n_layers=self.fvae_enc_layers, dec_n_layers=self.fvae_dec_layers,
            gin_channels=H, strides=(self.frames_multiple,),
            global_latent=self.variant != "local",
            use_prior_glow=self.use_prior_glow, remat=self.use_remat)
        if self.variant == "local":
            self.m_mapping_function = LatentMap(self.latent_size)
            self.logs_mapping_function = LatentMap(self.latent_size)
        elif self.variant == "global":
            self.m_mapping_function = GlobalLatentMap(self.latent_size)
            self.logs_mapping_function = GlobalLatentMap(self.latent_size)
        else:  # mle family
            self.z_mapping_function = GlobalLatentMap(self.latent_size)
        if self.variant == "seg_tech_mle":
            # attention-based PPG alignment (reference: svb_vae.py:402-478)
            from .common import MultiheadAttention
            self.k_mel_encoder_0 = nn.Conv(self.hidden_size, (1,))
            self.k_mel_encoder_bn = BatchNorm1d()
            self.k_mel_encoder_1 = nn.Conv(self.hidden_size, (1,))
            self.seg_ref_attn = MultiheadAttention(4)

    # ------------------------------------------------------------------
    def prepare_condition(self, mel, pitch, spk_emb, train: bool = False,
                          exact_lengths=None, ppg=None):
        """reference: svb_vae.py:60-86. ``exact_lengths`` selects the
        frozen ASR's rel-pos semantics (see models/conformer.py): None
        defaults to ``not train`` — exact at inference, batched in
        training. Phase-3 training applies the model in eval mode on
        padded batches, where the reference still computes rel-pos at the
        collate length, so the task passes exact_lengths=False there.

        ``ppg``: precomputed frozen-ASR content rows [B, ceil(T/stride), H]
        (the device cache's ``cache_ppg`` path, data/device_cache.py) —
        skips the per-step VCASR forward. Cached rows carry the
        exact-length rel-pos semantics regardless of ``exact_lengths``
        (documented deviation, see PARITY.md)."""
        if exact_lengths is None:
            exact_lengths = not train
        T = pitch.shape[1]
        tgt_nonpadding = (pitch > 0).astype(mel.dtype)[:, :, None]
        h_pitch = self.pitch_encoder(self.pitch_embed(pitch), train=train,
                                     x_mask=tgt_nonpadding)
        if ppg is None:
            ppg = self.vc_asr(mel, train=False,
                              exact_lengths=exact_lengths)["h_content"]
        ppg = jax.lax.stop_gradient(ppg)
        h_content = self.upsample_layer(ppg, train=train)[:, :T]
        h_style = jnp.repeat(self.spk_embed_proj(spk_emb)[:, None, :], T, axis=1)
        return dict(h_pitch=h_pitch, h_content=h_content, h_style=h_style,
                    tgt_nonpadding=tgt_nonpadding)

    def extract_ppg(self, mel, exact_lengths: bool = True):
        """Frozen-ASR content rows for one mel batch — the device cache's
        one-time precompute entry point (``model.apply(vars, mel,
        method=SVBVAE.extract_ppg)`` with only the ``vc_asr`` variable
        subtree). Padded (zero) mel frames come back as exactly-zero rows
        (the conformer masks its output), so flat per-item storage
        round-trips losslessly."""
        return self.vc_asr(mel, train=False,
                           exact_lengths=exact_lengths)["h_content"]

    def _cond_sum(self, h_pitch, h_content, h_style, mask=None):
        cond = self.encoded_embed_proj(
            jnp.concatenate([h_pitch, h_content, h_style], -1))
        # zero the condition at padded frames (h_style is nonzero there):
        # the FVAE's strided g_pre_net would otherwise smear padding into
        # the last valid stride-frames, breaking padding-invariance
        return cond if mask is None else cond * mask

    def normal_vae(self, tgt_mel, conds, infer: bool, train: bool = False,
                   prior_mean=0.0):
        cond = self._cond_sum(conds["h_pitch"], conds["h_content"],
                              conds["h_style"], mask=conds["tgt_nonpadding"])
        out: Dict[str, Any] = {}
        if infer:
            mel_out, z_p = self.vae_model(g=cond, prior_mean=prior_mean, infer=True,
                                          train=train)
            out["mel_out"] = mel_out
        else:
            (mel_out, out["kl"], out["z_p"], out["m_q"], out["logs_q"],
             out["x_mask_sqz"], out["z_q"]) = self.vae_model(
                tgt_mel, conds["tgt_nonpadding"], g=cond, prior_mean=prior_mean,
                train=train)
            out["mel_out"] = mel_out
        return out

    def train_vc_asr(self, mels, tokens, train: bool = False):
        """Teacher-forced ASR logits for the CE pretraining loss
        (reference: svb_vae.py:166-168)."""
        prev_tokens = jnp.pad(tokens[:, :-1], ((0, 0), (1, 0)))
        return self.vc_asr(mels, prev_tokens, train=train)["tokens"]

    # ------------------------------------------------------------------
    def __call__(self, amateur_mel, prof_mel, amateur_pitch, prof_pitch,
                 spk_emb, a2p_alignment=None, concurrent_ways: Tuple[str, ...] = (),
                 infer: bool = False, disable_map: bool = False,
                 train: bool = False, map_train: Optional[bool] = None,
                 tech_ids: Optional[Tuple[int, int]] = None,
                 exact_lengths: Optional[bool] = None,
                 ppg_a=None, ppg_p=None):
        """Returns {way: outputs}. ``concurrent_ways`` must be static.
        ``spk_emb``: [B, 256] — the same (amateur) speaker embedding is used
        for both sides, as in the reference task (svb_vae_task.py:146).
        ``ppg_a``/``ppg_p``: optional precomputed frozen-ASR content rows
        per side (see ``prepare_condition``)."""
        ret: Dict[str, Dict[str, Any]] = {}
        amateur_conds = self.prepare_condition(amateur_mel, amateur_pitch, spk_emb,
                                               train=train,
                                               exact_lengths=exact_lengths,
                                               ppg=ppg_a)
        prof_conds = self.prepare_condition(prof_mel, prof_pitch, spk_emb, train=train,
                                            exact_lengths=exact_lengths,
                                            ppg=ppg_p)

        if tech_ids is None and self.variant in ("tech_mle", "seg_tech_mle"):
            # prior N(tech_id, 1): amateur=0, professional=1
            # (reference: vae_models.py:196-200 TechPriorGlobalFVAE)
            tech_ids = (0, 1)
        prior_a = float(tech_ids[0]) if tech_ids is not None else 0.0
        prior_p = float(tech_ids[1]) if tech_ids is not None else 0.0

        a2a_out = p2p_out = None
        if "a2a" in concurrent_ways:
            a2a_out = self.normal_vae(amateur_mel, amateur_conds, infer, train,
                                      prior_mean=prior_a)
            ret["a2a"] = a2a_out
        if "p2p" in concurrent_ways:
            p2p_conds = prof_conds
            if self.variant == "seg_tech_mle" and a2p_alignment is not None:
                fake_prof_ppg, attn_w = self.get_aligned_ppg(
                    amateur_conds["h_content"], amateur_mel, a2p_alignment,
                    train=train)
                p2p_conds = dict(prof_conds)
                p2p_conds["h_content"] = fake_prof_ppg[:, : prof_mel.shape[1]]
            p2p_out = self.normal_vae(prof_mel, p2p_conds, infer, train,
                                      prior_mean=prior_p)
            if self.variant == "seg_tech_mle" and a2p_alignment is not None:
                p2p_out["attn"] = attn_w
                # a2p decodes with the same attention-aligned content
                amateur_conds = dict(amateur_conds)
                amateur_conds["h_content_aligned"] = \
                    fake_prof_ppg[:, : prof_mel.shape[1]]
            ret["p2p"] = p2p_out
        if "a2p" in concurrent_ways:
            mt = train if map_train is None else map_train
            ret["a2p"] = self._a2p(a2a_out, p2p_out, amateur_conds, prof_conds,
                                   a2p_alignment, disable_map, train, mt)
        return ret

    # ------------------------------------------------------------------
    def get_aligned_ppg(self, src_ppg, src_mel, alignment, train=False):
        """Attention-refined alignment of the amateur PPG to the professional
        timeline (reference: svb_vae.py:413-420)."""
        gathered = jnp.take_along_axis(src_ppg, alignment[:, :, None], 1)
        k = self.k_mel_encoder_0(src_mel)
        k = nn.relu(k)
        k = self.k_mel_encoder_bn(k, train=train)
        k = self.k_mel_encoder_1(k)
        attn, attn_w = self.seg_ref_attn(gathered, k, src_ppg, train=train)
        return attn, attn_w

    def _gathered_cond(self, amateur_conds, prof_conds, a2p_alignment):
        """Condition for decoding on the professional timeline: prof pitch,
        amateur PPG gathered through the DTW alignment (or attention-aligned
        for the seg variant), amateur style."""
        T_p = prof_conds["h_pitch"].shape[1]
        if "h_content_aligned" in amateur_conds:
            gathered = amateur_conds["h_content_aligned"][:, :T_p]
        else:
            gathered = jnp.take_along_axis(
                amateur_conds["h_content"], a2p_alignment[:, :, None], axis=1)
        style = jnp.repeat(amateur_conds["h_style"][:, :1], T_p, axis=1)
        return self._cond_sum(prof_conds["h_pitch"], gathered, style,
                              mask=prof_conds["tgt_nonpadding"])

    def _a2p(self, a2a_out, p2p_out, amateur_conds, prof_conds, a2p_alignment,
             disable_map, train, map_train=None):
        if map_train is None:
            map_train = train
        out: Dict[str, Any] = {}
        prof_m_q, prof_logs_q = p2p_out["m_q"], p2p_out["logs_q"]
        cond_a2p = self._gathered_cond(amateur_conds, prof_conds, a2p_alignment)
        mask_p = prof_conds["tgt_nonpadding"]
        style_a = amateur_conds["h_style"]

        if self.variant == "local":
            # shrink the frame alignment to latent rate (svb_vae.py:116-121)
            fm = self.frames_multiple
            Tz_a = a2a_out["m_q"].shape[1]
            shrink = jnp.clip(a2p_alignment[:, ::fm] // fm, 0, Tz_a - 1)
            m_a = jnp.take_along_axis(a2a_out["m_q"], shrink[:, :, None], 1)
            logs_a = jnp.take_along_axis(a2a_out["logs_q"], shrink[:, :, None], 1)
            if disable_map:
                m_map, logs_map = m_a, logs_a
            else:
                m_map = self.m_mapping_function(m_a, style_a, train=map_train)
                logs_map = self.logs_mapping_function(logs_a, style_a, train=map_train)
            kl = gaussian_kl(m_map, logs_map, prof_m_q, prof_logs_q)
            msk = p2p_out["x_mask_sqz"]
            out["kl"] = (kl * msk).sum() / msk.sum() / kl.shape[-1]
            out["mel_out"] = self.vae_model.decoder(m_map, mask_p, cond_a2p, train=train)
            eps = jax.random.normal(self.make_rng("noise"), m_map.shape, m_map.dtype)
            z_s = m_map + eps * jnp.exp(logs_map)
            out["a2p_sample_recon"] = self.vae_model.decoder(z_s, mask_p, cond_a2p,
                                                             train=train)
        elif self.variant == "global":
            m_a, logs_a = a2a_out["m_q"], a2a_out["logs_q"]
            if disable_map:
                m_map, logs_map = m_a, logs_a
            else:
                m_map = self.m_mapping_function(m_a, style_a, train=map_train)
                logs_map = self.logs_mapping_function(logs_a, style_a, train=map_train)
            kl = gaussian_kl(m_map, logs_map, prof_m_q, prof_logs_q)
            out["kl"] = kl.sum() / kl.shape[0] / kl.shape[-1]
            out["mel_out"] = self.vae_model.decoder(m_map, mask_p, cond_a2p, train=train)
            eps = jax.random.normal(self.make_rng("noise"), m_map.shape, m_map.dtype)
            z_s = m_map + eps * jnp.exp(logs_map)
            out["a2p_sample_recon"] = self.vae_model.decoder(z_s, mask_p, cond_a2p,
                                                             train=train)
        else:  # mle
            z_a = a2a_out["z_q"]
            if disable_map:
                z_map = z_a
            else:
                z_map = self.z_mapping_function(z_a, style_a, train=map_train)
            logp = normal_log_prob(z_map, prof_m_q, prof_logs_q)
            out["mle"] = -logp.sum() / z_map.shape[0] / z_map.shape[-1]
            out["mel_out"] = self.vae_model.decoder(z_map, mask_p, cond_a2p, train=train)
            out["logs_amateur_zq"] = z_a
            out["logs_prof_zq"] = p2p_out["z_q"]
        return out
