"""ASR-based PPG (phonetic posteriorgram) extractor and seq2seq decoder.

Re-design of the reference VCASR (reference:
modules/voice_conversion/vc_modules.py:56-80, modules/asr/seq2seq.py:10-102):
mel -> strided Prenet (T/2 with mel_strides [2,1,1]) -> Conformer content
encoder -> ``h_content``; optional Transformer decoder head produces token
logits for the CE training loss. In SVB training the whole module is frozen
(svb_vae_task.py:558-561).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import (DecSALayer, Embedding, Prenet, SinusoidalPositionalEmbedding,
                     causal_mask, dense)
from .conformer import ConformerLayers


class TransformerASRDecoder(nn.Module):
    """Causal transformer decoder over token embeddings attending to
    ``h_content`` (reference: modules/asr/seq2seq.py:10-102)."""
    hidden_size: int
    num_layers: int
    dropout: float
    out_dim: int
    num_heads: int = 2
    use_pos_embed: bool = True

    @nn.compact
    def __call__(self, dec_inputs, encoder_out, train: bool = False):
        self_pad = jnp.abs(dec_inputs).sum(-1) == 0  # [B, T]
        enc_pad = jnp.abs(encoder_out).sum(-1) == 0
        x = dec_inputs
        if self.use_pos_embed:
            pos = SinusoidalPositionalEmbedding(self.hidden_size)(~self_pad)
            x = x + pos
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        mask = causal_mask(x.shape[1], x.dtype)[None, None]
        attn_logits = []
        for i in range(self.num_layers):
            x, attn = DecSALayer(self.hidden_size, self.num_heads,
                                 dropout=self.dropout, kernel_size=9,
                                 name=f"layer_{i}")(
                x, encoder_out, encoder_padding_mask=enc_pad,
                self_attn_mask=mask, self_attn_padding_mask=self_pad, train=train)
            attn_logits.append(attn)
        x = nn.LayerNorm(name="layer_norm")(x)
        return dense(self.out_dim, use_bias=False, name="project_out")(x), attn_logits


class VCASR(nn.Module):
    """PPG extractor: Prenet(strides mel_strides) -> Conformer(asr_enc_layers,
    kernel 31). ``__call__(mel, prev_tokens)`` returns a dict with
    ``h_content`` [B, T/2, H] and (when prev_tokens given) ``tokens`` logits."""
    dict_size: int
    hidden_size: int = 256
    asr_enc_layers: int = 2
    asr_dec_layers: int = 2
    mel_strides: Sequence[int] = (2, 1, 1)
    asr_enc_type: str = "conformer"
    asr_last_norm: bool = False
    dropout: float = 0.1
    num_heads: int = 2

    @nn.compact
    def __call__(self, mel, prev_tokens=None, conversion_alignment=None,
                 train: bool = False, exact_lengths=None):
        """``exact_lengths``: forwarded to ConformerLayers — pass
        ``not task_train`` from frozen-ASR call sites (which always use
        ``train=False``) so training steps keep the reference's fast
        batched rel-pos semantics while inference stays bs=1-exact."""
        ret = {}
        _, h = Prenet(self.hidden_size, strides=list(self.mel_strides),
                      name="mel_prenet")(mel, train=train)
        if self.asr_enc_type == "conformer":
            h_content = ConformerLayers(
                self.hidden_size, self.asr_enc_layers, kernel_size=31,
                use_last_norm=self.asr_last_norm, dropout=self.dropout,
                name="content_encoder")(h, train=train,
                                        exact_lengths=exact_lengths)
        else:
            from .common import ConvStacks
            h_content = ConvStacks(n_chans=self.hidden_size, odim=self.hidden_size,
                                   name="content_encoder")(h, train=train)
        if conversion_alignment is not None:
            # realign to the target timeline at frame rate, pool back to
            # stride rate (reference AlignedVCASR, svb_ppg.py:178-196):
            # repeat x stride -> gather -> pad -> mean-pool(stride)
            stride = 1
            for s in self.mel_strides:
                stride *= int(s)
            rep = jnp.repeat(h_content, stride, axis=1)          # [B, S, H]
            idx = jnp.clip(conversion_alignment, 0, rep.shape[1] - 1)
            g = jnp.take_along_axis(rep, idx[:, :, None], 1)     # [B, T, H]
            pad = (-g.shape[1]) % stride
            g = jnp.pad(g, ((0, 0), (0, pad + stride), (0, 0)))
            Tg = g.shape[1] // stride
            h_content = g[:, : Tg * stride].reshape(
                g.shape[0], Tg, stride, -1).mean(2)              # [B, T/st, H]
        ret["h_content"] = h_content
        if prev_tokens is not None:
            tok_emb = Embedding(self.dict_size, self.hidden_size, 0,
                                name="token_embed")(prev_tokens)
            ret["tokens"], ret["asr_attn"] = TransformerASRDecoder(
                self.hidden_size, self.asr_dec_layers, self.dropout,
                self.dict_size, num_heads=self.num_heads,
                name="asr_decoder")(tok_emb, h_content, train=train)
        return ret
