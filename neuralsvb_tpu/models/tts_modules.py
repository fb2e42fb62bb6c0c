"""FastSpeech2 building blocks: FFT blocks, duration/pitch/energy
predictors, length regulator.

Re-design of the reference modules (reference:
modules/fastspeech/tts_modules.py:16-378) in [B, T, C] layout. The length
regulator takes a static ``max_len`` (bucketed frame count) because XLA needs
static output shapes; with ground-truth durations (the SVB configs set
``use_gt_dur: true``) mel2ph comes from data and this path is exact.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import (EncSALayer, SinusoidalPositionalEmbedding, dense)


class PredictorConvStack(nn.Module):
    """Shared conv->relu->LN->dropout stack of the FS2 predictors."""
    n_layers: int
    n_chans: int
    odim: int
    kernel_size: int
    dropout_rate: float
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x, x_masks=None, train: bool = False):
        # x: [B, T, C]; x_masks: [B, T] True where padded
        for i in range(self.n_layers):
            if self.padding == "SAME":
                pad = [((self.kernel_size - 1) // 2, (self.kernel_size - 1) // 2)]
            else:
                pad = [(self.kernel_size - 1, 0)]
            x = nn.Conv(self.n_chans, (self.kernel_size,), padding=pad,
                        name=f"conv_{i}")(x)
            x = nn.relu(x)
            x = nn.LayerNorm(name=f"ln_{i}")(x)
            x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
            if x_masks is not None:
                x = x * (1 - x_masks.astype(x.dtype))[:, :, None]
        x = dense(self.odim, name="linear")(x)
        if x_masks is not None:
            x = x * (1 - x_masks.astype(x.dtype))[:, :, None]
        return x


class DurationPredictor(nn.Module):
    """Log-domain duration predictor (reference: tts_modules.py:80-172)."""
    n_layers: int = 2
    n_chans: int = 384
    kernel_size: int = 3
    dropout_rate: float = 0.1
    offset: float = 1.0
    padding: str = "SAME"

    @nn.compact
    def __call__(self, xs, x_masks=None, train: bool = False):
        out = PredictorConvStack(self.n_layers, self.n_chans, 1,
                                 self.kernel_size, self.dropout_rate,
                                 self.padding, name="stack")(xs, x_masks, train)
        return out[..., 0]  # log-domain [B, T]

    @staticmethod
    def out2dur(xs_log, offset: float = 1.0):
        return jnp.clip(jnp.round(jnp.exp(xs_log) - offset), 0, None).astype(jnp.int32)


class PitchPredictor(nn.Module):
    """reference: tts_modules.py:213-256."""
    n_layers: int = 5
    n_chans: int = 384
    odim: int = 2
    kernel_size: int = 5
    dropout_rate: float = 0.1
    padding: str = "SAME"

    @nn.compact
    def __call__(self, xs, train: bool = False):
        return PredictorConvStack(self.n_layers, self.n_chans, self.odim,
                                  self.kernel_size, self.dropout_rate,
                                  self.padding, name="stack")(xs, None, train)


class EnergyPredictor(PitchPredictor):
    pass


def length_regulator(dur, dur_padding=None, alpha: float = 1.0,
                     max_len: Optional[int] = None):
    """Expand durations into mel2ph [B, max_len]
    (reference: tts_modules.py:175-211, token-mask construction)."""
    dur = jnp.round(dur.astype(jnp.float32) * alpha).astype(jnp.int32)
    if dur_padding is not None:
        dur = dur * (1 - dur_padding.astype(jnp.int32))
    B, T_txt = dur.shape
    if max_len is None:
        max_len = int(dur.sum(-1).max())  # only valid outside jit
    token_idx = jnp.arange(1, T_txt + 1)[None, :, None]
    dur_cumsum = jnp.cumsum(dur, 1)
    dur_cumsum_prev = jnp.pad(dur_cumsum, ((0, 0), (1, 0)))[:, :-1]
    pos_idx = jnp.arange(max_len)[None, None]
    token_mask = ((pos_idx >= dur_cumsum_prev[:, :, None])
                  & (pos_idx < dur_cumsum[:, :, None]))
    return (token_idx * token_mask.astype(jnp.int32)).sum(1)  # [B, max_len]


def mel2ph_to_dur(mel2ph, T_txt, max_dur=None):
    """Invert mel2ph to per-phone durations (reference: tts_modules.py:263-269)."""
    B = mel2ph.shape[0]
    onehot = jax.nn.one_hot(mel2ph, T_txt + 1, dtype=jnp.int32)
    dur = onehot.sum(1)[:, 1:]
    if max_dur is not None:
        dur = jnp.clip(dur, 0, max_dur)
    return dur


class FFTBlocks(nn.Module):
    """Transformer encoder stack with sinusoidal positions
    (reference: tts_modules.py:272-329)."""
    hidden_size: int
    num_layers: int
    ffn_kernel_size: int = 9
    dropout: float = 0.1
    num_heads: int = 2
    use_pos_embed: bool = True
    use_last_norm: bool = True
    norm: str = "ln"

    @nn.compact
    def __call__(self, x, padding_mask=None, train: bool = False):
        # x: [B, T, C]
        if padding_mask is None:
            padding_mask = jnp.abs(x).sum(-1) == 0
        nonpadding = (1 - padding_mask.astype(x.dtype))[:, :, None]
        if self.use_pos_embed:
            pos = SinusoidalPositionalEmbedding(self.hidden_size)(~padding_mask)
            x = x + pos
        x = nn.Dropout(self.dropout)(x, deterministic=not train) * nonpadding
        for i in range(self.num_layers):
            x = EncSALayer(self.hidden_size, self.num_heads, dropout=self.dropout,
                           kernel_size=self.ffn_kernel_size,
                           name=f"layer_{i}")(x, padding_mask, train=train)
            x = x * nonpadding
        if self.use_last_norm:
            x = nn.LayerNorm(name="last_norm")(x) * nonpadding
        return x


class FastspeechEncoder(nn.Module):
    """Token embedding + scaled positions + FFT blocks
    (reference: tts_modules.py:331-368)."""
    dict_size: int
    hidden_size: int = 256
    num_layers: int = 4
    kernel_size: int = 9
    num_heads: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(self, txt_tokens, train: bool = False):
        from .common import Embedding
        padding_mask = txt_tokens == 0
        emb = Embedding(self.dict_size, self.hidden_size, 0,
                        name="embed_tokens")(txt_tokens)
        x = emb * (self.hidden_size ** 0.5)
        pos = SinusoidalPositionalEmbedding(self.hidden_size)(~padding_mask)
        x = x + pos
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        x = x * (1 - padding_mask.astype(x.dtype))[:, :, None]
        return FFTBlocks(self.hidden_size, self.num_layers, self.kernel_size,
                         self.dropout, self.num_heads, use_pos_embed=False,
                         name="blocks")(x, padding_mask, train=train)


class FastspeechDecoder(nn.Module):
    hidden_size: int = 256
    num_layers: int = 4
    kernel_size: int = 9
    num_heads: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        return FFTBlocks(self.hidden_size, self.num_layers, self.kernel_size,
                         self.dropout, self.num_heads, name="blocks")(
            x, train=train)
