"""Common NN building blocks.

TPU-first re-design of the reference module library
(reference: modules/commons/common_layers.py:63-772,
modules/fastspeech/pe.py:7-41). Everything is [B, T, C]; masks are float
[B, T, 1] unless noted. Dropout/BatchNorm follow flax conventions
(``deterministic`` / ``use_running_average`` flags driven by a ``train``
argument).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# torch BatchNorm1d keeps 0.9 of the running stat per step
BN_MOMENTUM = 0.9


class Embedding(nn.Module):
    """Embedding with a zeroed padding row (reference: common_layers.py:63-69)."""
    num_embeddings: int
    features: int
    padding_idx: Optional[int] = None

    @nn.compact
    def __call__(self, ids):
        emb = nn.Embed(self.num_embeddings, self.features,
                       embedding_init=nn.initializers.normal(self.features ** -0.5))(ids)
        if self.padding_idx is not None:
            emb = emb * (ids != self.padding_idx)[..., None].astype(emb.dtype)
        return emb


def dense(features, use_bias=True, name=None):
    """Linear with xavier-uniform init (reference: common_layers.py:81-87)."""
    return nn.Dense(features, use_bias=use_bias,
                    kernel_init=nn.initializers.xavier_uniform(), name=name)


class LayerNorm(nn.LayerNorm):
    pass


class BatchNorm1d(nn.Module):
    """torch-flavored BatchNorm over the channel (last) dim of [B, T, C]
    (or [B, C]); per-device statistics — PyTorch DDP does not sync BN and we
    replicate that (SURVEY.md section 7.3)."""
    momentum: float = BN_MOMENTUM

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=self.momentum,
                            epsilon=1e-5, axis_name=None)(x)


class ConvNorm(nn.Module):
    """1-D conv with SAME-style explicit padding (reference ConvNorm)."""
    features: int
    kernel_size: int = 1
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        pad = (self.dilation * (self.kernel_size - 1)) // 2
        return nn.Conv(self.features, (self.kernel_size,), strides=(self.stride,),
                       kernel_dilation=(self.dilation,), padding=[(pad, pad)],
                       kernel_init=nn.initializers.xavier_uniform())(x)


class ConvBlock(nn.Module):
    """conv -> norm -> relu -> dropout (reference: common_layers.py:736-772).

    ``x_mask`` ([B, T, 1], post-stride resolution) makes the block exact
    under padded/bucketed batches: gn/in statistics are computed over valid
    frames only and outputs are re-zeroed, so a padded run equals the
    reference's exact-length (bs=1, unpadded) computation."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    norm: str = "gn"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False, x_mask=None):
        x = ConvNorm(self.features, self.kernel_size, self.stride)(x)
        if self.norm == "bn":
            x = BatchNorm1d()(x, train=train)
        elif self.norm == "in":
            # InstanceNorm over time, affine; masked moments under padding
            if x_mask is not None:
                n = jnp.maximum(x_mask.sum(1, keepdims=True), 1.0)
                mean = (x * x_mask).sum(1, keepdims=True) / n
                var = (((x - mean) ** 2) * x_mask).sum(1, keepdims=True) / n
            else:
                mean = x.mean(1, keepdims=True)
                var = x.var(1, keepdims=True)
            x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
            scale = self.param("in_scale", nn.initializers.ones, (self.features,))
            bias = self.param("in_bias", nn.initializers.zeros, (self.features,))
            x = x * scale + bias
        elif self.norm == "gn":
            # flax reshapes the mask into (..., groups, C//groups) with the
            # inputs, so it must be materialized at full input shape
            x = nn.GroupNorm(num_groups=self.features // 16)(
                x, mask=None if x_mask is None else
                jnp.broadcast_to(x_mask.astype(bool), x.shape))
        elif self.norm == "ln":
            x = nn.LayerNorm()(x)
        x = nn.relu(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return x


class ConvStacks(nn.Module):
    """Residual conv stack (reference: common_layers.py:672-707)."""
    n_layers: int = 5
    n_chans: int = 256
    odim: int = 32
    kernel_size: int = 5
    norm: str = "gn"
    dropout: float = 0.0
    strides: Optional[Sequence[int]] = None
    res: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, x_mask=None):
        """``x_mask`` [B, T, 1]: masks norm statistics and re-zeroes padded
        frames each layer, so padded/bucketed batches reproduce the
        reference's exact-length computation (padding-invariance)."""
        strides = self.strides if self.strides is not None else [1] * self.n_layers
        x = dense(self.n_chans)(x)
        if x_mask is not None:
            x = x * x_mask
        for stride in strides:
            if x_mask is not None and stride > 1:
                x_mask = x_mask[:, ::stride]
            x_ = ConvBlock(self.n_chans, self.kernel_size, stride,
                           norm=self.norm, dropout=self.dropout)(
                x, train=train, x_mask=x_mask)
            if x_mask is not None:
                x_ = x_ * x_mask
            x = x + x_ if (self.res and stride == 1) else x_
        out = dense(self.odim)(x)
        return out if x_mask is None else out * x_mask


class ConvGlobalStacks(nn.Module):
    """Strided conv stack + temporal mean -> global vector [B, odim]
    (reference: common_layers.py:710-733). NOTE: the temporal mean spans
    the padded length, mirroring the reference's unmasked pooling — only
    the SVBPPG ref-encoder path uses this (not the flagship), and the
    reference pads identically in its batched mode."""
    n_layers: int = 5
    n_chans: int = 256
    odim: int = 32
    kernel_size: int = 5
    norm: str = "gn"
    strides: Sequence[int] = (2, 2, 2, 2, 2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = dense(self.n_chans)(x)
        for stride in self.strides:
            x = ConvBlock(self.n_chans, self.kernel_size, stride, norm=self.norm)(x, train=train)
        return dense(self.odim)(x.mean(1))


class Prenet(nn.Module):
    """Strided conv prenet with padding-mask propagation
    (reference: modules/fastspeech/pe.py:7-41). Returns (hidden, out)."""
    out_dim: int = 256
    kernel: int = 5
    n_layers: int = 3
    strides: Optional[Sequence[int]] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        strides = self.strides if self.strides is not None else [1] * self.n_layers
        nonpadding = (jnp.abs(x).sum(-1) > 0).astype(x.dtype)[:, :, None]  # [B, T, 1]
        h = x
        for stride in strides:
            nonpadding = nonpadding[:, ::stride]
            h = nn.Conv(self.out_dim, (self.kernel,), strides=(stride,),
                        padding=[(self.kernel // 2, self.kernel // 2)])(h)
            h = nn.relu(h)
            h = BatchNorm1d()(h, train=train)
            h = h * nonpadding
        out = dense(self.out_dim)(h) * nonpadding
        return h, out


def sinusoidal_positions(length: int, dim: int, padding_idx: int = 0) -> np.ndarray:
    """fairseq-style sinusoidal table (reference: common_layers.py:89-148):
    half sin, half cos, position offset by padding_idx + 1."""
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    freqs = np.exp(np.arange(half) * -emb)
    pos = np.arange(length)[:, None] * freqs[None, :]
    table = np.concatenate([np.sin(pos), np.cos(pos)], -1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((length, 1))], -1)
    return table.astype(np.float32)


class SinusoidalPositionalEmbedding(nn.Module):
    """Positions count from padding_idx+1 for non-pad steps."""
    dim: int
    padding_idx: int = 0

    @nn.compact
    def __call__(self, nonpad_mask):
        # nonpad_mask: [B, T] boolean/float of non-padding positions
        mask = nonpad_mask.astype(jnp.int32)
        positions = jnp.cumsum(mask, -1) * mask + self.padding_idx
        T = nonpad_mask.shape[1]
        table = jnp.asarray(sinusoidal_positions(T + self.padding_idx + 2, self.dim))
        return table[positions]


class MultiheadAttention(nn.Module):
    """Dot-product MHA with optional key-padding and additive attn masks.

    Functional replacement for the fairseq-style attention the reference
    carries (reference: common_layers.py:167-485), including its incremental
    state for autoregressive decode — expressed TPU-natively as an explicit
    functional k/v cache (``init_cache`` + ``cache=`` kwarg) so single-step
    decode composes with ``lax.scan`` instead of mutating module state.
    Layout: [B, T, C].
    """
    num_heads: int
    qkv_bias: bool = False
    dropout: float = 0.0

    @staticmethod
    def init_cache(batch: int, max_len: int, channels: int, num_heads: int,
                   dtype=jnp.float32):
        """Empty k/v cache for incremental decode (the reference's
        'incremental_state' dict, common_layers.py:231-239,300-324)."""
        dh = channels // num_heads
        return {"k": jnp.zeros((batch, num_heads, max_len, dh), dtype),
                "v": jnp.zeros((batch, num_heads, max_len, dh), dtype),
                "idx": jnp.zeros((), jnp.int32)}

    @nn.compact
    def __call__(self, query, key, value, key_padding_mask=None, attn_mask=None,
                 train: bool = False, cache=None):
        """With ``cache``: query/key/value are one step [B, 1, C]; the new
        k/v are appended at cache['idx'], attention covers the filled prefix,
        and the return value is (out, weights, new_cache)."""
        C = query.shape[-1]
        H = self.num_heads
        Dh = C // H
        scale = Dh ** -0.5
        q = dense(C, use_bias=self.qkv_bias, name="q_proj")(query) * scale
        k = dense(C, use_bias=self.qkv_bias, name="k_proj")(key)
        v = dense(C, use_bias=self.qkv_bias, name="v_proj")(value)

        def split(x):
            return x.reshape(x.shape[0], x.shape[1], H, Dh).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        if cache is not None:
            idx = cache["idx"]
            k = jax.lax.dynamic_update_slice(cache["k"], k, (0, 0, idx, 0))
            v = jax.lax.dynamic_update_slice(cache["v"], v, (0, 0, idx, 0))
            cache = {"k": k, "v": v, "idx": idx + query.shape[1]}
            # mask out the unfilled suffix of the cache
            pos = jnp.arange(k.shape[2])
            prefix_mask = pos[None, :] > idx + query.shape[1] - 1
            key_padding_mask = (prefix_mask if key_padding_mask is None
                                else key_padding_mask | prefix_mask)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        if attn_mask is not None:
            logits = logits + attn_mask
        if key_padding_mask is not None:
            neg = jnp.finfo(logits.dtype).min
            logits = jnp.where(key_padding_mask[:, None, None, :], neg, logits)
        weights = jax.nn.softmax(logits, -1)
        if self.dropout > 0:
            weights = nn.Dropout(self.dropout)(weights, deterministic=not train)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(query.shape[0], query.shape[1], C)
        out = dense(C, use_bias=self.qkv_bias, name="out_proj")(out)
        if cache is not None:
            return out, weights, cache
        return out, weights


class TransformerFFNLayer(nn.Module):
    """Conv-in FFN (reference: common_layers.py:487-521)."""
    hidden_size: int
    filter_size: int
    kernel_size: int = 1
    padding: str = "SAME"
    dropout: float = 0.0
    act: str = "gelu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.padding == "SAME":
            pad = [(self.kernel_size // 2, (self.kernel_size - 1) // 2)]
        else:  # LEFT
            pad = [(self.kernel_size - 1, 0)]
        x = nn.Conv(self.filter_size, (self.kernel_size,), padding=pad)(x)
        x = x * self.kernel_size ** -0.5
        if self.act == "gelu":
            x = nn.gelu(x)
        elif self.act == "relu":
            x = nn.relu(x)
        elif self.act == "swish":
            x = nn.swish(x)
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return dense(self.hidden_size)(x)


class EncSALayer(nn.Module):
    """Pre-norm self-attention + FFN encoder layer
    (reference: common_layers.py:543-589)."""
    hidden_size: int
    num_heads: int
    dropout: float = 0.0
    attention_dropout: float = 0.1
    relu_dropout: float = 0.1
    kernel_size: int = 9
    padding: str = "SAME"
    act: str = "gelu"

    @nn.compact
    def __call__(self, x, padding_mask, train: bool = False):
        # padding_mask: [B, T] True where padded
        keep = (1.0 - padding_mask.astype(x.dtype))[:, :, None]
        if self.num_heads > 0:
            res = x
            h = nn.LayerNorm()(x)
            h, _ = MultiheadAttention(self.num_heads, dropout=self.attention_dropout)(
                h, h, h, key_padding_mask=padding_mask, train=train)
            h = nn.Dropout(self.dropout)(h, deterministic=not train)
            x = (res + h) * keep
        res = x
        h = nn.LayerNorm()(x)
        h = TransformerFFNLayer(self.hidden_size, 4 * self.hidden_size,
                                kernel_size=self.kernel_size, padding=self.padding,
                                dropout=self.relu_dropout, act=self.act)(h, train=train)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return (res + h) * keep


class DecSALayer(nn.Module):
    """Pre-norm causal self-attn + enc-dec attn + LEFT-padded FFN decoder
    layer (reference: common_layers.py:592-669)."""
    hidden_size: int
    num_heads: int
    dropout: float = 0.0
    attention_dropout: float = 0.1
    relu_dropout: float = 0.1
    kernel_size: int = 9
    act: str = "gelu"

    @nn.compact
    def __call__(self, x, encoder_out, encoder_padding_mask=None,
                 self_attn_mask=None, self_attn_padding_mask=None, train: bool = False):
        res = x
        h = nn.LayerNorm()(x)
        h, _ = MultiheadAttention(self.num_heads, dropout=self.attention_dropout)(
            h, h, h, key_padding_mask=self_attn_padding_mask,
            attn_mask=self_attn_mask, train=train)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        x = res + h

        res = x
        h = nn.LayerNorm()(x)
        h, attn_w = MultiheadAttention(self.num_heads, dropout=self.attention_dropout)(
            h, encoder_out, encoder_out, key_padding_mask=encoder_padding_mask, train=train)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        x = res + h

        res = x
        h = nn.LayerNorm()(x)
        h = TransformerFFNLayer(self.hidden_size, 4 * self.hidden_size,
                                kernel_size=self.kernel_size, padding="LEFT",
                                dropout=self.relu_dropout, act=self.act)(h, train=train)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return res + h, attn_w


def causal_mask(T: int, dtype=jnp.float32):
    """Additive upper-triangular -inf mask [T, T]."""
    return jnp.triu(jnp.full((T, T), jnp.finfo(dtype).min), k=1)
