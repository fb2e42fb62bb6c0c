"""ESPnet-style Conformer encoder with relative positional attention.

Re-design of the reference stack (reference:
modules/fastspeech/conformer/conformer.py:9-78, conformer/layers.py:7-260,
modules/commons/espnet_positional_embedding.py:89-112,
modules/commons/espnet_transformer_attn.py:106-186) in [B, T, C] layout.
"""

from __future__ import annotations

import math
from typing import Optional
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .common import BatchNorm1d, dense


def rel_positional_encoding(T: int, dim: int, max_len: int = 5000) -> np.ndarray:
    """ESPnet (legacy) RelPositionalEncoding table: the module builds a
    REVERSED table of length max(max_len, T) — positions L-1 ... 0 — and
    slices the first T rows, so the effective positions are L-1 ... L-T
    (reference: modules/commons/espnet_positional_embedding.py:23-45,100-112;
    parity verified in tests/test_parity_reference.py)."""
    L = max(max_len, T)
    pos = np.arange(L - 1, -1, -1.0)[:T, None]
    div = np.exp(np.arange(0, dim, 2) * -(math.log(10000.0) / dim))
    pe = np.zeros((T, dim), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


class RelPositionMultiHeadedAttention(nn.Module):
    """Transformer-XL style attention with position bias u/v and rel-shift."""
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, pos_emb, mask=None, train: bool = False,
                 exact_lengths: bool = False):
        B, T, C = x.shape
        H, Dh = self.num_heads, C // self.num_heads
        q = dense(C, name="linear_q")(x).reshape(B, T, H, Dh)
        k = dense(C, name="linear_k")(x).reshape(B, T, H, Dh)
        v = dense(C, name="linear_v")(x).reshape(B, T, H, Dh)
        p = dense(C, use_bias=False, name="linear_pos")(pos_emb).reshape(
            pos_emb.shape[0], -1, H, Dh)  # [B or 1, T, H, Dh]

        pos_bias_u = self.param("pos_bias_u", nn.initializers.xavier_uniform(), (H, Dh))
        pos_bias_v = self.param("pos_bias_v", nn.initializers.xavier_uniform(), (H, Dh))

        q_u = (q + pos_bias_u[None, None]).transpose(0, 2, 1, 3)  # [B,H,T,Dh]
        q_v = (q + pos_bias_v[None, None]).transpose(0, 2, 1, 3)
        k_t = k.transpose(0, 2, 1, 3)
        p_t = p.transpose(0, 2, 1, 3)

        matrix_ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k_t,
                               preferred_element_type=jnp.float32)
        matrix_bd = jnp.einsum("bhqd,bhkd->bhqk", q_v, p_t,
                               preferred_element_type=jnp.float32)
        if mask is not None and exact_lengths:
            # reference-exact per-example rel-shift (matches the reference's
            # exact-length bs=1 computation under any padding)
            n_valid = mask.reshape(B, -1, T)[:, 0].sum(-1).astype(jnp.int32)
            matrix_bd = self._rel_shift_exact(matrix_bd, n_valid)
        else:
            # training mode: the reference also computes rel-pos at the
            # collate length on padded batches; the plain shift mirrors that
            # and skips the skew/gather ops (~25 ms/step at flagship dims)
            matrix_bd = self._rel_shift(matrix_bd)
        scores = (matrix_ac + matrix_bd) / math.sqrt(Dh)

        if mask is not None:
            # mask: [B, 1, T] True where valid (ESPnet convention)
            neg = jnp.finfo(scores.dtype).min
            scores = jnp.where(mask[:, None, :, :] if mask.ndim == 3 else mask,
                               scores, neg)
        attn = jax.nn.softmax(scores, -1)
        if mask is not None:
            attn = jnp.where(mask[:, None, :, :] if mask.ndim == 3 else mask, attn, 0.0)
        if self.dropout > 0:
            attn = nn.Dropout(self.dropout)(attn, deterministic=not train)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v.transpose(0, 2, 1, 3))
        out = out.transpose(0, 2, 1, 3).reshape(B, T, C)
        return dense(C, name="linear_out")(out)

    @staticmethod
    def _rel_shift(x):
        """Shift trick converting position-indexed to offset-indexed scores
        (ESPnet rel_shift: pad a zero column, reshape, drop first row)."""
        B, H, T1, T2 = x.shape
        zero_pad = jnp.zeros((B, H, T1, 1), x.dtype)
        x_padded = jnp.concatenate([zero_pad, x], -1)
        x_padded = x_padded.reshape(B, H, T2 + 1, T1)
        return x_padded[:, :, 1:].reshape(B, H, T1, T2)

    @staticmethod
    def _rel_shift_exact(bd, n):
        """Reference-exact rel-shift under padding: reproduces what the
        legacy ESPnet rel_shift computes for a sequence of TRUE length n —
        including its wrap "junk" at positive offsets (reference:
        espnet_transformer_attn.py:127-145 without zero_triu; the trained
        checkpoints saw that junk, so exactness requires emulating it).

        Derivation: the legacy shift flattens [0 | bd_n[q, 0..n-1]] rows
        into an (n+1, n)-strided view, which resolves in closed form to
            out[a, b] = bd_n[a,   (n-1) + d]   for d = b - a <= 0  (legit)
            out[a, b] = 0                      for d == 1
            out[a, b] = bd_n[a+1, d - 2]       for d >= 2          (junk)
        — the junk is simply the NEXT query row re-indexed. With our
        per-example table (bd_n[q, j] = bd[q, j + T - n], see
        _pos_emb_per_example) the d <= 0 branch is the plain shift of
        ``bd`` unchanged, and the junk branch is the plain shift of the
        rows-up-by-one matrix column-shifted by (T - n) - (T + 1): one
        cheap last-dim gather + two reshape-shifts, no 2-D gather (the
        per-(a,b) gather variant cost ~9x the whole train step on TPU).
        For n == T this reduces to the plain shift bit-for-bit."""
        B, H, T, _ = bd.shape
        # d <= 0 (legit offsets): the plain shift of the padded matrix is
        # already exact — the per-example table absorbs the T-n shift
        part1 = RelPositionMultiHeadedAttention._rel_shift(bd)
        # d >= 2 (junk): out[a, b] = bd[a+1, (d-2) + (T-n)]. Skew the
        # rows-up-by-one matrix (row a shifted right by a) via the
        # pad+reshape trick, then the remaining index b + (T-n) - 2 is
        # column-only per example: one cheap last-dim gather.
        bd_r = jnp.concatenate([bd[:, :, 1:], jnp.zeros_like(bd[:, :, :1])],
                               axis=2)
        padded = jnp.pad(bd_r, ((0, 0), (0, 0), (0, 0), (0, T)))
        flat = padded.reshape(B, H, 2 * T * T)[:, :, : T * (2 * T - 1)]
        skew = flat.reshape(B, H, T, 2 * T - 1)  # skew[a, j] = bd_r[a, j-a]
        s = jnp.clip(T - n, 0, T)[:, None]             # [B, 1]
        j = jnp.arange(T)
        idx = j[None, :] + s - 2                       # [B, T]
        part2 = jnp.take_along_axis(
            skew, jnp.clip(idx, 0, 2 * T - 2)[:, None, None, :], axis=-1)
        part2 = part2 * (idx >= 0)[:, None, None, :]
        d = j[None, :] - j[:, None]                    # [T, T] offsets
        return jnp.where(d[None, None] <= 0, part1,
                         jnp.where(d[None, None] == 1, 0.0, part2))


class ConvolutionModule(nn.Module):
    """pointwise -> GLU -> depthwise -> BN -> swish -> pointwise."""
    channels: int
    kernel_size: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(2 * self.channels, (1,))(x)
        h = nn.glu(h, axis=-1)
        pad = (self.kernel_size - 1) // 2
        h = nn.Conv(self.channels, (self.kernel_size,), padding=[(pad, pad)],
                    feature_group_count=self.channels)(h)
        h = BatchNorm1d()(h, train=train)
        h = nn.swish(h)
        return nn.Conv(self.channels, (1,))(h)


class MultiLayeredConv1d(nn.Module):
    """Positionwise two-conv FFN."""
    hidden_chans: int
    out_chans: int
    kernel_size: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size - 1) // 2
        h = nn.Conv(self.hidden_chans, (self.kernel_size,), padding=[(pad, pad)])(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return nn.Conv(self.out_chans, (self.kernel_size,), padding=[(pad, pad)])(h)


class ConformerEncoderLayer(nn.Module):
    """Macaron FFN + rel-pos MHA + conv module + FFN, all pre-norm."""
    hidden_size: int
    kernel_size: int
    num_heads: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, pos_emb, mask=None, train: bool = False,
                 exact_lengths: bool = False):
        drop = lambda h: nn.Dropout(self.dropout)(h, deterministic=not train)
        ff_scale = 0.5
        # macaron FFN
        res = x
        h = nn.LayerNorm(name="norm_ff_macaron")(x)
        h = MultiLayeredConv1d(self.hidden_size * 4, self.hidden_size, 1,
                               self.dropout, name="ff_macaron")(h, train=train)
        x = res + ff_scale * drop(h)
        # MHA
        res = x
        h = nn.LayerNorm(name="norm_mha")(x)
        h = RelPositionMultiHeadedAttention(self.num_heads, 0.0, name="self_attn")(
            h, pos_emb, mask=mask, train=train, exact_lengths=exact_lengths)
        x = res + drop(h)
        # conv module; zero padded frames first so the depthwise kernel sees
        # exactly the implicit zero-padding an unpadded (bs=1) run would —
        # without this, bucketed batches leak padding into the last
        # (kernel_size-1)/2 valid frames
        res = x
        h = nn.LayerNorm(name="norm_conv")(x)
        if mask is not None:
            h = h * mask.transpose(0, 2, 1).astype(h.dtype)
        h = ConvolutionModule(self.hidden_size, self.kernel_size, name="conv_module")(
            h, train=train)
        x = res + drop(h)
        # FFN
        res = x
        h = nn.LayerNorm(name="norm_ff")(x)
        h = MultiLayeredConv1d(self.hidden_size * 4, self.hidden_size, 1,
                               self.dropout, name="ff")(h, train=train)
        x = res + ff_scale * drop(h)
        return nn.LayerNorm(name="norm_final")(x)


class ConformerLayers(nn.Module):
    """Stack of conformer layers over [B, T, H]; padding inferred from
    all-zero frames like the reference (conformer.py:47)."""
    hidden_size: int
    num_layers: int
    kernel_size: int = 31
    num_heads: int = 4
    dropout: float = 0.1
    use_last_norm: bool = True

    def _pos_emb_per_example(self, n_valid, T, max_len=5000):
        """ESPnet-legacy rel-pos table, built per example for its TRUE
        length: the legacy table's effective offset embedding is shifted by
        the sequence length (row j is read for offset d = j - (T-1), giving
        position max(L, n) - n - d), so a padded run with the naive length-T
        table would bias attention differently from the reference's exact
        bs=1 computation. arg = (T-1-j) + (max(max_len, n) - n) reproduces
        the exact-length table for every example regardless of padding."""
        dim = self.hidden_size
        i = jnp.arange(T, dtype=jnp.float32)
        L_ref = jnp.maximum(jnp.float32(max_len), n_valid.astype(jnp.float32))
        arg = (T - 1 - i)[None, :] + (L_ref - n_valid)[:, None]  # [B, T]
        div = jnp.asarray(
            np.exp(np.arange(0, dim, 2) * -(math.log(10000.0) / dim)),
            jnp.float32)
        ang = arg[:, :, None] * div[None, None, :]               # [B, T, D/2]
        return jnp.stack([jnp.sin(ang), jnp.cos(ang)], -1).reshape(
            ang.shape[0], T, dim)

    @nn.compact
    def __call__(self, x, train: bool = False,
                 exact_lengths: Optional[bool] = None):
        """``exact_lengths`` (default: not train) selects reference-exact
        per-example rel-pos semantics (bs=1 parity under padding) vs the
        reference's batched-training semantics (collate-length table)."""
        if exact_lengths is None:
            exact_lengths = not train
        nonpadding = (jnp.abs(x).sum(-1) > 0)  # [B, T]
        mask = nonpadding[:, None, :]  # [B, 1, T] valid positions
        T = x.shape[1]
        if exact_lengths:
            # reference bs=1 inference semantics at any padding
            pos_emb = self._pos_emb_per_example(nonpadding.sum(-1), T)
        else:
            # reference batched-training semantics: one collate-length table
            pos_emb = jnp.asarray(
                rel_positional_encoding(T, self.hidden_size))[None]
        h = x * math.sqrt(self.hidden_size)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        pos_emb = nn.Dropout(self.dropout)(pos_emb, deterministic=not train)
        for i in range(self.num_layers):
            h = ConformerEncoderLayer(self.hidden_size, self.kernel_size,
                                      self.num_heads, self.dropout,
                                      name=f"layer_{i}")(h, pos_emb, mask=mask, train=train,
                                                         exact_lengths=exact_lengths)
        if self.use_last_norm:
            h = nn.LayerNorm(name="last_norm")(h)
        else:
            h = dense(self.hidden_size, name="last_proj")(h)
        return h * nonpadding[:, :, None].astype(h.dtype)
