"""MelGAN generator/discriminator
(reference: modules/parallel_wavegan/models/melgan.py:18-427; carried by the
reference as an alternative vocoder / PWG upsample network).

Generator: 7x1 conv -> per-scale [leaky_relu, ConvTranspose up, 3 dilated
residual stacks] -> leaky_relu -> 7x1 conv -> tanh. Discriminator: multi-scale
stacks of grouped strided convs over average-pooled waveforms.

Padding follows the reference defaults: ReflectionPad1d around the
non-strided generator convs (melgan.py:71,126 pad="ReflectionPad1d"), zero
padding inside the strided discriminator convs. ``use_causal_conv=True``
selects the streaming variant (left-only padding; transposed convs computed
VALID and trimmed by one stride at the tail — layers/causal_conv.py:12-56,
layers/residual_stack.py:53-60).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import lax


def _pad1d(x, left, right, mode):
    """Pad the time axis of [B, T, C]."""
    if left == 0 and right == 0:
        return x
    return jnp.pad(x, ((0, 0), (left, right), (0, 0)),
                   mode="reflect" if mode == "reflect" else "constant")


class ResidualStack(nn.Module):
    """reference: modules/parallel_wavegan/layers/residual_stack.py:13-75."""
    channels: int
    kernel_size: int = 3
    dilation: int = 1
    pad_mode: str = "reflect"
    use_causal_conv: bool = False

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel_size - 1) * self.dilation
        h = nn.leaky_relu(x, 0.2)
        h = (_pad1d(h, pad, 0, self.pad_mode) if self.use_causal_conv
             else _pad1d(h, pad // 2, pad // 2, self.pad_mode))
        h = nn.Conv(self.channels, (self.kernel_size,),
                    kernel_dilation=(self.dilation,), padding="VALID",
                    name="conv_dilated")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.channels, (1,), name="conv_1x1")(h)
        skip = nn.Conv(self.channels, (1,), name="skip")(x)
        return h + skip


class MelGANGenerator(nn.Module):
    """reference: modules/parallel_wavegan/models/melgan.py:18-158."""
    in_channels: int = 80
    out_channels: int = 1
    channels: int = 512
    kernel_size: int = 7
    upsample_scales: Sequence[int] = (8, 8, 2, 2)
    stack_kernel_size: int = 3
    stacks: int = 3
    pad_mode: str = "reflect"
    use_causal_conv: bool = False

    @nn.compact
    def __call__(self, c):
        """c: [B, T, in] -> wav [B, T * prod(scales)]."""
        k = self.kernel_size
        x = (_pad1d(c, k - 1, 0, self.pad_mode) if self.use_causal_conv
             else _pad1d(c, (k - 1) // 2, (k - 1) // 2, self.pad_mode))
        x = nn.Conv(self.channels, (k,), padding="VALID", name="conv_pre")(x)
        ch = self.channels
        for i, scale in enumerate(self.upsample_scales):
            ch = ch // 2
            x = nn.leaky_relu(x, 0.2)
            if self.use_causal_conv:
                # CausalConvTranspose1d: VALID deconv -> (T-1)*s + 2s
                # samples, trim the trailing stride (causal_conv.py:56)
                t_in = x.shape[1]
                x = nn.ConvTranspose(ch, (scale * 2,), strides=(scale,),
                                     padding="VALID", transpose_kernel=True,
                                     name=f"up_{i}")(x)
                x = x[:, :t_in * scale]
            else:
                # torch: padding=s//2+s%2, output_padding=s%2 -> T*s out,
                # i.e. crop s//2+s%2 left / s//2 right off the VALID deconv.
                # flax SAME puts the extra crop on the RIGHT for odd s
                # (one-sample shift vs torch), so slice explicitly — exact
                # for both parities.
                t_in = x.shape[1]
                lo = scale // 2 + scale % 2
                x = nn.ConvTranspose(ch, (scale * 2,), strides=(scale,),
                                     padding="VALID", transpose_kernel=True,
                                     name=f"up_{i}")(x)
                x = x[:, lo:lo + t_in * scale]
            for j in range(self.stacks):
                x = ResidualStack(ch, self.stack_kernel_size,
                                  self.stack_kernel_size ** j,
                                  pad_mode=self.pad_mode,
                                  use_causal_conv=self.use_causal_conv,
                                  name=f"stack_{i}_{j}")(x)
        x = nn.leaky_relu(x, 0.2)
        x = (_pad1d(x, k - 1, 0, self.pad_mode) if self.use_causal_conv
             else _pad1d(x, (k - 1) // 2, (k - 1) // 2, self.pad_mode))
        x = nn.Conv(self.out_channels, (k,), padding="VALID",
                    name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


def melgan_stream(model: "MelGANGenerator", variables, mel, chunk: int = 32,
                  context: int = 64):
    """Chunked streaming inference with a causal generator.

    Re-runs the generator on [context + chunk] mel frames per step and
    emits only the new tail; with ``use_causal_conv=True`` outputs depend
    only on past frames, so chunked == full-utterance output exactly once
    ``context`` covers the receptive field (conv_pre k-1, plus each
    scale's deconv + dilated stacks divided by the cumulative upsample —
    ~a dozen frames at the shipped dims). Per-chunk latency is one
    [context+chunk]-frame forward instead of the whole utterance.

    mel: [B, T, in] -> wav [B, T * prod(upsample_scales)].
    """
    assert model.use_causal_conv, "streaming needs use_causal_conv=True"
    s = 1
    for sc in model.upsample_scales:
        s *= sc
    t_total = mel.shape[1]
    outs = []
    for t0 in range(0, t_total, chunk):
        lo = max(0, t0 - context)
        y = model.apply(variables, mel[:, lo: t0 + chunk])
        outs.append(y[:, (t0 - lo) * s:])
    return jnp.concatenate(outs, axis=1)


class MelGANDiscriminatorScale(nn.Module):
    """reference: modules/parallel_wavegan/models/melgan.py:194-300.
    First conv reflection-pads (k=15); strided grouped convs zero-pad."""
    pad_mode: str = "reflect"

    @nn.compact
    def __call__(self, x):
        # x: [B, N] -> (score [B, T'], feature maps)
        h = _pad1d(x[:, :, None], 7, 7, self.pad_mode)
        fmaps = []
        specs = [(16, 15, 1, 1, "VALID"), (64, 41, 4, 4, 20),
                 (256, 41, 4, 16, 20), (1024, 41, 4, 64, 20),
                 (1024, 41, 4, 256, 20), (1024, 5, 1, 1, 2)]
        for i, (ch, k, s, g, p) in enumerate(specs):
            h = nn.Conv(ch, (k,), strides=(s,), feature_group_count=g,
                        padding=p if p == "VALID" else [(p, p)],
                        name=f"conv_{i}")(h)
            h = nn.leaky_relu(h, 0.2)
            fmaps.append(h)
        out = nn.Conv(1, (3,), padding=[(1, 1)], name="conv_post")(h)
        fmaps.append(out)
        return out[..., 0], fmaps


def _avg_pool_no_pad(x, window=4, stride=2, pad=1):
    """AvgPool1d(count_include_pad=False): edge windows divide by the
    number of real samples (melgan.py:311-317 official pooling params)."""
    dims, strides = (1, window, 1), (1, stride, 1)
    padding = [(0, 0), (pad, pad), (0, 0)]
    s = lax.reduce_window(x, 0.0, lax.add, dims, strides, padding)
    n = lax.reduce_window(jnp.ones_like(x), 0.0, lax.add, dims, strides,
                          padding)
    return s / n


class MelGANMultiScaleDiscriminator(nn.Module):
    """reference: modules/parallel_wavegan/models/melgan.py:303-394."""
    scales: int = 3
    pad_mode: str = "reflect"

    @nn.compact
    def __call__(self, x):
        outs = []
        for i in range(self.scales):
            if i > 0:
                x = _avg_pool_no_pad(x[:, :, None])[:, :, 0]
            outs.append(MelGANDiscriminatorScale(
                pad_mode=self.pad_mode, name=f"scale_{i}")(x))
        return outs
