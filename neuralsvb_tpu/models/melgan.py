"""MelGAN generator/discriminator
(reference: modules/parallel_wavegan/models/melgan.py:18-427; carried by the
reference as an alternative vocoder / PWG upsample network).

Generator: 7x1 conv -> per-scale [leaky_relu, ConvTranspose up, 3 dilated
residual stacks] -> leaky_relu -> 7x1 conv -> tanh. Discriminator: multi-scale
stacks of grouped strided convs over average-pooled waveforms.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class ResidualStack(nn.Module):
    channels: int
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel_size - 1) // 2 * self.dilation
        h = nn.leaky_relu(x, 0.2)
        h = nn.Conv(self.channels, (self.kernel_size,),
                    kernel_dilation=(self.dilation,), padding=[(pad, pad)],
                    name="conv_dilated")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.channels, (1,), name="conv_1x1")(h)
        skip = nn.Conv(self.channels, (1,), name="skip")(x)
        return h + skip


class MelGANGenerator(nn.Module):
    in_channels: int = 80
    out_channels: int = 1
    channels: int = 512
    upsample_scales: Sequence[int] = (8, 8, 2, 2)
    stack_kernel_size: int = 3
    stacks: int = 3

    @nn.compact
    def __call__(self, c):
        """c: [B, T, in] -> wav [B, T * prod(scales)]."""
        x = nn.Conv(self.channels, (7,), padding=[(3, 3)], name="conv_pre")(c)
        ch = self.channels
        for i, scale in enumerate(self.upsample_scales):
            ch = ch // 2
            x = nn.leaky_relu(x, 0.2)
            x = nn.ConvTranspose(ch, (scale * 2,), strides=(scale,),
                                 padding="SAME", transpose_kernel=True,
                                 name=f"up_{i}")(x)
            for j in range(self.stacks):
                x = ResidualStack(ch, self.stack_kernel_size,
                                  self.stack_kernel_size ** j,
                                  name=f"stack_{i}_{j}")(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(self.out_channels, (7,), padding=[(3, 3)], name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


class MelGANDiscriminatorScale(nn.Module):
    @nn.compact
    def __call__(self, x):
        # x: [B, N] -> (score [B, T'], feature maps)
        h = x[:, :, None]
        fmaps = []
        specs = [(16, 15, 1, 1), (64, 41, 4, 4), (256, 41, 4, 16),
                 (1024, 41, 4, 64), (1024, 41, 4, 256), (1024, 5, 1, 1)]
        for i, (ch, k, s, g) in enumerate(specs):
            h = nn.Conv(ch, (k,), strides=(s,), feature_group_count=g,
                        padding=[(k // 2, k // 2)], name=f"conv_{i}")(h)
            h = nn.leaky_relu(h, 0.2)
            fmaps.append(h)
        out = nn.Conv(1, (3,), padding=[(1, 1)], name="conv_post")(h)
        fmaps.append(out)
        return out[..., 0], fmaps


class MelGANMultiScaleDiscriminator(nn.Module):
    scales: int = 3

    @nn.compact
    def __call__(self, x):
        outs = []
        for i in range(self.scales):
            if i > 0:
                x = nn.avg_pool(x[:, :, None], (4,), (2,), padding=[(1, 1)])[:, :, 0]
            outs.append(MelGANDiscriminatorScale(name=f"scale_{i}")(x))
        return outs
