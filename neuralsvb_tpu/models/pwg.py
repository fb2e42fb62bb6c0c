"""Parallel WaveGAN generator (noise + mel -> wav WaveNet) and discriminator.

Re-design of the reference PWG (reference:
modules/parallel_wavegan/models/parallel_wavegan.py:21-180,
layers/residual_block.py:39-130, layers/upsample.py:16-183) in [B, T, C]
layout. The aux-mel upsample network (nearest stretch + normalizing 2D convs)
and the 30-layer gated WaveNet compile to one XLA program.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .common import Embedding, dense


class UpsampleNetwork(nn.Module):
    """Per scale: nearest time-stretch then a (1, 2*scale+1) averaging conv
    over [B, T, C] treated as a 2D image [B, T, C, 1]."""
    upsample_scales: Sequence[int]
    freq_axis_kernel_size: int = 1

    @nn.compact
    def __call__(self, c):
        # c: [B, T, C] -> [B, T * prod(scales), C]
        x = c[..., None]  # [B, T, C, 1]
        for i, scale in enumerate(self.upsample_scales):
            x = jnp.repeat(x, scale, axis=1)
            fpad = (self.freq_axis_kernel_size - 1) // 2
            x = nn.Conv(1, (scale * 2 + 1, self.freq_axis_kernel_size),
                        padding=[(scale, scale), (fpad, fpad)], use_bias=False,
                        kernel_init=nn.initializers.constant(
                            1.0 / ((scale * 2 + 1) * self.freq_axis_kernel_size)),
                        name=f"conv_{i}")(x)
        return x[..., 0]


class ConvInUpsampleNetwork(nn.Module):
    upsample_scales: Sequence[int]
    aux_channels: int = 80
    aux_context_window: int = 2

    @nn.compact
    def __call__(self, c):
        k = 2 * self.aux_context_window + 1
        c = nn.Conv(self.aux_channels, (k,), padding="VALID", use_bias=False,
                    name="conv_in")(c)
        return UpsampleNetwork(self.upsample_scales, name="upsample")(c)


class PWGResidualBlock(nn.Module):
    kernel_size: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    dilation: int = 1

    @nn.compact
    def __call__(self, x, c):
        residual = x
        pad = (self.kernel_size - 1) // 2 * self.dilation
        h = nn.Conv(self.gate_channels, (self.kernel_size,),
                    kernel_dilation=(self.dilation,), padding=[(pad, pad)],
                    name="conv")(x)
        xa, xb = jnp.split(h, 2, axis=-1)
        if c is not None:
            hc = nn.Conv(self.gate_channels, (1,), use_bias=False,
                         name="conv1x1_aux")(c)
            ca, cb = jnp.split(hc, 2, axis=-1)
            xa, xb = xa + ca, xb + cb
        h = jnp.tanh(xa) * nn.sigmoid(xb)
        s = nn.Conv(self.skip_channels, (1,), name="conv1x1_skip")(h)
        x = (nn.Conv(self.residual_channels, (1,), name="conv1x1_out")(h)
             + residual) * math.sqrt(0.5)
        return x, s


class ParallelWaveGANGenerator(nn.Module):
    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    layers: int = 30
    stacks: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    aux_context_window: int = 2
    upsample_scales: Sequence[int] = (4, 4, 4, 4)
    use_pitch_embed: bool = False

    @nn.compact
    def __call__(self, x, c=None, pitch=None):
        """x: noise [B, T_wav, 1]; c: mel [B, T' + 2*ctx, aux]; pitch: [B, T'].
        Returns wav [B, T_wav]."""
        if c is not None:
            if self.use_pitch_embed and pitch is not None:
                p = Embedding(300, self.aux_channels, 0, name="pitch_embed")(pitch)
                ctx = self.aux_context_window
                c_core = c[:, ctx: c.shape[1] - ctx] if ctx > 0 else c
                fused = dense(self.aux_channels, name="c_proj")(
                    jnp.concatenate([c_core, p], -1))
                c = jnp.pad(fused, ((0, 0), (ctx, ctx), (0, 0)), mode="edge") \
                    if ctx > 0 else fused
            c = ConvInUpsampleNetwork(self.upsample_scales, self.aux_channels,
                                      self.aux_context_window,
                                      name="upsample_net")(c)
        h = nn.Conv(self.residual_channels, (1,), name="first_conv")(x)
        layers_per_stack = self.layers // self.stacks
        skips = 0.0
        for layer in range(self.layers):
            dilation = 2 ** (layer % layers_per_stack)
            h, s = PWGResidualBlock(
                self.kernel_size, self.residual_channels, self.gate_channels,
                self.skip_channels, self.aux_channels, dilation,
                name=f"block_{layer}")(h, c)
            skips = skips + s
        skips = skips * math.sqrt(1.0 / self.layers)
        out = nn.relu(skips)
        out = nn.Conv(self.skip_channels, (1,), name="last_conv_0")(out)
        out = nn.relu(out)
        out = nn.Conv(self.out_channels, (1,), name="last_conv_1")(out)
        return out[..., 0]


class ParallelWaveGANDiscriminator(nn.Module):
    """Non-causal dilated conv stack discriminator
    (reference: parallel_wavegan.py:183-260)."""
    layers: int = 10
    conv_channels: int = 64
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        # x: [B, T] -> [B, T, 1]
        h = x[:, :, None]
        for i in range(self.layers - 1):
            dilation = i if i > 0 else 1
            pad = (self.kernel_size - 1) // 2 * dilation
            h = nn.Conv(self.conv_channels, (self.kernel_size,),
                        kernel_dilation=(dilation,), padding=[(pad, pad)],
                        name=f"conv_{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        pad = (self.kernel_size - 1) // 2
        h = nn.Conv(1, (self.kernel_size,), padding=[(pad, pad)],
                    name="conv_out")(h)
        return h[..., 0]
