"""Glow-style residual coupling flows (optional FVAE prior,
``use_prior_glow``; off in shipped SVB configs).

Re-design of the reference modules (reference:
modules/glow/glow_tts_modules.py:145-234): N x (mean-only affine coupling
over a WN stack + channel flip). Layout [B, T, C]; masks [B, T, 1].
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .wn import WN


class ResidualCouplingLayer(nn.Module):
    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    mean_only: bool = True

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False, train: bool = False):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = nn.Conv(self.hidden_channels, (1,), name="pre")(x0) * x_mask
        h = WN(self.hidden_channels, self.kernel_size, self.dilation_rate,
               self.n_layers, self.gin_channels, name="enc")(h, x_mask, g,
                                                             train=train)
        out_ch = half * (1 if self.mean_only else 2)
        stats = nn.Conv(out_ch, (1,), kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros, name="post")(h) * x_mask
        if self.mean_only:
            m, logs = stats, jnp.zeros_like(stats)
        else:
            m, logs = jnp.split(stats, 2, axis=-1)
        if not reverse:
            x1 = m + x1 * jnp.exp(logs) * x_mask
            logdet = logs.sum((1, 2))
        else:
            x1 = (x1 - m) * jnp.exp(-logs) * x_mask
            logdet = -logs.sum((1, 2))
        return jnp.concatenate([x0, x1], -1), logdet


class ResidualCouplingBlock(nn.Module):
    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    n_flows: int = 4
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False,
                 train: bool = False):
        layers = [ResidualCouplingLayer(
            self.channels, self.hidden_channels, self.kernel_size,
            self.dilation_rate, self.n_layers, self.gin_channels,
            mean_only=True, name=f"flow_{i}") for i in range(self.n_flows)]
        total_logdet = jnp.zeros(x.shape[0])
        order = range(self.n_flows) if not reverse else reversed(range(self.n_flows))
        for i in order:
            if reverse:
                x = jnp.flip(x, -1)  # undo the flip first
                x, ld = layers[i](x, x_mask, g=g, reverse=True, train=train)
            else:
                x, ld = layers[i](x, x_mask, g=g, reverse=False, train=train)
                x = jnp.flip(x, -1)
            total_logdet = total_logdet + ld
        return x, total_logdet
