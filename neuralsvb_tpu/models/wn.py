"""WaveNet-style gated dilated conv stack (WN).

Re-design of the reference WN (reference: modules/fastspeech/fs2_vae.py:19-100)
in [B, T, C] layout. The per-layer gated activation tanh(a) * sigmoid(b) is a
single fused elementwise op for XLA; the conditioning projection for all
layers is one conv (as in the reference) so the conditioning matmul hits the
MXU once.

Weight norm is intentionally dropped (plain convs): it only reparameterizes
the optimization geometry and the reference removes it at inference anyway
(fs2_vae.py:94-100).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class WN(nn.Module):
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    p_dropout: float = 0.0
    share_cond_layers: bool = False

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, train: bool = False):
        """x: [B, T, C]; x_mask: [B, T, 1] or None; g: [B, T, gin]."""
        C = self.hidden_channels
        assert self.kernel_size % 2 == 1 and C % 2 == 0
        if x_mask is None:
            x_mask = jnp.ones_like(x[..., :1])

        if g is not None and not self.share_cond_layers:
            g = nn.Conv(2 * C * self.n_layers, (1,), name="cond_layer")(g)

        output = jnp.zeros_like(x)
        for i in range(self.n_layers):
            dilation = self.dilation_rate ** i
            pad = (self.kernel_size * dilation - dilation) // 2
            x_in = nn.Conv(2 * C, (self.kernel_size,), kernel_dilation=(dilation,),
                           padding=[(pad, pad)], name=f"in_layer_{i}")(x)
            x_in = nn.Dropout(self.p_dropout)(x_in, deterministic=not train)
            if g is not None:
                g_l = g[..., i * 2 * C:(i + 1) * 2 * C]
            else:
                g_l = jnp.zeros_like(x_in)
            acts_in = x_in + g_l
            acts = jnp.tanh(acts_in[..., :C]) * nn.sigmoid(acts_in[..., C:])
            res_skip_channels = 2 * C if i < self.n_layers - 1 else C
            res_skip = nn.Conv(res_skip_channels, (1,), name=f"res_skip_{i}")(acts)
            if i < self.n_layers - 1:
                x = (x + res_skip[..., :C]) * x_mask
                output = output + res_skip[..., C:]
            else:
                output = output + res_skip
        return output * x_mask
