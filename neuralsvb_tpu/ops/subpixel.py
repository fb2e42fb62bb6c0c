"""Polyphase (sub-pixel) transposed convolution for TPU.

XLA lowers ``conv_transpose`` through input dilation: the operand is
stretched with stride-1 zeros and convolved at full kernel width, so the
MXU multiplies the inserted zeros — ~stride x wasted FLOPs. For
``kernel_size % stride == 0`` the same map decomposes exactly into one
dense kernel-``k/stride`` convolution producing ``stride * C_out``
channels followed by a depth-to-space interleave:

    y[u*s + r] = sum_d x[u - d] * W[d*s + r]      (d = 0..k/s-1)

Measured on a v5e chip STANDALONE (T=2048, 512->256, k=16, s=8): 46.5 ms
-> 1.9 ms per call, bitwise-identical output (see tests/test_subpixel.py).
HONESTY NOTE: inside the full jitted HiFiGAN-NSF vocoder the polyphase
form LOSES (45.6 ms vs 36.8 ms device per 2048-frame call) — in context
XLA lowers conv_transpose through a fused path the depth-to-space
interleave breaks, so the production models keep nn.ConvTranspose. Use
this op when a transposed conv is isolated (not followed by fusable
elementwise/conv work) or when profiling shows the input-dilation
lowering on your toolchain.

``ConvTranspose1d`` is a drop-in for
``nn.ConvTranspose(features, (k,), strides=(s,), padding='SAME'|'VALID',
transpose_kernel=True)`` with the identical parameter tree (kernel
``[k, C_out, C_in]``, bias ``[C_out]``), so converted reference
checkpoints (convert/torch2jax.py convt1d_to_flax) load unchanged.
Reference anchor for the consumers: modules/hifigan/hifigan.py:118-125,
modules/parallel_wavegan/models/melgan.py:79-104.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
from jax import lax


def polyphase_conv_transpose(x, kernel, stride: int, padding: str = "SAME"):
    """x: [B, T, C_in]; kernel: [k, C_out, C_in] (flax transpose_kernel
    layout); k % stride == 0. SAME crops to T*stride ((k-s)//2 per side,
    matching torch padding=(k-s)//2 for even k-s); VALID returns the full
    (T-1)*stride + k samples."""
    k, c_out, c_in = kernel.shape
    s = stride
    m = k // s
    assert m * s == k, (k, s)
    w = kernel.reshape(m, s, c_out, c_in)[::-1]          # taps reversed
    w = jnp.transpose(w, (0, 3, 1, 2)).reshape(m, c_in, s * c_out)
    xp = jnp.pad(x, ((0, 0), (m - 1, m - 1), (0, 0)))
    y = lax.conv_general_dilated(
        xp, w, (1,), "VALID", dimension_numbers=("NHC", "HIO", "NHC"))
    b, t = x.shape[0], x.shape[1]
    y = y.reshape(b, t + m - 1, s, c_out).reshape(b, (t + m - 1) * s, c_out)
    if padding == "SAME":
        left = (k - s) // 2
        y = y[:, left: left + t * s]
    return y


class ConvTranspose1d(nn.Module):
    """Transposed 1-D conv; polyphase fast path when k % stride == 0,
    lax.conv_transpose otherwise. Parameter tree identical to
    nn.ConvTranspose(transpose_kernel=True)."""
    features: int
    kernel_size: int
    stride: int
    padding: str = "SAME"
    use_bias: bool = True
    param_dtype: Any = jnp.float32
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(in_axis=-1, out_axis=-2),
            (self.kernel_size, self.features, c_in), self.param_dtype)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), self.param_dtype)
                if self.use_bias else None)
        args = [x, kernel] + ([bias] if bias is not None else [])
        promoted = nn.dtypes.promote_dtype(*args, dtype=self.dtype)
        x, kernel = promoted[0], promoted[1]
        bias = promoted[2] if bias is not None else None
        if self.kernel_size % self.stride == 0:
            y = polyphase_conv_transpose(x, kernel, self.stride, self.padding)
        else:
            y = lax.conv_transpose(
                x, kernel, (self.stride,), self.padding,
                dimension_numbers=("NHC", "HIO", "NHC"),
                transpose_kernel=True)
        if bias is not None:
            y = y + bias
        return y
