"""HiFiGAN generator with NSF sine excitation, plus the multi-period /
multi-scale discriminators and GAN losses for vocoder training.

Re-design of the reference vocoder (reference: modules/hifigan/hifigan.py):
conv_pre -> N x (leaky_relu -> ConvTranspose up -> + NSF source via strided
noise_conv -> multi-kernel ResBlocks averaged) -> leaky_relu -> conv_post ->
tanh. Layout [B, T, C]; waveform output [B, T*hop].

The entire mel->wav program is one jitted XLA computation — the RTF
north-star path (BASELINE.md). Weight norm is folded into plain convs
(the reference removes it at inference, hifigan.py:29).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .nsf import SourceModuleHnNSF

LRELU_SLOPE = 0.1


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


class ResBlock1(nn.Module):
    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3, 5)

    @nn.compact
    def __call__(self, x):
        for j, d in enumerate(self.dilation):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            p = get_padding(self.kernel_size, d)
            xt = nn.Conv(self.channels, (self.kernel_size,), kernel_dilation=(d,),
                         padding=[(p, p)], name=f"conv1_{j}")(xt)
            xt = nn.leaky_relu(xt, LRELU_SLOPE)
            p = get_padding(self.kernel_size, 1)
            xt = nn.Conv(self.channels, (self.kernel_size,),
                         padding=[(p, p)], name=f"conv2_{j}")(xt)
            x = xt + x
        return x


class ResBlock2(nn.Module):
    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3)

    @nn.compact
    def __call__(self, x):
        for j, d in enumerate(self.dilation):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            p = get_padding(self.kernel_size, d)
            xt = nn.Conv(self.channels, (self.kernel_size,), kernel_dilation=(d,),
                         padding=[(p, p)], name=f"conv_{j}")(xt)
            x = xt + x
        return x


class HifiGanGenerator(nn.Module):
    """Config keys follow the reference yaml (upsample_rates, etc.).

    ``fuse_resblocks``: "auto" runs each upsample stage's 3-tower ResBlock
    cluster as one Pallas kernel on TPU (ops/fused_resblock.py) — one HBM
    round-trip instead of 18 conv-sized ones; "on"/"off" force it (tests use
    "on" with the CPU interpreter). Init always traces the unfused towers so
    the param tree (and torch-ckpt converter) is identical either way.
    """
    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock: str = "1"
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    use_pitch_embed: bool = True
    audio_sample_rate: int = 22050
    num_mels: int = 80
    harmonic_num: int = 8
    c_out: int = 1
    fuse_resblocks: str = "auto"

    @nn.compact
    def __call__(self, mel, f0=None):
        """mel: [B, T, num_mels]; f0: [B, T] Hz (0 = unvoiced) -> wav [B, T*hop]."""
        num_kernels = len(self.resblock_kernel_sizes)
        hop = int(np.prod(self.upsample_rates))
        har_source = None
        if self.use_pitch_embed and f0 is not None:
            # The sine source accumulates phase over T*hop samples — that
            # cumsum NEEDS f32 (bf16 phase drifts audibly within a second).
            # But everything DOWNSTREAM of the source is plain convs, so the
            # result is cast to the compute dtype (mel's dtype): without
            # this, a bf16 run silently promotes back to f32 at the first
            # `x + noise_conv(har_source)` and the whole upsample/resblock
            # chain runs f32 — the knob would be a silent no-op. (Measured
            # on v5e: even with the cast, explicit bf16 is ~10% slower than
            # f32 here because XLA's f32 conv lowering already stores bf16
            # tiles; the cast keeps the dtype contract honest, not fast.)
            f0_up = jnp.repeat(f0.astype(jnp.float32)[:, :, None], hop,
                               axis=1)  # nearest x hop
            har_source, _, _ = SourceModuleHnNSF(
                self.audio_sample_rate, self.harmonic_num,
                name="m_source")(f0_up)  # [B, T*hop, 1]
            har_source = har_source.astype(mel.dtype)

        x = nn.Conv(self.upsample_initial_channel, (7,), padding=[(3, 3)],
                    name="conv_pre")(mel)
        res_cls = ResBlock1 if self.resblock == "1" else ResBlock2
        fuse = (self.fuse_resblocks == "on"
                or (self.fuse_resblocks == "auto"
                    and jax.default_backend() == "tpu"))
        # The fused kernel reads tower params directly, so they must already
        # exist — init (and ResBlock2 configs) take the unfused path.
        fuse = fuse and self.resblock == "1" and not self.is_initializing()
        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            c_cur = self.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, LRELU_SLOPE)
            # SAME + transpose_kernel matches torch ConvTranspose1d with
            # padding=(k-u)//2 for even k-u (tests/test_vocoders.py).
            # NOT the polyphase form (ops/subpixel.py): measured in the
            # full jitted vocoder, XLA's own conv_transpose lowering wins
            # (36.8 ms vs 45.6 ms device per 2048-frame call)
            x = nn.ConvTranspose(c_cur, (k,), strides=(u,), padding="SAME",
                                 transpose_kernel=True, name=f"up_{i}")(x)
            if har_source is not None:
                if i + 1 < len(self.upsample_rates):
                    stride_f0 = int(np.prod(self.upsample_rates[i + 1:]))
                    xs_src = nn.Conv(c_cur, (stride_f0 * 2,), strides=(stride_f0,),
                                     padding=[(stride_f0 // 2, stride_f0 // 2)],
                                     name=f"noise_conv_{i}")(har_source)
                else:
                    xs_src = nn.Conv(c_cur, (1,), name=f"noise_conv_{i}")(har_source)
                x = x + xs_src[:, : x.shape[1]]
            if fuse:
                from ..ops.fused_resblock import fused_resblock_cluster
                mm = jnp.bfloat16 if x.dtype == jnp.bfloat16 else (
                    jnp.bfloat16 if jax.default_backend() == "tpu"
                    else jnp.float32)
                p = self.variables["params"]
                towers = [p[f"resblock_{i}_{j}"]
                          for j in range(num_kernels)]
                x = fused_resblock_cluster(
                    x, towers, self.resblock_kernel_sizes,
                    self.resblock_dilation_sizes, mm_dtype=mm)
            else:
                xs = None
                for j, (rk, rd) in enumerate(zip(self.resblock_kernel_sizes,
                                                 self.resblock_dilation_sizes)):
                    rb = res_cls(c_cur, rk, tuple(rd),
                                 name=f"resblock_{i}_{j}")(x)
                    xs = rb if xs is None else xs + rb
                x = xs / num_kernels
        x = nn.leaky_relu(x)
        x = nn.Conv(self.c_out, (7,), padding=[(3, 3)], name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


# ---------------------------------------------------------------------------
# discriminators (vocoder training)
# ---------------------------------------------------------------------------

class DiscriminatorP(nn.Module):
    """Period discriminator: fold wav into [T/p, p] and run 2D convs
    (reference: hifigan.py:182-224)."""
    period: int
    kernel_size: int = 5
    stride: int = 3

    @nn.compact
    def __call__(self, x):
        # x: [B, T]
        B, T = x.shape
        n_pad = (self.period - T % self.period) % self.period
        if n_pad:
            x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
        T = x.shape[1]
        x = x.reshape(B, T // self.period, self.period, 1)
        fmap = []
        chans = [32, 128, 512, 1024]
        for i, ch in enumerate(chans):
            x = nn.Conv(ch, (self.kernel_size, 1), strides=(self.stride, 1),
                        padding=[(get_padding(5, 1),) * 2, (0, 0)], name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = nn.Conv(1024, (self.kernel_size, 1), padding=[(2, 2), (0, 0)],
                    name="conv_4")(x)
        x = nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
        x = nn.Conv(1, (3, 1), padding=[(1, 1), (0, 0)], name="conv_post")(x)
        fmap.append(x)
        return x.reshape(B, -1), fmap


class DiscriminatorS(nn.Module):
    """Scale discriminator: grouped 1D convs (reference: hifigan.py:255-287)."""

    @nn.compact
    def __call__(self, x):
        # x: [B, T] -> [B, T, 1]
        h = x[:, :, None]
        fmap = []
        specs = [(128, 15, 1, 1), (128, 41, 2, 4), (256, 41, 2, 16),
                 (512, 41, 4, 16), (1024, 41, 4, 16), (1024, 41, 1, 16),
                 (1024, 5, 1, 1)]
        for i, (ch, k, s, g) in enumerate(specs):
            h = nn.Conv(ch, (k,), strides=(s,), feature_group_count=g,
                        padding=[(k // 2, k // 2)], name=f"conv_{i}")(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            fmap.append(h)
        h = nn.Conv(1, (3,), padding=[(1, 1)], name="conv_post")(h)
        fmap.append(h)
        return h.reshape(x.shape[0], -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, y, y_hat):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for p in self.periods:
            d = DiscriminatorP(p, name=f"disc_p{p}")
            r, fr = d(y)
            g, fg = d(y_hat)
            y_d_rs.append(r); fmap_rs.append(fr)
            y_d_gs.append(g); fmap_gs.append(fg)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class MultiScaleDiscriminator(nn.Module):
    @nn.compact
    def __call__(self, y, y_hat):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i in range(3):
            if i != 0:
                y = nn.avg_pool(y[:, :, None], (4,), (2,), padding=[(1, 1)])[:, :, 0]
                y_hat = nn.avg_pool(y_hat[:, :, None], (4,), (2,), padding=[(1, 1)])[:, :, 0]
            d = DiscriminatorS(name=f"disc_s{i}")
            r, fr = d(y)
            g, fg = d(y_hat)
            y_d_rs.append(r); fmap_rs.append(fr)
            y_d_gs.append(g); fmap_gs.append(fg)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


def feature_loss(fmap_r, fmap_g):
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(jnp.abs(rl - gl))
    return loss * 2


def discriminator_loss(disc_real_outputs, disc_generated_outputs):
    r_losses = sum(jnp.mean((1 - dr) ** 2) for dr in disc_real_outputs)
    g_losses = sum(jnp.mean(dg ** 2) for dg in disc_generated_outputs)
    n = len(disc_real_outputs)
    return r_losses / n, g_losses / n


def generator_loss(disc_outputs):
    return sum(jnp.mean((1 - dg) ** 2) for dg in disc_outputs) / len(disc_outputs)
