"""Frame-level and global conditional VAEs over mel-spectrograms, plus the
amateur->professional latent mapping functions.

Re-design of the reference FVAE stack (reference:
modules/fastspeech/fs2_vae.py:103-237, modules/voice_conversion/vae_models.py)
in [B, T, C] layout with explicit PRNG plumbing for the reparameterization
noise (rng collection ``'noise'``).

Conventions: latents are [B, Tz, L] (time-major like everything else; the
reference keeps [B, L, Tz]); global latents have Tz == 1.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .common import BatchNorm1d
from .wn import WN


def gaussian_kl(m_q, logs_q, m_p=0.0, logs_p=0.0):
    """KL(N(m_q, e^logs_q) || N(m_p, e^logs_p)), elementwise."""
    return (logs_p - logs_q
            + (jnp.exp(2 * logs_q) + (m_q - m_p) ** 2) / (2 * jnp.exp(2 * logs_p))
            - 0.5)


def normal_log_prob(x, mean, logs):
    """log N(x; mean, e^logs), elementwise."""
    var = jnp.exp(2 * logs)
    return -0.5 * (jnp.log(2 * jnp.pi) + 2 * logs + (x - mean) ** 2 / var)


class FVAEEncoder(nn.Module):
    """Strided conv pre-net -> WN -> latent out-proj; frame-level posterior
    (reference: fs2_vae.py:103-127)."""
    hidden_channels: int
    latent_channels: int
    kernel_size: int
    n_layers: int
    gin_channels: int = 0
    strides: Sequence[int] = (4,)
    remat: bool = False

    def project(self, x, x_mask, g, train):
        for i, s in enumerate(self.strides):
            x = nn.Conv(self.hidden_channels, (2 * s,), strides=(s,),
                        padding=[(s // 2, s // 2)], name=f"pre_{i}")(x)
        stride_total = int(np.prod(self.strides))
        x_mask = x_mask[:, ::stride_total][:, : x.shape[1]]
        x = x * x_mask
        wn_cls = nn.remat(WN, static_argnums=(4,)) if self.remat else WN
        x = wn_cls(self.hidden_channels, self.kernel_size, 1, self.n_layers,
                   self.gin_channels, name="wn")(x, x_mask, g, train) * x_mask
        x = nn.Conv(self.latent_channels * 2, (1,), name="out_proj")(x)
        return x, x_mask

    @nn.compact
    def __call__(self, x, x_mask, g, train: bool = False):
        x, x_mask = self.project(x, x_mask, g, train)
        m, logs = jnp.split(x, 2, axis=-1)
        eps = jax.random.normal(self.make_rng("noise"), m.shape, m.dtype)
        z = m + eps * jnp.exp(logs)
        return z, m, logs, x_mask


class GlobalFVAEEncoder(FVAEEncoder):
    """Adds 3 stride-2 conv poolings + temporal mean -> single global latent
    [B, 1, latent] (reference: vae_models.py:81-105)."""

    @nn.compact
    def __call__(self, x, x_mask, g, train: bool = False):
        x, x_mask = self.project(x, x_mask, g, train)
        # project()'s final out_proj is a biased 1x1 conv over masked input,
        # so padded positions hold the BIAS, not zero — mask them out so a
        # clip with < 15 valid pooled frames inside a longer-padded batch
        # sees the same zeros the unpadded bs=1 run gets from jnp.pad below
        h = x * x_mask
        # three stride-2 VALID poolings need >= 15 input frames or the
        # output collapses to length 0 (NaN mean); right-pad short clips
        if h.shape[1] < 15:
            h = jnp.pad(h, ((0, 0), (0, 15 - h.shape[1]), (0, 0)))
        # reference-exact lengths under padding: an unpadded (bs=1) run
        # pools L0 valid frames through three VALID stride-2 convs, so its
        # mean covers exactly L3 positions. VALID windows p < L_i read only
        # positions < L_{i-1}, which our zero-padded run computes
        # identically — restricting the mean to the first L3 positions (and
        # dividing by L3, not the padded length) makes the global latent
        # padding-invariant (reference: vae_models.py:96-105 never pads)
        n_valid = jnp.maximum(
            x_mask.sum(axis=(1, 2)).astype(jnp.int32), 15)
        L = n_valid
        for i in range(3):
            h = nn.Conv(self.latent_channels * 2, (3,), strides=(2,),
                        padding="VALID", name=f"pool_{i}")(h)
            if i < 2:
                h = nn.relu(h)
                h = BatchNorm1d(name=f"pool_bn_{i}")(h, train=train)
            L = (L - 3) // 2 + 1
        wmask = (jnp.arange(h.shape[1])[None, :] < L[:, None])
        wmask = wmask[:, :, None].astype(h.dtype)
        h = (h * wmask).sum(1, keepdims=True) \
            / jnp.maximum(L, 1)[:, None, None].astype(h.dtype)  # [B, 1, 2L]
        m, logs = jnp.split(h, 2, axis=-1)
        eps = jax.random.normal(self.make_rng("noise"), m.shape, m.dtype)
        z = m + eps * jnp.exp(logs)
        return z, m, logs, x_mask


class FVAEDecoder(nn.Module):
    """ConvTranspose pre-net -> WN -> out proj (reference: fs2_vae.py:130-151)."""
    hidden_channels: int
    out_channels: int
    kernel_size: int
    n_layers: int
    gin_channels: int = 0
    strides: Sequence[int] = (4,)
    repeat_global: bool = False  # GlobalFVAEDecoder: tile z to T//4 first
    remat: bool = False

    @nn.compact
    def __call__(self, z, x_mask, g, train: bool = False):
        x = z
        if self.repeat_global:
            # z: [B, 1, L] -> [B, T//stride, L] (reference: vae_models.py:124-127)
            stride_total = int(np.prod(self.strides))
            x = jnp.repeat(x, g.shape[1] // stride_total, axis=1)
        for i, s in enumerate(self.strides):
            x = nn.ConvTranspose(self.hidden_channels, (s,), strides=(s,),
                                 padding="VALID", transpose_kernel=True,
                                 name=f"pre_{i}")(x)
        x = x * x_mask
        wn_cls = nn.remat(WN, static_argnums=(4,)) if self.remat else WN
        x = wn_cls(self.hidden_channels, self.kernel_size, 1, self.n_layers,
                   self.gin_channels, name="wn")(x, x_mask, g, train) * x_mask
        return nn.Conv(self.out_channels, (1,), name="out_proj")(x)


class FVAE(nn.Module):
    """Conditional VAE; ``global_latent`` selects the Global variant
    (TMPFVAE/GlobalFVAE in the reference, vae_models.py:11-48,133-150)."""
    in_out_channels: int
    hidden_channels: int
    latent_size: int
    kernel_size: int
    enc_n_layers: int
    dec_n_layers: int
    gin_channels: int
    strides: Sequence[int] = (4,)
    global_latent: bool = False
    use_prior_glow: bool = False
    remat: bool = False  # jax.checkpoint the WN stacks (memory for FLOPs)
    glow_hidden: Optional[int] = None
    glow_kernel_size: Optional[int] = None
    glow_n_blocks: Optional[int] = None

    def setup(self):
        convs = []
        for i, s in enumerate(self.strides):
            convs.append(nn.Conv(self.gin_channels, (2 * s,), strides=(s,),
                                 padding=[(s // 2, s // 2)],
                                 name=f"g_pre_{i}"))
        self.g_pre_net = convs
        enc_cls = GlobalFVAEEncoder if self.global_latent else FVAEEncoder
        self.encoder = enc_cls(self.hidden_channels, self.latent_size,
                               self.kernel_size, self.enc_n_layers,
                               self.gin_channels, self.strides,
                               remat=self.remat)
        self.decoder = FVAEDecoder(self.hidden_channels, self.in_out_channels,
                                   self.kernel_size, self.dec_n_layers,
                                   self.gin_channels, self.strides,
                                   repeat_global=self.global_latent,
                                   remat=self.remat)
        if self.use_prior_glow:
            from .glow import ResidualCouplingBlock
            self.prior_flow = ResidualCouplingBlock(
                self.latent_size, self.glow_hidden, self.glow_kernel_size, 1,
                self.glow_n_blocks, 4, gin_channels=self.gin_channels)

    def _squeeze_g(self, g):
        for conv in self.g_pre_net:
            g = conv(g)
        return g

    def __call__(self, x=None, x_mask=None, g=None, prior_mean=0.0, infer: bool = False,
                 train: bool = False):
        """x: [B, T, C]; x_mask: [B, T, 1]; g: [B, T, gin].

        Train: returns (x_recon, loss_kl, z_p, m_q, logs_q, x_mask_sqz, z_q).
        Infer: returns (x_recon, z_p) with z sampled from the prior.
        """
        stride_total = int(np.prod(self.strides))
        if x is not None:
            assert x.shape[1] % stride_total == 0, (
                f"FVAE input frames ({x.shape[1]}) must be a multiple of the "
                f"latent stride ({stride_total} = prod(frames_multiple)); pad "
                f"via frames_multiple / collate_bucket_quant, do not change "
                f"frames_multiple to control padding")
        g_sqz = self._squeeze_g(g)
        if not infer:
            z_q, m_q, logs_q, x_mask_sqz = self.encoder(x, x_mask, g_sqz, train=train)
            x_recon = self.decoder(z_q, x_mask, g, train=train)
            # guard against non-positive posterior scales (vae_models.py:24-30)
            logs_q = jnp.where(jnp.isfinite(jnp.exp(logs_q)) & (jnp.exp(logs_q) > 0),
                               logs_q, 0.0)
            if self.use_prior_glow:
                logqx = normal_log_prob(z_q, m_q, logs_q)
                z_p, _ = self.prior_flow(z_q, x_mask_sqz, g_sqz)
                logpx = normal_log_prob(z_p, prior_mean, 0.0)
                kl_elem = logqx - logpx
            else:
                kl_elem = gaussian_kl(m_q, logs_q, prior_mean, 0.0)
                z_p = None
            # for the global variant kl_elem [B,1,L] broadcasts against the
            # frame mask [B,T',1], reproducing the reference's length-weighted
            # batch mean (TMPFVAE.forward inherited by GlobalFVAE)
            loss_kl = (kl_elem * x_mask_sqz).sum() / x_mask_sqz.sum() / kl_elem.shape[-1]
            return x_recon, loss_kl, z_p, m_q, logs_q, x_mask_sqz, z_q
        else:
            B = g.shape[0]
            Tz = 1 if self.global_latent else g_sqz.shape[1]
            z_p = prior_mean + jax.random.normal(
                self.make_rng("noise"), (B, Tz, self.latent_size))
            if self.use_prior_glow:
                z_p, _ = self.prior_flow(z_p, jnp.ones_like(z_p[..., :1]), g_sqz,
                                         reverse=True)
            x_mask_full = jnp.ones_like(g[..., :1]) if x_mask is None else x_mask
            x_recon = self.decoder(z_p, x_mask_full, g, train=train)
            return x_recon, z_p


class LatentMap(nn.Module):
    """Frame-level latent mapping: 3x conv(k3)+BN+ReLU with a projected
    speaker embedding added to the input (reference: vae_models.py:51-75)."""
    hidden_size: int

    @nn.compact
    def __call__(self, x, spk_emb, train: bool = False):
        # x: [B, Tz, L]; spk_emb: [B, T, 256]
        s = spk_emb[:, : x.shape[1]]
        s = nn.Conv(64, (3,), padding="SAME", name="spk_proj_0")(s)
        s = nn.relu(s)
        s = nn.Conv(16, (3,), padding="SAME", name="spk_proj_1")(s)
        x = x + s
        for i in range(3):
            x = nn.Conv(self.hidden_size, (3,), padding="SAME", name=f"conv_{i}")(x)
            if i < 2:
                x = BatchNorm1d(name=f"bn_{i}")(x, train=train)
                x = nn.relu(x)
        return x


class GlobalLatentMap(nn.Module):
    """Global latent mapping: 1x1 convs (reference: vae_models.py:149-172)."""
    hidden_size: int

    @nn.compact
    def __call__(self, x, spk_emb, train: bool = False):
        # x: [B, 1, L]; spk_emb: [B, T, 256]
        s = spk_emb[:, : x.shape[1]]
        s = nn.Conv(self.hidden_size, (1,), name="spk_proj_0")(s)
        s = nn.relu(s)
        s = nn.Conv(self.hidden_size, (1,), name="spk_proj_1")(s)
        x = x + s
        for i in range(3):
            x = nn.Conv(self.hidden_size, (1,), name=f"conv_{i}")(x)
            if i < 2:
                x = BatchNorm1d(name=f"bn_{i}")(x, train=train)
                x = nn.relu(x)
        return x


class TechClassifier(nn.Module):
    """Latent -> amateur/professional logits (reference: vae_models.py:238-261)."""
    latent_size: int

    @nn.compact
    def __call__(self, x, spk_emb, train: bool = False):
        s = spk_emb[:, : x.shape[1]]
        s = nn.Conv(self.latent_size, (1,), name="spk_proj_0")(s)
        s = nn.relu(s)
        s = nn.Conv(self.latent_size, (1,), name="spk_proj_1")(s)
        x = x + s
        widths = [self.latent_size // 2, self.latent_size // 4, 2]
        for i, w in enumerate(widths):
            x = nn.Conv(w, (1,), name=f"conv_{i}")(x)
            if i < 2:
                x = BatchNorm1d(name=f"bn_{i}")(x, train=train)
                x = nn.relu(x)
        return x[:, 0]  # [B, 2]
