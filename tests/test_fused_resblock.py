"""Fused ResBlock-cluster Pallas kernel vs the unfused flax towers.

The kernel runs in interpreter mode on CPU (tests/conftest.py pins cpu), so
these tests validate the exact kernel code path that runs compiled on TPU:
tiling + halo DMA windows, tap-stacked matmuls, sequence-edge masking, and
the custom-VJP backward (reference: modules/hifigan/hifigan.py:144-169 —
the resblock hot loop this kernel replaces).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralsvb_tpu.models.hifigan import HifiGanGenerator, ResBlock1
from neuralsvb_tpu.ops.fused_resblock import (fused_resblock_cluster,
                                              resblock_cluster_reference)

KS = (3, 7, 11)
DILS = ((1, 3, 5), (1, 3, 5), (1, 3, 5))


def _towers(C, T, B=1, seed=0):
    x = jnp.asarray(np.random.RandomState(seed).randn(B, T, C)
                    .astype(np.float32))
    params, outs = [], []
    for r, k in enumerate(KS):
        m = ResBlock1(C, k, DILS[r])
        v = m.init(jax.random.PRNGKey(100 + r), x)
        params.append(v["params"])
        outs.append(m.apply(v, x))
    return x, params, sum(outs) / len(outs)


@pytest.mark.parametrize("C,T,Tt", [
    (64, 300, 128),     # ragged T, multi-tile, edge masking both sides
    (128, 256, 256),    # single tile exactly
    (64, 515, 128),     # ragged everything
])
def test_fused_cluster_matches_flax(C, T, Tt):
    x, params, ref = _towers(C, T)
    y = fused_resblock_cluster(x, params, KS, DILS, Tt=Tt,
                               mm_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("batch_mode", ["grid", "map"])
def test_fused_cluster_batch(batch_mode):
    """Both batch foldings (leading grid axis vs lax.map scan) are exact;
    'grid' is the default (the scan variant crashes the TPU relay's compile
    helper at B=8 — ops/fused_resblock.py module docstring)."""
    x, params, ref = _towers(64, 260, B=3)
    y = fused_resblock_cluster(x, params, KS, DILS, Tt=128,
                               mm_dtype=jnp.float32, batch_mode=batch_mode)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_cluster_bf16_tolerance():
    x, params, ref = _towers(64, 256)
    y = fused_resblock_cluster(x, params, KS, DILS, Tt=128,
                               mm_dtype=jnp.bfloat16)
    scale = float(jnp.abs(ref).max())
    assert float(jnp.abs(y - ref).max()) < 0.05 * max(scale, 1.0)


def test_fused_cluster_grad_matches_reference():
    x, params, _ = _towers(64, 260)
    tw = tuple(params)

    def loss_fused(x, tw):
        return jnp.sum(fused_resblock_cluster(
            x, tw, KS, DILS, Tt=128, mm_dtype=jnp.float32) ** 2)

    def loss_ref(x, tw):
        return jnp.sum(resblock_cluster_reference(x, tw, KS, DILS) ** 2)

    g = jax.grad(loss_fused, argnums=(0, 1))(x, tw)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, tw)
    for a, b in zip(jax.tree_util.tree_leaves(g),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_generator_fused_matches_unfused():
    """End-to-end: HifiGanGenerator(fuse_resblocks='on') == 'off' — the
    serving configuration (tiny dims; NSF source + noise_convs included)."""
    kw = dict(upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
              upsample_initial_channel=128, use_pitch_embed=True,
              audio_sample_rate=22050)
    mel = jnp.asarray(np.random.RandomState(0)
                      .randn(1, 40, 80).astype(np.float32) - 2.0)
    f0 = jnp.full((1, 40), 220.0, jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    m_off = HifiGanGenerator(fuse_resblocks="off", **kw)
    params = m_off.init(rngs, mel, f0)["params"]
    w_off = m_off.apply({"params": params}, mel, f0,
                        rngs={"noise": jax.random.PRNGKey(1)})
    m_on = HifiGanGenerator(fuse_resblocks="on", **kw)
    w_on = m_on.apply({"params": params}, mel, f0,
                      rngs={"noise": jax.random.PRNGKey(1)})
    np.testing.assert_allclose(np.asarray(w_on), np.asarray(w_off),
                               rtol=1e-4, atol=1e-4)


def test_generator_fused_is_differentiable():
    """Vocoder training runs the fused forward: grads must flow (custom VJP
    via the reference towers)."""
    kw = dict(upsample_rates=(4,), upsample_kernel_sizes=(8,),
              upsample_initial_channel=64, use_pitch_embed=False,
              audio_sample_rate=22050)
    mel = jnp.asarray(np.random.RandomState(1)
                      .randn(1, 24, 80).astype(np.float32))
    m = HifiGanGenerator(fuse_resblocks="on", **kw)
    params = HifiGanGenerator(fuse_resblocks="off", **kw).init(
        {"params": jax.random.PRNGKey(0)}, mel)["params"]

    def loss(p):
        return jnp.sum(m.apply({"params": p}, mel) ** 2)

    g = jax.grad(loss)(params)
    total = sum(float(jnp.abs(v).sum())
                for v in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0
    # resblock conv grads specifically must be nonzero
    rb = g["resblock_0_0"]["conv1_0"]["kernel"]
    assert float(jnp.abs(rb).sum()) > 0
