"""Polyphase transposed conv == flax nn.ConvTranspose, same param tree."""

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from neuralsvb_tpu.ops.subpixel import ConvTranspose1d


@pytest.mark.parametrize("k,s", [(16, 8), (4, 2), (8, 4), (6, 2), (6, 3),
                                 (15, 8)])
@pytest.mark.parametrize("padding", ["SAME", "VALID"])
def test_polyphase_matches_conv_transpose(k, s, padding):
    rng = np.random.RandomState(k * 31 + s)
    x = jnp.asarray(rng.randn(2, 33, 12).astype(np.float32))
    ref = nn.ConvTranspose(5, (k,), strides=(s,), padding=padding,
                           transpose_kernel=True)
    ours = ConvTranspose1d(5, k, s, padding=padding)
    variables = ref.init(jax.random.PRNGKey(0), x)
    want = ref.apply(variables, x)
    # identical parameter tree: reuse the reference params directly
    got = ours.apply(variables, x)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                               rtol=1e-5, atol=1e-5)


def test_polyphase_grads_flow():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 3).astype(np.float32))
    m = ConvTranspose1d(4, 16, 8)
    v = m.init(jax.random.PRNGKey(1), x)

    def loss(params):
        return jnp.sum(m.apply(params, x) ** 2)

    g = jax.grad(loss)(v)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_polyphase_bf16():
    x = jnp.asarray(np.random.RandomState(2).randn(1, 32, 8), jnp.bfloat16)
    m = ConvTranspose1d(4, 16, 8, dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(1), x)
    y = m.apply(v, x)
    assert y.dtype == jnp.bfloat16 and y.shape == (1, 256, 4)
