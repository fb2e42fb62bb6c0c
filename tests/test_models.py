"""Model library tests: shapes, jit-ability, masking and gradient flow for
the SVB VAE family, conformer/ASR, and the multi-window discriminator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralsvb_tpu.models.asr import VCASR
from neuralsvb_tpu.models.common import ConvStacks, Embedding, Prenet
from neuralsvb_tpu.models.conformer import ConformerLayers
from neuralsvb_tpu.models.disc import Discriminator
from neuralsvb_tpu.models.fvae import FVAE
from neuralsvb_tpu.models.svb_vae import SVBVAE

B, T, MEL, H = 2, 64, 80, 64


def _rngs(seed=0):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 4)
    return {"params": ks[0], "noise": ks[1], "disc": ks[2], "dropout": ks[3]}


def _mel(seed=0, t=T):
    x = jax.random.normal(jax.random.PRNGKey(seed), (B, t, MEL)) - 2.0
    # pad last quarter
    return x.at[:, 3 * t // 4:].set(0.0)


def test_prenet_strides():
    m = Prenet(out_dim=H, strides=[2, 1, 1])
    vars_ = m.init(_rngs(), _mel())
    h, out = m.apply(vars_, _mel())
    assert out.shape == (B, T // 2, H)
    # padded region stays zero
    assert np.abs(np.asarray(out[:, -T // 8:])).max() == 0


def test_conformer_masks_padding():
    m = ConformerLayers(H, 2, kernel_size=7)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, H))
    x = x.at[:, T // 2:].set(0.0)
    vars_ = m.init(_rngs(), x)
    y = m.apply(vars_, x)
    assert y.shape == (B, T, H)
    assert np.abs(np.asarray(y[:, T // 2:])).max() == 0


def test_rel_shift_exact_matches_legacy_espnet():
    """_rel_shift_exact(bd, n) on the padded [T, T] score matrix must equal
    the legacy ESPnet rel_shift run at the TRUE length n (junk wrap
    included) on the valid [n, n] block, for every n — and reduce to the
    plain shift bit-for-bit at n == T."""
    from neuralsvb_tpu.models.conformer import RelPositionMultiHeadedAttention
    shift = RelPositionMultiHeadedAttention._rel_shift
    exact = RelPositionMultiHeadedAttention._rel_shift_exact

    rng = np.random.RandomState(0)
    Tn, Hh = 17, 2
    ns = np.array([17, 11, 5, 1], np.int32)
    bd = rng.randn(len(ns), Hh, Tn, Tn).astype(np.float32)
    got = np.asarray(exact(jnp.asarray(bd), jnp.asarray(ns)))
    for b, n in enumerate(ns):
        # per-example table relation: bd_n[q, j] = bd[q, j + T - n]
        bd_n = bd[b:b + 1, :, :n, Tn - n:]
        want = np.asarray(shift(jnp.asarray(bd_n)))[0]
        np.testing.assert_allclose(got[b, :, :n, :n], want, atol=1e-6,
                                   err_msg=f"n={n}")
    full = np.asarray(shift(jnp.asarray(bd)))
    np.testing.assert_array_equal(got[0], full[0])  # n == T: bit-exact


def test_vcasr_ppg_and_tokens():
    m = VCASR(dict_size=50, hidden_size=H)
    mel = _mel()
    tokens = jnp.ones((B, 12), jnp.int32)
    vars_ = m.init(_rngs(), mel, tokens)
    out = m.apply(vars_, mel, tokens)
    assert out["h_content"].shape == (B, T // 2, H)
    assert out["tokens"].shape == (B, 12, 50)


def test_fvae_local_and_global():
    for global_latent, tz in [(False, T // 4), (True, 1)]:
        m = FVAE(in_out_channels=MEL, hidden_channels=48, latent_size=16,
                 kernel_size=5, enc_n_layers=2, dec_n_layers=2, gin_channels=H,
                 strides=(4,), global_latent=global_latent)
        x = _mel()
        mask = jnp.ones((B, T, 1))
        g = jax.random.normal(jax.random.PRNGKey(1), (B, T, H))
        vars_ = m.init(_rngs(), x, mask, g)
        recon, kl, z_p, m_q, logs_q, mask_sqz, z_q = m.apply(
            vars_, x, mask, g, rngs={"noise": jax.random.PRNGKey(5)})
        assert recon.shape == (B, T, MEL)
        assert m_q.shape == (B, tz, 16), (global_latent, m_q.shape)
        assert np.isfinite(float(kl))
        # infer path samples from prior
        recon_i, z_i = m.apply(vars_, g=g, infer=True,
                               rngs={"noise": jax.random.PRNGKey(6)})
        assert recon_i.shape == (B, T, MEL)
        assert z_i.shape == (B, tz, 16)


def _small_svb(variant):
    return SVBVAE(dict_size=50, hidden_size=H, latent_size=16, fvae_hidden=48,
                  fvae_enc_layers=2, fvae_dec_layers=2, variant=variant)


def _svb_inputs(t_a=T, t_p=T + 16):
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 6)
    amateur = jax.random.normal(ks[0], (B, t_a, MEL)) - 2
    prof = jax.random.normal(ks[1], (B, t_p, MEL)) - 2
    pa = jax.random.randint(ks[2], (B, t_a), 1, 255)
    pp = jax.random.randint(ks[3], (B, t_p), 1, 255)
    spk = jax.random.normal(ks[4], (B, 256))
    align = jnp.clip(jnp.arange(t_p)[None].repeat(B, 0) * t_a // t_p, 0, t_a - 1)
    return amateur, prof, pa, pp, spk, align


@pytest.mark.parametrize("variant", ["mle", "global", "local"])
def test_svbvae_forward(variant):
    m = _small_svb(variant)
    am, pr, pa, pp, spk, align = _svb_inputs()
    ways = ("a2a", "p2p", "a2p")
    vars_ = m.init(_rngs(), am, pr, pa, pp, spk, align, concurrent_ways=ways)
    out = m.apply(vars_, am, pr, pa, pp, spk, align, concurrent_ways=ways,
                  rngs={"noise": jax.random.PRNGKey(9)})
    assert out["a2a"]["mel_out"].shape == am.shape
    assert out["p2p"]["mel_out"].shape == pr.shape
    assert out["a2p"]["mel_out"].shape == pr.shape
    if variant == "mle":
        assert np.isfinite(float(out["a2p"]["mle"]))
    else:
        assert np.isfinite(float(out["a2p"]["kl"]))
    assert np.isfinite(float(out["a2a"]["kl"]))


def test_svbvae_jit_and_grad():
    m = _small_svb("mle")
    am, pr, pa, pp, spk, align = _svb_inputs()
    ways = ("a2a", "p2p", "a2p")
    vars_ = m.init(_rngs(), am, pr, pa, pp, spk, align, concurrent_ways=ways)
    params = vars_["params"]
    other = {k: v for k, v in vars_.items() if k != "params"}

    @jax.jit
    def loss_fn(params):
        out = m.apply({"params": params, **other}, am, pr, pa, pp, spk, align,
                      concurrent_ways=ways, rngs={"noise": jax.random.PRNGKey(2)})
        return (jnp.abs(out["p2p"]["mel_out"] - pr).mean()
                + out["a2p"]["mle"] * 0.001 + out["a2a"]["kl"])

    g = jax.jit(jax.grad(loss_fn))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # frozen ASR gets no gradient (stop_gradient)
    asr_grads = jax.tree_util.tree_leaves(g["vc_asr"])
    assert all(np.abs(np.asarray(l)).max() == 0 for l in asr_grads)
    # mapping function DOES get gradient through mle loss
    map_grads = jax.tree_util.tree_leaves(g["z_mapping_function"])
    assert any(np.abs(np.asarray(l)).max() > 0 for l in map_grads)


def test_discriminator():
    m = Discriminator(time_lengths=(8, 16, 32), freq_length=MEL, hidden_size=32)
    x = _mel(t=48)
    vars_ = m.init(_rngs(), x)
    out = m.apply(vars_, x, rngs={"disc": jax.random.PRNGKey(3)}, train=False)
    assert out["y"].shape == (B, 3)
    # pinning the windows reproduces the same output
    starts = out["start_frames_wins"]
    out2 = m.apply(vars_, x, start_frames_wins=starts,
                   rngs={"disc": jax.random.PRNGKey(99)})
    np.testing.assert_allclose(np.asarray(out["y"]), np.asarray(out2["y"]), atol=1e-6)


def test_discriminator_conditional_branch():
    """use_cond_disc: condition clips are projected and added to the window
    input (reference: multi_window_disc.py cond path)."""
    from neuralsvb_tpu.models.disc import Discriminator
    import jax
    import jax.numpy as jnp
    d = Discriminator(time_lengths=(8, 16), freq_length=80, hidden_size=8,
                      cond_size=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 40, 80))
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 40, 16))
    rngs = {"params": jax.random.PRNGKey(2), "disc": jax.random.PRNGKey(3)}
    v = d.init(rngs, x, cond)
    out = d.apply(v, x, cond, rngs={"disc": jax.random.PRNGKey(4)})
    assert out["y"] is not None and np.isfinite(np.asarray(out["y"])).all()
    assert out["y_c"] is not None
    out2 = d.apply(v, x, cond * 10, rngs={"disc": jax.random.PRNGKey(4)})
    assert not np.allclose(np.asarray(out["y_c"]), np.asarray(out2["y_c"])), \
        "condition must influence the conditional discriminator"


def test_mha_incremental_decode():
    """Incremental k/v-cache decode equals full-sequence causal attention
    (the reference's fairseq incremental state, common_layers.py:231-324,
    expressed as an explicit functional cache)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from neuralsvb_tpu.models.common import MultiheadAttention, causal_mask

    B, T, C, H = 2, 10, 16, 4
    rng = np.random.RandomState(0)
    x = rng.randn(B, T, C).astype(np.float32)
    mha = MultiheadAttention(H)
    variables = mha.init(jax.random.PRNGKey(0), x, x, x)

    mask = causal_mask(T, jnp.float32)[None, None]
    full, _ = mha.apply(variables, x, x, x, attn_mask=mask)

    cache = MultiheadAttention.init_cache(B, T, C, H)
    steps = []
    for t in range(T):
        xt = x[:, t:t + 1]
        out, _, cache = mha.apply(variables, xt, xt, xt, cache=cache)
        steps.append(out)
    inc = jnp.concatenate(steps, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(inc),
                               atol=1e-5, rtol=1e-5)
