"""Tests for the FastSpeech2 lineage, PPG regression models and glow flows."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralsvb_tpu.models.fs2 import FastSpeech2
from neuralsvb_tpu.models.glow import ResidualCouplingBlock
from neuralsvb_tpu.models.svb_ppg import (ParaAlignedPPG, ParaPPGPreExp,
                                          ParaSVBPPG, SVBPPG, VCPPG)
from neuralsvb_tpu.models.tts_modules import length_regulator, mel2ph_to_dur

B, T_TXT, T_MEL, H = 2, 10, 40, 32

RNGS = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2)}


def test_length_regulator_and_inverse():
    dur = jnp.asarray([[2, 2, 3, 0], [1, 4, 0, 0]])
    m2p = length_regulator(dur, max_len=8)
    np.testing.assert_array_equal(
        np.asarray(m2p),
        [[1, 1, 2, 2, 3, 3, 3, 0], [1, 2, 2, 2, 2, 0, 0, 0]])
    back = mel2ph_to_dur(m2p, 4)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(dur))


def test_fs2_forward_gt_dur():
    model = FastSpeech2(dict_size=20, hidden_size=H, enc_layers=1, dec_layers=1,
                        predictor_layers=1, use_pitch_embed=True)
    tokens = jnp.ones((B, T_TXT), jnp.int32).at[:, -2:].set(0)
    # simple mel2ph: each phone gets 4 frames; padded tail 0
    m2p = jnp.clip((jnp.arange(T_MEL) // 4 + 1)[None].repeat(B, 0), 0, 8)
    m2p = jnp.where(jnp.arange(T_MEL)[None] < 32, m2p, 0)
    f0 = jnp.zeros((B, T_MEL))
    uv = jnp.zeros((B, T_MEL))
    vars_ = model.init(RNGS, tokens, m2p, None, f0, uv)
    out = model.apply(vars_, tokens, m2p, None, f0, uv,
                      rngs={"dropout": jax.random.PRNGKey(3)})
    assert out["mel_out"].shape == (B, T_MEL, 80)
    assert out["dur"].shape == (B, T_TXT)
    assert out["pitch_pred"].shape == (B, T_MEL, 2)
    # padding frames produce zero mel
    assert np.abs(np.asarray(out["mel_out"][:, 32:])).max() == 0


def test_fs2_infer_predicted_dur():
    model = FastSpeech2(dict_size=20, hidden_size=H, enc_layers=1, dec_layers=1,
                        predictor_layers=1)
    tokens = jnp.ones((B, T_TXT), jnp.int32)
    vars_ = model.init(RNGS, tokens, None, None, None, None, max_frames=T_MEL)
    out = model.apply(vars_, tokens, None, None, None, None, infer=True,
                      max_frames=T_MEL, rngs={"dropout": jax.random.PRNGKey(3)})
    assert out["mel_out"].shape == (B, T_MEL, 80)
    assert out["mel2ph"].shape == (B, T_MEL)


@pytest.mark.parametrize("cls,needs_align", [
    (VCPPG, False), (SVBPPG, False), (ParaSVBPPG, True),
    (ParaPPGPreExp, True), (ParaAlignedPPG, True)])
def test_ppg_models(cls, needs_align):
    kw = dict(dict_size=20, hidden_size=H, ref_enc_out=H, use_energy=True,
              asr_enc_layers=1, asr_dec_layers=1, dec_layers=1)
    model = cls(**kw)
    mels = jax.random.normal(jax.random.PRNGKey(0), (B, T_MEL, 80)) - 2
    pitch = jax.random.randint(jax.random.PRNGKey(1), (B, T_MEL), 1, 255)
    energy = jax.random.uniform(jax.random.PRNGKey(2), (B, T_MEL))
    tech = jnp.zeros((B,), jnp.int32)
    align = jnp.clip(jnp.arange(T_MEL)[None].repeat(B, 0), 0, T_MEL - 1) \
        if needs_align else None
    spk = (jax.random.normal(jax.random.PRNGKey(3), (B, 5, 256))
           if needs_align else None)
    tokens = jnp.ones((B, 6), jnp.int32)
    vars_ = model.init(RNGS, mels, mels, pitch, energy, spk, tech, align)
    # ASR decoder params are only created by the CE path; merge a second init
    vars_asr = model.init(RNGS, mels, tokens, method=model.train_vc_asr)

    def merge(a, b):
        if not isinstance(a, dict):
            return a
        out = dict(a)
        for k, v in b.items():
            out[k] = merge(a[k], v) if k in a else v
        return out

    vars_ = {"params": merge(vars_["params"], vars_asr["params"]),
             **{k: v for k, v in vars_.items() if k != "params"}}
    out = model.apply(vars_, mels, mels, pitch, energy, spk, tech, align,
                      rngs={"dropout": jax.random.PRNGKey(4)})
    assert out["mel_out"].shape == (B, T_MEL, 80)
    logits = model.apply(vars_, mels, tokens, method=model.train_vc_asr,
                         rngs={"dropout": jax.random.PRNGKey(5)})
    assert logits.shape == (B, 6, 20)


def test_glow_invertible():
    block = ResidualCouplingBlock(channels=8, hidden_channels=16, kernel_size=3,
                                  dilation_rate=1, n_layers=2, n_flows=2,
                                  gin_channels=H)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 12, 8))
    mask = jnp.ones((B, 12, 1))
    g = jax.random.normal(jax.random.PRNGKey(1), (B, 12, H))
    vars_ = block.init(RNGS, x, mask, g)
    y, logdet = block.apply(vars_, x, mask, g)
    x_rec, logdet_r = block.apply(vars_, y, mask, g, reverse=True)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(logdet), -np.asarray(logdet_r), atol=1e-5)


def test_svbvae_tech_variants():
    from neuralsvb_tpu.models.svb_vae import SVBVAE
    for variant in ("tech_mle", "seg_tech_mle"):
        m = SVBVAE(dict_size=20, hidden_size=H, latent_size=8, fvae_hidden=16,
                   fvae_enc_layers=2, fvae_dec_layers=2, asr_enc_layers=1,
                   asr_dec_layers=1, variant=variant)
        am = jax.random.normal(jax.random.PRNGKey(0), (B, 32, 80)) - 2
        pr = jax.random.normal(jax.random.PRNGKey(1), (B, 48, 80)) - 2
        pa = jax.random.randint(jax.random.PRNGKey(2), (B, 32), 1, 255)
        pp = jax.random.randint(jax.random.PRNGKey(3), (B, 48), 1, 255)
        spk = jax.random.normal(jax.random.PRNGKey(4), (B, 256))
        align = jnp.clip(jnp.arange(48)[None].repeat(B, 0) * 32 // 48, 0, 31)
        ways = ("a2a", "p2p", "a2p")
        vars_ = m.init(RNGS, am, pr, pa, pp, spk, align, concurrent_ways=ways)
        out = m.apply(vars_, am, pr, pa, pp, spk, align, concurrent_ways=ways,
                      rngs={"noise": jax.random.PRNGKey(9)})
        assert out["a2p"]["mel_out"].shape == pr.shape
        assert np.isfinite(float(out["a2p"]["mle"]))
        # tech priors differ: a2a kl vs prior 0, p2p vs prior 1
        assert np.isfinite(float(out["a2a"]["kl"]))
        if variant == "seg_tech_mle":
            assert "attn" in out["p2p"]


def test_fs2_cwt_pitch_path():
    """pitch_type='cwt': wavelet-spectrum predictor + utterance f0 stats,
    inverse CWT at inference (reference: fs2.py:205-231 + cwt2f0)."""
    from neuralsvb_tpu.models.fs2 import FastSpeech2
    m = FastSpeech2(dict_size=20, hidden_size=H, enc_layers=1, dec_layers=1,
                    predictor_layers=1, pitch_type="cwt", use_uv=True,
                    cwt_hidden_size=16)
    tokens = jnp.ones((B, 6), jnp.int32)
    m2p = jnp.repeat(jnp.arange(1, 7)[None], B, 0).repeat(5, axis=1)
    vars_ = m.init(RNGS, tokens, m2p, None, None, None)
    # train mode: cwt spectrum head present
    out = m.apply(vars_, tokens, m2p, None,
                  jnp.zeros((B, 30)), jnp.zeros((B, 30)),
                  rngs={"dropout": jax.random.PRNGKey(2)})
    assert out["cwt"].shape == (B, 30, 11)
    assert out["f0_mean"].shape == (B,) and out["f0_std"].shape == (B,)
    # infer mode: f0 reconstructed via inverse CWT, finite everywhere
    out_i = m.apply(vars_, tokens, m2p, None, None, None, infer=True,
                    rngs={"dropout": jax.random.PRNGKey(3)})
    assert out_i["mel_out"].shape == (B, 30, 80)
    assert np.isfinite(np.asarray(out_i["f0_denorm"])).all()


def test_para_ppg_constraint_aligned_ce():
    """ParaPPGConstraint.train_vc_asr realigns the content encoding to the
    professional timeline inside the ASR before the CE decoder and returns
    h_content with gradient (reference: svb_ppg.py:178-196 + 252-258)."""
    from neuralsvb_tpu.models.svb_ppg import ParaPPGConstraint
    model = ParaPPGConstraint(dict_size=20, hidden_size=H, ref_enc_out=H,
                              use_energy=True, asr_enc_layers=1,
                              asr_dec_layers=1, dec_layers=1)
    T_a, T_p = 30, 36
    mels_a = jax.random.normal(jax.random.PRNGKey(0), (B, T_a, 80)) - 2
    mels_p = jax.random.normal(jax.random.PRNGKey(1), (B, T_p, 80)) - 2
    tokens = jnp.ones((B, 6), jnp.int32)
    # a2p alignment: professional frame t -> amateur frame index
    align = jnp.clip((jnp.arange(T_p) * T_a) // T_p, 0, T_a - 1)[None].repeat(B, 0)
    vars_ = model.init(RNGS, mels_a, tokens, align, True,
                       method=model.train_vc_asr)
    logits_a, h_a = model.apply(vars_, mels_a, tokens, align, True,
                                method=model.train_vc_asr,
                                rngs={"dropout": jax.random.PRNGKey(2)})
    logits_p, h_p = model.apply(vars_, mels_p, tokens, None, True,
                                method=model.train_vc_asr,
                                rngs={"dropout": jax.random.PRNGKey(2)})
    assert logits_a.shape == (B, 6, 20) and logits_p.shape == (B, 6, 20)
    # amateur content is on the professional stride-rate timeline now
    stride = 2  # prod(mel_strides) default (2, 1, 1)
    assert h_p.shape[1] == T_p // stride
    assert h_a.shape[1] >= T_p // stride
    assert np.isfinite(np.asarray(h_a)).all()
    # identity alignment on the same mel reproduces the unaligned pooling
    id_align = jnp.arange(T_a)[None].repeat(B, 0)
    _, h_id = model.apply(vars_, mels_a, tokens, id_align, True,
                          method=model.train_vc_asr,
                          rngs={"dropout": jax.random.PRNGKey(2)})
    _, h_raw = model.apply(vars_, mels_a, tokens, None, True,
                           method=model.train_vc_asr,
                           rngs={"dropout": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(np.asarray(h_id[:, : h_raw.shape[1]]),
                               np.asarray(h_raw), atol=1e-5)
