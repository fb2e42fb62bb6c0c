"""Padding-invariance of the full SVBVAE forward: bucketed static shapes
must not change the answer. For every way, running the model on inputs
right-padded by an arbitrary amount (mels 0.0, pitch token 0, alignment 0)
must reproduce the unpadded run exactly on the valid region — the property
that makes our padded/bucketed batches equal the reference's exact-length
bs=1 computation (reference never pads at inference; see the masked-
semantics notes in models/common.py, models/fvae.py, models/conformer.py).
"""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.slow

HP = dict(
    audio_num_mel_bins=80, hidden_size=32, latent_size=8,
    fvae_enc_dec_hidden=16, fvae_kernel_size=5, fvae_enc_n_layers=2,
    fvae_dec_n_layers=2, frames_multiple=4, mel_strides=[2, 1, 1],
    asr_enc_layers=1, asr_dec_layers=1, asr_last_norm=False,
)


def _model():
    from neuralsvb_tpu.models.svb_vae import SVBVAE
    return SVBVAE(dict_size=20, hidden_size=HP["hidden_size"],
                  latent_size=HP["latent_size"],
                  fvae_hidden=HP["fvae_enc_dec_hidden"],
                  fvae_kernel=HP["fvae_kernel_size"],
                  fvae_enc_layers=HP["fvae_enc_n_layers"],
                  fvae_dec_layers=HP["fvae_dec_n_layers"],
                  mel_strides=tuple(HP["mel_strides"]),
                  asr_enc_layers=HP["asr_enc_layers"],
                  asr_dec_layers=HP["asr_dec_layers"], variant="mle")


def _inputs(B, T, seed=0):
    rng = np.random.RandomState(seed)
    return dict(
        mel_a=rng.randn(B, T, 80).astype(np.float32) - 2,
        mel_p=rng.randn(B, T, 80).astype(np.float32) - 2,
        pitch_a=rng.randint(1, 255, (B, T)).astype(np.int32),
        pitch_p=rng.randint(1, 255, (B, T)).astype(np.int32),
        spk=rng.randn(B, 256).astype(np.float32),
        align=np.clip(np.sort(rng.randint(0, T, (B, T)), axis=1),
                      0, T - 1).astype(np.int32),
    )


def _pad(x, pad, value=0):
    cfg = [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 2)
    return np.pad(x, cfg, constant_values=value)


@pytest.mark.parametrize("pad,T", [
    (20, 64), (36, 64),
    # T=40 -> 10 squeezed frames < the global encoder's 15-frame pooling
    # minimum: the unpadded run takes the jnp.pad branch while the padded
    # run (T'=19..) relies on post-out_proj masking — the two must agree
    (36, 40),
])
def test_svbvae_forward_padding_invariant(pad, T):
    from neuralsvb_tpu.hparams import hparams
    hparams.update({k: v for k, v in HP.items() if k not in hparams})
    model = _model()
    B = 2
    z = _inputs(B, T)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    ways = ("a2a", "p2p", "a2p")
    variables = model.init(rngs, z["mel_a"], z["mel_p"], z["pitch_a"],
                           z["pitch_p"], z["spk"], z["align"],
                           concurrent_ways=ways)

    # mu-decode: zero reparameterization noise so both runs are
    # deterministic (same semantics as the parity suite)
    j_normal = jax.random.normal
    jax.random.normal = (
        lambda key, shape=(), dtype=np.float32: np.zeros(shape, dtype))
    try:
        def run(mel_a, mel_p, pa, pp, align):
            return model.apply(
                {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})},
                mel_a, mel_p, pa, pp, z["spk"], align,
                concurrent_ways=ways, rngs={"noise": jax.random.PRNGKey(3)})

        ref = run(z["mel_a"], z["mel_p"], z["pitch_a"], z["pitch_p"],
                  z["align"])
        padded = run(_pad(z["mel_a"], pad), _pad(z["mel_p"], pad),
                     _pad(z["pitch_a"], pad), _pad(z["pitch_p"], pad),
                     _pad(z["align"], pad))
    finally:
        jax.random.normal = j_normal

    for way in ways:
        a = np.asarray(ref[way]["mel_out"])
        b = np.asarray(padded[way]["mel_out"])[:, :T]
        d = np.abs(a - b).max()
        assert d < 2e-5, f"{way} mel_out padding leak: max |delta| = {d:.2e}"
        for stat in ("m_q", "logs_q"):
            if stat in ref[way]:
                da = np.abs(np.asarray(ref[way][stat])
                            - np.asarray(padded[way][stat])).max()
                assert da < 2e-5, f"{way} {stat} leak: {da:.2e}"
    # global scalars (the latent posterior / mle) must match too
    assert abs(float(ref["a2p"]["mle"]) - float(padded["a2p"]["mle"])) < 1e-4
