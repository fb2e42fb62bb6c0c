"""Activation-level parity against the ACTUAL reference PyTorch modules.

Each test random-initializes the real torch module from /root/reference,
converts its genuine ``state_dict()`` with ``neuralsvb_tpu.convert.torch2jax``,
runs both forwards on identical inputs, and asserts the outputs agree. This
retires the self-referential-converter-test risk: a shared wrong assumption
(name drift or layout transposition encoded on both sides of the synthetic
round-trip in test_convert_svbvae.py) cannot pass here.

Stochastic paths (reparameterization noise, NSF initial phase / additive
noise) are made deterministic by patching the RNG primitives to zero on BOTH
frameworks — μ-decode semantics per SURVEY.md §7.3 'Randomness semantics'.

Reference anchors: modules/voice_conversion/vc_modules.py:56-80 (VCASR),
modules/fastspeech/fs2_vae.py:19-206 (WN/FVAE),
modules/voice_conversion/vae_models.py:81-233 (GlobalFVAE/GlobalLatentMap),
modules/voice_conversion/svb_vae.py:251-312 (MleSVBVAE),
modules/hifigan/hifigan.py:104-178 (HiFiGAN-NSF).
"""

from __future__ import annotations

import contextlib
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
from flax import serialization

REF = "/root/reference"

torch = pytest.importorskip("torch")

# dims shared with the reference global hparams dict. hidden_size must be 256:
# the reference LatentMap/GlobalLatentMap spk_proj hard-codes Conv1d(256, ...)
# over h_style (vae_models.py:64-66,160-162).
HP = dict(
    hidden_size=256, audio_num_mel_bins=80, latent_size=16,
    fvae_enc_dec_hidden=32, fvae_kernel_size=5, fvae_enc_n_layers=2,
    fvae_dec_n_layers=2, asr_enc_layers=1, asr_dec_layers=1,
    asr_enc_type="conformer", asr_last_norm=False, mel_strides=[2, 1, 1],
    dropout=0.1, frames_multiple=4, num_heads=2,
    # DecSALayer/FFN defaults (reference: egs/egs_bases/tts/base.yaml:72-74)
    dec_ffn_kernel_size=9, ffn_act="gelu", ffn_padding="SAME",
)
B, T = 2, 64  # T % 4 == 0 and T//4 >= 15 (GlobalFVAEEncoder poolings)


@pytest.fixture(scope="module")
def ref():
    """Import the reference PyTorch modules with missing third-party deps
    stubbed (their functions never run in these tests) and the reference
    global hparams dict populated."""
    from neuralsvb_tpu.convert.ref_env import stub_missing_ref_deps
    stub_missing_ref_deps()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from utils.hparams import hparams as ref_hparams
    ref_hparams.update(HP)
    ns = types.SimpleNamespace()
    import modules.fastspeech.fs2_vae as fs2_vae
    import modules.hifigan.hifigan as hifigan
    import modules.voice_conversion.svb_vae as svb_vae
    import modules.voice_conversion.vae_models as vae_models
    import modules.voice_conversion.vc_modules as vc_modules
    ns.fs2_vae, ns.vae_models, ns.svb_vae = fs2_vae, vae_models, svb_vae
    ns.vc_modules, ns.hifigan = vc_modules, hifigan
    ns.hparams = ref_hparams
    return ns


@contextlib.contextmanager
def zero_noise():
    """All sampled noise (torch.rand/randn_like, jax.random.normal/uniform)
    becomes zero, making both forwards deterministic and z_q == m_q."""
    t_rand, t_randn_like = torch.rand, torch.randn_like
    j_normal, j_uniform = jax.random.normal, jax.random.uniform

    def zrand(*size, **kw):
        if len(size) == 1 and isinstance(size[0], (tuple, list)):
            size = tuple(size[0])
        return torch.zeros(*size)

    torch.rand = zrand
    torch.randn_like = lambda t, **kw: torch.zeros_like(t)
    jax.random.normal = (
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype))
    jax.random.uniform = (
        lambda key, shape=(), dtype=jnp.float32, minval=0.0, maxval=1.0:
        jnp.zeros(shape, dtype))
    try:
        yield
    finally:
        torch.rand, torch.randn_like = t_rand, t_randn_like
        jax.random.normal, jax.random.uniform = j_normal, j_uniform


def sd_numpy(module):
    import neuralsvb_tpu.convert.torch2jax as c
    return c.fold_weight_norm(
        {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()})


def load_params(model, init_args, init_kwargs, converted, converted_stats=None):
    """init the flax model for tree structure, then overwrite with the
    converted reference weights (from_state_dict checks shape compat)."""
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, *init_args, **init_kwargs)
    params = serialization.from_state_dict(variables["params"], converted)
    stats = variables.get("batch_stats", {})
    if converted_stats is not None and stats:
        stats = serialization.from_state_dict(stats, converted_stats)
    return params, stats


def agree(a, b, tol=1e-4, name=""):
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape, (name, a.shape, b.shape)
    d = np.abs(a - b).max()
    assert d <= tol, f"{name}: max |Δ| = {d:.3e} > {tol}"


# ---------------------------------------------------------------------------

def test_wn_parity(ref):
    import neuralsvb_tpu.convert.torch2jax as c
    from neuralsvb_tpu.models.wn import WN

    torch.manual_seed(0)
    tm = ref.fs2_vae.WN(hidden_channels=32, kernel_size=5, dilation_rate=1,
                        n_layers=3, gin_channels=24).eval()
    sd = {f"wn.{k}": v for k, v in sd_numpy(tm).items()}
    converted = c.convert_wn(sd, "wn", 3)

    rng = np.random.RandomState(1)
    x = rng.randn(B, T, 32).astype(np.float32)
    mask = np.ones((B, T, 1), np.float32)
    mask[:, -7:] = 0
    g = rng.randn(B, T, 24).astype(np.float32)

    with torch.no_grad():
        out_t = tm(torch.tensor(x.transpose(0, 2, 1)),
                   torch.tensor(mask.transpose(0, 2, 1)),
                   g=torch.tensor(g.transpose(0, 2, 1)))
    jm = WN(32, 5, 1, 3, 24)
    params, _ = load_params(jm, (x, mask, g), {}, converted)
    out_j = jm.apply({"params": params}, x, mask, g)
    agree(out_t.numpy().transpose(0, 2, 1), out_j, 1e-5, "WN out")


def test_global_fvae_parity(ref):
    import neuralsvb_tpu.convert.torch2jax as c
    from neuralsvb_tpu.models.fvae import FVAE

    torch.manual_seed(0)
    tm = ref.vae_models.GlobalFVAE(
        in_out_channels=80, hidden_channels=32, latent_size=16, kernel_size=5,
        enc_n_layers=2, dec_n_layers=2, gin_channels=48, strides=[4],
        use_prior_glow=False).eval()
    sd = {f"vae_model.{k}": v for k, v in sd_numpy(tm).items()}
    converted, conv_stats = c.convert_global_fvae(sd, "vae_model", 2, 2)

    rng = np.random.RandomState(1)
    x = rng.randn(B, T, 80).astype(np.float32)
    mask = np.ones((B, T, 1), np.float32)
    g = rng.randn(B, T, 48).astype(np.float32)

    jm = FVAE(in_out_channels=80, hidden_channels=32, latent_size=16,
              kernel_size=5, enc_n_layers=2, dec_n_layers=2, gin_channels=48,
              strides=(4,), global_latent=True)
    params, stats = load_params(jm, (x, mask, g), {}, converted, conv_stats)

    with zero_noise(), torch.no_grad():
        x_recon, kl, _, m_q, logs_q, _, z_q = tm(
            torch.tensor(x.transpose(0, 2, 1)),
            torch.tensor(mask.transpose(0, 2, 1)),
            g=torch.tensor(g.transpose(0, 2, 1)))
        rj = jm.apply({"params": params, "batch_stats": stats}, x, mask, g,
                      rngs={"noise": jax.random.PRNGKey(3)})
    xj, klj, _, mj, logsj, _, zj = rj
    agree(m_q.numpy().transpose(0, 2, 1), mj, 1e-5, "m_q")
    agree(logs_q.numpy().transpose(0, 2, 1), logsj, 1e-5, "logs_q")
    agree(z_q.numpy().transpose(0, 2, 1), zj, 1e-5, "z_q (μ-decode)")
    agree(x_recon.numpy().transpose(0, 2, 1), xj, 1e-4, "x_recon")
    agree(kl.numpy(), klj, 1e-5, "loss_kl")


def test_global_latent_map_parity(ref):
    import neuralsvb_tpu.convert.torch2jax as c
    from neuralsvb_tpu.models.fvae import GlobalLatentMap

    torch.manual_seed(0)
    tm = ref.vae_models.GlobalLatentMap(16).eval()
    sd = {f"z_mapping_function.{k}": v for k, v in sd_numpy(tm).items()}
    converted, conv_stats = c.convert_global_latent_map(sd, "z_mapping_function")

    rng = np.random.RandomState(1)
    z = rng.randn(B, 1, 16).astype(np.float32)
    style = rng.randn(B, T, 256).astype(np.float32)

    jm = GlobalLatentMap(16)
    params, stats = load_params(jm, (z, style), {}, converted, conv_stats)
    with torch.no_grad():
        out_t = tm(torch.tensor(z.transpose(0, 2, 1)),
                   torch.tensor(style.transpose(0, 2, 1)))
    out_j = jm.apply({"params": params, "batch_stats": stats}, z, style)
    agree(out_t.numpy().transpose(0, 2, 1), out_j, 1e-5, "GlobalLatentMap")


def test_vcasr_parity(ref):
    import neuralsvb_tpu.convert.torch2jax as c
    from neuralsvb_tpu.models.asr import VCASR

    torch.manual_seed(0)
    dict_size = 20
    tm = ref.vc_modules.VCASR(dict_size).eval()
    sd = {f"vc_asr.{k}": v for k, v in sd_numpy(tm).items()}
    converted, conv_stats = c.convert_vcasr(sd, "vc_asr", HP["asr_enc_layers"],
                                            HP["asr_dec_layers"])

    rng = np.random.RandomState(1)
    mel = rng.randn(B, T, 80).astype(np.float32)
    prev_tokens = rng.randint(1, dict_size, (B, 16)).astype(np.int64)

    jm = VCASR(dict_size, HP["hidden_size"], HP["asr_enc_layers"],
               HP["asr_dec_layers"], tuple(HP["mel_strides"]),
               asr_last_norm=HP["asr_last_norm"])
    params, stats = load_params(jm, (mel, prev_tokens.astype(np.int32)), {},
                                converted, conv_stats)
    with torch.no_grad():
        rt = tm(torch.tensor(mel), torch.tensor(prev_tokens))
    rj = jm.apply({"params": params, "batch_stats": stats}, mel,
                  prev_tokens.astype(np.int32))
    agree(rt["h_content"].numpy(), rj["h_content"], 2e-4, "h_content")
    agree(rt["tokens"].numpy(), rj["tokens"], 2e-3, "asr tokens logits")


def test_mle_svbvae_full_parity(ref):
    import neuralsvb_tpu.convert.torch2jax as c
    from neuralsvb_tpu.hparams import hparams
    from neuralsvb_tpu.models.svb_vae import SVBVAE

    hparams.update({k: v for k, v in HP.items() if k not in hparams})
    torch.manual_seed(0)
    dict_size = 20
    tm = ref.svb_vae.MleSVBVAE(dict_size).eval()
    sd = sd_numpy(tm)
    converted, conv_stats = c.convert_svbvae_mle_sd(
        sd, HP["fvae_enc_n_layers"], HP["fvae_dec_n_layers"],
        HP["asr_enc_layers"], HP["asr_dec_layers"])

    rng = np.random.RandomState(1)
    mel_a = rng.randn(B, T, 80).astype(np.float32) - 2
    mel_p = rng.randn(B, T, 80).astype(np.float32) - 2
    pitch_a = rng.randint(1, 255, (B, T)).astype(np.int64)
    pitch_p = rng.randint(1, 255, (B, T)).astype(np.int64)
    spk = rng.randn(B, 256).astype(np.float32)
    align = np.clip(np.sort(rng.randint(0, T, (B, T)), axis=1), 0, T - 1)

    jm = SVBVAE(dict_size=dict_size, hidden_size=HP["hidden_size"],
                latent_size=HP["latent_size"],
                fvae_hidden=HP["fvae_enc_dec_hidden"],
                fvae_kernel=HP["fvae_kernel_size"],
                fvae_enc_layers=HP["fvae_enc_n_layers"],
                fvae_dec_layers=HP["fvae_dec_n_layers"],
                mel_strides=tuple(HP["mel_strides"]),
                asr_enc_layers=HP["asr_enc_layers"],
                asr_dec_layers=HP["asr_dec_layers"], variant="mle")
    args = (mel_a, mel_p, pitch_a.astype(np.int32), pitch_p.astype(np.int32),
            spk, align.astype(np.int32))
    kwargs = dict(concurrent_ways=("a2a", "p2p", "a2p"))
    params, stats = load_params(jm, args, kwargs, converted, conv_stats)

    with zero_noise(), torch.no_grad():
        rt = tm(amateur_mel=torch.tensor(mel_a), prof_mel=torch.tensor(mel_p),
                amateur_pitch=torch.tensor(pitch_a),
                prof_pitch=torch.tensor(pitch_p),
                amateur_spk_id=torch.tensor(spk),
                prof_spk_id=torch.tensor(spk),
                a2p_alignment=torch.tensor(align),
                concurrent_ways=["a2a", "p2p", "a2p"])
        rj = jm.apply({"params": params, "batch_stats": stats}, *args,
                      rngs={"noise": jax.random.PRNGKey(3)}, **kwargs)

    for way in ("a2a", "p2p"):
        agree(rt[way]["m_q"].numpy().transpose(0, 2, 1), rj[way]["m_q"],
              1e-4, f"{way} m_q")
        agree(rt[way]["logs_q"].numpy().transpose(0, 2, 1), rj[way]["logs_q"],
              1e-4, f"{way} logs_q")
        agree(rt[way]["mel_out"].numpy(), rj[way]["mel_out"], 5e-4,
              f"{way} mel_out")
        agree(rt[way]["kl"].numpy(), rj[way]["kl"], 1e-4, f"{way} kl")
    agree(rt["a2p"]["mle"].numpy(), rj["a2p"]["mle"], 1e-3, "a2p mle")
    agree(rt["a2p"]["mel_out"].numpy(), rj["a2p"]["mel_out"], 5e-4,
          "a2p mel_out")


def test_pwg_official_ckpt_parity(ref):
    """Official ParallelWaveGAN artifact layout: checkpoint with
    ckpt['model']['generator'] + stats.h5 feature scaler + config.yaml
    (reference: vocoders/pwg.py:16-50). Loads through our PWG vocoder and
    checks waveform parity against the reference generator."""
    import os
    import tempfile

    import h5py
    import yaml

    import modules.parallel_wavegan.models as pwg_models
    from neuralsvb_tpu.vocoders.pwg import PWG as JPWG

    torch.manual_seed(0)
    gen_params = dict(layers=6, stacks=3, residual_channels=8,
                      gate_channels=16, skip_channels=8, aux_channels=80,
                      aux_context_window=2,
                      upsample_params={"upsample_scales": [4, 4]})
    tm = pwg_models.ParallelWaveGANGenerator(**gen_params).eval()
    tm.remove_weight_norm()

    mean = np.zeros(80, np.float32) + 0.25
    scale = np.ones(80, np.float32) * 2.0
    with tempfile.TemporaryDirectory() as d:
        torch.save({"model": {"generator": tm.state_dict()}},
                   os.path.join(d, "checkpoint-400000steps.pkl"))
        with h5py.File(os.path.join(d, "stats.h5"), "w") as f:
            f["mean"] = mean
            f["scale"] = scale
        with open(os.path.join(d, "config.yaml"), "w") as f:
            yaml.safe_dump({"generator_params": gen_params, "format": "hdf5",
                            "hop_size": 16}, f)
        hp = {"vocoder_ckpt": d, "audio_sample_rate": 22050, "hop_size": 16,
              "fft_size": 512, "win_size": 512, "audio_num_mel_bins": 80,
              "fmin": 50, "fmax": 11025}
        voc = JPWG(hp)
        assert voc.scaler is not None, "official stats.h5 scaler not loaded"

        rng = np.random.RandomState(1)
        Tm = 32
        mel = rng.randn(Tm, 80).astype(np.float32) - 2

        # reference path: scaler.transform -> pad edge ctx -> z noise
        c = (mel - mean) / scale
        c = np.pad(c, ((2, 2), (0, 0)), "edge")
        z = rng.randn(1, 1, Tm * 16).astype(np.float32)
        with torch.no_grad():
            wav_t = tm(torch.tensor(z), torch.tensor(c.T[None])).view(-1).numpy()

        # ours: inject the same z through the jitted path
        zj = z[0, 0][None, :, None]
        cj = np.pad((mel - mean) / scale, ((2, 2), (0, 0)), mode="edge")[None]
        wav_j = voc._jitted(voc.params, zj, cj, None)
        agree(wav_t, np.asarray(wav_j)[0][: Tm * 16], 1e-4, "pwg official wav")


def test_hifigan_nsf_parity(ref):
    import neuralsvb_tpu.convert.torch2jax as c
    from neuralsvb_tpu.models.hifigan import HifiGanGenerator

    torch.manual_seed(0)
    h = dict(resblock="1", upsample_rates=[4, 4], upsample_kernel_sizes=[8, 8],
             upsample_initial_channel=32, resblock_kernel_sizes=[3],
             resblock_dilation_sizes=[[1, 3, 5]], use_pitch_embed=True,
             audio_sample_rate=22050)
    tm = ref.hifigan.HifiGanGenerator(h).eval()

    jm = HifiGanGenerator(
        upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32, resblock="1",
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3, 5),),
        use_pitch_embed=True, audio_sample_rate=22050)

    # convert through the real file-based path (torch zip checkpoint)
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".ckpt") as f:
        torch.save({"state_dict": {"model_gen": tm.state_dict()}}, f.name)
        converted = c.convert_hifigan(f.name, jm)

    rng = np.random.RandomState(1)
    Tm = 32
    mel = rng.randn(B, Tm, 80).astype(np.float32) - 2
    f0 = np.where(rng.rand(B, Tm) > 0.3, 220.0, 0.0).astype(np.float32)

    params, _ = load_params(jm, (mel, f0), {}, converted)
    with zero_noise(), torch.no_grad():
        wav_t = tm(torch.tensor(mel.transpose(0, 2, 1)), f0=torch.tensor(f0))
        wav_j = jm.apply({"params": params}, mel, f0,
                         rngs={"noise": jax.random.PRNGKey(3)})
    agree(wav_t.numpy()[:, 0], wav_j, 1e-4, "hifigan nsf wav")


def test_radam_parity(ref):
    """optax.scale_by_radam vs the reference torch RAdam
    (modules/parallel_wavegan/optimizers/radam.py:1-91): identical parameter
    trajectories over 12 steps, covering both the pre-rectification (SGD-like)
    and rectified regimes."""
    import optax

    from modules.parallel_wavegan.optimizers.radam import RAdam

    rng = np.random.RandomState(0)
    w0 = rng.randn(7, 5).astype(np.float32)
    grads = [rng.randn(7, 5).astype(np.float32) for _ in range(12)]
    lr = 1e-2

    p = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = RAdam([p], lr=lr, betas=(0.9, 0.999), eps=1e-8)
    for g in grads:
        p.grad = torch.tensor(g)
        opt.step()

    tx = optax.scale_by_radam(b1=0.9, b2=0.999, eps=1e-8)
    w = jnp.asarray(w0)
    state = tx.init(w)
    for g in grads:
        upd, state = tx.update(jnp.asarray(g), state, w)
        w = w - lr * upd
    # eps placement differs slightly (reference adds eps to sqrt(v), optax to
    # sqrt(v_hat)); trajectories agree to ~1e-5 per step at lr 1e-2
    agree(p.detach().numpy(), w, 1e-4, "radam trajectory")


def test_nsw_normalizer_parity(ref):
    """Our Chinese NSW normalizer vs the reference's (utils/text_norm.py:603-717)
    on all rule categories: dates, money, phones, fractions, percentages,
    quantified cardinals, decimals, digit strings, cardinals, O2O case."""
    from utils.text_norm import NSWNormalizer as RefNSW

    from neuralsvb_tpu.utils.text_norm import NSWNormalizer, zh_cardinal

    cases = [
        "固话：0595-23865596或23880880。",
        "手机：+86 19859213959或15659451527。",
        "分数：32477/76391。",
        "百分数：80.03%。",
        "编号：31520181154418。",
        "纯数：2983.07克或12345.60米。",
        "日期：1999年2月20日或09年3月15号。",
        "金钱：12块5，34.5元",
        "特殊：O2O或B2C。",
        "数学：二的平方是四，三分之一。",
        "价格：这个价格是134元",
        "共300余元", "约2.5亿", "新增100多个", "第3个", "10%", "0.03%",
        "1", "10", "14", "105", "110", "123", "2018", "0.5", "3.14",
    ]
    for c in cases:
        for rp in (True, False):
            exp = RefNSW(c).normalize(remove_punc=rp)
            got = NSWNormalizer(c).normalize(remove_punc=rp)
            assert got == exp, f"{c!r} (remove_punc={rp}): {got!r} != {exp!r}"

    # the positional number reader against reference num2chn across the
    # 两 / 零 / 一十 conventions and unit boundaries
    from utils.text_norm import num2chn
    nums = ["0", "2", "10", "12", "20", "22", "102", "110", "120", "200",
            "512", "1001", "1010", "1100", "2000", "2512", "2222", "10000",
            "10001", "10101", "12000", "20000", "22000", "100000", "200000",
            "202020", "2000000", "20000000", "100000000", "200000000",
            "1200000000", "10500", "100100", "2983", "12345", "32477",
            "100000001", "100010000", "1234567890123", "222222", "0.25",
            "2.22", "1020000", "220000", "220000000", "20002", "200002"]
    for n in nums:
        assert zh_cardinal(n) == num2chn(n), (n, zh_cardinal(n), num2chn(n))


@contextlib.contextmanager
def ones_noise():
    """All sampled noise becomes ones — deterministic but non-degenerate
    (exercises the noise-mixing arithmetic, unlike zeros)."""
    t_rand, t_randn_like, t_randn = torch.rand, torch.randn_like, torch.randn
    j_normal = jax.random.normal

    def orand(*size, **kw):
        if len(size) == 1 and isinstance(size[0], (tuple, list, torch.Size)):
            size = tuple(size[0])
        return torch.zeros(*size)

    torch.rand = orand
    torch.randn_like = lambda t, **kw: torch.ones_like(t)
    torch.randn = lambda *s, **kw: torch.ones(
        *(tuple(s[0]) if len(s) == 1 and isinstance(s[0], (tuple, list, torch.Size))
          else s))
    jax.random.normal = (
        lambda key, shape=(), dtype=jnp.float32: jnp.ones(shape, dtype))
    try:
        yield
    finally:
        torch.rand, torch.randn_like, torch.randn = t_rand, t_randn_like, t_randn
        jax.random.normal = j_normal


def test_pulse_cycnoise_parity(ref):
    """PulseGen / CyclicNoiseGen / SourceModuleCycNoise vs the reference NSF
    source variants (reference: source.py:140-349)."""
    import modules.parallel_wavegan.models.source as ref_src

    from neuralsvb_tpu.models.nsf import PulseGen, SourceModuleCycNoise

    rng = np.random.RandomState(0)
    L = 400
    f0 = np.zeros((1, L, 1), np.float32)
    f0[0, 50:180, 0] = 220.0   # voiced segment 1
    f0[0, 250:360, 0] = 330.0  # voiced segment 2

    tm = ref_src.PulseGen(22050, pulse_amp=0.1, noise_std=0.003,
                          voiced_threshold=0).eval()
    jm = PulseGen(22050, pulse_amp=0.1, noise_std=0.003, voiced_threshold=0.0)
    with ones_noise(), torch.no_grad():
        pt_t, sine_t, uv_t, noise_t = tm(torch.tensor(f0))
        out = jm.apply({}, f0, rngs={"noise": jax.random.PRNGKey(0)})
    pt_j, sine_j, uv_j, noise_j = out
    agree(uv_t.numpy(), uv_j, 0, "pulse uv")
    agree(sine_t.numpy(), sine_j, 1e-5, "pulse-mode sine (phase reset)")
    agree(pt_t.numpy(), pt_j, 1e-5, "pulse train")

    tmc = ref_src.SourceModuleCycNoise_v1(22050, 0.003, 0).eval()
    jmc = SourceModuleCycNoise(22050, 0.003, 0.0)
    beta_t = torch.tensor([[[0.87]]])
    with ones_noise(), torch.no_grad():
        cyc_t, n_t, uv_t2 = tmc(torch.tensor(f0), beta_t)
        cyc_j, n_j, uv_j2 = jmc.apply({}, f0, jnp.asarray([[[0.87]]]),
                                      rngs={"noise": jax.random.PRNGKey(0)})
    agree(uv_t2.numpy(), uv_j2, 0, "cyc uv")
    agree(cyc_t.numpy(), cyc_j, 1e-4, "cyclic noise")
    agree(n_t.numpy(), n_j, 1e-6, "cyc noise branch")


def test_hifigan_torch_mel_frontend_parity(ref):
    """mel_spectrogram_hifigan vs the reference torch-mel alternate frontend
    (modules/hifigan/mel_utils.py:45-80). The stubbed librosa mel basis is
    routed to our Slaney filterbank on both sides, so this checks the
    padding / windowing / STFT / compression pipeline."""
    import modules.hifigan.mel_utils as mel_utils

    from neuralsvb_tpu.ops.mel_filters import mel_filterbank
    from neuralsvb_tpu.ops.stft import mel_spectrogram_hifigan

    hp = {"fft_size": 512, "hop_size": 128, "win_size": 400,
          "audio_sample_rate": 22050, "audio_num_mel_bins": 80,
          "fmin": 50, "fmax": 11025}
    orig_fn, orig_basis = mel_utils.librosa_mel_fn, dict(mel_utils.mel_basis)
    mel_utils.librosa_mel_fn = (
        lambda sr, n_fft, num_mels, fmin, fmax:
        np.asarray(mel_filterbank(sr, n_fft, num_mels, fmin, fmax)))
    mel_utils.mel_basis.clear()
    # the reference uses the pre-2.0 torch.stft API (no return_complex);
    # shim it to the old real/imag-stacked layout
    orig_stft = torch.stft

    def old_stft(*args, **kw):
        kw["return_complex"] = True
        return torch.view_as_real(orig_stft(*args, **kw))

    torch.stft = old_stft
    try:
        rng = np.random.RandomState(0)
        y = (0.4 * np.sin(2 * np.pi * 220 * np.arange(4096) / 22050)
             + 0.01 * rng.randn(4096)).astype(np.float32)[None]
        with torch.no_grad():
            ref_mel = mel_utils.mel_spectrogram(torch.tensor(y), hp).numpy()
        ours = mel_spectrogram_hifigan(y, hp)
        agree(ref_mel, ours, 2e-4, "hifigan torch-mel frontend")
    finally:
        torch.stft = orig_stft
        mel_utils.librosa_mel_fn = orig_fn
        mel_utils.mel_basis.clear()
        mel_utils.mel_basis.update(orig_basis)


@pytest.mark.parametrize("causal,scales", [
    (False, [4, 4, 2]), (True, [4, 4, 2]),
    # odd scale: torch crops s//2+1 left of the deconv (padding=s//2+s%2,
    # output_padding=s%2) where flax SAME crops s//2 — a one-sample shift
    # unless the trim is done explicitly
    (False, [5, 2]),
])
def test_melgan_generator_parity(ref, causal, scales):
    """MelGANGenerator, non-causal (reflection-padded) and causal
    (streaming) variants, through convert_melgan_generator.
    Reference: modules/parallel_wavegan/models/melgan.py:18-158,
    layers/causal_conv.py:12-56, layers/residual_stack.py:53-60."""
    import modules.parallel_wavegan.models.melgan as ref_melgan

    from neuralsvb_tpu.convert.torch2jax import convert_melgan_generator
    from neuralsvb_tpu.models.melgan import MelGANGenerator

    stacks, ch, cin = 2, 64, 12
    tg = ref_melgan.MelGANGenerator(
        in_channels=cin, out_channels=1, kernel_size=7, channels=ch,
        upsample_scales=scales, stack_kernel_size=3, stacks=stacks,
        use_causal_conv=causal)
    tg.eval()

    rng = np.random.RandomState(3)
    c = rng.randn(2, 20, cin).astype(np.float32)
    with torch.no_grad():
        want = tg(torch.tensor(c.transpose(0, 2, 1)))[:, 0].numpy()

    params = convert_melgan_generator(sd_numpy(tg), scales, stacks,
                                      use_causal_conv=causal)
    jm = MelGANGenerator(in_channels=cin, channels=ch,
                         upsample_scales=tuple(scales), stacks=stacks,
                         use_causal_conv=causal)
    params, _ = load_params(jm, (jnp.asarray(c),), {}, params)
    got = jm.apply({"params": params}, jnp.asarray(c))
    agree(want, got, 1e-4, f"melgan generator causal={causal}")

    if causal:
        # streaming property: wav[: t0*prod(scales)] must not depend on
        # input frames >= t0
        c2 = c.copy()
        c2[:, 12:] += 1.0
        got2 = jm.apply({"params": params}, jnp.asarray(c2))
        n = 12 * int(np.prod(scales))
        agree(np.asarray(got)[:, :n], np.asarray(got2)[:, :n], 0,
              "melgan causal prefix")


def test_melgan_discriminator_parity(ref):
    """MelGANMultiScaleDiscriminator with the official pooling
    (AvgPool1d count_include_pad=False) and reflection-padded first conv.
    Reference: modules/parallel_wavegan/models/melgan.py:194-394."""
    import modules.parallel_wavegan.models.melgan as ref_melgan

    from neuralsvb_tpu.convert.torch2jax import _conv, conv1d_to_flax
    from neuralsvb_tpu.models.melgan import MelGANMultiScaleDiscriminator

    td = ref_melgan.MelGANMultiScaleDiscriminator()
    td.eval()
    sd = sd_numpy(td)

    def scale_params(d):
        p = {"conv_0": _conv(sd, f"discriminators.{d}.layers.0.1")}
        for i in range(1, 5):
            p[f"conv_{i}"] = _conv(sd, f"discriminators.{d}.layers.{i}.0")
        p["conv_5"] = _conv(sd, f"discriminators.{d}.layers.5.0")
        p["conv_post"] = _conv(sd, f"discriminators.{d}.layers.6")
        return p

    converted = {f"scale_{d}": scale_params(d) for d in range(3)}
    rng = np.random.RandomState(5)
    x = rng.randn(2, 4096).astype(np.float32) * 0.3
    jm = MelGANMultiScaleDiscriminator()
    params, _ = load_params(jm, (jnp.asarray(x),), {}, converted)
    got = jm.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        want = td(torch.tensor(x)[:, None])
    for d in range(3):
        # reference returns per-layer outputs; ours (score, fmaps): score is
        # the last layer, fmaps[:-1] are the activated intermediates
        agree(want[d][-1][:, 0].numpy(), got[d][0], 1e-4, f"disc scale {d}")
        for li in range(6):
            agree(want[d][li].numpy().transpose(0, 2, 1), got[d][1][li],
                  1e-4, f"disc scale {d} fmap {li}")


def test_melgan_streaming_chunked_equals_full():
    """Causal MelGAN chunked streaming (melgan_stream) reproduces the
    full-utterance forward exactly once the context covers the receptive
    field."""
    from neuralsvb_tpu.models.melgan import MelGANGenerator, melgan_stream

    m = MelGANGenerator(in_channels=10, channels=64, upsample_scales=(4, 4, 2),
                        stacks=2, use_causal_conv=True)
    rng = np.random.RandomState(11)
    mel = jnp.asarray(rng.randn(2, 50, 10).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), mel)
    full = m.apply(v, mel)
    chunked = melgan_stream(m, v, mel, chunk=7, context=24)
    assert chunked.shape == full.shape
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                               rtol=0, atol=1e-6)
