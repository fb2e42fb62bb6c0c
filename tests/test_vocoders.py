"""Vocoder tests: HiFiGAN-NSF / PWG shapes + jit, conversion layout rules
verified against torch ops, NSF sine generator properties."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from neuralsvb_tpu.convert.torch2jax import (conv1d_to_flax, convt1d_to_flax,
                                             fold_weight_norm, linear_to_flax)
from neuralsvb_tpu.models.hifigan import HifiGanGenerator
from neuralsvb_tpu.models.nsf import SineGen
from neuralsvb_tpu.models.pwg import ParallelWaveGANGenerator

RNGS = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}


def test_conv1d_layout_matches_torch():
    import flax.linen as nn
    tconv = torch.nn.Conv1d(3, 5, 7, padding=3)
    x = torch.randn(2, 3, 20)
    ref = tconv(x).detach().numpy()  # [2, 5, 20]
    fconv = nn.Conv(5, (7,), padding=[(3, 3)])
    params = conv1d_to_flax(tconv.weight.detach().numpy(), tconv.bias.detach().numpy())
    ours = fconv.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 2, 1), ref, atol=1e-5)


def test_convtranspose1d_layout_matches_torch():
    import flax.linen as nn
    u, k = 4, 8
    tconv = torch.nn.ConvTranspose1d(6, 3, k, stride=u, padding=(k - u) // 2)
    x = torch.randn(2, 6, 10)
    ref = tconv(x).detach().numpy()  # [2, 3, 40]
    fconv = nn.ConvTranspose(3, (k,), strides=(u,), padding="SAME",
                             transpose_kernel=True)
    params = convt1d_to_flax(tconv.weight.detach().numpy(), tconv.bias.detach().numpy())
    ours = fconv.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    assert ours.shape == (2, 40, 3)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 2, 1), ref, atol=1e-5)


def test_fold_weight_norm():
    conv = torch.nn.utils.weight_norm(torch.nn.Conv1d(4, 8, 3))
    sd = {k: v.detach().numpy() for k, v in conv.state_dict().items()}
    folded = fold_weight_norm(sd)
    assert "weight" in folded and "weight_v" not in folded
    w_ref = torch.nn.utils.remove_weight_norm(conv).weight.detach().numpy()
    np.testing.assert_allclose(folded["weight"], w_ref, atol=1e-6)


def test_sinegen_voiced_unvoiced():
    sg = SineGen(16000, harmonic_num=2)
    f0 = jnp.zeros((1, 800, 1)).at[:, :400].set(200.0)
    vars_ = sg.init(RNGS, f0)
    sines, uv, noise = sg.apply(vars_, f0, rngs={"noise": jax.random.PRNGKey(2)})
    assert sines.shape == (1, 800, 3)
    assert float(uv[:, :400].mean()) == 1.0 and float(uv[:, 400:].mean()) == 0.0
    # voiced: ~amp^2/2 = 5e-3; unvoiced: noise (amp/3)^2 ~ 1.1e-3
    voiced_power = float((sines[0, 50:350, 0] ** 2).mean())
    unvoiced_power = float((sines[0, 450:750, 0] ** 2).mean())
    assert voiced_power > 3 * unvoiced_power
    # fundamental frequency is right: count zero crossings ~ 2*f0*T
    s = np.asarray(sines[0, 50:350, 0])
    zc = int((np.diff(np.sign(s)) != 0).sum())
    expected = 2 * 200 * (300 / 16000)
    assert abs(zc - expected) <= 2, (zc, expected)


def test_hifigan_generator_shapes():
    model = HifiGanGenerator(upsample_rates=(4, 4, 2), upsample_kernel_sizes=(8, 8, 4),
                             upsample_initial_channel=32, use_pitch_embed=True)
    mel = jnp.zeros((1, 24, 80))
    f0 = jnp.full((1, 24), 220.0)
    vars_ = model.init(RNGS, mel, f0)
    wav = jax.jit(lambda p, m, f: model.apply(
        {"params": p}, m, f, rngs={"noise": jax.random.PRNGKey(3)}))(
        vars_["params"], mel, f0)
    assert wav.shape == (1, 24 * 32)
    assert np.abs(np.asarray(wav)).max() <= 1.0


def test_pwg_generator_shapes():
    model = ParallelWaveGANGenerator(layers=6, stacks=3, upsample_scales=(4, 4, 8))
    hop = 128
    T = 12
    z = jnp.zeros((1, T * hop, 1))
    c = jnp.zeros((1, T + 4, 80))
    vars_ = model.init(jax.random.PRNGKey(0), z, c)
    wav = model.apply(vars_, z, c)
    assert wav.shape == (1, T * hop)


def test_hifigan_vocoder_wrapper(tmp_path, monkeypatch):
    """End-to-end spec2wav through the registry (random init smoke mode)."""
    from neuralsvb_tpu import hparams as hp_mod
    from neuralsvb_tpu.vocoders import get_vocoder_cls
    hp = {"vocoder": "hifigan", "vocoder_ckpt": str(tmp_path / "none"),
          "audio_sample_rate": 22050, "audio_num_mel_bins": 80, "fft_size": 512,
          "hop_size": 128, "win_size": 512, "fmin": 50, "fmax": 11025,
          "upsample_rates": (8, 4, 4), "upsample_kernel_sizes": (16, 8, 8),
          "upsample_initial_channel": 16, "use_pitch_embed": True}
    cls = get_vocoder_cls(hp)
    voc = cls(hp)
    mel = np.random.RandomState(0).randn(50, 80).astype(np.float32)
    f0 = np.full(50, 220.0, np.float32)
    wav = voc.spec2wav(mel, f0=f0)
    assert wav.shape == (50 * 128,)
    # second call with a different length hits the same bucket (no recompile)
    wav2 = voc.spec2wav(mel[:40], f0=f0[:40])
    assert wav2.shape == (40 * 128,)


def test_hifigan_wrapper_denoise(tmp_path):
    """vocoder_denoise_c > 0 routes through spectral subtraction
    (reference: hifigan wrapper denoise option)."""
    from neuralsvb_tpu.vocoders import get_vocoder_cls
    hp = {"vocoder": "hifigan", "vocoder_ckpt": str(tmp_path / "none"),
          "audio_sample_rate": 22050, "audio_num_mel_bins": 80, "fft_size": 512,
          "hop_size": 128, "win_size": 512, "fmin": 50, "fmax": 11025,
          "upsample_rates": (8, 4, 4), "upsample_kernel_sizes": (16, 8, 8),
          "upsample_initial_channel": 16, "use_pitch_embed": True,
          "vocoder_denoise_c": 0.01}
    voc = get_vocoder_cls(hp)(hp)
    mel = np.random.RandomState(0).randn(50, 80).astype(np.float32)
    f0 = np.full(50, 220.0, np.float32)
    wav = voc.spec2wav(mel, f0=f0)
    assert np.isfinite(wav).all() and len(wav) > 0
    hp2 = dict(hp, vocoder_denoise_c=0.0)
    wav_raw = get_vocoder_cls(hp2)(hp2).spec2wav(mel, f0=f0)
    assert not np.allclose(wav[: len(wav_raw)], wav_raw[: len(wav)])


def test_pwg_wav2spec_wav2mfcc(tmp_path):
    """wav2spec linear branch and MFCC+deltas extraction shapes/finiteness."""
    from neuralsvb_tpu.hparams import hparams
    from neuralsvb_tpu.ops.audio import save_wav
    from neuralsvb_tpu.vocoders.pwg import PWG
    hp = {"audio_sample_rate": 22050, "audio_num_mel_bins": 80,
          "fft_size": 512, "hop_size": 128, "win_size": 512,
          "fmin": 50, "fmax": 11025, "loud_norm": False,
          "min_level_db": -100, "ref_level_db": 20}
    hparams.clear()
    hparams.update(hp)
    sr = 22050
    t = np.arange(sr) / sr
    wav = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    fn = str(tmp_path / "a.wav")
    save_wav(wav, fn, sr)
    wav_out, mel, spc = PWG.wav2spec(fn, return_linear=True)
    assert mel.shape[1] == 80 and spc.shape[1] == 512 // 2 + 1
    assert abs(mel.shape[0] - spc.shape[0]) <= 1
    mfcc = PWG.wav2mfcc(fn)
    assert mfcc.shape[1] == 39  # 13 mfcc + delta + delta2
    assert np.isfinite(mfcc).all()
