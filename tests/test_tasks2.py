"""Smoke tests for the secondary task families: SVBPara, SVBPPG, vocoder
training and the DTW accuracy harness."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

SR = 22050


def _sing(freq, dur, seed):
    rng = np.random.RandomState(seed)
    t = np.arange(int(SR * dur)) / SR
    vib = freq * (1 + 0.03 * np.sin(2 * np.pi * 5 * t))
    wav = 0.3 * np.sin(2 * np.pi * np.cumsum(vib) / SR)
    return (wav + 0.01 * rng.randn(len(t))).astype(np.float32)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("svb2")
    from neuralsvb_tpu.hparams import hparams, load_config_recursive
    from neuralsvb_tpu.ops.audio import save_wav
    data_dir = root / "processed" / "data" / "p1"
    data_dir.mkdir(parents=True)
    for spk, song, freq in [("Female1", "SongA", 220.0), ("Male6", "SongC", 150.0)]:
        for idx in range(2):
            dur = 1.0 + 0.1 * idx
            save_wav(_sing(freq * 1.02, dur, idx),
                     str(data_dir / f"{spk}#singing#{song}_Amateur_{idx}.wav"), SR)
            save_wav(_sing(freq, dur * 0.95, idx + 9),
                     str(data_dir / f"{spk}#singing#{song}_Professional_{idx}.wav"), SR)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.chdir(repo)
    common = {
        "processed_data_dir": str(root / "processed"),
        "binary_data_dir": str(root / "binary"),
        "spk_emb_data_dir": str(root / "spk_emb"),
        "work_dir": str(root / "work"),
        "hidden_size": 32, "latent_size": 8, "mel_disc_hidden_size": 8,
        "disc_win_num": 2, "asr_enc_layers": 1, "asr_dec_layers": 1,
        "dec_layers": 1, "ref_enc_out": 32,
        "max_frames": 200, "max_tokens": 2000, "max_sentences": 2,
        "test_prefixes": ["Male6#singing#"], "pretrain_asr_ckpt": "",
        "ds_workers": 1, "ge2e_ckpt": "", "mesh_shape": "data:2",
        "disc_start_steps": 0, "num_test_samples": 0,
    }
    bin_cfg = load_config_recursive("egs/datasets/audio/PopBuTFy/para_bin.yaml")
    bin_cfg.update(common)
    bin_cfg["binarization_args"]["with_wav"] = True  # for vocoder training
    hparams.clear()
    hparams.update(bin_cfg)
    from neuralsvb_tpu.data.binarizer import PopBuTFyENSpkEMBinarizer, SaveSpkEmb
    SaveSpkEmb().process()
    PopBuTFyENSpkEMBinarizer().process()
    cfg = load_config_recursive("egs/datasets/audio/PopBuTFy/vae_global_mle_eng.yaml")
    cfg.update(common)
    return root, cfg


def _steps(task, batch, step=5):
    outs = {}
    for opt in range(task.num_optimizers):
        ret = task.training_step(batch, step, opt)
        if ret is not None:
            total, logs = ret
            assert np.isfinite(float(total)), (opt, logs)
            outs[opt] = logs
    return outs


def test_svb_para_task(env):
    root, cfg = env
    from neuralsvb_tpu.hparams import hparams
    hparams.clear()
    hparams.update(cfg)
    hparams["concurrent_ways"] = "a2a,p2p,a2p"
    from neuralsvb_tpu.tasks.svb_para import ParaPPGPretrainedTask, SVBParaTask
    task = SVBParaTask()
    task.build_model()
    batch = next(iter(task.train_dataloader()))
    outs = _steps(task, batch)
    assert 0 in outs and 1 in outs
    assert any(k.startswith("l1a2p") or k.startswith("ssima2p") for k in outs[0])
    val = task.validation_step(batch, 0)
    assert np.isfinite(val["total_loss"])

    # frozen-ASR variant: vc_asr excluded from updates
    task2 = ParaPPGPretrainedTask()
    task2.build_model()
    before = np.asarray(task2.get_state()["params"]["vc_asr"]["mel_prenet"]
                        ["Conv_0"]["kernel"]).copy()
    _steps(task2, batch)
    after = np.asarray(task2.get_state()["params"]["vc_asr"]["mel_prenet"]
                       ["Conv_0"]["kernel"])
    np.testing.assert_array_equal(before, after)


def test_svb_ppg_task(env):
    root, cfg = env
    from neuralsvb_tpu.hparams import hparams
    hparams.clear()
    hparams.update(cfg)
    from neuralsvb_tpu.tasks.svb_ppg import SVBPPGTask
    task = SVBPPGTask()
    task.build_model()
    batch = next(iter(task.train_dataloader()))
    outs = _steps(task, batch)
    assert 0 in outs


def test_pitch_alignment_harness(env):
    root, cfg = env
    from neuralsvb_tpu.hparams import hparams
    hparams.clear()
    hparams.update(cfg)
    from neuralsvb_tpu.tasks.pitch_alignment_task import evaluate
    res = evaluate("test", ("EHSADTW", "NaiveDTW"), n_workers=2)
    assert "EHSADTW" in res and 0 <= res["EHSADTW"]["avg"] <= 1


def test_vocoder_task(env):
    root, cfg = env
    from neuralsvb_tpu.hparams import hparams
    hparams.clear()
    hparams.update(cfg)
    hparams.update({
        "max_samples": 2048, "max_sentences": 2, "resblock": "1",
        "upsample_rates": [8, 4, 4], "upsample_kernel_sizes": [16, 8, 8],
        "upsample_initial_channel": 16, "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 3]], "use_pitch_embed": True,
        "lambda_mel": 5.0, "lambda_adv": 1.0, "use_fm_loss": False,
        "adam_b1": 0.8, "adam_b2": 0.99, "disc_start_steps": 0,
        "generator_grad_norm": 10, "discriminator_grad_norm": 1,
    })
    from neuralsvb_tpu.tasks.vocoder_task import HifiGanTask
    task = HifiGanTask()
    task.build_model()
    batch = next(iter(task.train_dataloader()))
    assert batch["wavs"].shape[1] == 2048
    outs = _steps(task, batch, step=5)
    assert 0 in outs and 1 in outs
    assert "mel" in outs[0] and "r_p" in outs[1]
    val = task.validation_step(batch, 0)
    assert np.isfinite(val["total_loss"])


def test_stft_loss_and_melgan():
    import jax
    import jax.numpy as jnp
    from neuralsvb_tpu.models.melgan import (MelGANGenerator,
                                             MelGANMultiScaleDiscriminator)
    from neuralsvb_tpu.models.stft_loss import multi_resolution_stft_loss
    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.randn(2, 4096).astype(np.float32) * 0.1)
    sc0, mag0 = multi_resolution_stft_loss(y, y)
    assert float(sc0) < 1e-5 and float(mag0) < 1e-5
    y2 = y + 0.05 * jnp.asarray(rng.randn(2, 4096).astype(np.float32))
    sc1, mag1 = multi_resolution_stft_loss(y2, y)
    assert float(sc1) > 0 and float(mag1) > 0

    g = MelGANGenerator(channels=32, upsample_scales=(4, 4, 8), stacks=2)
    mel = jnp.zeros((1, 8, 80))
    v = g.init(jax.random.PRNGKey(0), mel)
    wav = g.apply(v, mel)
    assert wav.shape == (1, 8 * 128)
    d = MelGANMultiScaleDiscriminator()
    dv = d.init(jax.random.PRNGKey(1), wav)
    outs = d.apply(dv, wav)
    assert len(outs) == 3 and outs[0][0].ndim == 2


def test_pwg_training_task(env):
    root, cfg = env
    from neuralsvb_tpu.hparams import hparams
    hparams.clear()
    hparams.update(cfg)
    hparams.update({
        "max_samples": 2048, "max_sentences": 2,
        "generator_params": {"layers": 4, "stacks": 2, "residual_channels": 8,
                             "gate_channels": 16, "skip_channels": 8,
                             "upsample_scales": [4, 4, 8]},
        "aux_context_window": 2, "lambda_adv": 4.0,
        "generator_grad_norm": 10, "discriminator_grad_norm": 1,
        "disc_start_steps": 0,
    })
    from neuralsvb_tpu.tasks.vocoder_task import PWGTask
    task = PWGTask()
    task.build_model()
    batch = next(iter(task.train_dataloader()))
    outs = _steps(task, batch, step=5)
    assert "sc" in outs[0] and "mag" in outs[0] and "a" in outs[0]
    assert "r" in outs[1] and "f" in outs[1]
    val = task.validation_step(batch, 0)
    assert np.isfinite(val["total_loss"])


def test_svb_para_inference(env, tmp_path_factory):
    root, cfg = env
    from neuralsvb_tpu.hparams import hparams
    hparams.clear()
    hparams.update(cfg)
    hparams.update({"concurrent_ways": "a2a,p2p,a2p", "infer": True,
                    "vocoder_ckpt": str(root / "novoc"),
                    "upsample_rates": [8, 4, 4], "upsample_kernel_sizes": [16, 8, 8],
                    "upsample_initial_channel": 8, "use_pitch_embed": True,
                    "gen_dir_name": "", "work_dir": str(root / "work_para")})
    from neuralsvb_tpu.tasks.svb_para import SVBParaTask
    task = SVBParaTask()
    task.build_model()
    task.global_step = 7
    task.test_start()
    loader = task.test_dataloader()
    outs = []
    for i, b in enumerate(loader):
        outs.append(task.test_step(b, i))
        break
    task.test_end(outs)
    gen = os.path.join(str(root / "work_para"), "generated_7_")
    for sub in ["gt_a_wavout", "a2p_wavout"]:
        d = os.path.join(gen, "wavs", sub)
        assert os.path.isdir(d) and len(os.listdir(d)) == 1, d
    hparams["infer"] = False


def test_vc_raw_wav_inputs(env):
    root, cfg = env
    from neuralsvb_tpu.hparams import hparams
    hparams.clear()
    hparams.update(cfg)
    hparams.update({"use_pitch_embed": True, "pitch_norm": "standard",
                    "use_uv": True, "f0_mean": 220.0, "f0_std": 60.0,
                    "normalize_pitch": False, "frames_multiple": 4,
                    "vocoder": "pwg", "vocoder_ckpt": ""})
    from neuralsvb_tpu.tasks.vc_ppg import load_test_inputs
    wav_dir = str(root / "processed" / "data" / "p1")
    import glob as g
    wavs = sorted(g.glob(os.path.join(wav_dir, "*.wav")))[:2]
    items, sizes = load_test_inputs(wavs, ["w0", "w1"])
    assert len(items) == 2
    assert items[0]["mel"].shape[1] == 80
    assert "f0" in items[0] and "pitch" in items[0]


def test_spk_consistent_and_amtspk(env):
    root, cfg = env
    from neuralsvb_tpu.hparams import hparams
    hparams.clear()
    hparams.update(cfg)
    hparams["concurrent_ways"] = "a2a,p2p,a2p"
    from neuralsvb_tpu.tasks.svb_para import AmtSpkTask, ParaPPGSpkConsistentTask
    hparams["ref_enc_out"] = 256  # spk-emb/ref-encoder width must match
    task = ParaPPGSpkConsistentTask()
    task.build_model()
    assert "_spk" in task.discriminators
    batch = next(iter(task.train_dataloader()))
    outs = _steps(task, batch)
    assert any("_spk" in k for k in outs[0]), outs[0].keys()  # spk adv term
    assert any("_spk" in k for k in outs[1]), outs[1].keys()

    task2 = AmtSpkTask()
    task2.build_model()
    outs2 = _steps(task2, batch)
    assert 0 in outs2 and np.isfinite(sum(
        float(v) for v in outs2[0].values()))


def test_para_ppg_constraint_task(env):
    """ParaPPGConstraintTask: aligned amateur CE + ppg_constraint MSE against
    the detached professional content (reference: svb_para.py:371-407)."""
    root, cfg = env
    from neuralsvb_tpu.hparams import hparams
    hparams.clear()
    hparams.update(cfg)
    hparams["concurrent_ways"] = "a2a,p2p,a2p"
    from neuralsvb_tpu.tasks.svb_para import ParaPPGConstraintTask
    task = ParaPPGConstraintTask()
    task.build_model()
    batch = dict(next(iter(task.train_dataloader())))
    B = batch["mels"].shape[0]
    batch["txt_tokens"] = np.tile(np.array([4, 5, 6, 7, 0, 0]), (B, 1))
    outs = _steps(task, batch)
    logs = outs[0]
    for key in ("asr_a", "asr_p", "ppg_constraint"):
        assert key in logs and np.isfinite(logs[key]), (key, logs)
    assert logs["ppg_constraint"] >= 0
