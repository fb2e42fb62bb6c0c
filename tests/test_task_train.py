"""End-to-end task test: binarize synthetic pairs -> SVBVAEMleTask ->
train steps through all 3 phases (gen/disc/map) -> validation -> jitted
inference + wav dumping, on the virtual multi-device CPU mesh."""

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
def task_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("svb")
    from neuralsvb_tpu.hparams import hparams, load_config_recursive
    from neuralsvb_tpu.ops.audio import save_wav

    data_dir = root / "processed" / "data" / "p1"
    data_dir.mkdir(parents=True)
    for spk, song, freq in [("Female1", "SongA", 220.0), ("Female1", "SongB", 250.0),
                            ("Male6", "SongC", 150.0)]:
        for idx in range(2):
            dur = 1.0 + 0.1 * idx
            save_wav(_sing(freq * 1.02, dur, idx),
                     str(data_dir / f"{spk}#singing#{song}_Amateur_{idx}.wav"), SR)
            save_wav(_sing(freq, dur * 0.95, idx + 9),
                     str(data_dir / f"{spk}#singing#{song}_Professional_{idx}.wav"), SR)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.chdir(repo)  # config chains use repo-relative paths
    common = {
        "processed_data_dir": str(root / "processed"),
        "binary_data_dir": str(root / "binary"),
        "spk_emb_data_dir": str(root / "spk_emb"),
        "work_dir": str(root / "work"),
        # tiny model for test speed
        "hidden_size": 32, "latent_size": 8, "fvae_enc_dec_hidden": 16,
        "fvae_enc_n_layers": 2, "fvae_dec_n_layers": 2,
        "asr_enc_layers": 1, "asr_dec_layers": 1,
        "mel_disc_hidden_size": 8, "disc_win_num": 2,
        "max_frames": 200, "max_tokens": 2000, "max_sentences": 2,
        "test_prefixes": ["Male6#singing#"],
        "pretrain_asr_ckpt": "", "vocoder_ckpt": str(root / "novocoder"),
        # tiny hifigan so spec2wav is fast
        "upsample_rates": [8, 4, 4], "upsample_kernel_sizes": [16, 8, 8],
        "upsample_initial_channel": 8, "use_pitch_embed": True,
        "ds_workers": 1, "infer": False, "num_test_samples": 0,
        "ge2e_ckpt": "", "mesh_shape": "data:2",
        "phase_1_steps": -1, "phase_2_steps": 3, "disc_start_steps": 0,
        "num_valid_plots": 0, "valid_infer_interval": 10 ** 9,
        "gen_dir_name": "",
    }

    # binarize with the para_bin chain (carries `datasets`), as the reference does
    bin_cfg = load_config_recursive("egs/datasets/audio/PopBuTFy/para_bin.yaml")
    bin_cfg.update(common)
    hparams.clear()
    hparams.update(bin_cfg)
    from neuralsvb_tpu.data.binarizer import PopBuTFyENSpkEMBinarizer, SaveSpkEmb
    SaveSpkEmb().process()
    PopBuTFyENSpkEMBinarizer().process()

    cfg = load_config_recursive("egs/datasets/audio/PopBuTFy/vae_global_mle_eng.yaml")
    cfg.update(common)
    return root, cfg


def test_train_val_infer(task_env):
    root, cfg = task_env
    from neuralsvb_tpu.hparams import hparams
    hparams.clear()
    hparams.update(cfg)
    from neuralsvb_tpu.tasks.svb_vae_task import SVBVAEMleTask

    task = SVBVAEMleTask()
    assert task.n_devices == 2
    task.build_model()

    loader = iter(task.train_dataloader())
    batch = next(loader)
    assert batch["mels"].shape[0] % 2 == 0  # divisible by mesh

    # phase 2 (steps 0..3): gen + disc run, map idle
    logs_seen = {}
    for step in range(3):
        task.global_step = step
        for opt_idx in range(3):
            ret = task.training_step(batch, step, opt_idx)
            if ret is not None:
                total, logs = ret
                assert np.isfinite(float(total)), (step, opt_idx, logs)
                logs_seen[(min(step, 1), opt_idx)] = logs
    assert (1, 0) in logs_seen and (1, 1) in logs_seen
    assert (1, 2) not in logs_seen
    gen_logs = logs_seen[(1, 0)]
    assert any("kl" in k for k in gen_logs)
    assert any(k.startswith("l1") or k.startswith("ssim") for k in gen_logs)
    assert any(k.endswith("_a") for k in gen_logs)  # adversarial term
    disc_logs = logs_seen[(1, 1)]
    assert any(k.endswith("_r") for k in disc_logs)

    # phase 3: only map step runs, with mle loss
    step = 5
    task.global_step = step
    assert task.training_step(batch, step, 0) is None
    assert task.training_step(batch, step, 1) is None
    ret = task.training_step(batch, step, 2)
    assert ret is not None
    total, logs = ret
    assert any(k.endswith("_mle") for k in logs), logs
    assert np.isfinite(float(total))

    # mapping params changed, generator params did not (map step)
    # (spot check z_mapping_function vs encoded_embed_proj)
    before = task.get_state()
    ret = task.training_step(batch, step + 1, 2)
    after = task.get_state()
    zb = before["params"]["z_mapping_function"]["conv_0"]["kernel"]
    za = after["params"]["z_mapping_function"]["conv_0"]["kernel"]
    assert np.abs(np.asarray(zb) - np.asarray(za)).max() > 0
    eb = before["params"]["encoded_embed_proj"]["kernel"]
    ea = after["params"]["encoded_embed_proj"]["kernel"]
    np.testing.assert_array_equal(np.asarray(eb), np.asarray(ea))

    # validation
    val_out = task.validation_step(batch, 0)
    assert np.isfinite(val_out["total_loss"])
    agg = task.validation_end([val_out])
    assert "val_loss" in agg

    # inference end-to-end (test split = Male6 pairs), bs=1
    hparams["infer"] = True
    task.global_step = 10
    task.test_start()
    test_loader = task.test_dataloader()
    outs = []
    for i, b in enumerate(test_loader):
        outs.append(task.test_step(b, i))
        break
    task.test_end(outs)
    gen_dir = os.path.join(cfg["work_dir"], "generated_10_")
    for sub in ["gt_a_wavout", "gt_p_wavout", "a2a_wavout", "p2p_wavout", "a2p_wavout"]:
        d = os.path.join(gen_dir, "wavs", sub)
        assert os.path.isdir(d) and len(os.listdir(d)) == 1, d
    for sub in ["gt_a_mel", "a2p_mel"]:
        d = os.path.join(gen_dir, "mels", sub)
        assert os.path.isdir(d) and len(os.listdir(d)) == 1, d

    # batched inference: one batch of 2 utterances, per-item outputs
    hparams["infer_batch_size"] = 2
    task.global_step = 11
    task.test_start()
    outs = []
    for i, b in enumerate(task.test_dataloader()):
        assert b["nsamples"] == 2
        outs.append(task.test_step(b, i))
        break
    task.test_end(outs)
    d = os.path.join(cfg["work_dir"], "generated_11_", "wavs", "a2p_wavout")
    assert len(os.listdir(d)) == 2, os.listdir(d)
    hparams["infer_batch_size"] = 1
    hparams["infer"] = False


def test_learning_dynamics(task_env):
    """Gen-step losses decrease when overfitting one batch (validates that
    gradients actually improve the reconstruction)."""
    root, cfg = task_env
    from neuralsvb_tpu.hparams import hparams
    hparams.clear()
    hparams.update(cfg)
    hparams.update({"mesh_shape": "data:1", "lambda_mel_adv": 0.0,
                    "lr": 0.5, "warmup_updates": 10, "infer": False,
                    "phase_2_steps": 1000})
    from neuralsvb_tpu.tasks.svb_vae_task import SVBVAEMleTask
    task = SVBVAEMleTask()
    task.build_model()
    batch = next(iter(task.train_dataloader()))
    first = None
    last = None
    for step in range(30):
        ret = task.training_step(batch, step, 0)  # phase 2 (gen only)
        assert ret is not None
        total, logs = ret
        recon = float(logs["l1p2p"]) + float(logs["l1a2a"])
        if first is None:
            first = recon
        last = recon
    assert last < first * 0.9, (first, last)


def test_trainer_fused_dispatch_matches_stepwise(task_env):
    """Full Trainer.fit equivalence: per-step dispatch vs the K=2 fused
    lax.scan window path (steps_per_dispatch + drop_last_batch +
    collate_bucket_quant) must produce identical final parameters — the
    trainer windowing, loader shape filtering and cycle scan compose
    without changing training semantics."""
    root, cfg = task_env
    from neuralsvb_tpu.hparams import hparams
    from neuralsvb_tpu.tasks.svb_vae_task import SVBVAEMleTask
    from neuralsvb_tpu.training.trainer import Trainer

    def run(work_dir, extra):
        c = dict(cfg)
        # uniform shapes: every train batch pads to (2, 200) so windows form;
        # 4 train items / max_sentences 2 -> full batches, nothing dropped
        c.update(work_dir=str(work_dir), collate_bucket_quant=200,
                 phase_2_steps=100, max_updates=6, num_sanity_val_steps=0,
                 val_check_interval=10 ** 6, tb_log_interval=10 ** 6,
                 infer=False)
        c.update(extra)
        hparams.clear()
        hparams.update(c)
        np.random.seed(c.get("seed", 1234))
        task = SVBVAEMleTask()
        trainer = Trainer(work_dir=c["work_dir"],
                          val_check_interval=c.get("val_check_interval",
                                                   10 ** 6),
                          tb_log_interval=10 ** 6, max_updates=6,
                          num_sanity_val_steps=0, save_best=False)
        trainer.fit(task)
        assert task.global_step == 6
        return task.get_state()["params"]

    p_step = run(root / "w_step", {"steps_per_dispatch": 1})
    p_fused = run(root / "w_fused", {"steps_per_dispatch": 2,
                                     "drop_last_batch": True})
    # validation at step 4 forces the prefetched pending window to drain
    # before run_evaluation (and window_must_flush keeps windows off the
    # boundary) — must not change training semantics
    p_val = run(root / "w_val", {"steps_per_dispatch": 2,
                                 "drop_last_batch": True,
                                 "val_check_interval": 4})
    # K=4 > batches-per-epoch (2): every window goes ragged at epoch end ->
    # dispatch-pending + per-step fallback path
    p_ragged = run(root / "w_ragged", {"steps_per_dispatch": 4,
                                       "drop_last_batch": True})
    import jax
    leaves1, tree1 = jax.tree_util.tree_flatten(p_step)
    # scan-compiled and inline-compiled XLA programs reassociate float ops
    # (single-step delta ~5e-8, tests/test_cycle.py); over 6 adversarial
    # optimizer steps that compounds to ~1e-5 — far below any training
    # signal, but not bit-exact
    for other in (p_fused, p_val, p_ragged):
        leaves2, tree2 = jax.tree_util.tree_flatten(other)
        assert tree1 == tree2
        for a, b in zip(leaves1, leaves2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=1e-4)


def test_pipelined_dispatch_logs_at_computed_step(task_env, monkeypatch):
    """TB points under pipelined fused dispatch must be attributed to the
    step each window ENDED at — dispatch_pending resolves window N-1's
    losses while global_step already points past window N, so logging at
    the current step would shift every training curve by K. The final
    window's logs (drained at end of training / epoch boundaries) must
    appear too, not be dropped."""
    root, cfg = task_env
    from neuralsvb_tpu.hparams import hparams
    from neuralsvb_tpu.tasks.svb_vae_task import SVBVAEMleTask
    from neuralsvb_tpu.training.trainer import Trainer

    c = dict(cfg)
    # deterministic window structure: singleton batches all bucket-pad to
    # the same (1, 200, ...) shape so no signature flush ever goes ragged,
    # and disc_start_steps=-1 keeps _disc_start constant from step 0 (with
    # the default 0, _disc_start(0) != _disc_start(1) forces the FIRST
    # batch out of the window as a per-step fallback)
    c.update(work_dir=str(root / "w_logstep"), collate_bucket_quant=200,
             phase_2_steps=100, max_updates=6, num_sanity_val_steps=0,
             val_check_interval=10 ** 6, tb_log_interval=2, infer=False,
             steps_per_dispatch=2, drop_last_batch=True, max_sentences=1,
             disc_start_steps=-1)
    hparams.clear()
    hparams.update(c)
    np.random.seed(c.get("seed", 1234))

    records = []

    class FakeLogger:
        def add_scalar(self, tag, value, step):
            records.append((tag, step))

        def __getattr__(self, name):  # add_audio/add_figure/flush/close
            return lambda *a, **k: None

    def fake_build_logger(self, task):
        self.logger = FakeLogger()
        task.logger = self.logger

    monkeypatch.setattr(Trainer, "_build_logger", fake_build_logger)
    task = SVBVAEMleTask()
    trainer = Trainer(work_dir=c["work_dir"], val_check_interval=10 ** 6,
                      tb_log_interval=2, max_updates=6,
                      num_sanity_val_steps=0, save_best=False)
    trainer.fit(task)
    assert task.global_step == 6
    tr_steps = sorted({s for t, s in records if t.startswith("tr/")})
    # 4 singleton batches/epoch, K=2 -> fused windows end at steps 2, 4
    # (epoch 1) and 6 (epoch 2, drained by the final dispatch_pending);
    # each must be logged at ITS end step. Without step attribution the
    # pipeline logs window N at window N+1's dispatch (gs already +K):
    # [4, 6] with window 1's point shifted and the last window's GATED
    # (6 // interval == _last_tb_step // interval) -> curve loses points.
    assert tr_steps == [2, 4, 6], tr_steps
