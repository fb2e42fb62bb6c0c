"""K-step fused training cycle (lax.scan over batches, one dispatch):
bit-equivalence with per-step dispatch, trainer windowing, and scheduler
traceability."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

TINY = dict(
    audio_num_mel_bins=80, hidden_size=32, latent_size=8,
    fvae_enc_dec_hidden=16, fvae_kernel_size=5, fvae_enc_n_layers=2,
    fvae_dec_n_layers=2, frames_multiple=4, mel_strides=[2, 1, 1],
    asr_enc_layers=1, asr_dec_layers=1, asr_last_norm=False,
    mel_loss="ssim:0.5|l1:0.5", lambda_kl=0.001, lambda_mle=1.0,
    lambda_mel_adv=0.1, mel_gan=True, disc_start_steps=0, disc_interval=1,
    disc_win_num=2, mel_disc_hidden_size=8, disc_norm="in",
    disc_reduction="stack", use_cond_disc=False,
    cross_way_no_recon_loss=False, cross_way_no_disc_loss=False,
    disable_map=False, optimizer_adam_beta1=0.5, optimizer_adam_beta2=0.999,
    weight_decay=0.0, generator_grad_norm=5.0, discriminator_grad_norm=1.0,
    discriminator_optimizer_params={"eps": 1e-6, "weight_decay": 0.0},
    discriminator_scheduler_params={"step_size": 60000, "gamma": 0.5},
    map_scheduler_params={"step_size": 60000, "gamma": 0.5},
    lr=1.0, disc_lr=1e-4, map_lr=1e-3, scheduler="rsqrt",
    warmup_updates=2000, phase_1_steps=-1, phase_2_steps=100,
    phase_1_concurrent_ways="p2p", phase_2_concurrent_ways="a2a,p2p",
    phase_3_concurrent_ways="a2p", seed=1234, binary_data_dir="",
    pretrain_asr_ckpt="", mesh_shape="data:2", max_frames=5000,
)


def _batch(B=4, T=64, seed=0):
    rng = np.random.RandomState(seed)
    return dict(
        mels=rng.randn(B, T, 80).astype(np.float32) - 2,
        prof_mels=rng.randn(B, T, 80).astype(np.float32) - 2,
        pitch=rng.randint(1, 255, (B, T)).astype(np.int32),
        prof_pitch=rng.randint(1, 255, (B, T)).astype(np.int32),
        a2p_f0_alignment=np.clip(np.arange(T), 0, T - 1)
        .astype(np.int32)[None].repeat(B, 0),
        multi_spk_emb=rng.randn(B, 5, 256).astype(np.float32),
        nsamples=B,
    )


def _make_task():
    from neuralsvb_tpu.hparams import hparams
    from neuralsvb_tpu.tasks.svb_vae_task import SVBVAEMleTask
    hparams.clear()
    hparams.update(TINY)
    task = SVBVAEMleTask()
    task.build_model()
    return task


@pytest.mark.slow
def test_cycle_matches_stepwise():
    """training_cycle(K batches) == K x training_step: the training-noise
    key is fold_in(base, step) on both paths, so the trajectories coincide
    up to XLA fusion rounding."""
    batches = [_batch(seed=s) for s in range(3)]

    task_a = _make_task()
    losses_a = []
    for i, b in enumerate(batches):
        step = 5 + i
        ret = task_a.training_step(b, step, 0)
        losses_a.append({f"g/{k}": v for k, v in ret[1].items()
                         if not k.startswith("lr_")})
        ret = task_a.training_step(b, step, 1)
        losses_a[-1].update({f"d/{k}": v for k, v in ret[1].items()
                             if not k.startswith("lr_")})
    params_a = jax.device_get(task_a.state["params"])

    task_b = _make_task()
    logs = task_b.training_cycle(batches, 5)
    params_b = jax.device_get(task_b.state["params"])

    # scan and inline dispatch may differ in XLA fusion choices -> last-ulp
    # float differences; the trajectories must agree to ~1e-6
    for i in range(len(batches)):
        for k, v in losses_a[i].items():
            assert k in logs, (k, sorted(logs))
            np.testing.assert_allclose(float(v), float(logs[k][i]),
                                       rtol=1e-5, atol=1e-6,
                                       err_msg=f"{k}@{i}")
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        params_a, params_b)


@pytest.mark.slow
def test_cycle_phase3_map():
    """Fused cycle in phase 3 drives the latent-map optimizer."""
    task = _make_task()
    from neuralsvb_tpu.hparams import hparams
    batches = [_batch(seed=s) for s in range(2)]
    start = hparams["phase_2_steps"] + 10
    logs = task.training_cycle(batches, start)
    assert any(k.startswith("m/") for k in logs)
    for k, v in logs.items():
        assert v.shape[0] == 2 and np.isfinite(np.asarray(v)).all(), k


def test_schedulers_traceable():
    from neuralsvb_tpu.training.schedulers import (rsqrt_schedule,
                                                   step_lr_schedule)
    rs = rsqrt_schedule(1.0, 2000, 256)
    sl = step_lr_schedule(1e-4, 100, 0.5)
    # eager values
    assert float(rs(0)) == pytest.approx(1e-7)
    assert float(rs(2000)) == pytest.approx(1.0 / np.sqrt(2000) / 16.0)
    assert float(sl(250)) == pytest.approx(1e-4 * 0.25)
    # traced values match eager
    got = jax.jit(lambda s: (rs(s), sl(s)))(jnp.asarray(250))
    assert float(got[0]) == pytest.approx(float(rs(250)))
    assert float(got[1]) == pytest.approx(float(sl(250)))


def test_trainer_window_flush_boundaries():
    """Windows never cross validation / phase / disc-start boundaries."""
    from neuralsvb_tpu.training.trainer import window_crosses_boundary

    class FakeTask:
        def phase_and_ways(self, step):
            return (2, ("a2a", "p2p")) if step <= 100 else (3, ("a2p",))

        def _disc_start(self, step):
            return step > 10

    task = FakeTask()

    def must_flush(start, cur_len):
        return window_crosses_boundary(task, start, cur_len,
                                       val_check_interval=50,
                                       max_updates=1000)

    assert must_flush(48, 2)          # 48+2 hits val boundary 50
    assert not must_flush(48, 1)
    assert must_flush(99, 2)          # next step enters phase 3
    # disc turns on at step 11 (_disc_start(11) is the first True); the
    # window [10, 11) must flush before step 11 joins it — same index
    # convention as training_step's _disc_start(step) (ADVICE r2)
    assert not must_flush(9, 1)       # steps 9, 10 both disc-off
    assert must_flush(10, 1)          # next step 11 is disc-on
    assert not must_flush(60, 3)
    assert must_flush(997, 3)         # max_updates


@pytest.mark.slow
def test_cycle_at_disc_start_boundary_matches_stepwise():
    """A fused window starting exactly at the first disc-on step must run
    the discriminator on the same steps as per-step dispatch (ADVICE r2
    off-by-one: the old convention ran D one step early)."""
    from neuralsvb_tpu.hparams import hparams
    batches = [_batch(seed=s) for s in range(2)]

    task_a = _make_task()
    hparams["disc_start_steps"] = 4
    start = 5  # first step with _disc_start(step) True
    losses_a = []
    for i, b in enumerate(batches):
        ret = task_a.training_step(b, start + i, 0)
        losses_a.append({f"g/{k}": v for k, v in ret[1].items()
                         if not k.startswith("lr_")})
        ret = task_a.training_step(b, start + i, 1)
        assert ret is not None  # disc ran on both steps
        losses_a[-1].update({f"d/{k}": v for k, v in ret[1].items()
                             if not k.startswith("lr_")})

    task_b = _make_task()
    hparams["disc_start_steps"] = 4
    logs = task_b.training_cycle(batches, start)
    assert any(k.startswith("d/") for k in logs)
    for i in range(len(batches)):
        for k, v in losses_a[i].items():
            np.testing.assert_allclose(float(v), float(logs[k][i]),
                                       rtol=1e-5, atol=1e-6, err_msg=f"{k}@{i}")
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        jax.device_get(task_a.state["params"]),
        jax.device_get(task_b.state["params"]))


def test_cycle_rejects_disc_interval():
    """disc_interval > 1 cannot be expressed in the fused scan; it must
    raise instead of silently dropping discriminator updates (ADVICE r2)."""
    from neuralsvb_tpu.hparams import hparams
    task = _make_task()
    hparams["disc_interval"] = 2
    with pytest.raises(ValueError, match="disc_interval"):
        task.training_cycle([_batch(), _batch()], 5)


def test_wire_int8_roundtrip():
    """wire_dtype: int8 quantizes log-mels to ~0.051 LSB; decode inside
    jit recovers them within half an LSB, other keys stay exact — and
    zero-padded frames decode to EXACT zeros (the abs(mel) > 0 nonpadding
    masks downstream would otherwise treat padding as valid frames)."""
    from neuralsvb_tpu.hparams import hparams
    from neuralsvb_tpu.tasks.svb_vae_task import (_I8_SCALE, wire_pack,
                                                  wire_unpack)
    hparams.clear()
    hparams.update(TINY)
    hparams["wire_dtype"] = "int8"
    try:
        b = _batch(seed=7)
        b.pop("nsamples")
        b.pop("multi_spk_emb")
        # bucketed collate zero-pads the tail of shorter utterances
        b["mels"][:, -3:] = 0.0
        b["prof_mels"][1:, -5:] = 0.0
        buf, meta = wire_pack(b)
        assert buf.dtype == np.uint8
        mel_keys = {k for k, dt, _ in meta if dt == "|q1"}
        assert mel_keys == {"mels", "prof_mels"}
        dec = jax.jit(wire_unpack, static_argnames="meta")(buf, meta)
        for k in ("mels", "prof_mels"):
            err = np.abs(np.asarray(dec[k]) - b[k]).max()
            assert err <= _I8_SCALE / 2 + 1e-6, (k, err)
            # padding must stay EXACTLY zero (abs(mel) > 0 masks); valid
            # values within half an LSB of 0 also land on the zero code,
            # which is ordinary quantization noise, so only assert the
            # padding direction
            pad_leak = np.abs(np.asarray(dec[k])[b[k] == 0.0]).max()
            assert pad_leak == 0.0, (
                f"{k}: int8 wire dequantized zero padding to {pad_leak}")
        for k in ("pitch", "prof_pitch", "a2p_f0_alignment"):
            np.testing.assert_array_equal(np.asarray(dec[k]), b[k])
    finally:
        hparams.pop("wire_dtype", None)  # don't leak int8 into other tests


@pytest.mark.slow
def test_wire_int8_training_step():
    """A gen training step runs on the int8 wire and its losses stay close
    to the f16-wire step (quantization noise only)."""
    from neuralsvb_tpu.hparams import hparams
    b = _batch(seed=3)
    task16 = _make_task()
    r16 = task16.training_step(b, 1, 0)
    task8 = _make_task()
    hparams["wire_dtype"] = "int8"
    r8 = task8.training_step(b, 1, 0)
    l16 = {k: float(v) for k, v in r16[1].items()}
    l8 = {k: float(v) for k, v in r8[1].items()}
    assert l16.keys() == l8.keys()
    for k in l8:
        assert np.isfinite(l8[k])
        assert abs(l8[k] - l16[k]) < 5e-2, (k, l8[k], l16[k])


@pytest.mark.slow
def test_prepare_cycle_handle():
    """training_cycle accepts a prepare_cycle handle (the Trainer prefetch
    path) and produces the same losses as the direct call."""
    task_a = _make_task()
    batches = [_batch(seed=s) for s in range(2)]
    logs_a = task_a.training_cycle(batches, 5)
    task_b = _make_task()
    prepared = task_b.prepare_cycle(batches)
    logs_b = task_b.training_cycle(batches, 5, prepared=prepared)
    for k in logs_a:
        np.testing.assert_allclose(np.asarray(logs_a[k]),
                                   np.asarray(logs_b[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


@pytest.mark.slow
def test_wire_dtype_float32_fallback():
    """wire_dtype: float32 disables the packed f16 wire; training steps and
    the fused cycle must still run (plain dict path) and agree with the
    packed path to f16-quantization tolerance."""
    from neuralsvb_tpu.hparams import hparams

    task_f16 = _make_task()
    b = _batch(seed=3)
    task_f16.global_step = 1
    ret16 = task_f16.training_step(b, 1, 0)
    assert ret16 is not None
    losses16 = {k: float(v) for k, v in ret16[1].items()}

    task_f32 = _make_task()
    hparams["wire_dtype"] = "float32"
    task_f32.global_step = 1
    ret32 = task_f32.training_step(b, 1, 0)
    assert ret32 is not None
    losses32 = {k: float(v) for k, v in ret32[1].items()}
    assert losses16.keys() == losses32.keys()
    for k in losses32:
        assert np.isfinite(losses32[k])
        # f16 mel quantization perturbs losses only slightly
        assert abs(losses16[k] - losses32[k]) < 2e-2, (k, losses16[k], losses32[k])

    # fused cycle also runs on the dict path
    logs = task_f32.training_cycle([b, b], 2)
    assert all(np.isfinite(np.asarray(v)).all() for v in logs.values())
