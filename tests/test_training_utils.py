"""Unit tests for LR schedules and checkpoint retention/best/restore."""

import numpy as np

from neuralsvb_tpu.training.checkpoint import (get_all_ckpts,
                                               get_last_checkpoint,
                                               restore_checkpoint,
                                               save_checkpoint)
from neuralsvb_tpu.training.schedulers import (none_schedule, rsqrt_schedule,
                                               step_lr_schedule)


def test_rsqrt_schedule():
    fn = rsqrt_schedule(lr=1.0, warmup_updates=100, hidden_size=256)
    # linear warmup
    assert fn(50) < fn(100)
    assert abs(fn(50) / fn(100) - 0.5) < 1e-6
    # rsqrt decay after warmup
    assert abs(fn(400) / fn(100) - 0.5) < 1e-6
    # floor
    assert fn(10 ** 18) == 1e-7
    # peak = lr * warmup^-0.5 * hidden^-0.5
    assert abs(fn(100) - 100 ** -0.5 * 256 ** -0.5) < 1e-9


def test_step_lr_schedule():
    fn = step_lr_schedule(lr=2.0, step_size=10, gamma=0.5)
    assert fn(0) == 2.0 and fn(9) == 2.0
    assert fn(10) == 1.0 and fn(25) == 0.5
    assert none_schedule(3.0)(12345) == 3.0


def test_checkpoint_retention_best_and_restore(tmp_path):
    wd = str(tmp_path)
    template = {"params": {"w": np.zeros((2, 2), np.float32)}}
    for step, best in [(2, None), (4, 0.9), (6, 0.7), (8, 0.8)]:
        state = {"params": {"w": np.full((2, 2), step, np.float32)}}
        save_checkpoint(state, wd, step, epoch=step // 2, num_ckpt_keep=2,
                        best_val=best, is_best=(best == 0.7))
    kept = get_all_ckpts(wd)
    assert [int(p.split("steps_")[1].split(".")[0]) for p in kept] == [8, 6]
    assert get_last_checkpoint(wd).endswith("steps_8.ckpt")
    state, step, epoch, best = restore_checkpoint(template, wd)
    assert step == 8 and epoch == 4 and best == 0.8
    np.testing.assert_array_equal(state["params"]["w"], np.full((2, 2), 8.0))
    # steps pin (resume_from_checkpoint)
    state6, step6, _, _ = restore_checkpoint(template, wd, steps=6)
    assert step6 == 6
    np.testing.assert_array_equal(state6["params"]["w"], np.full((2, 2), 6.0))
    # best snapshot exists and holds the step-6 weights
    import os
    from flax import serialization
    best_fn = os.path.join(wd, "model_ckpt_best.pt")
    assert os.path.exists(best_fn)
    raw = serialization.msgpack_restore(open(best_fn, "rb").read())
    np.testing.assert_array_equal(raw["state"]["params"]["w"],
                                  np.full((2, 2), 6.0))


def test_restore_lenient_extra_and_missing(tmp_path):
    wd = str(tmp_path)
    save_checkpoint({"params": {"a": np.ones(3, np.float32),
                                "gone": np.ones(2, np.float32)}},
                    wd, 1, 0)
    template = {"params": {"a": np.zeros(3, np.float32),
                           "new": np.zeros(4, np.float32)}}
    state, step, _, _ = restore_checkpoint(template, wd)
    np.testing.assert_array_equal(state["params"]["a"], np.ones(3))
    np.testing.assert_array_equal(state["params"]["new"], np.zeros(4))
    assert "gone" not in state["params"]


def test_wire_pack_unpack_roundtrip():
    """Packed uint8 wire batches decode to the exact int values and
    f16-rounded mels the dict path would produce."""
    import jax
    import numpy as np
    from neuralsvb_tpu.tasks.svb_vae_task import wire_pack, wire_unpack

    rng = np.random.RandomState(0)
    b = {
        "mels": rng.randn(4, 16, 8).astype(np.float32),
        "prof_mels": rng.randn(4, 12, 8).astype(np.float32),
        "pitch": rng.randint(0, 256, (4, 16)).astype(np.int32),
        "prof_pitch": rng.randint(0, 256, (4, 12)).astype(np.int32),
        "a2p_f0_alignment": rng.randint(0, 12, (4, 12)).astype(np.int32),
        "spk_emb": rng.randn(4, 6).astype(np.float32),
    }
    buf, meta = wire_pack(b)
    assert buf.dtype == np.uint8 and buf.shape[0] == 4
    out = jax.jit(wire_unpack, static_argnums=1)(buf, meta)
    for k in ("pitch", "prof_pitch", "a2p_f0_alignment"):
        assert out[k].dtype == np.int32
        np.testing.assert_array_equal(np.asarray(out[k]), b[k])
    for k in ("mels", "prof_mels"):
        assert out[k].dtype == np.float32
        np.testing.assert_array_equal(np.asarray(out[k]),
                                      b[k].astype(np.float16).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(out["spk_emb"]), b["spk_emb"])


def test_drop_last_batch_makes_shapes_repeat():
    """drop_last_batch keeps only full max_sentences train batches so the
    K-step fused-dispatch windows (steps_per_dispatch) can form; the
    reference's DDP similarly drops world-indivisible batches
    (reference: tasks/tts/tts.py:93-96)."""
    import numpy as np
    from neuralsvb_tpu.hparams import hparams
    from neuralsvb_tpu.tasks.base_task import BaseTask

    class _DS:
        sizes = [10] * 31

        def __len__(self):
            return 31

        def ordered_indices(self):
            return np.arange(31)

        def num_tokens(self, i):
            return 10

        def collater(self, samples):
            return samples

        def __getitem__(self, i):
            return i

    saved = dict(hparams)
    try:
        hparams["drop_last_batch"] = True
        hparams["ds_workers"] = 0
        task = BaseTask.__new__(BaseTask)
        dl = BaseTask.build_dataloader(task, _DS(), shuffle=True,
                                       max_sentences=8, endless=False)
        lens = [len(b) for b in dl.batches]
        assert lens and all(n == 8 for n in lens), lens  # 31 -> 3 full of 8
        # eval loaders (shuffle=False) keep every batch
        dl2 = BaseTask.build_dataloader(task, _DS(), shuffle=False,
                                        max_sentences=8, endless=False)
        assert sum(len(b) for b in dl2.batches) == 31
    finally:
        hparams.clear()
        hparams.update(saved)


def test_wire_pack_rejects_int16_overflow():
    import numpy as np
    import pytest
    from neuralsvb_tpu.tasks.svb_vae_task import wire_pack

    b = {"mels": np.zeros((2, 4, 8), np.float32),
         "a2p_f0_alignment": np.full((2, 4), 40000, np.int32)}
    with pytest.raises(ValueError, match="int16"):
        wire_pack(b)


def test_wire_pack_rejects_int8_out_of_window():
    """int8 log-mel quantization must raise (like the int16 guard), not
    silently clip, when mels fall outside the [-10, 2] log10 window."""
    import numpy as np
    import pytest
    from neuralsvb_tpu.hparams import hparams
    from neuralsvb_tpu.tasks.svb_vae_task import wire_pack

    saved = hparams.get("wire_dtype")
    hparams["wire_dtype"] = "int8"
    try:
        ok = {"mels": np.full((2, 4, 8), -9.5, np.float32),
              "prof_mels": np.full((2, 4, 8), 1.5, np.float32)}
        wire_pack(ok)  # in-window values pack fine
        bad = {"mels": np.full((2, 4, 8), -23.0, np.float32),
               "prof_mels": np.zeros((2, 4, 8), np.float32)}
        with pytest.raises(ValueError, match="int8"):
            wire_pack(bad)
        # NaN compares False against the window bounds; it must raise, not
        # quantize to a plausible-looking mel code
        nan = {"mels": np.full((2, 4, 8), np.nan, np.float32),
               "prof_mels": np.zeros((2, 4, 8), np.float32)}
        with pytest.raises(ValueError, match="non-finite"):
            wire_pack(nan)
    finally:
        if saved is None:
            hparams.pop("wire_dtype", None)
        else:
            hparams["wire_dtype"] = saved
