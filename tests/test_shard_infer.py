"""Multi-chip inference sharding (shard_infer): the eval/test forward over
a data:N mesh must equal the single-device forward — the serving path's
8-chip story (VERDICT r3 #5). Params are replicated; only the batch shards."""

import numpy as np
import pytest

import jax

from tests.test_cycle import TINY, _batch


def _make_task():
    from neuralsvb_tpu.tasks.svb_vae_task import SVBVAEMleTask
    task = SVBVAEMleTask()
    task.build_model()
    return task


@pytest.mark.slow
def test_sharded_eval_matches_single_device():
    from neuralsvb_tpu.hparams import hparams_scope
    b = _batch(B=4, T=64)
    ways = ("a2a", "p2p", "a2p")

    with hparams_scope(new=dict(TINY, mesh_shape="data:1")):
        task1 = _make_task()
        out1, losses1, _ = task1._eval_forward(b, ways)

    with hparams_scope(new=dict(TINY, mesh_shape="data:4",
                                shard_infer=True)):
        task4 = _make_task()
        assert task4._shard_infer()
        out4, losses4, _ = task4._eval_forward(b, ways)

        for way in ways:
            np.testing.assert_allclose(
                np.asarray(out1[way]["mel_out"]),
                np.asarray(out4[way]["mel_out"]),
                rtol=1e-5, atol=1e-5, err_msg=way)
        for k in losses1:
            np.testing.assert_allclose(float(losses1[k]), float(losses4[k]),
                                       rtol=1e-5, atol=1e-6, err_msg=k)

        # ragged batch (B=3 on data:4): falls back to single-device, still runs
        b3 = _batch(B=3, T=64)
        out_r, _, _ = task4._eval_forward(b3, ways)
        assert np.isfinite(np.asarray(out_r["a2p"]["mel_out"])).all()

        # the sharded forward really placed the batch across devices
        b4 = task4._prep_batch(b, infer=True)
        from neuralsvb_tpu.parallel.mesh import shard_batch
        sharded = shard_batch(b4, task4.mesh)
        assert len(sharded["mels"].sharding.device_set) == 4
