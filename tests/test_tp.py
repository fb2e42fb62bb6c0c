"""Tensor-parallel (data x model mesh) sharding: param placement rules and a
full 3-optimizer training step on a 2x4 virtual mesh."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow
from jax.sharding import PartitionSpec as P


def test_param_sharding_rules():
    from neuralsvb_tpu.parallel.mesh import make_mesh, param_sharding
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh("data:2,model:4")
    big = np.zeros((5, 64, 64), np.float32)     # conv kernel -> column shard
    bias = np.zeros((64,), np.float32)          # 1-D -> replicate
    small = np.zeros((4, 4), np.float32)        # tiny -> replicate
    odd = np.zeros((64, 65), np.float32)        # indivisible -> replicate
    assert param_sharding(big, mesh, 1024).spec == P(None, None, "model")
    assert param_sharding(bias, mesh, 1024).spec == P()
    assert param_sharding(small, mesh, 1024).spec == P()
    assert param_sharding(odd, mesh, 1024).spec == P()


def test_tp_training_steps():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _flagship_hparams, _batch
    from neuralsvb_tpu.hparams import hparams
    hp = _flagship_hparams(tiny=True)
    hp.update(mesh_shape="data:2,model:4", phase_2_steps=10,
              tp_min_param_size=64)
    hparams.clear()
    hparams.update(hp)
    from neuralsvb_tpu.tasks.svb_vae_task import SVBVAEMleTask
    task = SVBVAEMleTask()
    task.build_model()
    n_tp = sum(1 for leaf in jax.tree_util.tree_leaves(task.state["params"])
               if "model" in str(getattr(leaf.sharding, "spec", "")))
    assert n_tp > 0, "no tensor-sharded params"
    B, T = 4, 64
    batch = _batch(B, T, T + 32)
    batch["nsamples"] = B
    for step, opt in [(5, 0), (5, 1), (20, 2)]:
        ret = task.training_step(batch, step, opt)
        assert ret is not None and np.isfinite(float(ret[0])), (step, opt)


def test_remat_training_step():
    """use_remat=True: WN stacks rematerialized under grad; same param tree,
    finite losses."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _flagship_hparams, _batch
    from neuralsvb_tpu.hparams import hparams
    hp = _flagship_hparams(tiny=True)
    hp.update(mesh_shape="data:1", phase_2_steps=10, use_remat=True)
    hparams.clear()
    hparams.update(hp)
    from neuralsvb_tpu.tasks.svb_vae_task import SVBVAEMleTask
    task = SVBVAEMleTask()
    task.build_model()
    B, T = 2, 64
    batch = _batch(B, T, T + 32)
    batch["nsamples"] = B
    ret = task.training_step(batch, 5, 0)
    assert ret is not None and np.isfinite(float(ret[0]))
    hparams["use_remat"] = False
    task2 = SVBVAEMleTask()
    task2.build_model()
    t1 = jax.tree_util.tree_structure(jax.device_get(task.state["params"]))
    t2 = jax.tree_util.tree_structure(jax.device_get(task2.state["params"]))
    assert t1 == t2, "remat must not change the param tree"


def test_tp_checkpoint_roundtrip(tmp_path):
    """Sharded state gathers to host for saving; restore re-applies the
    tensor shardings through set_state and training continues."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _flagship_hparams, _batch
    from neuralsvb_tpu.hparams import hparams
    from neuralsvb_tpu.training.checkpoint import (restore_checkpoint,
                                                   save_checkpoint)
    hp = _flagship_hparams(tiny=True)
    hp.update(mesh_shape="data:2,model:4", phase_2_steps=10,
              tp_min_param_size=64)
    hparams.clear()
    hparams.update(hp)
    from neuralsvb_tpu.tasks.svb_vae_task import SVBVAEMleTask
    task = SVBVAEMleTask()
    task.build_model()
    batch = _batch(4, 64, 96)
    batch["nsamples"] = 4
    task.training_step(batch, 5, 0)
    save_checkpoint(task.get_state(), str(tmp_path), 1, 0)

    task2 = SVBVAEMleTask()
    task2.build_model()
    state, step, _, _ = restore_checkpoint(task2.state_template(), str(tmp_path))
    task2.set_state(state)
    n_tp = sum(1 for leaf in jax.tree_util.tree_leaves(task2.state["params"])
               if "model" in str(getattr(leaf.sharding, "spec", "")))
    assert n_tp > 0, "restore must re-apply tensor shardings"
    ret = task2.training_step(batch, 6, 0)
    assert ret is not None and np.isfinite(float(ret[0]))
