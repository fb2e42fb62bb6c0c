"""Gradient accumulation (optax.MultiSteps): params update only every k-th
micro-step (reference: utils/trainer.py accumulate_grad_batches)."""

import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _leaf(params):
    n = params["vae_model"]
    while isinstance(n, dict):
        n = n[sorted(n)[0]]
    return np.asarray(n).copy()


def test_accumulate_grad_batches():
    from __graft_entry__ import _flagship_hparams, _batch
    from neuralsvb_tpu.hparams import hparams
    hp = _flagship_hparams(tiny=True)
    hp.update(mesh_shape="data:1", phase_2_steps=10 ** 6,
              accumulate_grad_batches=2, mel_gan=False)
    hparams.clear()
    hparams.update(hp)
    from neuralsvb_tpu.tasks.svb_vae_task import SVBVAEMleTask
    task = SVBVAEMleTask()
    task.build_model()
    batch = _batch(2, 64, 64)
    batch["nsamples"] = 2
    p0 = _leaf(task.state["params"])
    task.training_step(batch, 5, 0)
    p1 = _leaf(task.state["params"])
    np.testing.assert_array_equal(p0, p1)  # micro-step 1: no update yet
    task.training_step(batch, 6, 0)
    p2 = _leaf(task.state["params"])
    assert np.abs(p2 - p1).max() > 0, "second micro-step must apply the update"
