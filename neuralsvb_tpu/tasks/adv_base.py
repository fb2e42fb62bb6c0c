"""Shared machinery for 2-optimizer (generator/discriminator) adversarial
mel tasks (reference: tasks/tts/fs2_adv.py:11-128 + the training loop's
multi-optimizer dispatch, utils/trainer.py:269-342).

Subclasses implement ``build_generator`` / ``forward_losses`` (traced) and
get jitted gen/disc steps, optimizers, schedules and the validation plumbing
for free. The SVBVAE task keeps its own specialized 3-optimizer machine
(svb_vae_task.py)."""

from __future__ import annotations

import json
import os
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..hparams import hparams
from ..models.disc import Discriminator
from ..parallel.mesh import make_mesh, replicate_state
from ..training.schedulers import rsqrt_schedule, step_lr_schedule
from .base_task import BaseTask
from .svb_vae_task import mse, parse_mel_losses


def cross_entropy_ignore0(logits, targets):
    """CE with ignore_index=0 (reference: svb_para.py add_asr_losses)."""
    logp = jax.nn.log_softmax(logits, -1)
    nll = -jnp.take_along_axis(logp, targets[..., None], -1)[..., 0]
    mask = (targets != 0).astype(nll.dtype)
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


class AdversarialTaskBase(BaseTask):
    num_optimizers = 2

    def __init__(self):
        super().__init__()
        self.mesh = make_mesh(hparams.get("mesh_shape", ""))
        self.n_devices = int(np.prod(self.mesh.devices.shape))
        self.loss_and_lambda = parse_mel_losses(hparams["mel_loss"])
        self._rng = jax.random.PRNGKey(hparams.get("seed", 1234))
        self._np_rng = np.random.RandomState(hparams.get("seed", 1234))
        self._step_cache: Dict = {}
        self.vocoder = None

    # ------------------------------------------------------------------
    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _dict_size(self):
        fn = os.path.join(hparams["binary_data_dir"], "phone_set.json")
        if os.path.exists(fn):
            return len(json.load(open(fn))) + 10
        return 100

    # subclass API ------------------------------------------------------
    def build_generator(self):
        """Set self.model; return (init_params, init_batch_stats)."""
        raise NotImplementedError

    def forward_losses(self, params, batch_stats, batch, rng, train: bool):
        """Traced. Returns (losses dict, fakes dict {name: mel}, gt dict
        {name: mel}, new_batch_stats)."""
        raise NotImplementedError

    def prep_batch(self, batch, infer: bool = False):
        raise NotImplementedError

    def frozen_keys(self) -> Tuple[str, ...]:
        return ()

    def build_extra_discs(self):
        """Hook for variants with additional discriminators
        (e.g. ParaPPGSpkConsistentTask's speaker discriminator)."""
        return

    # ------------------------------------------------------------------
    def build_model(self):
        hp = hparams
        params, batch_stats = self.build_generator()
        self.mel_disc = Discriminator(
            time_lengths=tuple([32, 64, 128][: hp["disc_win_num"]]),
            freq_length=hp["audio_num_mel_bins"],
            hidden_size=hp["mel_disc_hidden_size"], norm_type=hp["disc_norm"],
            reduction=hp["disc_reduction"],
            cond_size=hp["hidden_size"] if hp["use_cond_disc"] else 0,
        ) if hp.get("mel_gan") else None
        self.discriminators = {}
        if self.mel_disc is not None:
            self.discriminators[""] = self.mel_disc
            self.build_extra_discs()
        state = {"params": params, "batch_stats": batch_stats}
        if self.mel_disc is not None:
            dd = np.zeros((2, 2 * max(self.mel_disc.time_lengths),
                           hp["audio_num_mel_bins"]), np.float32)
            state["disc_params"], state["disc_batch_stats"] = {}, {}
            for name, disc in self.discriminators.items():
                dv = disc.init({"params": jax.random.fold_in(jax.random.PRNGKey(2),
                                                             hash(name) % 100),
                                "disc": jax.random.PRNGKey(3),
                                "dropout": jax.random.PRNGKey(4)}, dd, train=True)
                state["disc_params"][name] = dv["params"]
                state["disc_batch_stats"][name] = dv.get("batch_stats", {})
        self._build_optimizers(state)
        self.state = replicate_state(state, self.mesh)
        return self.model

    def _build_optimizers(self, state):
        hp = hparams

        accum = int(hp.get("accumulate_grad_batches", 1) or 1)

        clip_value = float(hp.get("clip_grad_value") or 0)

        def chain(clip, b1, b2, eps=1e-8, wd=0.0):
            tx = optax.chain(
                optax.clip(clip_value) if clip_value > 0 else optax.identity(),
                optax.clip_by_global_norm(clip) if clip > 0 else optax.identity(),
                optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
                optax.add_decayed_weights(wd))
            if accum > 1:
                tx = optax.MultiSteps(tx, every_k_schedule=accum)
            return tx

        b1, b2 = hp["optimizer_adam_beta1"], hp["optimizer_adam_beta2"]
        disc_p = hp.get("discriminator_optimizer_params", {})
        self.tx_gen = chain(hp.get("generator_grad_norm")
                            or hp.get("clip_grad_norm") or 0, b1, b2,
                            wd=hp.get("weight_decay", 0.0))
        self.sched_gen = (rsqrt_schedule(hp["lr"], hp["warmup_updates"],
                                         hp["hidden_size"])
                          if hp["scheduler"] == "rsqrt" else lambda s: hp["lr"])
        gen_sub = {k: v for k, v in state["params"].items()
                   if k not in self.frozen_keys()}
        state["opt_gen"] = self.tx_gen.init(gen_sub)
        if "disc_params" in state:
            self.tx_disc = chain(hp.get("discriminator_grad_norm", 0), b1, b2,
                                 eps=disc_p.get("eps", 1e-8),
                                 wd=disc_p.get("weight_decay", 0.0))
            dsp = hp.get("discriminator_scheduler_params",
                         {"step_size": 60000, "gamma": 0.5})
            self.sched_disc = step_lr_schedule(hp["disc_lr"], dsp["step_size"],
                                               dsp["gamma"])
            state["opt_disc"] = self.tx_disc.init(state["disc_params"])

    def state_template(self):
        return self.state

    def get_state(self):
        return jax.device_get(self.state)

    def set_state(self, state):
        self.state = replicate_state(state, self.mesh)

    def _disc_start(self, step: int) -> bool:
        return (hparams.get("mel_gan", False)
                and step > hparams["disc_start_steps"]
                and hparams["lambda_mel_adv"] > 0)

    # ------------------------------------------------------------------
    def _get_step(self, kind: str, disc_on: bool):
        key = (kind, disc_on)
        if key not in self._step_cache:
            maker = {"gen": self._make_gen_step, "disc": self._make_disc_step}[kind]
            self._step_cache[key] = maker(disc_on)
        return self._step_cache[key]

    def _make_gen_step(self, disc_on):
        lam_adv = hparams["lambda_mel_adv"]

        @partial(jax.jit, donate_argnums=(0,))
        def gen_step(state, batch, rng, lr):
            k_fwd, k_disc = jax.random.split(rng)

            def loss_fn(params):
                losses, fakes, gts, new_stats = self.forward_losses(
                    params, state["batch_stats"], batch, k_fwd, train=True)
                if disc_on and self.mel_disc is not None:
                    for i, (name, mel_p) in enumerate(fakes.items()):
                        for j, (dname, disc) in enumerate(
                                self.discriminators.items()):
                            o = disc.apply(
                                {"params": state["disc_params"][dname],
                                 "batch_stats": state["disc_batch_stats"][dname]},
                                mel_p, rngs={"disc": jax.random.fold_in(
                                    k_disc, i * 17 + j)})
                            if o["y"] is not None:
                                key = f"{name}{dname}a" if (name or dname) else "a"
                                losses[key] = mse(o["y"], 1.0) * lam_adv
                total = sum(losses.values())
                sg = jax.lax.stop_gradient
                return total, (losses, {k: sg(v) for k, v in fakes.items()},
                               gts, new_stats)

            grads, (losses, fakes, gts, new_stats) = jax.grad(
                loss_fn, has_aux=True)(state["params"])
            frozen = self.frozen_keys()
            gen_grads = {k: v for k, v in grads.items() if k not in frozen}
            gen_params = {k: v for k, v in state["params"].items()
                          if k not in frozen}
            updates, new_opt = self.tx_gen.update(gen_grads, state["opt_gen"],
                                                  gen_params)
            updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
            params = dict(state["params"])
            params.update(optax.apply_updates(gen_params, updates))
            state = dict(state)
            state.update(params=params, batch_stats=new_stats, opt_gen=new_opt)
            return state, losses, fakes, gts

        return gen_step

    def _make_disc_step(self, disc_on):
        @partial(jax.jit, donate_argnums=(0,))
        def disc_step(state, fakes, gts, rng, lr):
            def loss_fn(disc_params):
                losses = {}
                stats = dict(state["disc_batch_stats"])
                for i, name in enumerate(fakes):
                    for j, (dname, disc) in enumerate(self.discriminators.items()):
                        kr, kf = jax.random.split(
                            jax.random.fold_in(rng, i * 17 + j))
                        kr, kr_d = jax.random.split(kr)
                        kf, kf_d = jax.random.split(kf)
                        o_r, m1 = disc.apply(
                            {"params": disc_params[dname],
                             "batch_stats": stats[dname]},
                            gts[name], train=True,
                            rngs={"disc": kr, "dropout": kr_d},
                            mutable=["batch_stats"])
                        stats[dname] = m1["batch_stats"]
                        o_f, m2 = disc.apply(
                            {"params": disc_params[dname],
                             "batch_stats": stats[dname]},
                            fakes[name], train=True,
                            rngs={"disc": kf, "dropout": kf_d},
                            mutable=["batch_stats"])
                        stats[dname] = m2["batch_stats"]
                        pre = f"{name}{dname}" if (name or dname) else ""
                        if o_r["y"] is not None:
                            losses[f"{pre}r" if pre else "r"] = mse(o_r["y"], 1.0)
                        if o_f["y"] is not None:
                            losses[f"{pre}f" if pre else "f"] = mse(o_f["y"], 0.0)
                total = sum(losses.values()) if losses else jnp.zeros(())
                return total, (losses, stats)

            grads, (losses, new_stats) = jax.grad(
                loss_fn, has_aux=True)(state["disc_params"])
            updates, new_opt = self.tx_disc.update(grads, state["opt_disc"],
                                                   state["disc_params"])
            updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
            state = dict(state)
            state.update(disc_params=optax.apply_updates(state["disc_params"],
                                                         updates),
                         disc_batch_stats=new_stats, opt_disc=new_opt)
            return state, losses

        return disc_step

    # ------------------------------------------------------------------
    def training_step(self, batch, step: int, optimizer_idx: int):
        disc_on = self._disc_start(step)
        if optimizer_idx == 0:
            b = self.prep_batch(batch)
            fn = self._get_step("gen", disc_on)
            lr = self.sched_gen(step)
            self.state, losses, fakes, gts = fn(self.state, b, self._next_rng(), lr)
            self._last_fakes, self._last_gts = fakes, gts
            losses = dict(losses)
            losses["lr_0"] = lr
            return sum(v for k, v in losses.items() if k != "lr_0"), losses
        if optimizer_idx == 1:
            if (self.mel_disc is None or not disc_on
                    or step % hparams["disc_interval"] != 0
                    or not hasattr(self, "_last_fakes")):
                return None
            fn = self._get_step("disc", disc_on)
            lr = self.sched_disc(max(step - hparams["disc_start_steps"], 1))
            self.state, losses = fn(self.state, self._last_fakes, self._last_gts,
                                    self._next_rng(), lr)
            if not losses:
                return None
            losses = dict(losses)
            losses["lr_1"] = lr
            return sum(v for k, v in losses.items() if k != "lr_1"), losses
        return None

    def validation_step(self, batch, batch_idx: int):
        b = self.prep_batch(batch, infer=True)
        losses, fakes, gts, _ = self.forward_losses(
            self.state["params"], self.state["batch_stats"], b,
            self._next_rng(), train=False)
        self.vis_validation(batch, fakes, gts, batch_idx)
        losses = {k: float(v) for k, v in losses.items()}
        return {"losses": losses, "total_loss": sum(losses.values()),
                "nsamples": batch["nsamples"]}

    def vis_validation(self, batch, fakes, gts, batch_idx):
        """Optional TB visualization hook; subclasses override."""
