"""Task base class + lightweight loader plumbing.

Functional replacement for the reference's BaseTask/BaseDataset glue
(reference: tasks/base_task.py:27-355, tasks/tts/tts.py:57-101): a task owns
model construction, jitted step functions and dataloaders; the Trainer
(training/trainer.py) owns the loop, checkpoints and TensorBoard.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List

import numpy as np

from ..hparams import hparams
from ..data.batching import batch_by_size
from ..parallel.mesh import trim_batch_to_multiple


class AvgrageMeter:
    def __init__(self):
        self.avg, self.sum, self.cnt = 0.0, 0.0, 0

    def update(self, val, n=1):
        self.sum += val * n
        self.cnt += n
        self.avg = self.sum / self.cnt


def tensors_to_scalars(d):
    out = {}
    for k, v in d.items():
        if hasattr(v, "item") and np.size(v) == 1:
            out[k] = float(v)  # device->host fetch happens here, on demand
        else:
            out[k] = v
    return out


class DataLoaderLite:
    """Batches of collated numpy dicts from (dataset, index batches).

    With ``prefetch > 0`` a daemon thread keeps a small queue of collated
    batches ahead of the consumer, overlapping dataset IO/collate with the
    accelerator step (the reference gets this from torch DataLoader
    ``num_workers``; here collate is numpy so a thread suffices)."""

    def __init__(self, dataset, batches: List[List[int]], endless: bool = False,
                 shuffle: bool = False, seed: int = 1234, prefetch: int = 4):
        self.dataset = dataset
        self.batches = batches
        self.endless = endless
        self.shuffle = shuffle
        self.prefetch = prefetch
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.batches)

    def _iter_sync(self) -> Iterator[Dict]:
        while True:
            order = list(range(len(self.batches)))
            if self.shuffle:
                self.rng.shuffle(order)
            for bi in order:
                idxs = self.batches[bi]
                yield self.dataset.collater([self.dataset[i] for i in idxs])
            if not self.endless:
                return

    def __iter__(self) -> Iterator[Dict]:
        if self.prefetch <= 0:
            yield from self._iter_sync()
            return
        import queue
        import threading
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def worker():
            try:
                for b in self._iter_sync():
                    q.put(b)
            finally:
                q.put(sentinel)

        threading.Thread(target=worker, daemon=True).start()
        while True:
            b = q.get()
            if b is sentinel:
                return
            yield b


class BaseTask:
    def __init__(self):
        self.hparams = hparams
        self.global_step = 0
        self.current_epoch = 0
        self.trainer = None
        self.logger = None
        self.training_losses_meter = None

    # ------------------------------------------------------------------
    def build_model(self):
        raise NotImplementedError

    def build_dataloader(self, dataset, shuffle: bool, max_tokens=None,
                         max_sentences=None, required_batch_size_multiple=-1,
                         endless=False, use_batch_by_size=True, n_devices=1):
        if required_batch_size_multiple == -1:
            required_batch_size_multiple = n_devices
        if max_tokens is not None:
            max_tokens *= n_devices
        if max_sentences is not None:
            max_sentences *= n_devices
        indices = dataset.ordered_indices()
        if use_batch_by_size:
            batches = batch_by_size(
                indices, dataset.num_tokens, max_tokens=max_tokens,
                max_sentences=max_sentences,
                required_batch_size_multiple=required_batch_size_multiple)
        else:
            ms = max_sentences or 1
            batches = [list(indices[i:i + ms]) for i in range(0, len(indices), ms)]
        if n_devices > 1:
            batches = [trim_batch_to_multiple(b, n_devices) for b in batches]
            batches = [b for b in batches if len(b) > 0]
        if shuffle and hparams.get("drop_last_batch"):
            # keep only full max_sentences batches so training shapes repeat
            # exactly — required for the K-step fused dispatch windows
            # (steps_per_dispatch) to form; the reference's DDP similarly
            # drops world-indivisible batches (reference: tts.py:93-96)
            full = max_sentences or max(len(b) for b in batches)
            batches = [b for b in batches if len(b) == full] or batches
        return DataLoaderLite(dataset, batches, endless=endless, shuffle=shuffle,
                              seed=hparams.get("seed", 1234),
                              prefetch=4 if int(hparams.get("ds_workers", 1)
                                               or 0) > 0 else 0)

    def train_dataloader(self, n_devices=1):
        raise NotImplementedError

    def val_dataloader(self, n_devices=1):
        raise NotImplementedError

    def test_dataloader(self, n_devices=1):
        raise NotImplementedError

    # ------------------------------------------------------------------
    # hooks mirrored from the reference lifecycle
    def on_train_start(self):
        pass

    def on_epoch_start(self):
        self.training_losses_meter = {"total_loss": AvgrageMeter()}

    def training_step(self, batch, batch_idx: int, optimizer_idx: int):
        """Returns (total_loss, log dict) or None if this opt pass is idle."""
        raise NotImplementedError

    def validation_step(self, batch, batch_idx: int):
        raise NotImplementedError

    def validation_end(self, outputs):
        meters = {"total_loss": AvgrageMeter()}
        for output in outputs:
            if not output:
                continue
            n = output.pop("nsamples", 1)
            losses = tensors_to_scalars(output["losses"])
            total = float(output.get("total_loss", sum(losses.values())))
            for k, v in losses.items():
                meters.setdefault(k, AvgrageMeter()).update(v, n)
            meters["total_loss"].update(total, n)
        loss_output = {k: round(v.avg, 4) for k, v in meters.items()}
        print(f"| Valid results: {loss_output}")
        return {"tb_log": {f"val/{k}": v for k, v in loss_output.items()},
                "val_loss": loss_output["total_loss"]}

    def test_start(self):
        pass

    def test_step(self, batch, batch_idx: int):
        raise NotImplementedError

    def test_end(self, outputs):
        return {}

    def on_keyboard_interrupt(self):
        pass

    # ------------------------------------------------------------------
    @classmethod
    def start(cls):
        from ..training.trainer import Trainer
        np.random.seed(hparams.get("seed", 1234))
        task = cls()
        trainer = Trainer(
            work_dir=hparams["work_dir"],
            val_check_interval=hparams["val_check_interval"],
            tb_log_interval=hparams["tb_log_interval"],
            max_updates=hparams["max_updates"],
            num_ckpt_keep=hparams["num_ckpt_keep"],
            save_best=hparams["save_best"],
            num_sanity_val_steps=hparams["num_sanity_val_steps"]
            if not hparams.get("validate") else 10000,
            accumulate_grad_batches=hparams["accumulate_grad_batches"],
            monitor_key=hparams["valid_monitor_key"],
            monitor_mode=hparams["valid_monitor_mode"],
            max_epochs=hparams.get("max_epochs") or 1000,
        )
        if not hparams.get("infer"):
            trainer.fit(task)
        else:
            trainer.test(task)
