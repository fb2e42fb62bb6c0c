"""Non-parallel SVB task: random technique-prefix conditioning per step
(reference: tasks/singing/svb_ppg.py:22-203; duplicated in the reference as
tasks/singing/svb_base.py)."""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..hparams import hparams
from ..models.svb_ppg import SVBPPG
from ..parallel.mesh import shard_batch
from .adv_base import cross_entropy_ignore0
from .svb_para import SVBParaTask
from .svb_vae_task import add_mel_loss


class SVBPPGTask(SVBParaTask):
    model_cls = SVBPPG

    def __init__(self):
        super().__init__()
        from ..data.datasets import FastSingingDataset
        self.dataset_cls = FastSingingDataset

    def prep_batch(self, batch, infer: bool = False):
        # random tech prefix per step (reference: svb_ppg.py:40)
        prefix = "" if infer else ["", "prof_"][self._np_rng.randint(0, 2)]
        b = {
            "mels": batch[f"{prefix}mels"],
            "pitch": batch[f"{prefix}pitch"].astype(np.int32),
            "energy": batch[f"{prefix}energy"],
            "tech": np.full((batch["mels"].shape[0],),
                            1 if prefix == "prof_" else 0, np.int32),
        }
        if hparams["use_spk_id"] and batch.get("spk_ids") is not None:
            b["spk_ids"] = batch["spk_ids"].astype(np.int32)
        if batch.get("txt_tokens") is not None:
            b["txt_tokens"] = batch["txt_tokens"].astype(np.int32)
        if infer:
            return b
        return shard_batch(b, self.mesh)

    def forward_losses(self, params, batch_stats, batch, rng, train):
        losses: Dict[str, Any] = {}
        out, mut = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["mels"], batch["mels"], batch["pitch"], batch["energy"],
            batch.get("spk_ids"), batch["tech"], None, train=train,
            rngs={"dropout": rng}, mutable=["batch_stats"])
        add_mel_loss(self.loss_and_lambda, out["mel_out"], batch["mels"], losses)
        if "txt_tokens" in batch:
            logits = self.model.apply(
                {"params": params, "batch_stats": mut["batch_stats"]},
                batch["mels"], batch["txt_tokens"],
                method=self.model.train_vc_asr, rngs={"dropout": rng})
            losses["asr"] = cross_entropy_ignore0(logits, batch["txt_tokens"])
        return (losses, {"": out["mel_out"]}, {"": batch["mels"]},
                mut["batch_stats"])
