"""Speech voice-conversion task over VCPPG
(reference: tasks/vc/vc_ppg.py:44-156)."""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..hparams import hparams
from ..models.svb_ppg import VCPPG
from ..parallel.mesh import shard_batch
from .adv_base import cross_entropy_ignore0
from .svb_para import SVBParaTask
from .svb_vae_task import add_mel_loss


class VCPPGTask(SVBParaTask):
    model_cls = VCPPG

    def __init__(self):
        super().__init__()
        from ..data.datasets import FastSpeechDataset
        self.dataset_cls = FastSpeechDataset

    def prep_batch(self, batch, infer: bool = False):
        b = {"mels": batch["mels"],
             "pitch": batch["pitch"].astype(np.int32),
             "energy": batch["energy"]}
        if hparams["use_spk_id"] and batch.get("spk_ids") is not None:
            b["spk_ids"] = batch["spk_ids"].astype(np.int32)
        if batch.get("txt_tokens") is not None:
            b["txt_tokens"] = batch["txt_tokens"].astype(np.int32)
        if infer:
            return b
        return shard_batch(b, self.mesh)

    def build_generator(self):
        # VCPPG takes no tech embedding
        hp = dict(hparams)
        hparams["use_tech"] = False
        try:
            return super().build_generator()
        finally:
            hparams.update(hp)

    def forward_losses(self, params, batch_stats, batch, rng, train):
        losses: Dict[str, Any] = {}
        out, mut = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["mels"], batch["mels"], batch["pitch"], batch["energy"],
            batch.get("spk_ids"), None, None, train=train,
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
