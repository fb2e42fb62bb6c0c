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


def load_test_inputs(inp_wav_paths, item_names):
    """Raw-wav inference inputs: run the binarizer frontend on loose wavs
    (reference: tasks/vc/vc_ppg.py:21-41 load_test_inputs)."""
    from ..data.binarizer import BaseBinarizer
    items, sizes = [], []
    bargs = dict(hparams.get("binarization_args", {}))
    bargs["with_f0"] = True
    for wav_fn, item_name in zip(inp_wav_paths, item_names):
        item = BaseBinarizer.process_item(item_name, wav_fn, 0, bargs)
        item["phone"] = [1]
        items.append(item)
        sizes.append(item["len"])
    return items, sizes


class RawWavDataset:
    """Minimal test dataset over load_test_inputs items."""

    def __init__(self, items, sizes, base_cls):
        self.items = items
        self.sizes = sizes
        self._base = base_cls.__new__(base_cls)  # reuse sample/collate logic
        self._base.hparams = hparams
        self._base.indexed_ds = items
        self._base.avail_idxs = list(range(len(items)))
        self._base.prefix = "raw"
        self._base.data_dir = ""
        self._base.sizes = sizes
        self._base.pitch_type = hparams.get("pitch_type")
        self._base.f0_mean = hparams.get("f0_mean") or 220.0
        self._base.f0_std = hparams.get("f0_std") or 60.0

    def __len__(self):
        return len(self.items)

    def num_tokens(self, i):
        return min(self.sizes[i], hparams["max_frames"])

    def ordered_indices(self):
        import numpy as np
        return np.arange(len(self.items))

    def __getitem__(self, i):
        return self._base.__getitem__(i)

    def collater(self, samples):
        return self._base.collater(samples)


class VCPPGTask(SVBParaTask):
    model_cls = VCPPG

    def __init__(self):
        super().__init__()
        from ..data.datasets import FastSpeechDataset
        self.dataset_cls = FastSpeechDataset

    def test_dataloader(self, n_devices=None):
        test_dir = hparams.get("test_input_dir", "")
        if test_dir:
            import glob
            import os
            wavs = sorted(glob.glob(os.path.join(test_dir, "*.wav"))
                          + glob.glob(os.path.join(test_dir, "*.mp3")))
            names = [os.path.splitext(os.path.basename(w))[0] for w in wavs]
            items, sizes = load_test_inputs(wavs, names)
            ds = RawWavDataset(items, sizes, self.dataset_cls)
            return self.build_dataloader(ds, False, None, 1,
                                         use_batch_by_size=False, n_devices=1)
        return super().test_dataloader(n_devices)

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
