"""Parallel-data SVB tasks over the PPG regression models
(reference: tasks/singing/svb_para.py:52-687).

``SVBParaTask`` runs the model on the concurrent ways a2a/p2p/a2p/p2a with
per-way mel + adversarial losses and ASR CE losses;
``ParaPPGPretrainedTask`` freezes the warm-started ASR. Variant tasks pick
different PPG models (PreExp/Aligned/Constraint)."""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..hparams import hparams
from ..models.svb_ppg import (ParaAlignedPPG, ParaPPGConstraint, ParaPPGPreExp,
                              ParaSVBPPG)
from ..ops.pitch_utils import denorm_f0
from ..parallel.mesh import shard_batch
from ..training.checkpoint import load_sub_params
from .adv_base import AdversarialTaskBase, cross_entropy_ignore0
from .svb_vae_task import add_mel_loss

WAY_SRC = {"a2a": ("", ""), "p2p": ("prof_", "prof_"),
           "a2p": ("", "prof_"), "p2a": ("prof_", "")}


class SVBParaTask(AdversarialTaskBase):
    model_cls = ParaSVBPPG
    freeze_asr = False

    def __init__(self):
        super().__init__()
        from ..data.datasets import FastSingingF0AlignDataset
        self.dataset_cls = FastSingingF0AlignDataset
        ways = [w for w in hparams.get("concurrent_ways", "").split(",") if w]
        self.concurrent_ways = tuple(ways) or ("a2a", "p2p", "a2p")
        self.watch_asr_loss = False

    # ------------------------------------------------------------------
    def build_generator(self):
        hp = hparams
        self.model = self.model_cls(
            dict_size=self._dict_size(), hidden_size=hp["hidden_size"],
            num_mel_bins=hp["audio_num_mel_bins"],
            mel_strides=tuple(hp["mel_strides"]),
            asr_enc_layers=hp["asr_enc_layers"], asr_dec_layers=hp["asr_dec_layers"],
            asr_last_norm=hp["asr_last_norm"], ref_enc_out=hp["ref_enc_out"],
            use_energy=hp["use_energy"], use_spk_id=hp["use_spk_id"],
            num_spk=hp["num_spk"], use_tech=hp.get("use_tech", True),
            num_techs=hp.get("num_techs", 3),
            ref_attn=bool(hp.get("ref_attn")),
            asr_enc_type=hp.get("asr_enc_type") or "conformer",
            decoder_type=hp["decoder_type"],
            dec_layers=hp["dec_layers"],
            dec_ffn_kernel_size=hp["dec_ffn_kernel_size"],
            num_heads=hp["num_heads"], dropout=hp["dropout"])
        B, T = 2, 32
        bins = hp["audio_num_mel_bins"]
        mels = np.zeros((B, T, bins), np.float32)
        pitch = np.ones((B, T), np.int32)
        energy = np.zeros((B, T), np.float32)
        spk = np.zeros((B, 5, 256), np.float32)
        tech = np.zeros((B,), np.int32)
        align = np.zeros((B, T), np.int32)
        tokens = np.ones((B, 8), np.int32)
        rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
        v1 = self.model.init(rngs, mels, mels, pitch, energy, spk, tech, align)
        v2 = self.model.init(rngs, mels, tokens, method=self.model.train_vc_asr)
        # a third init with spk=None creates the ref_encoder branch (used by
        # AmtSpk and non-para configs) so all data-dependent branches exist
        v3 = (self.model.init(rngs, mels, mels, pitch, energy, None, tech, align)
              if not hparams["use_spk_id"] else {"params": {}})

        def merge(a, b):
            if not isinstance(a, dict):
                return a
            out = dict(a)
            for k, vv in b.items():
                out[k] = merge(a[k], vv) if k in a else vv
            return out

        params = merge(merge(dict(v1["params"]), v2["params"]),
                       dict(v3.get("params", {})))
        asr_ckpt = hparams.get("pretrain_asr_ckpt", "")
        if self.freeze_asr and asr_ckpt:
            from flax import serialization
            loaded = load_sub_params(params["vc_asr"], asr_ckpt,
                                     key_path=("state", "params", "vc_asr"))
            params["vc_asr"] = serialization.from_state_dict(params["vc_asr"], loaded)
        return params, merge(merge(dict(v1.get("batch_stats", {})),
                                   v2.get("batch_stats", {})),
                             dict(v3.get("batch_stats", {})))

    def frozen_keys(self):
        return ("vc_asr",) if self.freeze_asr else ()

    # ------------------------------------------------------------------
    def prep_batch(self, batch, infer: bool = False):
        b = {
            "mels": batch["mels"], "prof_mels": batch["prof_mels"],
            "pitch": batch["pitch"].astype(np.int32),
            "prof_pitch": batch["prof_pitch"].astype(np.int32),
            "energy": batch["energy"], "prof_energy": batch["prof_energy"],
            "a2p_f0_alignment": batch["a2p_f0_alignment"].astype(np.int32),
        }
        if "p2a_f0_alignment" in batch and batch.get("p2a_f0_alignment") is not None:
            b["p2a_f0_alignment"] = batch["p2a_f0_alignment"].astype(np.int32)
        if "multi_spk_emb" in batch:
            b["multi_spk_emb"] = batch["multi_spk_emb"]
        else:
            b["multi_spk_emb"] = np.zeros((batch["mels"].shape[0], 1, 256), np.float32)
        if batch.get("txt_tokens") is not None:
            b["txt_tokens"] = batch["txt_tokens"].astype(np.int32)
        if infer:
            return b
        return shard_batch(b, self.mesh)

    def _one_way(self, params, batch_stats, batch, way, rng, train):
        src, tgt = WAY_SRC[way]
        mels_content = batch[f"{src}mels"]
        pitch = batch[f"{tgt}pitch"]
        energy = batch.get(f"{tgt}energy")
        tech = (jnp.ones if tgt == "prof_" else jnp.zeros)(
            (mels_content.shape[0],), jnp.int32)
        align = None
        if way == "a2p":
            align = batch["a2p_f0_alignment"]
        elif way == "p2a":
            align = batch.get("p2a_f0_alignment")
        out, mut = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            mels_content, mels_content, pitch, energy, batch["multi_spk_emb"],
            tech, align, train=train,
            rngs={"dropout": rng}, mutable=["batch_stats"])
        return out, mut["batch_stats"]

    def forward_losses(self, params, batch_stats, batch, rng, train):
        losses: Dict[str, Any] = {}
        fakes, gts = {}, {}
        stats = batch_stats
        for i, way in enumerate(self.concurrent_ways):
            out, stats = self._one_way(params, stats, batch, way,
                                       jax.random.fold_in(rng, i), train)
            _, tgt = WAY_SRC[way]
            mel_g = batch[f"{tgt}mels"]
            add_mel_loss(self.loss_and_lambda, out["mel_out"], mel_g, losses,
                         postfix=way)
            fakes[f"{way}_"] = out["mel_out"]
            gts[f"{way}_"] = mel_g
        self.add_asr_losses(params, stats, batch, losses, rng, train)
        return losses, fakes, gts, stats

    def add_asr_losses(self, params, batch_stats, batch, losses, rng, train):
        """CE over amateur and professional mels (reference: svb_para.py:358-369)."""
        if "txt_tokens" not in batch:
            return
        tokens = batch["txt_tokens"]
        sides = {w[0] for w in self.concurrent_ways}
        variables = {"params": params, "batch_stats": batch_stats}
        if "a" in sides:
            logits = self.model.apply(variables, batch["mels"], tokens,
                                      method=self.model.train_vc_asr,
                                      rngs={"dropout": rng})
            losses["asr_a"] = cross_entropy_ignore0(logits, tokens)
        if "p" in sides:
            logits = self.model.apply(variables, batch["prof_mels"], tokens,
                                      method=self.model.train_vc_asr,
                                      rngs={"dropout": rng})
            losses["asr_p"] = cross_entropy_ignore0(logits, tokens)

    # ------------------------------------------------------------------
    # validation visualization (reference: svb_para.py:226-269)
    def vis_validation(self, batch, fakes, gts, batch_idx):
        if (self.logger is None
                or self.global_step % hparams["valid_infer_interval"] != 0
                or batch_idx >= hparams.get("num_valid_plots", 0)):
            return
        from ..utils.plot import spec_to_figure, tb_add_audio
        if getattr(self, "vocoder", None) is None:
            from ..vocoders.base import get_vocoder_cls
            self.vocoder = get_vocoder_cls(hparams)(dict(hparams))
        sr = hparams["audio_sample_rate"]
        f0s = {"a2a": denorm_f0(batch["f0"], batch["uv"], hparams),
               "p2p": denorm_f0(batch["prof_f0"], batch["prof_uv"], hparams)}
        f0s["a2p"], f0s["p2a"] = f0s["p2p"], f0s["a2a"]
        lens = {"a2a": int(batch["mel_lengths"][0]),
                "p2p": int(batch["prof_mel_lengths"][0])}
        lens["a2p"], lens["p2a"] = lens["p2p"], lens["a2a"]
        for key, mel_pred in fakes.items():
            way = key.rstrip("_")
            if way not in lens:
                continue
            L = lens[way]
            mel = np.asarray(mel_pred[0][:L])
            wav = self.vocoder.spec2wav(mel, f0=np.asarray(f0s[way][0][:L]))
            tb_add_audio(self.logger, f"{way}_wavout_{batch_idx}", wav,
                         self.global_step, sr)
            gt = np.asarray(gts[key][0][:L])
            fig = spec_to_figure(np.concatenate([gt, mel], -1),
                                 vmin=hparams["mel_vmin"],
                                 vmax=hparams["mel_vmax"],
                                 title=f"{way} gt|pred")
            self.logger.add_figure(f"{way}_gt_{batch_idx}", fig,
                                   self.global_step)

    # ------------------------------------------------------------------
    # inference (reference: svb_para.py:275-353)
    def test_start(self):
        from multiprocessing.pool import ThreadPool
        from ..vocoders.base import get_vocoder_cls
        self.saving_result_pool = ThreadPool(8)
        self.saving_results_futures = []
        self.vocoder = get_vocoder_cls(hparams)(dict(hparams))
        self.results_id = 0

    def test_step(self, batch, batch_idx: int):
        assert batch["nsamples"] == 1, "inference supports batch_size=1"
        b = self.prep_batch(batch, infer=True)
        losses = {}
        fakes = {}
        stats = self.state["batch_stats"]
        for i, way in enumerate(self.concurrent_ways):
            out, stats = self._one_way(self.state["params"], stats, b, way,
                                       jax.random.fold_in(self._next_rng(), i),
                                       train=False)
            fakes[way] = np.asarray(out["mel_out"][0])
        f0s = {"a2a": denorm_f0(batch["f0"], batch["uv"], hparams),
               "p2p": denorm_f0(batch["prof_f0"], batch["prof_uv"], hparams)}
        f0s["a2p"], f0s["p2a"] = f0s["p2p"], f0s["a2a"]
        lens = {"a2a": int(batch["mel_lengths"][0]),
                "p2p": int(batch["prof_mel_lengths"][0])}
        lens["a2p"], lens["p2a"] = lens["p2p"], lens["a2a"]
        gen_dir = os.path.join(
            hparams["work_dir"],
            f"generated_{self.global_step}_{hparams['gen_dir_name']}")
        wavs_dict = {
            "gt_a_wavout": self.vocoder.spec2wav(
                np.asarray(batch["mels"][0][: lens["a2a"]]),
                f0=np.asarray(f0s["a2a"][0][: lens["a2a"]])),
            "gt_p_wavout": self.vocoder.spec2wav(
                np.asarray(batch["prof_mels"][0][: lens["p2p"]]),
                f0=np.asarray(f0s["p2p"][0][: lens["p2p"]])),
        }
        for way in self.concurrent_ways:
            L = lens[way]
            wavs_dict[f"{way}_wavout"] = self.vocoder.spec2wav(
                fakes[way][:L], f0=np.asarray(f0s[way][0][:L]))
        base_fn = f"[{self.results_id:06d}][{batch['item_name'][0]}][P]" \
            .replace(" ", "_")
        self.results_id += 1
        from .svb_vae_task import SVBVAETaskBase
        self.saving_results_futures.append(self.saving_result_pool.apply_async(
            SVBVAETaskBase.save_result, args=[wavs_dict, base_fn, gen_dir, {}]))
        return {"item_name": batch["item_name"][0]}

    def test_end(self, outputs):
        self.saving_result_pool.close()
        for f in self.saving_results_futures:
            f.get()
        self.saving_result_pool.join()
        return {}

    # ------------------------------------------------------------------
    def train_dataloader(self, n_devices=None):
        from ..data.datasets import maybe_concat_dataset
        ds = maybe_concat_dataset(self.dataset_cls,
                                  hparams["train_set_name"], shuffle=True)
        return self.build_dataloader(ds, True, hparams["max_tokens"],
                                     hparams["max_sentences"],
                                     endless=hparams["endless_ds"],
                                     n_devices=n_devices or self.n_devices)

    def val_dataloader(self, n_devices=None):
        ds = self.dataset_cls(hparams["valid_set_name"], shuffle=False)
        mv = hparams["max_valid_tokens"]
        return self.build_dataloader(
            ds, False, mv if mv != -1 else hparams["max_tokens"],
            hparams["max_valid_sentences"], n_devices=1)

    def test_dataloader(self, n_devices=None):
        ds = self.dataset_cls(hparams["test_set_name"], shuffle=False)
        return self.build_dataloader(ds, False, None, 1,
                                     use_batch_by_size=False, n_devices=1)


class ParaPPGConstraintTask(SVBParaTask):
    """+ PPG consistency constraint between aligned amateur and professional
    content features (reference: svb_para.py:371-407)."""
    model_cls = ParaPPGConstraint

    def add_asr_losses(self, params, batch_stats, batch, losses, rng, train):
        if "txt_tokens" not in batch:
            return
        tokens = batch["txt_tokens"]
        variables = {"params": params, "batch_stats": batch_stats}
        # amateur content realigned to the professional timeline inside the
        # ASR (reference: svb_para.py:387-406 + AlignedVCASR)
        logits_a, h_a = self.model.apply(
            variables, batch["mels"], tokens, batch["a2p_f0_alignment"],
            with_hidden=True, method=self.model.train_vc_asr,
            rngs={"dropout": rng})
        logits_p, h_p = self.model.apply(
            variables, batch["prof_mels"], tokens, None, with_hidden=True,
            method=self.model.train_vc_asr, rngs={"dropout": rng})
        losses["asr_a"] = cross_entropy_ignore0(logits_a, tokens)
        losses["asr_p"] = cross_entropy_ignore0(logits_p, tokens)
        T = h_p.shape[1]
        scale = int(np.prod(hparams["mel_strides"]))
        mel_lengths = ((jnp.abs(batch["prof_mels"]).sum(-1) > 0).sum(-1)
                       // scale).astype(jnp.int32)
        mask = (jnp.arange(T)[None] < mel_lengths[:, None]).astype(h_p.dtype)
        h_a = h_a[:, :T]
        if h_a.shape[1] < T:
            h_a = jnp.pad(h_a, ((0, 0), (0, T - h_a.shape[1]), (0, 0)))
        diff = ((h_a - jax.lax.stop_gradient(h_p)) ** 2) * mask[:, :, None]
        losses["ppg_constraint"] = diff.sum() / jnp.maximum(
            mask.sum() * h_p.shape[-1], 1.0) * 0.1


class ParaPPGPreExpTask(SVBParaTask):
    model_cls = ParaPPGPreExp


class ParaAlignedPPGTask(SVBParaTask):
    model_cls = ParaAlignedPPG


class ParaPPGPretrainedTask(SVBParaTask):
    """Frozen warm-started ASR; ASR CE only watched (detached) in validation
    (reference: svb_para.py:431-530)."""
    freeze_asr = True

    def add_asr_losses(self, params, batch_stats, batch, losses, rng, train):
        if train or "txt_tokens" not in batch:
            return
        tokens = batch["txt_tokens"]
        variables = {"params": params, "batch_stats": batch_stats}
        for name, mels in (("asr_a", batch["mels"]), ("asr_p", batch["prof_mels"])):
            logits = self.model.apply(variables, mels, tokens,
                                      method=self.model.train_vc_asr,
                                      rngs={"dropout": rng})
            losses[name] = jax.lax.stop_gradient(
                cross_entropy_ignore0(logits, tokens))


class ParaPPGSpkConsistentTask(ParaPPGPretrainedTask):
    """Adds a second (speaker-consistency) discriminator over generated mels
    (reference: svb_para.py:533-631). With ``use_cond_disc`` off (the shipped
    default) the reference's spk disc degenerates to a second unconditional
    mel discriminator, which is what this builds; conditional speaker
    embedding input follows ``use_cond_disc``."""

    def build_extra_discs(self):
        from ..models.disc import Discriminator
        hp = hparams
        self.spk_disc = Discriminator(
            time_lengths=tuple([32, 64, 128][: hp["disc_win_num"]]),
            freq_length=hp["audio_num_mel_bins"],
            hidden_size=hp["mel_disc_hidden_size"], norm_type=hp["disc_norm"],
            reduction=hp["disc_reduction"],
            cond_size=hp["hidden_size"] if hp["use_cond_disc"] else 0)
        self.discriminators["_spk"] = self.spk_disc


class AmtSpkTask(ParaPPGPretrainedTask):
    """Amateur mel is the timbre reference for every way
    (reference: svb_para.py:632-687)."""

    def _one_way(self, params, batch_stats, batch, way, rng, train):
        src, tgt = WAY_SRC[way]
        mels_content = batch[f"{src}mels"]
        pitch = batch[f"{tgt}pitch"]
        energy = None
        tech = (jnp.ones if tgt == "prof_" else jnp.zeros)(
            (mels_content.shape[0],), jnp.int32)
        align = None
        if way == "a2p":
            align = batch["a2p_f0_alignment"]
        elif way == "p2a":
            align = batch.get("p2a_f0_alignment")
        out, mut = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            mels_content, batch["mels"], pitch, energy, None,
            tech, align, train=train,
            rngs={"dropout": rng}, mutable=["batch_stats"])
        return out, mut["batch_stats"]
