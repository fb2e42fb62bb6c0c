"""FastSpeech2 task: text -> mel with duration/pitch losses
(reference: tasks/tts/fs2.py:29-506)."""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..hparams import hparams
from ..models.fs2 import FastSpeech2
from ..models.tts_modules import mel2ph_to_dur
from ..parallel.mesh import shard_batch
from .adv_base import AdversarialTaskBase
from .svb_vae_task import add_mel_loss


def binary_cross_entropy_logits(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


class FastSpeech2Task(AdversarialTaskBase):
    def __init__(self):
        super().__init__()
        from ..data.datasets import FastSpeechDataset
        self.dataset_cls = FastSpeechDataset

    def build_generator(self):
        hp = hparams
        self.model = FastSpeech2(
            dict_size=self._dict_size(), hidden_size=hp["hidden_size"],
            enc_layers=hp["enc_layers"], dec_layers=hp["dec_layers"],
            enc_ffn_kernel_size=hp["enc_ffn_kernel_size"],
            dec_ffn_kernel_size=hp["dec_ffn_kernel_size"],
            num_heads=hp["num_heads"], out_dims=hp["audio_num_mel_bins"],
            decoder_type="fft" if hp["decoder_type"] == "fft" else "conv",
            use_spk_id=hp["use_spk_id"], use_spk_embed=hp["use_spk_embed"],
            num_spk=hp["num_spk"], use_pitch_embed=hp["use_pitch_embed"],
            use_energy_embed=hp["use_energy_embed"], use_uv=hp["use_uv"],
            pitch_type=hp["pitch_type"],
            predictor_hidden=hp["predictor_hidden"],
            predictor_kernel=hp["predictor_kernel"],
            predictor_layers=hp["predictor_layers"],
            dur_predictor_kernel=hp["dur_predictor_kernel"],
            dur_predictor_layers=hp["dur_predictor_layers"],
            predictor_dropout=hp["predictor_dropout"],
            predictor_grad=hp["predictor_grad"], dropout=hp["dropout"],
            f0_mean=hp.get("f0_mean") or 220.0, f0_std=hp.get("f0_std") or 60.0,
            pitch_norm=hp["pitch_norm"])
        B, Tt, Tm = 2, 8, 32
        tokens = np.ones((B, Tt), np.int32)
        m2p = np.ones((B, Tm), np.int32)
        f0 = np.zeros((B, Tm), np.float32)
        spk = (np.zeros((B,), np.int32) if hp["use_spk_id"]
               else np.zeros((B, 256), np.float32) if hp["use_spk_embed"] else None)
        rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
        v = self.model.init(rngs, tokens, m2p, spk, f0, f0)
        return dict(v["params"]), dict(v.get("batch_stats", {}))

    def prep_batch(self, batch, infer: bool = False):
        hp = hparams
        b = {"txt_tokens": batch["txt_tokens"].astype(np.int32),
             "mels": batch["mels"],
             "mel2ph": batch["mel2ph"].astype(np.int32),
             "f0": batch["f0"], "uv": batch["uv"], "energy": batch["energy"]}
        if hp["pitch_type"] == "cwt" and "cwt_spec" in batch:
            b["cwt_spec"] = batch["cwt_spec"]
            b["f0_mean"] = batch["f0_mean"]
            b["f0_std"] = batch["f0_std"]
        if "ph2word" in batch:
            b["ph2word"] = batch["ph2word"].astype(np.int32)
        if hp["use_spk_id"]:
            b["spk"] = batch["spk_ids"].astype(np.int32)
        elif hp["use_spk_embed"]:
            b["spk"] = batch["spk_embed"]
        if infer:
            return b
        return shard_batch(b, self.mesh)

    def forward_losses(self, params, batch_stats, batch, rng, train):
        hp = hparams
        f0 = batch["f0"] if hp["use_gt_f0"] else None
        uv = batch["uv"] if hp["use_gt_f0"] else None
        if hp["pitch_type"] == "cwt" and "cwt_spec" in batch:
            # GT f0 is decoded from the GT wavelet spectrum
            # (reference: fs2.py:119-123 run_model)
            from ..ops.cwt import cwt2f0_norm
            f0 = cwt2f0_norm(batch["cwt_spec"], batch["f0_mean"],
                             batch["f0_std"], batch["mel2ph"], hp)
            uv = batch["uv"]
        out, mut = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["txt_tokens"], batch["mel2ph"], batch.get("spk"),
            f0, uv, batch.get("energy"), train=train,
            rngs={"dropout": rng}, mutable=["batch_stats"])
        losses: Dict[str, Any] = {}
        add_mel_loss(self.loss_and_lambda, out["mel_out"], batch["mels"], losses)
        self._dur_loss(out, batch, losses)
        if hp["use_pitch_embed"]:
            self._pitch_loss(out, batch, losses)
        if hp.get("use_energy_embed"):
            self._energy_loss(out, batch, losses)
        return losses, {"": out["mel_out"]}, {"": batch["mels"]}, \
            mut["batch_stats"]

    def _dur_loss(self, out, batch, losses):
        hp = hparams
        tokens = batch["txt_tokens"]
        nonpadding = (tokens != 0).astype(jnp.float32)
        dur_gt = mel2ph_to_dur(batch["mel2ph"], tokens.shape[1]).astype(
            jnp.float32) * nonpadding
        pdur = ((out["dur"] - jnp.log(dur_gt + 1)) ** 2) * nonpadding
        losses["pdur"] = (pdur.sum() / nonpadding.sum()) * hp["lambda_ph_dur"]
        if hp["lambda_sent_dur"] > 0:
            dur_pred_lin = jnp.clip(jnp.exp(out["dur"]) - 1, 0, None) * nonpadding
            sd = (jnp.log(dur_pred_lin.sum(-1) + 1)
                  - jnp.log(dur_gt.sum(-1) + 1)) ** 2
            losses["sdur"] = sd.mean() * hp["lambda_sent_dur"]
        if hp.get("lambda_word_dur", 0) > 0 and batch.get("ph2word") is not None:
            # word-level duration loss via segment sums over ph2word
            # (reference: fs2.py:208-216)
            ph2word = batch["ph2word"]  # [B, T_txt], 1-indexed, 0 = pad
            n_words = int(ph2word.max()) + 1 if hasattr(ph2word, "max") else 64
            dur_pred_lin = jnp.clip(jnp.exp(out["dur"]) - 1, 0, None) * nonpadding
            oh = jax.nn.one_hot(ph2word, n_words, dtype=dur_gt.dtype)
            wd_p = jnp.einsum("bt,btw->bw", dur_pred_lin, oh)[:, 1:]
            wd_g = jnp.einsum("bt,btw->bw", dur_gt, oh)[:, 1:]
            keep = (wd_g > 0).astype(dur_gt.dtype)
            wl = ((jnp.log(wd_p + 1) - jnp.log(wd_g + 1)) ** 2 * keep).sum() \
                / jnp.maximum(keep.sum(), 1.0)
            losses["wdur"] = wl * hp["lambda_word_dur"]

    def _energy_loss(self, out, batch, losses):
        """reference: fs2.py add_energy + EnergyPredictor L1."""
        hp = hparams
        if "energy_pred" not in out or batch.get("energy") is None:
            return
        nonpadding = (batch["mel2ph"] != 0).astype(jnp.float32)
        el = (jnp.abs(out["energy_pred"] - batch["energy"]) * nonpadding).sum() \
            / jnp.maximum(nonpadding.sum(), 1.0)
        losses["e"] = el * hp.get("lambda_energy", 0.0)

    def _pitch_loss(self, out, batch, losses):
        hp = hparams
        nonpadding = (batch["mel2ph"] != 0).astype(jnp.float32)
        if hp["pitch_type"] == "cwt":
            return self._cwt_pitch_loss(out, batch, losses, nonpadding)
        pred = out["pitch_pred"]
        f0_l = (jnp.abs(pred[:, :, 0] - batch["f0"]) * nonpadding).sum() \
            / jnp.maximum(nonpadding.sum(), 1.0)
        losses["f0"] = f0_l * hp["lambda_f0"]
        if hp["use_uv"] and pred.shape[-1] > 1:
            uv_l = (binary_cross_entropy_logits(pred[:, :, 1], batch["uv"])
                    * nonpadding).sum() / jnp.maximum(nonpadding.sum(), 1.0)
            losses["uv"] = uv_l * hp["lambda_uv"]

    def _cwt_pitch_loss(self, out, batch, losses, nonpadding):
        """Wavelet-domain pitch losses: spectrum + uv + utterance stats
        (reference: tasks/tts/fs2.py:233-250)."""
        hp = hparams
        if "cwt_spec" not in batch:
            return
        cwt_g = batch["cwt_spec"]
        T = min(cwt_g.shape[1], out["cwt"].shape[1])
        cwt_pred = out["cwt"][:, :T, :10]
        kind = hp.get("cwt_loss", "l1")
        diff = cwt_pred - cwt_g[:, :T]
        c = jnp.abs(diff).mean() if kind == "l1" else (diff ** 2).mean()
        losses["C"] = c * hp["lambda_f0"]
        if hp["use_uv"]:
            uv_l = (binary_cross_entropy_logits(
                out["cwt"][:, :T, -1], batch["uv"][:, :T])
                * nonpadding[:, :T]).sum() \
                / jnp.maximum(nonpadding[:, :T].sum(), 1.0)
            losses["uv"] = uv_l * hp["lambda_uv"]
        losses["f0_mean"] = jnp.abs(
            out["f0_mean"] - batch["f0_mean"]).mean() * hp["lambda_f0"]
        losses["f0_std"] = jnp.abs(
            out["f0_std"] - batch["f0_std"]).mean() * hp["lambda_f0"]
        if hp.get("cwt_add_f0_loss"):
            from ..ops.cwt import cwt2f0_norm
            f0_cwt = cwt2f0_norm(cwt_pred, out["f0_mean"], out["f0_std"],
                                 batch["mel2ph"], hp)
            fl = (jnp.abs(f0_cwt - batch["f0"]) * nonpadding).sum() \
                / jnp.maximum(nonpadding.sum(), 1.0)
            losses["f0"] = fl * hp["lambda_f0"]

    # ------------------------------------------------------------------
    # validation visualization (reference: fs2.py validation plots)
    def vis_validation(self, batch, fakes, gts, batch_idx):
        if (self.logger is None
                or self.global_step % hparams["valid_infer_interval"] != 0
                or batch_idx >= hparams.get("num_valid_plots", 0)):
            return
        from ..ops.pitch_utils import denorm_f0
        from ..utils.plot import spec_to_figure, tb_add_audio
        if getattr(self, "vocoder", None) is None:
            from ..vocoders.base import get_vocoder_cls
            self.vocoder = get_vocoder_cls(hparams)(dict(hparams))
        L = int(batch["mel_lengths"][0])
        mel = np.asarray(fakes[""][0][:L])
        gt = np.asarray(gts[""][0][:L])
        fig = spec_to_figure(np.concatenate([gt, mel], -1),
                             vmin=hparams["mel_vmin"], vmax=hparams["mel_vmax"],
                             title="gt|pred")
        self.logger.add_figure(f"mel_{batch_idx}", fig, self.global_step)
        f0 = np.asarray(denorm_f0(batch["f0"], batch["uv"], hparams)[0][:L])
        wav = self.vocoder.spec2wav(mel, f0=f0)
        tb_add_audio(self.logger, f"wav_{batch_idx}", wav, self.global_step,
                     hparams["audio_sample_rate"])

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


    # ------------------------------------------------------------------
    # inference (reference: tasks/tts/fs2.py:after_infer wav saving)
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
        use_gt_dur = hparams.get("use_gt_dur", True) and b.get("mel2ph") is not None
        out, _ = self.model.apply(
            {"params": self.state["params"],
             "batch_stats": self.state["batch_stats"]},
            b["txt_tokens"], b["mel2ph"] if use_gt_dur else None, b.get("spk"),
            b["f0"] if hparams.get("use_gt_f0", True) else None,
            b["uv"] if hparams.get("use_gt_f0", True) else None,
            b.get("energy"), infer=True,
            max_frames=None if use_gt_dur else batch["mels"].shape[1],
            rngs={"dropout": self._next_rng()}, mutable=["batch_stats"])
        T = int(batch["mel_lengths"][0])
        mel_pred = np.asarray(out["mel_out"][0][:T])
        from ..ops.pitch_utils import denorm_f0
        f0 = np.asarray(denorm_f0(batch["f0"], batch["uv"], hparams)[0][:T])
        gen_dir = os.path.join(
            hparams["work_dir"],
            f"generated_{self.global_step}_{hparams['gen_dir_name']}")
        wavs = {"P": self.vocoder.spec2wav(mel_pred, f0=f0)}
        if hparams.get("save_gt", True):
            wavs["G"] = self.vocoder.spec2wav(np.asarray(batch["mels"][0][:T]),
                                              f0=f0)
        base_fn = f"[{self.results_id:06d}][{batch['item_name'][0]}]".replace(" ", "_")
        self.results_id += 1
        from .svb_vae_task import SVBVAETaskBase
        wavs_named = {f"{k.lower()}_wavout": v for k, v in wavs.items()}
        self.saving_results_futures.append(self.saving_result_pool.apply_async(
            SVBVAETaskBase.save_result,
            args=[wavs_named, base_fn, gen_dir, {"mel": mel_pred}]))
        if hparams.get("save_f0") and "G" in wavs:
            self.saving_results_futures.append(self.saving_result_pool.apply_async(
                self._save_f0_plot,
                args=[wavs["P"], mel_pred, wavs["G"],
                      np.asarray(batch["mels"][0][:T]), gen_dir, base_fn]))
        return {"item_name": batch["item_name"][0]}

    @staticmethod
    def _save_f0_plot(wav_pred, mel_pred, wav_gt, mel_gt, gen_dir, base_fn):
        """Overlay pred/gt f0 tracked from the vocoded wavs
        (reference: fs2.py:432-447 save_f0 plotting)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from ..ops.pitch import get_pitch
        f0_p, _ = get_pitch(wav_pred, mel_pred, hparams)
        f0_g, _ = get_pitch(wav_gt, mel_gt, hparams)
        os.makedirs(f"{gen_dir}/plot", exist_ok=True)
        fig = plt.figure()
        plt.plot(f0_p, label=r"$f0_P$")
        plt.plot(f0_g, label=r"$f0_G$")
        plt.legend()
        plt.tight_layout()
        plt.savefig(f"{gen_dir}/plot/[F0]{base_fn}.png", format="png")
        plt.close(fig)

    def test_end(self, outputs):
        self.saving_result_pool.close()
        for f in self.saving_results_futures:
            f.get()
        self.saving_result_pool.join()
        return {}
