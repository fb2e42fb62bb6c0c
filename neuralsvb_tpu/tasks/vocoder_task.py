"""HiFiGAN(-NSF) vocoder training task.

The reference *references* ``tasks.vocoder.hifigan.HifiGanTask``
(egs/egs_bases/tts/vocoder/hifigan.yaml:2) but ships no implementation —
vocoder training was stripped (SURVEY.md section 2.5 note). This restores the
capability: LSGAN over MultiPeriod+MultiScale discriminators, feature-matching
loss and an L1 mel loss on re-analyzed audio, on random ``max_samples``-long
wav crops (static shapes).

Requires a packed dataset binarized with ``binarization_args.with_wav: true``
and (for NSF) ``with_f0: true``.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..hparams import hparams
from ..models.hifigan import (HifiGanGenerator, MultiPeriodDiscriminator,
                              MultiScaleDiscriminator, discriminator_loss,
                              feature_loss, generator_loss)
from ..ops.stft import log_mel_jax
from ..parallel.mesh import make_mesh, replicate_state, shard_batch
from ..training.schedulers import step_lr_schedule
from .base_task import BaseTask
from .svb_vae_task import mse


class VocoderDataset:
    """Random fixed-length wav crops + aligned mel/f0 windows."""

    def __init__(self, prefix: str, shuffle: bool = False):
        from ..data.indexed_dataset import IndexedDataset
        self.prefix = prefix
        self.ds = IndexedDataset(f"{hparams['binary_data_dir']}/{prefix}")
        self.sizes = [1] * len(self.ds)
        self.shuffle = shuffle
        self.rng = np.random.RandomState(hparams.get("seed", 1234))
        self.max_samples = hparams.get("max_samples", 8192)
        self.hop = hparams["hop_size"]

    def __len__(self):
        return len(self.ds)

    def num_tokens(self, index):
        return 1

    def ordered_indices(self):
        idx = np.arange(len(self))
        if self.shuffle:
            self.rng.shuffle(idx)
        return idx

    def __getitem__(self, index):
        item = self.ds[index]
        wav = np.asarray(item["wav"], np.float32)
        mel = np.asarray(item["mel"], np.float32)
        f0 = np.asarray(item.get("f0", np.zeros(len(mel))), np.float32)
        frames = self.max_samples // self.hop
        T = min(len(mel), len(wav) // self.hop)
        if T <= frames:
            start = 0
            mel_seg = np.pad(mel[:T], ((0, frames - T), (0, 0)))
            f0_seg = np.pad(f0[:T], (0, frames - T))
            wav_seg = np.pad(wav[: T * self.hop],
                             (0, frames * self.hop - T * self.hop))
        else:
            start = self.rng.randint(0, T - frames)
            mel_seg = mel[start:start + frames]
            f0_seg = f0[start:start + frames]
            wav_seg = wav[start * self.hop:(start + frames) * self.hop]
        return {"wav": wav_seg, "mel": mel_seg, "f0": f0_seg}

    def collater(self, samples):
        return {"wavs": np.stack([s["wav"] for s in samples]),
                "mels": np.stack([s["mel"] for s in samples]),
                "f0": np.stack([s["f0"] for s in samples]),
                "nsamples": len(samples)}


class HifiGanTask(BaseTask):
    num_optimizers = 2

    def __init__(self):
        super().__init__()
        self.mesh = make_mesh(hparams.get("mesh_shape", ""))
        self.n_devices = int(np.prod(self.mesh.devices.shape))
        self._rng = jax.random.PRNGKey(hparams.get("seed", 1234))
        self._step_cache = {}

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def build_model(self):
        hp = hparams
        self.model = HifiGanGenerator(
            upsample_rates=tuple(hp["upsample_rates"]),
            upsample_kernel_sizes=tuple(hp["upsample_kernel_sizes"]),
            upsample_initial_channel=hp["upsample_initial_channel"],
            resblock=str(hp["resblock"]),
            resblock_kernel_sizes=tuple(hp["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tuple(tuple(d) for d in
                                          hp["resblock_dilation_sizes"]),
            use_pitch_embed=hp["use_pitch_embed"],
            audio_sample_rate=hp["audio_sample_rate"],
            num_mels=hp["audio_num_mel_bins"])
        self.mpd = MultiPeriodDiscriminator()
        self.msd = MultiScaleDiscriminator()
        frames = hp.get("max_samples", 8192) // hp["hop_size"]
        mel = jnp.zeros((1, frames, hp["audio_num_mel_bins"]))
        f0 = jnp.zeros((1, frames))
        rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
        gv = self.model.init(rngs, mel, f0 if hp["use_pitch_embed"] else None)
        wav = jnp.zeros((1, hp.get("max_samples", 8192)))
        pv = self.mpd.init(jax.random.PRNGKey(2), wav, wav)
        sv = self.msd.init(jax.random.PRNGKey(3), wav, wav)
        state = {"params": gv["params"], "mpd": pv["params"], "msd": sv["params"]}
        b1 = hp.get("adam_b1", 0.8)
        b2 = hp.get("adam_b2", 0.99)
        self.tx_gen = optax.chain(
            optax.clip_by_global_norm(hp.get("generator_grad_norm", 10)),
            optax.scale_by_adam(b1=b1, b2=b2))
        self.tx_disc = optax.chain(
            optax.clip_by_global_norm(hp.get("discriminator_grad_norm", 1)),
            optax.scale_by_adam(b1=b1, b2=b2))
        gsp = hp.get("generator_scheduler_params", {"step_size": 600, "gamma": 0.999})
        dsp = hp.get("discriminator_scheduler_params", gsp)
        self.sched_gen = step_lr_schedule(
            hp.get("generator_optimizer_params", {}).get("lr", 2e-4),
            gsp["step_size"], gsp["gamma"])
        self.sched_disc = step_lr_schedule(
            hp.get("discriminator_optimizer_params", {}).get("lr", 2e-4),
            dsp["step_size"], dsp["gamma"])
        state["opt_gen"] = self.tx_gen.init(state["params"])
        state["opt_disc"] = self.tx_disc.init({"mpd": state["mpd"],
                                               "msd": state["msd"]})
        self.state = replicate_state(state, self.mesh)
        return self.model

    def state_template(self):
        return self.state

    def get_state(self):
        return jax.device_get(self.state)

    def set_state(self, state):
        self.state = replicate_state(state, self.mesh)

    # ------------------------------------------------------------------
    def _mel_fn(self, wav):
        hp = hparams
        return log_mel_jax(wav, sample_rate=hp["audio_sample_rate"],
                           fft_size=hp["fft_size"], hop_size=hp["hop_size"],
                           win_size=hp["win_size"],
                           num_mels=hp["audio_num_mel_bins"],
                           fmin=float(hp["fmin"]), fmax=float(hp["fmax"]))

    def _gen_step(self):
        if "gen" in self._step_cache:
            return self._step_cache["gen"]
        hp = hparams
        lam_mel = hp.get("lambda_mel", 5.0)
        lam_adv = hp.get("lambda_adv", 1.0)
        use_fm = hp.get("use_fm_loss", False)
        use_f0 = hp["use_pitch_embed"]

        @partial(jax.jit, donate_argnums=(0,))
        def step(state, batch, rng, lr):
            def loss_fn(params):
                y_hat = self.model.apply(
                    {"params": params}, batch["mels"],
                    batch["f0"] if use_f0 else None, rngs={"noise": rng})
                losses = {}
                mel_hat = self._mel_fn(y_hat)
                mel_ref = self._mel_fn(batch["wavs"])
                losses["mel"] = jnp.abs(mel_hat - mel_ref).mean() * lam_mel
                _, y_p_g, f_p_r, f_p_g = self.mpd.apply(
                    {"params": state["mpd"]}, batch["wavs"], y_hat)
                _, y_s_g, f_s_r, f_s_g = self.msd.apply(
                    {"params": state["msd"]}, batch["wavs"], y_hat)
                losses["a_p"] = generator_loss(y_p_g) * lam_adv
                losses["a_s"] = generator_loss(y_s_g) * lam_adv
                if use_fm:
                    losses["fm"] = feature_loss(f_p_r, f_p_g) + \
                        feature_loss(f_s_r, f_s_g)
                return sum(losses.values()), (losses, jax.lax.stop_gradient(y_hat))

            grads, (losses, y_hat) = jax.grad(loss_fn, has_aux=True)(state["params"])
            updates, new_opt = self.tx_gen.update(grads, state["opt_gen"],
                                                  state["params"])
            updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
            state = dict(state)
            state.update(params=optax.apply_updates(state["params"], updates),
                         opt_gen=new_opt)
            return state, losses, y_hat

        self._step_cache["gen"] = step
        return step

    def _disc_step(self):
        if "disc" in self._step_cache:
            return self._step_cache["disc"]

        @partial(jax.jit, donate_argnums=(0,))
        def step(state, batch, y_hat, lr):
            def loss_fn(dparams):
                y_p_r, y_p_g, _, _ = self.mpd.apply(
                    {"params": dparams["mpd"]}, batch["wavs"], y_hat)
                y_s_r, y_s_g, _, _ = self.msd.apply(
                    {"params": dparams["msd"]}, batch["wavs"], y_hat)
                rp, fp = discriminator_loss(y_p_r, y_p_g)
                rs, fs = discriminator_loss(y_s_r, y_s_g)
                losses = {"r_p": rp, "f_p": fp, "r_s": rs, "f_s": fs}
                return sum(losses.values()), losses

            dparams = {"mpd": state["mpd"], "msd": state["msd"]}
            grads, losses = jax.grad(loss_fn, has_aux=True)(dparams)
            updates, new_opt = self.tx_disc.update(grads, state["opt_disc"], dparams)
            updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
            new_d = optax.apply_updates(dparams, updates)
            state = dict(state)
            state.update(mpd=new_d["mpd"], msd=new_d["msd"], opt_disc=new_opt)
            return state, losses

        self._step_cache["disc"] = step
        return step

    # ------------------------------------------------------------------
    def training_step(self, batch, step: int, optimizer_idx: int):
        b = shard_batch({"wavs": batch["wavs"], "mels": batch["mels"],
                         "f0": batch["f0"]}, self.mesh)
        if optimizer_idx == 0:
            lr = self.sched_gen(step)
            self.state, losses, y_hat = self._gen_step()(
                self.state, b, self._next_rng(), lr)
            self._last_fake = y_hat
            self._last_batch = b
            return sum(losses.values()), dict(losses)
        if optimizer_idx == 1:
            if step <= hparams.get("disc_start_steps", 0) or \
                    not hasattr(self, "_last_fake"):
                return None
            lr = self.sched_disc(step)
            self.state, losses = self._disc_step()(
                self.state, self._last_batch, self._last_fake, lr)
            return sum(losses.values()), dict(losses)
        return None

    def validation_step(self, batch, batch_idx: int):
        b = {"wavs": batch["wavs"], "mels": batch["mels"], "f0": batch["f0"]}
        y_hat = self.model.apply(
            {"params": self.state["params"]}, b["mels"],
            b["f0"] if hparams["use_pitch_embed"] else None,
            rngs={"noise": self._next_rng()})
        mel_l1 = float(jnp.abs(self._mel_fn(y_hat) - self._mel_fn(b["wavs"])).mean())
        return {"losses": {"mel": mel_l1}, "total_loss": mel_l1,
                "nsamples": batch["nsamples"]}

    # ------------------------------------------------------------------
    def train_dataloader(self, n_devices=None):
        ds = VocoderDataset(hparams["train_set_name"], shuffle=True)
        return self.build_dataloader(ds, True, None,
                                     hparams.get("max_sentences", 24),
                                     endless=hparams["endless_ds"],
                                     use_batch_by_size=False,
                                     n_devices=n_devices or self.n_devices)

    def val_dataloader(self, n_devices=None):
        ds = VocoderDataset(hparams["valid_set_name"], shuffle=False)
        return self.build_dataloader(ds, False, None, 1,
                                     use_batch_by_size=False, n_devices=1)

    def test_dataloader(self, n_devices=None):
        return self.val_dataloader()


class PWGTask(HifiGanTask):
    """Parallel WaveGAN vocoder training: multi-resolution STFT loss +
    single-discriminator LSGAN (the reference ships PWG's losses/optimizers
    as support code but no task — restored here). Optimizer defaults to
    RAdam (reference: modules/parallel_wavegan/optimizers/radam.py:1-91,
    parity-tested in tests/test_parity_reference.py); set
    ``vocoder_optimizer: adam`` to fall back."""

    @staticmethod
    def _stft_scales():
        """Multi-resolution STFT setups from config (stft_loss_scales:
        [[fft, hop, win], ...]) or the reference defaults."""
        from ..models.stft_loss import DEFAULT_RESOLUTIONS
        scales = hparams.get("stft_loss_scales")
        return [tuple(s) for s in scales] if scales else DEFAULT_RESOLUTIONS

    def build_model(self):
        hp = hparams
        from ..models.pwg import (ParallelWaveGANDiscriminator,
                                  ParallelWaveGANGenerator)
        gen_p = hp.get("generator_params", {}) or {}
        self.model = ParallelWaveGANGenerator(
            layers=gen_p.get("layers", 30), stacks=gen_p.get("stacks", 3),
            residual_channels=gen_p.get("residual_channels", 64),
            gate_channels=gen_p.get("gate_channels", 128),
            skip_channels=gen_p.get("skip_channels", 64),
            aux_channels=hp["audio_num_mel_bins"],
            aux_context_window=hp.get("aux_context_window", 2),
            upsample_scales=tuple(gen_p.get("upsample_scales",
                                            (4, 4, 4, 2))))
        self.disc = ParallelWaveGANDiscriminator()
        frames = hp.get("max_samples", 8192) // hp["hop_size"]
        hop = int(np.prod(self.model.upsample_scales))
        assert hop == hp["hop_size"], (hop, hp["hop_size"])
        ctx = self.model.aux_context_window
        z = jnp.zeros((1, frames * hop, 1))
        c = jnp.zeros((1, frames + 2 * ctx, hp["audio_num_mel_bins"]))
        gv = self.model.init(jax.random.PRNGKey(0), z, c)
        dv = self.disc.init(jax.random.PRNGKey(1), jnp.zeros((1, frames * hop)))
        state = {"params": gv["params"], "disc": dv["params"]}
        b1, b2 = 0.9, 0.999
        scale = (optax.scale_by_adam
                 if hp.get("vocoder_optimizer", "radam") == "adam"
                 else optax.scale_by_radam)
        self.tx_gen = optax.chain(
            optax.clip_by_global_norm(hp.get("generator_grad_norm", 10)),
            scale(b1=b1, b2=b2))
        self.tx_disc = optax.chain(
            optax.clip_by_global_norm(hp.get("discriminator_grad_norm", 1)),
            scale(b1=b1, b2=b2))
        gsp = hp.get("generator_scheduler_params", {"step_size": 200000,
                                                    "gamma": 0.5})
        dsp = hp.get("discriminator_scheduler_params", gsp)
        self.sched_gen = step_lr_schedule(
            hp.get("generator_optimizer_params", {}).get("lr", 1e-4),
            gsp["step_size"], gsp["gamma"])
        self.sched_disc = step_lr_schedule(
            hp.get("discriminator_optimizer_params", {}).get("lr", 5e-5),
            dsp["step_size"], dsp["gamma"])
        state["opt_gen"] = self.tx_gen.init(state["params"])
        state["opt_disc"] = self.tx_disc.init(state["disc"])
        self.state = replicate_state(state, self.mesh)
        return self.model

    def _gen_step(self):
        if "gen" in self._step_cache:
            return self._step_cache["gen"]
        hp = hparams
        lam_adv = hp.get("lambda_adv", 4.0)
        ctx = self.model.aux_context_window
        from ..models.stft_loss import multi_resolution_stft_loss

        @partial(jax.jit, donate_argnums=(0,))
        def step(state, batch, rng, lr):
            def loss_fn(params):
                z = jax.random.normal(rng, batch["wavs"].shape)[:, :, None]
                c = jnp.pad(batch["mels"], ((0, 0), (ctx, ctx), (0, 0)),
                            mode="edge")
                y_hat = self.model.apply({"params": params}, z, c)
                sc, mag = multi_resolution_stft_loss(
                    y_hat, batch["wavs"], resolutions=self._stft_scales())
                losses = {"sc": sc, "mag": mag}
                d_out = self.disc.apply({"params": state["disc"]}, y_hat)
                losses["a"] = mse(d_out, 1.0) * lam_adv
                return sum(losses.values()), (losses, jax.lax.stop_gradient(y_hat))

            grads, (losses, y_hat) = jax.grad(loss_fn, has_aux=True)(state["params"])
            updates, new_opt = self.tx_gen.update(grads, state["opt_gen"],
                                                  state["params"])
            updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
            state = dict(state)
            state.update(params=optax.apply_updates(state["params"], updates),
                         opt_gen=new_opt)
            return state, losses, y_hat

        self._step_cache["gen"] = step
        return step

    def _disc_step(self):
        if "disc" in self._step_cache:
            return self._step_cache["disc"]

        @partial(jax.jit, donate_argnums=(0,))
        def step(state, batch, y_hat, lr):
            def loss_fn(dparams):
                real = self.disc.apply({"params": dparams}, batch["wavs"])
                fake = self.disc.apply({"params": dparams}, y_hat)
                losses = {"r": mse(real, 1.0), "f": mse(fake, 0.0)}
                return sum(losses.values()), losses

            grads, losses = jax.grad(loss_fn, has_aux=True)(state["disc"])
            updates, new_opt = self.tx_disc.update(grads, state["opt_disc"],
                                                   state["disc"])
            updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
            state = dict(state)
            state.update(disc=optax.apply_updates(state["disc"], updates),
                         opt_disc=new_opt)
            return state, losses

        self._step_cache["disc"] = step
        return step

    def validation_step(self, batch, batch_idx: int):
        from ..models.stft_loss import multi_resolution_stft_loss
        ctx = self.model.aux_context_window
        z = jax.random.normal(self._next_rng(),
                              batch["wavs"].shape)[:, :, None]
        c = np.pad(batch["mels"], ((0, 0), (ctx, ctx), (0, 0)), mode="edge")
        y_hat = self.model.apply({"params": self.state["params"]}, z, c)
        sc, mag = multi_resolution_stft_loss(
            y_hat, batch["wavs"], resolutions=self._stft_scales())
        losses = {"sc": float(sc), "mag": float(mag)}
        return {"losses": losses, "total_loss": sum(losses.values()),
                "nsamples": batch["nsamples"]}
