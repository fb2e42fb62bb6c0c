"""PIPELINE-level parity against the ACTUAL reference task code.

test_parity_reference.py proves module-level activation parity; this test
closes the remaining gap (VERDICT r2 missing #1): it drives the reference's
own task/dataset/inference stack — ``SVBVAEMleTask.test_step``/``after_infer``
with the ``MultiSpkEmbDataset`` collater (reference:
tasks/singing/svb_vae_task.py:302-381, :20-45) — on a tiny synthetic packed
dataset, exports the reference model's random-init torch weights through
``convert/torch2jax``, runs OUR checkpoint-restore + ``--infer`` pipeline
(Trainer.test) on the same packed data, and asserts:

- the a2a/p2p/a2p (+gt) mel .npy artifacts agree to <=5e-4;
- the generated output trees are identical (same relative wav/mel paths).

This covers what module parity cannot: collate, f0 plumbing, alignment
clamping, way selection, spk-emb index choice at infer, checkpoint
restore, and the output-tree contract. Stochastic paths are zeroed on both
frameworks (mu-decode; SURVEY.md section 7.3 randomness semantics).

The packed dataset is written by OUR binarizer — its on-disk
IndexedDataset format is reference-compatible (tests/test_data_pipeline),
so the reference dataset code reads it directly: the data interface is
part of what's under test.
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import types
from unittest import mock

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from flax import serialization

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SR = 22050
STEP = 4  # trainer.global_step on both sides -> generated_4_ trees


def _sing(freq, dur, seed):
    rng = np.random.RandomState(seed)
    t = np.arange(int(SR * dur)) / SR
    vib = freq * (1 + 0.03 * np.sin(2 * np.pi * 5 * t))
    wav = 0.3 * np.sin(2 * np.pi * np.cumsum(vib) / SR)
    return (wav + 0.01 * rng.randn(len(t))).astype(np.float32)


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    """Synthetic paired wavs -> OUR binarize (SaveSpkEmb + SpkEM para) ->
    packed test split + phone_set.json, plus the merged flagship config."""
    root = tmp_path_factory.mktemp("pipeparity")
    from neuralsvb_tpu.hparams import hparams, load_config_recursive
    from neuralsvb_tpu.ops.audio import save_wav

    data_dir = root / "processed" / "data" / "p1"
    data_dir.mkdir(parents=True)
    # Female1 items land in the train split (so train_f0s_mean_std.npy is
    # written — the reference dataset requires it for pitch_norm: standard);
    # Male6 items are the test split driven through both pipelines
    for spk, song, freq in [("Female1", "SongA", 220.0),
                            ("Male6", "SongC", 150.0)]:
        for idx in range(2):
            dur = 1.0 + 0.1 * idx
            save_wav(_sing(freq * 1.02, dur, idx),
                     str(data_dir / f"{spk}#singing#{song}_Amateur_{idx}.wav"),
                     SR)
            save_wav(_sing(freq, dur * 0.95, idx + 9),
                     str(data_dir /
                         f"{spk}#singing#{song}_Professional_{idx}.wav"), SR)

    os.chdir(REPO)  # config chains use repo-relative paths
    common = {
        "processed_data_dir": str(root / "processed"),
        "binary_data_dir": str(root / "binary"),
        "spk_emb_data_dir": str(root / "spk_emb"),
        # hidden_size must be 256: the reference GlobalLatentMap spk_proj
        # hard-codes Conv1d(256, ...) (reference: vae_models.py:160-162)
        "hidden_size": 256, "latent_size": 8, "fvae_enc_dec_hidden": 16,
        "fvae_enc_n_layers": 2, "fvae_dec_n_layers": 2,
        "asr_enc_layers": 1, "asr_dec_layers": 1,
        "mel_disc_hidden_size": 8, "disc_win_num": 2,
        "max_frames": 200, "max_tokens": 4000, "max_sentences": 1,
        "max_valid_tokens": -1, "max_valid_sentences": 1,
        "test_prefixes": ["Male6#singing#"],
        "pretrain_asr_ckpt": "", "vocoder_ckpt": str(root / "novocoder"),
        "upsample_rates": [8, 4, 4], "upsample_kernel_sizes": [16, 8, 8],
        "upsample_initial_channel": 8, "use_pitch_embed": True,
        "ds_workers": 0, "infer": True, "num_test_samples": 0,
        "ge2e_ckpt": "", "mesh_shape": "data:1", "gen_dir_name": "",
        "disable_map": False, "load_ckpt": "", "seed": 1234,
    }
    bin_cfg = load_config_recursive("egs/datasets/audio/PopBuTFy/para_bin.yaml")
    bin_cfg.update(common)
    hparams.clear()
    hparams.update(bin_cfg)
    from neuralsvb_tpu.data.binarizer import (PopBuTFyENSpkEMBinarizer,
                                              SaveSpkEmb)
    SaveSpkEmb().process()
    PopBuTFyENSpkEMBinarizer().process()
    # both SVBVAEMleTask implementations size the ASR dict from this file
    # (reference: svb_vae_task.py:549-554 <-> tasks/svb_vae_task.py:_dict_size)
    with open(root / "binary" / "phone_set.json", "w") as f:
        json.dump([f"ph{i}" for i in range(40)], f)

    cfg = load_config_recursive(
        "egs/datasets/audio/PopBuTFy/vae_global_mle_eng.yaml")
    cfg.update(common)
    return root, cfg


@contextlib.contextmanager
def ref_path_only():
    """Make /root/reference the ONLY resolver for the `tasks`/`data_gen`
    roots (our repo ships same-named top-level packages that would shadow
    the reference's namespace packages)."""
    saved_path = list(sys.path)
    saved_mods = {}
    for name in list(sys.modules):
        if name.split(".")[0] in ("tasks", "data_gen"):
            saved_mods[name] = sys.modules.pop(name)
    sys.path = [p for p in sys.path
                if os.path.abspath(p or os.getcwd()) != REPO]
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        yield
    finally:
        sys.path = saved_path
        for name in list(sys.modules):
            if name.split(".")[0] in ("tasks", "data_gen"):
                del sys.modules[name]
        sys.modules.update(saved_mods)


def _stub_missing():
    from neuralsvb_tpu.convert.ref_env import stub_missing_ref_deps
    stub_missing_ref_deps()


class _FakeVocoder:
    """Stand-in for HifiGAN on the reference side: wav content is not under
    test (module-level NSF parity lives in test_parity_reference); only the
    mel artifacts and the output-tree layout are compared."""

    def __init__(self, *a, **kw):
        pass

    def spec2wav(self, mel, f0=None, **kw):
        return np.zeros(len(mel) * 128, np.float32)


class _SyncPool:
    def apply_async(self, fn, args=()):
        fn(*args)
        return types.SimpleNamespace(get=lambda *a, **kw: None)

    def close(self):
        pass

    def join(self):
        pass


@contextlib.contextmanager
def _torch_zero_noise():
    t_rand, t_randn_like = torch.rand, torch.randn_like

    def zrand(*size, **kw):
        if len(size) == 1 and isinstance(size[0], (tuple, list)):
            size = tuple(size[0])
        return torch.zeros(*size)

    torch.rand = zrand
    torch.randn_like = lambda t, **kw: torch.zeros_like(t)
    try:
        yield
    finally:
        torch.rand, torch.randn_like = t_rand, t_randn_like


@contextlib.contextmanager
def _jax_zero_noise():
    j_normal, j_uniform = jax.random.normal, jax.random.uniform
    jax.random.normal = (
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype))
    jax.random.uniform = (
        lambda key, shape=(), dtype=jnp.float32, minval=0.0, maxval=1.0:
        jnp.zeros(shape, dtype))
    try:
        yield
    finally:
        jax.random.normal, jax.random.uniform = j_normal, j_uniform


def _tree(gen_dir):
    out = []
    for dirpath, _, files in os.walk(gen_dir):
        for fn in files:
            out.append(os.path.relpath(os.path.join(dirpath, fn), gen_dir))
    return sorted(out)


def _run_reference(cfg, ref_work):
    """Drive the reference task: build (random-init, seeded), dataset ->
    collate -> test_step -> after_infer -> test_end. Returns the generator
    state_dict (numpy) for conversion."""
    _stub_missing()
    with ref_path_only():
        from utils.hparams import hparams as rhp
        rhp.clear()
        rhp.update(cfg)
        rhp["work_dir"] = ref_work
        import utils as rutils
        import tasks.singing.svb_vae_task as rmod
        import tasks.tts.tts as rtts

        torch.manual_seed(0)
        with mock.patch.object(rutils, "load_ckpt"):  # pretrain ASR absent
            rtask = rmod.SVBVAEMleTask()
            rtask.build_model()
        rtask.model.eval()
        rtask.trainer = types.SimpleNamespace(global_step=STEP)
        with mock.patch.object(rtts, "get_vocoder_cls",
                               lambda hp: _FakeVocoder), \
                mock.patch.object(rtts, "Pool", lambda n: _SyncPool()):
            rtask.test_start()
        ds = rtask.dataset_cls("test")
        assert len(ds) == 2
        with _torch_zero_noise(), torch.no_grad():
            for i in range(len(ds)):
                batch = ds.collater([ds[i]])
                rtask.test_step(batch, i)
        rtask.test_end([])
        sd = {k: v.detach().cpu().numpy()
              for k, v in rtask.model.state_dict().items()}
    return sd


def test_pipeline_parity(packed, tmp_path_factory):
    root, cfg = packed
    ref_work = str(tmp_path_factory.mktemp("ref_work"))
    our_work = str(tmp_path_factory.mktemp("our_work"))

    sd = _run_reference(cfg, ref_work)
    ref_gen = os.path.join(ref_work, f"generated_{STEP}_")
    ref_files = _tree(ref_gen)
    assert ref_files, "reference run produced no artifacts"

    # ---- convert the reference generator weights to our params tree ----
    import neuralsvb_tpu.convert.torch2jax as c
    from neuralsvb_tpu.hparams import hparams
    from neuralsvb_tpu.tasks.svb_vae_task import SVBVAEMleTask
    from neuralsvb_tpu.training.checkpoint import save_checkpoint
    from neuralsvb_tpu.training.trainer import Trainer

    hparams.clear()
    hparams.update(cfg)
    hparams["work_dir"] = our_work
    converted, conv_stats = c.convert_svbvae_mle_sd(
        c.fold_weight_norm(sd), cfg["fvae_enc_n_layers"],
        cfg["fvae_dec_n_layers"], cfg["asr_enc_layers"],
        cfg["asr_dec_layers"])

    seed_task = SVBVAEMleTask()
    seed_task.build_model()
    state = seed_task.get_state()
    state["params"] = serialization.from_state_dict(state["params"],
                                                    converted)
    if conv_stats is not None and state.get("batch_stats"):
        state["batch_stats"] = serialization.from_state_dict(
            state["batch_stats"], conv_stats)
    save_checkpoint(state, our_work, STEP, 0)

    # ---- our full --infer pipeline: restore ckpt, test loop, artifacts ----
    task = SVBVAEMleTask()
    trainer = Trainer(work_dir=our_work)
    with _jax_zero_noise():
        trainer.test(task)

    our_gen = os.path.join(our_work, f"generated_{STEP}_")
    our_files = _tree(our_gen)
    assert [f for f in our_files if f.endswith(".npy")] == \
        [f for f in ref_files if f.endswith(".npy")], "mel tree mismatch"
    assert [f for f in our_files if f.endswith(".wav")] == \
        [f for f in ref_files if f.endswith(".wav")], "wav tree mismatch"

    # ---- mel artifacts agree (the MCD-north-star proxy) ----
    worst = {}
    for rel in ref_files:
        if not rel.endswith(".npy"):
            continue
        a = np.load(os.path.join(ref_gen, rel))
        b = np.load(os.path.join(our_gen, rel))
        assert a.shape == b.shape, (rel, a.shape, b.shape)
        worst[rel] = float(np.abs(a - b).max())
    gt = {k: v for k, v in worst.items() if "/gt_" in k}
    pred = {k: v for k, v in worst.items() if "/gt_" not in k}
    assert gt and pred
    for rel, d in gt.items():
        assert d <= 1e-6, f"gt mel {rel}: max |delta| = {d:.3e}"
    for rel, d in pred.items():
        assert d <= 5e-4, f"pred mel {rel}: max |delta| = {d:.3e}"
