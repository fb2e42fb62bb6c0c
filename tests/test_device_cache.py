"""Device-resident feature cache (data/device_cache.py): on-device batch
assembly must equal the host collate + packed-wire path exactly, and the
cached training mode must reproduce the streamed mode's losses/params.

Why this matters: the cache replaces megabytes/step of host->device batch
transfer with [B]-int32 indices (the measured training wall bottleneck on
interconnect-bound hosts); any assembly mismatch would silently train on
wrong data while all shapes stay plausible."""

import numpy as np
import pytest

import jax

from tests.test_cycle import TINY


class FakeDataset:
    """Minimal MultiSpkEmbDataset stand-in: per-item post-crop features."""

    def __init__(self, n=6, seed=0):
        rng = np.random.RandomState(seed)
        self.items, self.sizes = [], []
        for i in range(n):
            Ta = 48 + 4 * (i % 3)
            Tp = 52 + 4 * (i % 2)
            self.items.append(dict(
                id=i,
                mel=(rng.randn(Ta, 80).astype(np.float32) - 2),
                prof_mel=(rng.randn(Tp, 80).astype(np.float32) - 2),
                pitch=rng.randint(1, 255, Ta).astype(np.int64),
                prof_pitch=rng.randint(1, 255, Tp).astype(np.int64),
                a2p_f0_alignment=np.clip(np.arange(Tp) * Ta // Tp, 0,
                                         Ta - 1).astype(np.int64),
                multi_spk_emb=rng.randn(5, 256).astype(np.float32),
            ))
            self.sizes.append(max(Ta, Tp))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def collate(ds, idxs):
    """Collate like MultiSpkEmbDataset.collater (0-padded to batch max)."""
    samples = [ds[i] for i in idxs]
    Ta = max(len(s["mel"]) for s in samples)
    Tp = max(len(s["prof_mel"]) for s in samples)

    def pad(key, T, dtype):
        out = np.zeros((len(samples), T) + samples[0][key].shape[1:], dtype)
        for j, s in enumerate(samples):
            out[j, : len(s[key])] = s[key]
        return out

    return dict(
        id=np.asarray(idxs, np.int64),
        nsamples=len(samples),
        mels=pad("mel", Ta, np.float32),
        prof_mels=pad("prof_mel", Tp, np.float32),
        pitch=pad("pitch", Ta, np.int32),
        prof_pitch=pad("prof_pitch", Tp, np.int32),
        a2p_f0_alignment=pad("a2p_f0_alignment", Tp, np.int32),
        multi_spk_emb=np.stack([s["multi_spk_emb"] for s in samples]),
    )


def test_assemble_matches_host_collate():
    """assemble_batch == collate + f16 wire quantization, bit for bit."""
    from neuralsvb_tpu.data.device_cache import (DeviceFeatureCache,
                                                 assemble_batch)
    ds = FakeDataset()
    cache = DeviceFeatureCache.build(ds, verbose=False)
    assert cache is not None and cache.n_items == len(ds)

    idxs = [4, 1, 2]
    host = collate(ds, idxs)
    emb_idx = 3
    got = jax.jit(assemble_batch, static_argnames=("T_a", "T_p"))(
        cache.arrays, np.asarray(idxs, np.int32), np.int32(emb_idx),
        T_a=host["mels"].shape[1], T_p=host["prof_mels"].shape[1])

    np.testing.assert_array_equal(
        np.asarray(got["mels"]), host["mels"].astype(np.float16).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(got["prof_mels"]),
        host["prof_mels"].astype(np.float16).astype(np.float32))
    for k in ("pitch", "prof_pitch", "a2p_f0_alignment"):
        np.testing.assert_array_equal(np.asarray(got[k]), host[k])
    np.testing.assert_array_equal(np.asarray(got["spk_emb"]),
                                  host["multi_spk_emb"][:, emb_idx])


def test_budget_and_id_guards():
    from neuralsvb_tpu.data.device_cache import (DeviceFeatureCache,
                                                 estimate_cache_mb)
    ds = FakeDataset()
    assert estimate_cache_mb(ds) > 0
    assert DeviceFeatureCache.build(ds, budget_mb=0.0001,
                                    verbose=False) is None

    class Remapped(FakeDataset):
        def __getitem__(self, i):
            s = dict(super().__getitem__(i))
            s["id"] = 0  # member-local ids (BaseConcatDataset shape)
            return s

    assert DeviceFeatureCache.build(Remapped(), verbose=False) is None


def _make_task(extra=None):
    from neuralsvb_tpu.hparams import hparams
    from neuralsvb_tpu.tasks.svb_vae_task import SVBVAEMleTask
    hparams.clear()
    hparams.update(TINY)
    hparams.update(extra or {})
    task = SVBVAEMleTask()
    task.build_model()
    return task


@pytest.mark.slow
def test_cached_training_matches_wire():
    """gen+disc+map steps and the fused cycle produce identical losses and
    params whether batches stream over the packed f16 wire or assemble from
    the device cache (both quantize mels to f16)."""
    ds = FakeDataset()
    batches = [collate(ds, [0, 1]), collate(ds, [2, 3])]

    def run(task):
        losses = []
        for i, b in enumerate(batches):
            step = 5 + i
            ret = task.training_step(b, step, 0)
            d = {f"g/{k}": float(v) for k, v in ret[1].items()
                 if not k.startswith("lr_")}
            ret = task.training_step(b, step, 1)
            d.update({f"d/{k}": float(v) for k, v in ret[1].items()
                      if not k.startswith("lr_")})
            # phase-3 map step on the same batch
            ret = task.training_step(b, 200 + i, 2)
            d.update({f"m/{k}": float(v) for k, v in ret[1].items()
                      if not k.startswith("lr_")})
            losses.append(d)
        return losses, jax.device_get(task.state["params"])

    task_wire = _make_task({"device_data_cache": "off"})
    task_wire._train_ds = ds
    l_wire, p_wire = run(task_wire)
    assert task_wire._device_cache == "unset"  # stayed on the wire path

    task_cache = _make_task({"device_data_cache": "on"})
    task_cache._train_ds = ds
    l_cache, p_cache = run(task_cache)
    assert task_cache._device_cache is not None
    assert task_cache._device_cache != "unset"

    for a, b in zip(l_wire, l_cache):
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-6,
                                       err_msg=k)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-6),
        p_wire, p_cache)


@pytest.mark.slow
def test_cached_cycle_matches_wire_cycle():
    """Fused K-step cycle over cache indices == over packed wire windows,
    including the prepare_cycle prefetch handle."""
    ds = FakeDataset()
    # same (Ta, Tp) across the window (the trainer's shape-signature rule)
    batches = [collate(ds, [0, 3]), collate(ds, [3, 0])]

    task_wire = _make_task({"device_data_cache": "off"})
    task_wire._train_ds = ds
    logs_w = task_wire.training_cycle(batches, 5)

    task_cache = _make_task({"device_data_cache": "on"})
    task_cache._train_ds = ds
    prepared = task_cache.prepare_cycle(batches)
    assert prepared[1][0] == "cache"
    # the window payload is indices only: ~K*B*4 bytes on the wire
    assert prepared[0]["idxs"].nbytes <= 64
    logs_c = task_cache.training_cycle(batches, 5, prepared=prepared)

    assert logs_w.keys() == logs_c.keys()
    for k in logs_w:
        np.testing.assert_allclose(np.asarray(logs_w[k]),
                                   np.asarray(logs_c[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_ppg_cache_assembly_matches_extractor():
    """cache_ppg: assembled PPG rows == the frozen-ASR extractor applied to
    the f16-decoded cached mels (valid rows, f16 storage rounding), and
    padded rows are exactly zero — the property flat storage relies on."""
    import jax.numpy as jnp
    from neuralsvb_tpu.data.device_cache import assemble_batch
    ds = FakeDataset()
    task = _make_task({"device_data_cache": "on", "cache_ppg": True})
    task._train_ds = ds
    cache = task._maybe_device_cache({"id": np.arange(2)})
    assert cache is not None and "ppg_a" in cache.arrays

    idxs = [4, 1]
    host = collate(ds, idxs)
    T_a, T_p = host["mels"].shape[1], host["prof_mels"].shape[1]
    got = jax.jit(assemble_batch, static_argnames=("T_a", "T_p"))(
        cache.arrays, np.asarray(idxs, np.int32), np.int32(0),
        T_a=T_a, T_p=T_p)
    stride = task._mel_stride()
    assert got["ppg_a"].shape[1] == -(-T_a // stride)

    ppg_fn = task._make_ppg_fn()
    for side, key, T in (("a", "mels", T_a), ("p", "prof_mels", T_p)):
        mels_f16 = host[key].astype(np.float16).astype(np.float32)
        want = np.asarray(ppg_fn(mels_f16))
        for j, i in enumerate(idxs):
            L = len(ds[i]["mel" if side == "a" else "prof_mel"])
            lp = -(-L // stride)
            # build pads to its own static length (multiple of 64); exact-
            # length PPG is pad-invariant to float noise, then f16-rounded
            # on store -> compare to one f16 ulp
            np.testing.assert_allclose(
                np.asarray(got[f"ppg_{side}"])[j, :lp],
                want[j, :lp].astype(np.float16).astype(np.float32),
                rtol=2e-3, atol=2e-3, err_msg=f"ppg_{side} item {i}")
            # beyond the item's rows: exact zeros on both paths
            assert np.all(np.asarray(got[f"ppg_{side}"])[j, lp:] == 0)
            assert np.all(want[j, lp:] == 0)


@pytest.mark.slow
def test_cached_ppg_training_runs_and_matches_exact_semantics():
    """With cache_ppg on: (1) the model applied with cached PPG equals the
    in-graph forward under exact_lengths=True to f16-storage tolerance;
    (2) gen/disc/map steps and the fused cycle run and produce finite
    losses close to the streamed run (the documented deviation is the
    rel-pos padding semantics of the frozen ASR only)."""
    import jax.numpy as jnp
    ds = FakeDataset()
    task = _make_task({"device_data_cache": "on", "cache_ppg": True})
    task._train_ds = ds
    b, meta = task._prep_batch(collate(ds, [0, 1]))
    from neuralsvb_tpu.tasks.svb_vae_task import wire_decode
    batch = jax.jit(wire_decode, static_argnames=("meta",))(b, meta=meta)
    assert "ppg_a" in batch and "ppg_p" in batch

    rng = jax.random.PRNGKey(0)
    kw = dict(ways=("a2a", "p2p", "a2p"), rng=rng, train=False,
              map_train=False)
    out_cached = task._apply_model(task.state["params"],
                                   task.state["batch_stats"], dict(batch),
                                   **kw)
    b2 = {k: v for k, v in batch.items() if not k.startswith("ppg_")}
    out_exact = task._apply_model(task.state["params"],
                                  task.state["batch_stats"], b2,
                                  exact_lengths=True, **kw)
    for way in out_cached:
        np.testing.assert_allclose(
            np.asarray(out_cached[way]["mel_out"]),
            np.asarray(out_exact[way]["mel_out"]), rtol=5e-3, atol=5e-3,
            err_msg=f"{way} mel_out cached-PPG vs exact in-graph")

    # steps + fused cycle compile and produce finite losses
    batches = [collate(ds, [0, 1]), collate(ds, [2, 3])]
    for opt in range(task.num_optimizers):
        ret = task.training_step(batches[0], 5, opt)
        if ret is not None:
            assert all(np.isfinite(float(v)) for k, v in ret[1].items()), ret
    logs = task.training_cycle(batches, 5)
    assert all(np.isfinite(np.asarray(v)).all() for v in logs.values())
    ret = task.training_step(batches[0], 200, 2)  # phase-3 map step
    assert ret is None or all(np.isfinite(float(v)) for _, v in ret[1].items())


@pytest.mark.slow
def test_ppg_cache_rebuild_after_restore_matches(tmp_path):
    """Mid-training checkpoint restore must rebuild the PPG cache
    identically: the cache is derived from state['params']['vc_asr'] (frozen,
    excluded from every optimizer), so restored params must reproduce the
    original rows bit-for-bit — and set_state must invalidate a previously
    built cache so the rebuild actually happens (VERDICT r4 #4)."""
    from neuralsvb_tpu.training.checkpoint import (restore_checkpoint,
                                                   save_checkpoint)
    ds = FakeDataset()
    task = _make_task({"device_data_cache": "on", "cache_ppg": True})
    task._train_ds = ds
    b = collate(ds, [0, 1])
    task.training_step(b, 5, 0)  # a real step; builds the cache en route
    cache1 = task._maybe_device_cache(b)
    assert cache1 is not None and "ppg_a" in cache1.arrays
    rows1 = {k: np.asarray(v) for k, v in cache1.arrays.items()
             if k.startswith("ppg_")}
    save_checkpoint(task.get_state(), str(tmp_path), 6, 0)

    # fresh process stand-in: new task, restore, rebuild on first batch
    task2 = _make_task({"device_data_cache": "on", "cache_ppg": True})
    state, step, _, _ = restore_checkpoint(task2.state_template(),
                                           str(tmp_path))
    assert step == 6
    task2.set_state(state)
    assert task2._device_cache == "unset"  # set_state invalidates
    task2._train_ds = ds
    cache2 = task2._maybe_device_cache(b)
    for k, v in rows1.items():
        np.testing.assert_array_equal(np.asarray(cache2.arrays[k]), v,
                                      err_msg=f"{k} after restore")
    # restored task keeps training on the rebuilt cache
    ret = task2.training_step(b, 7, 0)
    assert ret is not None and np.isfinite(float(ret[0]))


@pytest.mark.slow
def test_flagship_recipe_cache_ppg_off_leg():
    """The shipped flagship recipe trains with cache_ppg: true (PARITY.md
    §2.1); this leg pins the OTHER numerics: the real config chain with
    `cache_ppg: false` must train on the device cache WITHOUT PPG rows —
    i.e. the reference's collate-length rel-pos semantics stay exercised in
    CI (VERDICT r4 #4)."""
    import os
    from neuralsvb_tpu.hparams import hparams_scope, load_config_recursive
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config_recursive(os.path.join(
        repo, "egs/datasets/audio/PopBuTFy/vae_global_mle_eng.yaml"))
    assert cfg.get("cache_ppg") is True  # the documented shipped default
    assert cfg.get("device_data_cache") == "auto"
    cfg.update(TINY)  # CI dims; the recipe's cache/dispatch knobs survive
    cfg["cache_ppg"] = False
    with hparams_scope(new=cfg):
        from neuralsvb_tpu.tasks.svb_vae_task import SVBVAEMleTask
        task = SVBVAEMleTask()
        task.build_model()
        ds = FakeDataset()
        task._train_ds = ds
        batches = [collate(ds, [0, 3]), collate(ds, [3, 0])]
        prepared = task.prepare_cycle(batches)
        assert prepared[1][0] == "cache"  # device cache engaged
        assert "ppg_a" not in task._device_cache.arrays  # ...without PPG
        logs = task.training_cycle(batches, 5, prepared=prepared)
        assert all(np.isfinite(np.asarray(v)).all() for v in logs.values())
