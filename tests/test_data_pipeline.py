"""End-to-end data pipeline test: synthetic paired wavs -> SaveSpkEmb ->
PopBuTFyENSpkEMBinarizer -> MultiSpkEmbDataset -> collated batch."""

import os

import numpy as np
import pytest

from neuralsvb_tpu.data.batching import batch_by_size, collate_2d, ordered_indices
from neuralsvb_tpu.data.indexed_dataset import IndexedDataset, IndexedDatasetBuilder

SR = 22050


def _sing(freq, dur, seed):
    rng = np.random.RandomState(seed)
    t = np.arange(int(SR * dur)) / SR
    vib = freq * (1 + 0.03 * np.sin(2 * np.pi * 5 * t))
    wav = 0.3 * np.sin(2 * np.pi * np.cumsum(vib) / SR)
    return (wav + 0.01 * rng.randn(len(t))).astype(np.float32)


def test_indexed_dataset_roundtrip(tmp_path):
    path = str(tmp_path / "ds")
    items = [{"a": np.random.RandomState(i).normal(size=[100, 10])} for i in range(20)]
    b = IndexedDatasetBuilder(path)
    for it in items:
        b.add_item(it)
    b.finalize()
    ds = IndexedDataset(path)
    assert len(ds) == 20
    rng = np.random.RandomState(0)
    for _ in range(100):
        i = rng.randint(20)
        np.testing.assert_array_equal(ds[i]["a"], items[i]["a"])


def test_indexed_dataset_concurrent_readers(tmp_path):
    """One dataset object shared by ThreadPool workers (the
    pitch_alignment_task.evaluate pattern) must not race the fd position:
    reads use os.pread with explicit offsets. Also covers a forked child
    inheriting the parent's open dataset."""
    from multiprocessing.pool import ThreadPool

    path = str(tmp_path / "ds")
    items = [{"i": i, "a": np.full([4096], i, np.float32)} for i in range(8)]
    b = IndexedDatasetBuilder(path)
    for it in items:
        b.add_item(it)
    b.finalize()
    ds = IndexedDataset(path, num_cache=0)
    assert ds[3]["i"] == 3  # open + move the parent's fd position
    with ThreadPool(4) as pool:
        got = pool.map(lambda i: ds[i % 8]["i"], range(256))
    assert got == [i % 8 for i in range(256)]

    r, w = os.pipe()
    pid = os.fork()
    if pid == 0:  # child: inherited dataset must reopen per-process
        try:
            ok = ds[5]["i"] == 5 and int(ds[5]["a"][0]) == 5
            os.write(w, b"1" if ok else b"0")
        finally:
            os._exit(0)
    os.close(w)
    assert os.read(r, 1) == b"1"
    os.close(r)
    os.waitpid(pid, 0)
    np.testing.assert_array_equal(ds[6]["a"], items[6]["a"])


def test_batch_by_size():
    sizes = [10, 20, 30, 40, 50, 60]
    batches = batch_by_size(range(6), lambda i: sizes[i], max_tokens=100)
    flat = [i for b in batches for i in b]
    assert sorted(flat) == list(range(6))
    for b in batches:
        max_len = max(sizes[i] for i in b)
        assert max_len * len(b) <= 100 or len(b) == 1


def test_collate_bucket():
    vals = [np.ones((37, 4)), np.ones((50, 4))]
    out = collate_2d(vals, bucket_quant=32)
    assert out.shape == (2, 64, 4)
    assert out[0, 37:].sum() == 0


@pytest.fixture(scope="module")
def binarized_dir(tmp_path_factory):
    """Build a tiny paired dataset and binarize it."""
    root = tmp_path_factory.mktemp("popbutfy")
    from neuralsvb_tpu.hparams import hparams
    from neuralsvb_tpu.ops.audio import save_wav

    data_dir = root / "processed" / "data" / "part1"
    data_dir.mkdir(parents=True)
    songs = [("Female1", "SongA", 220.0, 1), ("Female1", "SongB", 250.0, 2),
             ("Male6", "SongC", 150.0, 3)]
    for spk, song, freq, n in songs:
        for idx in range(2):
            dur = 1.2 + 0.12 * idx
            a = _sing(freq * 1.02, dur, seed=idx)
            p = _sing(freq, dur * 0.95, seed=idx + 10)
            save_wav(a, str(data_dir / f"{spk}#singing#{song}_Amateur_{idx}.wav"), SR)
            save_wav(p, str(data_dir / f"{spk}#singing#{song}_Professional_{idx}.wav"), SR)

    hp = {
        "processed_data_dir": str(root / "processed"),
        "binary_data_dir": str(root / "binary"),
        "spk_emb_data_dir": str(root / "spk_emb"),
        "datasets": ["Female1#", "Male6#"],
        "test_prefixes": ["Male6#singing#"],
        "binarization_args": {"with_f0": True, "with_spk_embed": False,
                              "with_wav": False, "shuffle": False},
        "audio_sample_rate": SR, "fft_size": 512, "hop_size": 128, "win_size": 512,
        "audio_num_mel_bins": 80, "fmin": 50, "fmax": 11025, "loud_norm": False,
        "test_num": 0, "num_spk": 10, "ds_workers": 1, "spk_emb_num": 4,
        "max_mel_tech_gap": 800, "vocoder": "pwg", "vocoder_ckpt": "",
        "ge2e_ckpt": "",
    }
    hparams.clear()
    hparams.update(hp)
    from neuralsvb_tpu.data.binarizer import PopBuTFyENSpkEMBinarizer, SaveSpkEmb
    SaveSpkEmb().process()
    PopBuTFyENSpkEMBinarizer().process()
    return root, dict(hp)


def test_binarize_and_dataset(binarized_dir):
    root, hp = binarized_dir
    bin_dir = str(root / "binary")
    assert os.path.exists(f"{bin_dir}/train.data")
    assert os.path.exists(f"{bin_dir}/train_lengths.npy")
    assert os.path.exists(f"{bin_dir}/train_f0s_mean_std.npy")
    mean, std = np.load(f"{bin_dir}/train_f0s_mean_std.npy")
    assert 100 < mean < 400, mean

    ds = IndexedDataset(f"{bin_dir}/train")
    assert len(ds) == 4  # Female1 pairs (Male6 goes to test)
    item = ds[0]
    for key in ("mel", "prof_mel", "f0", "prof_f0", "pitch", "prof_pitch",
                "a2p_f0_alignment", "multi_spk_emb"):
        assert key in item, key
    assert item["mel"].shape[1] == 80
    assert item["multi_spk_emb"].shape == (5, 256)
    assert len(item["a2p_f0_alignment"]) == len(item["prof_f0"])
    # alignment is monotone and in-range
    al = item["a2p_f0_alignment"]
    assert al.max() < len(item["f0"]) and (np.diff(al[1:]) >= 0).all()


def test_multispkemb_dataset_batch(binarized_dir):
    root, hp = binarized_dir
    from neuralsvb_tpu.hparams import hparams
    hparams.clear()
    hparams.update(hp)
    hparams.update({"max_frames": 400, "frames_multiple": 4, "max_input_tokens": 1550,
                    "use_spk_embed": False, "use_spk_id": False, "sort_by_len": True,
                    "pitch_norm": "standard", "use_uv": True, "use_pitch_embed": True,
                    "infer": False, "num_test_samples": 0, "min_frames": 0,
                    "normalize_pitch": False, "pitch_type": "frame", "seed": 1234})
    from neuralsvb_tpu.data.datasets import MultiSpkEmbDataset
    ds = MultiSpkEmbDataset("train", shuffle=True)
    assert len(ds) == 4
    idxs = ds.ordered_indices()
    batch = ds.collater([ds[i] for i in idxs[:2]])
    assert batch["mels"].shape[0] == 2 and batch["mels"].shape[2] == 80
    assert batch["mels"].shape[1] % 32 == 0  # bucketed
    assert batch["prof_mels"].shape[1] % 32 == 0
    assert batch["a2p_f0_alignment"].shape == batch["prof_pitch"].shape
    assert batch["multi_spk_emb"].shape[1:] == (5, 256)
    assert batch["pitch"].max() <= 255
    # padded region of pitch is 0 => nonpadding mask works
    lens = batch["mel_lengths"]
    for b, L in enumerate(lens):
        assert (batch["pitch"][b, L:] == 0).all()


def _write_textgrid(path, phones, total_sec):
    """Emit a minimal long-format TextGrid with one 'phones' tier: a leading
    and trailing silence plus one interval per phone."""
    n = len(phones)
    sil = 0.08
    seg = (total_sec - 2 * sil) / n
    items = [(0.0, sil, "")]
    for i, p in enumerate(phones):
        items.append((sil + i * seg, sil + (i + 1) * seg, p))
    items.append((total_sec - sil, total_sec, ""))
    lines = ['File type = "ooTextFile"', 'name = "phones"']
    for k, (x0, x1, txt) in enumerate(items):
        lines += [f"intervals [{k + 1}]:", f"xmin = {x0:.6f}",
                  f"xmax = {x1:.6f}", f'text = "{txt}"']
    with open(path, "w") as f:
        f.write("\n".join(lines))


def test_base_binarizer_text_branch(tmp_path):
    """with_txt/with_align/with_word: text_labels + MFA TextGrids ->
    phone/mel2ph/dur/ph2word/word_tokens + phone_set/word_set."""
    from neuralsvb_tpu.hparams import hparams
    from neuralsvb_tpu.ops.audio import save_wav
    from neuralsvb_tpu.utils.text_encoder import is_sil_phoneme
    from neuralsvb_tpu.data.txt_processors import get_txt_processor_cls

    root = tmp_path
    data_dir = root / "processed" / "data" / "p1"
    txt_dir = root / "processed" / "text_labels" / "p1"
    tg_dir = root / "processed" / "mfa_outputs"
    for d in (data_dir, txt_dir, tg_dir):
        d.mkdir(parents=True)

    texts = {"spkA#read_0": "hi yo", "spkA#read_1": "go up now",
             "spkB#read_0": "so low"}
    dur_s = 1.4
    for name, txt in texts.items():
        save_wav(_sing(200.0, dur_s, seed=hash(name) % 97),
                 str(data_dir / f"{name}.wav"), SR)
        (txt_dir / f"{name}.txt").write_text(txt)
        phs, _ = get_txt_processor_cls("en").process(txt, {})
        nonsil = [p for p in phs if not is_sil_phoneme(p)]
        _write_textgrid(str(tg_dir / f"{name}.TextGrid"), nonsil, dur_s)

    hp = {
        "processed_data_dir": str(root / "processed"),
        "binary_data_dir": str(root / "binary"),
        "binarization_args": {"with_f0": True, "with_txt": True,
                              "with_align": True, "with_word": True,
                              "with_wav": False, "with_spk_embed": False,
                              "shuffle": False, "reset_phone_dict": True,
                              "reset_word_dict": True, "trim_eos_bos": False},
        "pre_align_args": {"txt_processor": "en"},
        "audio_sample_rate": SR, "fft_size": 512, "hop_size": 128,
        "win_size": 512, "audio_num_mel_bins": 80, "fmin": 50, "fmax": 11025,
        "loud_norm": False, "test_num": 1, "num_spk": 10, "ds_workers": 1,
        "word_size": 100, "vocoder": "pwg", "vocoder_ckpt": "", "ge2e_ckpt": "",
    }
    hparams.clear()
    hparams.update(hp)
    from neuralsvb_tpu.data.binarizer import BaseBinarizer
    BaseBinarizer().process()

    bin_dir = str(root / "binary")
    assert os.path.exists(f"{bin_dir}/phone_set.json")
    assert os.path.exists(f"{bin_dir}/word_set.json")
    assert os.path.exists(f"{bin_dir}/train_ph_lengths.npy")
    ds = IndexedDataset(f"{bin_dir}/train")
    assert len(ds) == 2, "3 items - test_num(1)"
    item = ds[0]
    for key in ("phone", "mel2ph", "dur", "ph2word", "word_tokens",
                "mel", "f0"):
        assert key in item, key
    n_ph = len(item["phone"])
    assert item["ph_len"] == n_ph
    m2p = np.asarray(item["mel2ph"])
    assert len(m2p) == item["len"]
    assert m2p.max() <= n_ph and m2p.min() >= 0
    assert (np.diff(m2p) >= 0).all(), "alignment must be monotone"
    assert int(np.asarray(item["dur"]).sum()) == item["len"]
    ph2word = np.asarray(item["ph2word"])
    assert len(ph2word) == n_ph and ph2word.min() >= 1
    assert (np.diff(ph2word) >= 0).all()
    # word_tokens: <BOS> + words + <EOS>; matches #words in text + 2
    n_words = len(item["words"])
    assert len(item["word_tokens"]) == n_words
    assert item["ph_words"][0] == "<BOS>" and item["ph_words"][-1] == "<EOS>"
    assert ph2word.max() == len(item["ph_words"])

    # second pass: trim_eos_bos drops the aligned <BOS>/<EOS> frames
    hp2 = dict(hp)
    hp2["binary_data_dir"] = str(root / "binary_trim")
    hp2["binarization_args"] = dict(hp["binarization_args"], trim_eos_bos=True)
    hparams.clear()
    hparams.update(hp2)
    BaseBinarizer().process()
    ds2 = IndexedDataset(f"{hp2['binary_data_dir']}/train")
    it2 = ds2[0]
    assert it2["len"] < item["len"]
    assert it2["len"] == it2["mel"].shape[0] == len(it2["mel2ph"])
    assert int(np.asarray(it2["dur"]).sum()) == it2["len"]
    assert np.asarray(it2["mel2ph"]).min() >= 2, "BOS frames trimmed"


def test_binarize_multiprocess_workers(tmp_path):
    """chunked_multiprocess_run with spawn workers produces the same items
    as the in-process path (hparams reseeded in children)."""
    from neuralsvb_tpu.hparams import hparams
    from neuralsvb_tpu.ops.audio import save_wav
    root = tmp_path
    data_dir = root / "processed" / "data" / "p1"
    data_dir.mkdir(parents=True)
    for i in range(3):
        save_wav(_sing(200.0 + 10 * i, 1.0, seed=i),
                 str(data_dir / f"spkA#read_{i}.wav"), SR)
    hp = {
        "processed_data_dir": str(root / "processed"),
        "binary_data_dir": str(root / "binary"),
        "binarization_args": {"with_f0": True, "with_wav": False,
                              "with_spk_embed": False, "shuffle": False},
        "audio_sample_rate": SR, "fft_size": 512, "hop_size": 128,
        "win_size": 512, "audio_num_mel_bins": 80, "fmin": 50, "fmax": 11025,
        "loud_norm": False, "test_num": 1, "num_spk": 10, "ds_workers": 2,
        "vocoder": "pwg", "vocoder_ckpt": "", "ge2e_ckpt": "",
    }
    hparams.clear()
    hparams.update(hp)
    from neuralsvb_tpu.data.binarizer import BaseBinarizer
    BaseBinarizer().process()
    ds = IndexedDataset(str(root / "binary" / "train"))
    assert len(ds) == 2
    for i in range(len(ds)):
        item = ds[i]
        assert item["mel"].shape[1] == 80 and (np.asarray(item["f0"]) > 0).any()


def test_base_concat_dataset(binarized_dir):
    """BaseConcatDataset: multi-dataset training surface (reference:
    tasks/base_task.py:99-128)."""
    root, hp = binarized_dir
    from neuralsvb_tpu.hparams import hparams
    hparams.clear()
    hparams.update(hp)
    hparams.update({"max_frames": 400, "frames_multiple": 4,
                    "max_input_tokens": 1550, "use_spk_embed": False,
                    "use_spk_id": False, "sort_by_len": True,
                    "pitch_norm": "standard", "use_uv": True,
                    "use_pitch_embed": True, "infer": False,
                    "num_test_samples": 0, "min_frames": 0,
                    "normalize_pitch": False, "pitch_type": "frame",
                    "seed": 1234})
    from neuralsvb_tpu.data.datasets import (BaseConcatDataset,
                                             MultiSpkEmbDataset,
                                             maybe_concat_dataset)
    d1 = MultiSpkEmbDataset("train", shuffle=True)
    d2 = MultiSpkEmbDataset("train", shuffle=True)
    cat = BaseConcatDataset([d1, d2])
    assert len(cat) == len(d1) + len(d2)
    assert cat.sizes == d1.sizes + d2.sizes
    # index space spans both members; items round-trip to member items
    item_lo, item_hi = cat[0], cat[len(d1)]
    np.testing.assert_array_equal(item_lo["mel"], d1[0]["mel"])
    np.testing.assert_array_equal(item_hi["mel"], d2[0]["mel"])
    # shared collater + batching metadata compose
    idxs = cat.ordered_indices()
    assert sorted(idxs) == list(range(len(cat)))
    batch = cat.collater([cat[i] for i in idxs[:3]])
    assert batch["mels"].shape[0] == 3
    assert cat.size(0) == d1.size(0)
    # hparams hook: binary_data_dirs builds the concat automatically
    bin_dir = str(root / "binary")
    hparams["binary_data_dirs"] = [bin_dir, bin_dir]
    ds = maybe_concat_dataset(MultiSpkEmbDataset, "train", shuffle=True)
    assert isinstance(ds, BaseConcatDataset) and len(ds) == 2 * len(d1)
    hparams["binary_data_dirs"] = []
    ds = maybe_concat_dataset(MultiSpkEmbDataset, "train", shuffle=True)
    assert isinstance(ds, MultiSpkEmbDataset)


def test_fastsinging_collater_mixed_prof_mel2ph():
    """A batch mixing items binarized with and without prof_mel2ph must
    collate (zeros = no-phone for the missing rows), not crash on a None
    in collate_1d or silently drop the key when samples[0] lacks it."""
    from neuralsvb_tpu.data.datasets import FastSingingDataset

    ds = object.__new__(FastSingingDataset)
    ds.hparams = {"collate_bucket_quant": 4, "frames_multiple": 1}
    ds.pitch_type = None

    def mk(i, T, with_m2p):
        return {
            "id": i, "item_name": f"it{i}", "text": None,
            "mel": np.full((T, 8), -2.0, np.float32),
            "f0": np.ones(T, np.float32), "uv": np.zeros(T, np.float32),
            "pitch": np.ones(T, np.int64),
            "energy": np.ones(T, np.float32),
            "prof_mel": np.full((T, 8), -2.0, np.float32),
            "prof_f0": np.ones(T, np.float32),
            "prof_uv": np.zeros(T, np.float32),
            "prof_pitch": np.ones(T, np.int64),
            "prof_energy": np.ones(T, np.float32),
            "prof_mel2ph": (np.arange(1, T + 1, dtype=np.int64)
                            if with_m2p else None),
        }

    # first sample LACKS the alignment, second has it
    batch = ds.collater([mk(0, 6, False), mk(1, 8, True)])
    m2p = batch["prof_mel2ph"]
    assert m2p is not None and m2p.shape[0] == 2
    assert (m2p[0] == 0).all()          # missing row -> all no-phone
    assert (m2p[1, :8] == np.arange(1, 9)).all()
    # all-absent -> key stays None (the a2p para pipeline has no mel2ph)
    batch2 = ds.collater([mk(0, 6, False), mk(1, 8, False)])
    assert batch2["prof_mel2ph"] is None
