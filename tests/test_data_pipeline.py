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
