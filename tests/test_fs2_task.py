"""FastSpeech2 task end-to-end: synthetic phone-aligned packed dataset ->
train steps (gen + disc) -> validation -> inference with wav dumping."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

SR, HOP = 22050, 128


@pytest.fixture(scope="module")
def fs2_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("fs2")
    from neuralsvb_tpu.data.indexed_dataset import IndexedDatasetBuilder
    from neuralsvb_tpu.hparams import hparams, load_config_recursive

    bin_dir = root / "binary"
    bin_dir.mkdir()
    rng = np.random.RandomState(0)
    n_ph = 12
    json.dump([f"ph{i}" for i in range(n_ph)], open(bin_dir / "phone_set.json", "w"))
    for split in ("train", "valid", "test"):
        builder = IndexedDatasetBuilder(str(bin_dir / split))
        lengths = []
        for i in range(4):
            T = 96 + 16 * i
            n_tok = 6
            phone = rng.randint(4, n_ph, n_tok)
            # equal durations
            mel2ph = np.repeat(np.arange(1, n_tok + 1), T // n_tok)[:T]
            mel = (rng.randn(T, 80) * 0.5 - 2).astype(np.float32)
            f0 = 200 + 20 * np.sin(np.arange(T) / 7.0)
            f0[:4] = 0
            from neuralsvb_tpu.ops.pitch_utils import f0_to_coarse
            item = {"item_name": f"{split}_{i}", "txt": "a b c", "phone": phone,
                    "mel": mel, "mel2ph": mel2ph, "f0": f0,
                    "pitch": np.asarray(f0_to_coarse(f0)), "spk_id": 0}
            builder.add_item(item)
            lengths.append(T)
        builder.finalize()
        np.save(str(bin_dir / f"{split}_lengths.npy"), lengths)
    np.save(str(bin_dir / "train_f0s_mean_std.npy"), [200.0, 20.0])

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.chdir(repo)
    cfg = load_config_recursive("egs/egs_bases/tts/fs2_adv.yaml")
    cfg.update({
        "binary_data_dir": str(bin_dir), "work_dir": str(root / "work"),
        "hidden_size": 32, "enc_layers": 1, "dec_layers": 1,
        "predictor_layers": 1, "mel_disc_hidden_size": 8, "disc_win_num": 2,
        "max_frames": 200, "max_tokens": 1000, "max_sentences": 2,
        "frames_multiple": 1, "mesh_shape": "data:1", "ds_workers": 1,
        "disc_start_steps": 0, "use_gt_dur": True, "use_gt_f0": True,
        "num_test_samples": 0, "infer": False, "use_spk_embed": False,
        "use_spk_id": False, "vocoder": "hifigan",
        "vocoder_ckpt": str(root / "novoc"),
        "upsample_rates": [8, 4, 4], "upsample_kernel_sizes": [16, 8, 8],
        "upsample_initial_channel": 8, "use_pitch_embed": True,
        "audio_sample_rate": SR, "fft_size": 512, "hop_size": HOP,
        "win_size": 512, "fmin": 50, "fmax": 11025, "gen_dir_name": "",
    })
    hparams.clear()
    hparams.update(cfg)
    return root, cfg


def test_fs2_train_and_infer(fs2_env):
    root, cfg = fs2_env
    from neuralsvb_tpu.hparams import hparams
    hparams.clear()
    hparams.update(cfg)
    from neuralsvb_tpu.tasks.fs2_adv import FastSpeech2AdvTask
    task = FastSpeech2AdvTask()
    task.build_model()
    batch = next(iter(task.train_dataloader()))
    ret = task.training_step(batch, 5, 0)
    assert ret is not None
    total, logs = ret
    assert np.isfinite(float(total)), logs
    assert "pdur" in logs and any(k.startswith(("l1", "ssim")) for k in logs)
    ret_d = task.training_step(batch, 5, 1)
    assert ret_d is not None and np.isfinite(float(ret_d[0]))

    val = task.validation_step(batch, 0)
    assert np.isfinite(val["total_loss"])

    hparams["infer"] = True
    task.global_step = 3
    task.test_start()
    outs = []
    for i, b in enumerate(task.test_dataloader()):
        outs.append(task.test_step(b, i))
        break
    task.test_end(outs)
    gen = os.path.join(cfg["work_dir"], "generated_3_")
    assert os.path.isdir(os.path.join(gen, "wavs", "p_wavout"))
    assert len(os.listdir(os.path.join(gen, "wavs", "p_wavout"))) == 1
    hparams["infer"] = False
