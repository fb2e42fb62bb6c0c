"""Tests for TextGrid/mel2ph alignment, PitchExtractor, energy VAD, f0cwt
binarize branch, param counter."""

import jax
import numpy as np

from neuralsvb_tpu.data.textgrid import get_mel2ph, parse_textgrid
from neuralsvb_tpu.models.pe import PitchExtractor
from neuralsvb_tpu.ops.audio import trim_long_silences
from neuralsvb_tpu.utils import num_params

TG = """File type = "ooTextFile"
Object class = "TextGrid"
xmin = 0
xmax = 1.0
tiers? <exists>
size = 1
item []:
    item [1]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 1.0
        intervals: size = 4
        intervals [1]:
            xmin = 0.0
            xmax = 0.1
            text = "sil"
        intervals [2]:
            xmin = 0.1
            xmax = 0.5
            text = "AA"
        intervals [3]:
            xmin = 0.5
            xmax = 0.9
            text = "B"
        intervals [4]:
            xmin = 0.9
            xmax = 1.0
            text = ""
"""


def test_parse_textgrid():
    tiers = parse_textgrid(TG)
    assert len(tiers) == 1 and tiers[0]["name"] == "phones"
    assert len(tiers[0]["items"]) == 4
    assert tiers[0]["items"][1]["text"] == "AA"


def test_get_mel2ph(tmp_path):
    fn = tmp_path / "x.TextGrid"
    fn.write_text(TG)
    hp = {"audio_sample_rate": 22050, "hop_size": 128}
    n_frames = int(1.0 * 22050 / 128) + 1
    mel = np.zeros((n_frames, 80))
    mel2ph, dur = get_mel2ph(str(fn), "| AA B |", mel, hp)
    assert mel2ph.shape == (n_frames,)
    assert dur.sum() == n_frames
    # phone 2 (AA) spans ~0.1-0.5s
    t_025 = int(0.25 * 22050 / 128)
    assert mel2ph[t_025] == 2
    t_07 = int(0.7 * 22050 / 128)
    assert mel2ph[t_07] == 3


def test_pitch_extractor_module():
    m = PitchExtractor(hidden_size=16)
    mel = jax.random.normal(jax.random.PRNGKey(0), (2, 30, 80))
    v = m.init({"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
               mel)
    out = m.apply(v, mel, rngs={"dropout": jax.random.PRNGKey(3)})
    assert out["pitch_pred"].shape == (2, 30, 2)
    assert out["f0_denorm_pred"].shape == (2, 30)
    n = num_params(v["params"], print_out=False)
    assert n > 0


def test_trim_long_silences():
    sr = 16000
    t = np.arange(sr) / sr
    tone = 0.3 * np.sin(2 * np.pi * 220 * t).astype(np.float32)
    sil = np.zeros(sr, np.float32)  # 1s silence (> 400ms -> trimmed)
    wav = np.concatenate([tone, sil, tone])
    out, mask, _ = trim_long_silences(wav, sr)
    assert len(out) < len(wav)
    assert len(out) > 2 * len(tone) * 0.9  # tones kept


def test_audio_io_resample_griffin_lim(tmp_path):
    """save/load round-trip, resample length/content, griffin-lim recovers a
    tone from its magnitude spectrogram."""
    import numpy as np
    from neuralsvb_tpu.ops.audio import (griffin_lim, load_wav, resample,
                                         save_wav, _stft_complex)
    sr = 22050
    t = np.arange(sr) / sr
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    fn = str(tmp_path / "tone.wav")
    save_wav(wav, fn, sr)
    back, got_sr = load_wav(fn)
    assert got_sr == sr and abs(len(back) - len(wav)) <= 1
    assert np.corrcoef(back[:len(wav)], wav[:len(back)])[0, 1] > 0.99

    down = resample(wav, sr, sr // 2)
    assert abs(len(down) - len(wav) // 2) <= 2
    # dominant frequency survives resampling
    spec = np.abs(np.fft.rfft(down))
    freq = np.fft.rfftfreq(len(down), 1.0 / (sr // 2))
    assert abs(freq[spec.argmax()] - 440) < 15

    hp = {"fft_size": 512, "hop_size": 128, "win_size": 512,
          "griffin_lim_iters": 30}
    S = np.abs(_stft_complex(wav[:sr // 2], 512, 128, 512))
    rec = griffin_lim(S, hp)
    # reconstruction keeps the 440 Hz peak
    spec_r = np.abs(np.fft.rfft(rec))
    freq_r = np.fft.rfftfreq(len(rec), 1.0 / sr)
    assert abs(freq_r[spec_r.argmax()] - 440) < 15
