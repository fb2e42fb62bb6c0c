"""Pitch tracker tests on synthetic signals with known ground truth."""

import numpy as np

from neuralsvb_tpu.ops.pitch import get_pitch, track_pitch

SR, HOP = 22050, 128


def _tone(freq, dur=1.0, amp=0.3):
    t = np.arange(int(SR * dur)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_constant_tone():
    for freq in [110.0, 220.0, 440.0]:
        f0 = track_pitch(_tone(freq), SR, HOP)
        mid = f0[20:-20]
        voiced = mid[mid > 0]
        assert len(voiced) > 0.9 * len(mid)
        err = np.abs(voiced - freq) / freq
        assert np.median(err) < 0.02, (freq, np.median(err))


def test_silence_is_unvoiced():
    wav = np.zeros(SR // 2, np.float32)
    f0 = track_pitch(wav, SR, HOP)
    assert (f0 == 0).all()


def test_tone_with_silence_segments():
    wav = np.concatenate([np.zeros(SR // 4, np.float32), _tone(220, 0.5),
                          np.zeros(SR // 4, np.float32)])
    f0 = track_pitch(wav, SR, HOP)
    T = len(f0)
    q = SR // 4 // HOP
    # middle segment voiced at ~220
    mid = f0[q + 10: q + int(0.5 * SR / HOP) - 10]
    assert (mid > 0).mean() > 0.85
    assert np.median(np.abs(mid[mid > 0] - 220) / 220) < 0.03
    # silent ends unvoiced
    assert (f0[: q - 8] == 0).mean() > 0.9
    assert (f0[-(q - 8):] == 0).mean() > 0.9


def test_vibrato_tracking():
    t = np.arange(SR) / SR
    inst = 220 * (1 + 0.05 * np.sin(2 * np.pi * 5 * t))  # 5 Hz vibrato
    phase = 2 * np.pi * np.cumsum(inst) / SR
    wav = (0.3 * np.sin(phase)).astype(np.float32)
    f0 = track_pitch(wav, SR, HOP)
    mid = f0[20:-20]
    assert (mid > 0).mean() > 0.95
    # tracked contour spans the vibrato range
    assert mid[mid > 0].max() > 224 and mid[mid > 0].min() < 216


def test_get_pitch_contract():
    hp = {"hop_size": HOP, "audio_sample_rate": SR}
    wav = _tone(220, 0.6)
    n_frames = 1 + len(wav) // HOP
    mel = np.zeros((n_frames, 80), np.float32)
    f0, coarse = get_pitch(wav, mel, hp)
    assert f0.shape == (n_frames,) and coarse.shape == (n_frames,)
    assert (f0[:8] == 0).all()  # lpad frames for hop 128
    assert coarse.min() >= 1 and coarse.max() <= 255
