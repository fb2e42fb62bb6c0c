"""Tests for text encoder, text normalization, masks, metrics, profiling."""

import numpy as np

from neuralsvb_tpu.utils.metrics import laplace_var, mel_cepstral_distortion
from neuralsvb_tpu.utils.profiling import RTFMeter, Timer
from neuralsvb_tpu.utils.text_encoder import TokenTextEncoder
from neuralsvb_tpu.utils.text_norm import normalize_en, normalize_zh
from neuralsvb_tpu.utils.tts_utils import make_pad_mask, sequence_mask


def test_token_text_encoder():
    enc = TokenTextEncoder(None, vocab_list=["a", "b", "c"], replace_oov="<UNK>")
    assert enc.pad() == 0 and enc.eos() == 1 and enc.unk() == 2
    assert enc.vocab_size == 7  # 4 reserved + 3
    ids = enc.encode("a c zz")
    assert ids == [4, 6, 2]  # zz -> UNK
    assert enc.decode(ids) == "a c <UNK>"
    assert enc.decode([4, 0, 6], strip_padding=True) == "a"
    sils = enc.sil_phonemes()
    assert "|" in sils and "<pad>" in sils


def test_text_norm():
    assert normalize_en("Dr. Smith has 21 cats") == \
        "doctor smith has twenty one cats"
    assert "one hundred five" in normalize_en("105 things")
    assert normalize_zh("我有3只猫") == "我有三只猫"
    assert "二十一" in normalize_zh("21")


def test_masks():
    m = np.asarray(sequence_mask([2, 4], 5))
    np.testing.assert_array_equal(m, [[1, 1, 0, 0, 0], [1, 1, 1, 1, 0]])
    np.testing.assert_array_equal(np.asarray(make_pad_mask([2, 4], 5)), ~m)


def test_mcd():
    rng = np.random.RandomState(0)
    a = rng.randn(50, 80)
    assert mel_cepstral_distortion(a, a) == 0.0
    b = a + 0.1 * rng.randn(50, 80)
    d_small = mel_cepstral_distortion(a, b)
    c = a + 1.0 * rng.randn(50, 80)
    d_big = mel_cepstral_distortion(a, c)
    assert 0 < d_small < d_big
    assert laplace_var(a) > 0


def test_timer_and_rtf():
    with Timer("x", enable=True):
        _ = sum(range(1000))
    assert Timer.report()["x"] >= 0
    m = RTFMeter()
    m.add(0.5, 10.0)
    assert abs(m.rtf - 0.05) < 1e-9


def test_compiled_cost_and_roofline():
    """compiled_cost returns XLA's flop/byte counts; roofline picks the
    binding resource and a sane lower bound."""
    import jax
    import jax.numpy as jnp
    from neuralsvb_tpu.utils import profiling as P

    f = jax.jit(lambda x: (x @ x).sum())
    c = P.compiled_cost(f, jnp.ones((128, 128), jnp.float32))
    if not c["flops"]:  # backend without cost analysis
        return
    assert abs(c["flops"] - 2 * 128 ** 3) / (2 * 128 ** 3) < 0.1
    assert c["bytes"] >= 2 * 128 * 128 * 4  # at least operand+output traffic

    # known peaks: 100 GFLOP/s, 10 GB/s (monkeypatched table lookup)
    orig_f, orig_b = P.peak_flops_for_device, P.peak_hbm_bytes_for_device
    P.peak_flops_for_device = lambda: 100e9
    P.peak_hbm_bytes_for_device = lambda: 10e9
    try:
        # compute-bound: 1 GFLOP / 1 KB -> bound 10 ms
        lb, frac, which = P.roofline(1e9, 1e3, 20e-3)
        assert which == "compute" and abs(lb - 10e-3) < 1e-9
        assert abs(frac - 0.5) < 1e-9
        # bandwidth-bound: 1 KFLOP / 100 MB -> bound 10 ms
        lb, frac, which = P.roofline(1e3, 100e6, 10e-3)
        assert which == "bandwidth" and abs(frac - 1.0) < 1e-9
        assert P.roofline(0.0, 0.0, 1e-3) == (None, None, None)
    finally:
        P.peak_flops_for_device, P.peak_hbm_bytes_for_device = orig_f, orig_b


def test_mcd_eval_dirs(tmp_path, capsys):
    """mcd_eval harness: matches by basename, 0 dB on identical mels,
    positive on perturbed."""
    import numpy as np
    from neuralsvb_tpu.tasks.mcd_eval import evaluate_dirs
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(); b.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        mel = rng.randn(50 + i, 80).astype(np.float32)
        np.save(a / f"item{i}.npy", mel)
        np.save(b / f"item{i}.npy", mel)
    np.save(a / "only_a.npy", rng.randn(10, 80))
    assert evaluate_dirs(str(a), str(b)) < 1e-6
    # constant offsets shift only c0, which MCD excludes; use shaped noise
    np.save(b / "item0.npy",
            np.load(a / "item0.npy") + 0.3 * rng.randn(50, 80))
    assert evaluate_dirs(str(a), str(b)) > 0.01


def test_zh_g2pm_core():
    """Pure core of the zh_g2pM pipeline (reference: zh_g2pM.py:23-68),
    driven with a synthetic g2pM transcription (package absent in env)."""
    from neuralsvb_tpu.data.txt_processors import (get_txt_processor_cls,
                                                   split_shenmu,
                                                   zh_g2pm_phoneme_seq)
    assert split_shenmu("zhang1") == ["zh", "ang1"]
    assert split_shenmu("an4") == ["an4"]          # no initial
    assert split_shenmu("a") == ["a"]              # single letter stays
    assert split_shenmu("shi4") == ["sh", "i4"]

    # "他来到了" as 2 jieba words: 他 / 来到了  (boundaries become '#')
    ph_list = ["ta1", "lai2", "dao4", "le5"]
    seg_list = "他#来到了"
    phs = zh_g2pm_phoneme_seq(ph_list, seg_list, use_tone=True)
    assert phs == ["|", "t", "a1", "#", "l", "ai2", "|", "d", "ao4", "|",
                   "l", "e5"]
    # residual hanzi goes through the pinyin callback
    phs2 = zh_g2pm_phoneme_seq(["他"], "他", True,
                               pinyin_fn=lambda p, t: "ta1")
    assert phs2 == ["|", "t", "a1"]
    # registry carries the processor under the reference name
    assert get_txt_processor_cls("zh_g2pM") is not None
