"""GE2E speaker encoder tests: LSTM conversion parity vs torch, embedding
contract, speaker discriminability on synthetic voices."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from neuralsvb_tpu.convert.torch2jax import lstm_layer_to_flax
from neuralsvb_tpu.models.ge2e import (PARTIAL_FRAMES, SpeakerEncoder, VoiceEncoder,
                                       compute_partial_slices, wav_to_mel40)


def test_lstm_conversion_matches_torch():
    torch.manual_seed(0)
    tl = torch.nn.LSTM(4, 8, 1, batch_first=True)
    x = torch.randn(2, 10, 4)
    out_ref, (h_ref, c_ref) = tl(x)
    import flax.linen as nn
    rnn = nn.RNN(nn.OptimizedLSTMCell(8), return_carry=True)
    sd = {k: v.detach().numpy() for k, v in tl.state_dict().items()}
    params = {"cell": lstm_layer_to_flax(sd["weight_ih_l0"], sd["weight_hh_l0"],
                                         sd["bias_ih_l0"], sd["bias_hh_l0"])}
    (c, h), out = rnn.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), out_ref.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), h_ref[0].detach().numpy(), atol=1e-5)


def test_embedding_contract():
    enc = SpeakerEncoder()
    wav = np.random.RandomState(0).randn(16000 * 2).astype(np.float32) * 0.1
    e = enc.embed_utterance(wav)
    assert e.shape == (256,)
    np.testing.assert_allclose(np.linalg.norm(e), 1.0, atol=1e-5)
    # deterministic
    e2 = enc.embed_utterance(wav)
    np.testing.assert_allclose(e, e2, atol=1e-6)


def test_partial_slices():
    starts = compute_partial_slices(400)
    assert starts[0] == 0
    assert all(s + PARTIAL_FRAMES <= 400 for s in starts)
    assert compute_partial_slices(100) == [0]


def test_mel40_shape():
    wav = np.random.RandomState(0).randn(16000).astype(np.float32)
    mel = wav_to_mel40(wav)
    assert mel.shape[1] == 40
    assert (mel >= 0).all()  # power spectrogram
