"""Converter CLI end-to-end: flax params -> synthesized torch checkpoint ->
`python -m neuralsvb_tpu.convert.cli --kind hifigan` -> msgpack equal to the
originals (inverse-layout round-trip through the real CLI)."""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest
import torch
from flax import serialization


def _to_torch_conv(k, b):
    # flax conv kernel [k, in, out] -> torch [out, in, k]
    out = {"weight": torch.tensor(np.transpose(np.asarray(k), (2, 1, 0)))}
    if b is not None:
        out["bias"] = torch.tensor(np.asarray(b))
    return out


def _to_torch_convt(k, b):
    # flax ConvTranspose(transpose_kernel=True) kernel [k, out, in] ->
    # torch ConvTranspose1d weight [in, out, k]
    out = {"weight": torch.tensor(np.transpose(np.asarray(k), (2, 1, 0)))}
    if b is not None:
        out["bias"] = torch.tensor(np.asarray(b))
    return out


def test_convert_cli_hifigan_roundtrip(tmp_path):
    from neuralsvb_tpu.models.hifigan import HifiGanGenerator
    model = HifiGanGenerator(upsample_rates=(8, 4), upsample_kernel_sizes=(16, 8),
                             upsample_initial_channel=16, use_pitch_embed=True)
    mel = np.zeros((1, 16, 80), np.float32)
    f0 = np.full((1, 16), 220.0, np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "noise": jax.random.PRNGKey(1)}, mel, f0)
    params = variables["params"]

    sd = {}
    def put(prefix, tree, kind="conv"):
        conv = _to_torch_convt if kind == "convt" else _to_torch_conv
        if kind == "linear":
            sd[f"{prefix}.weight"] = torch.tensor(
                np.asarray(tree["kernel"]).T.copy())
            if "bias" in tree:
                sd[f"{prefix}.bias"] = torch.tensor(np.asarray(tree["bias"]))
            return
        for name, t in conv(tree["kernel"], tree.get("bias")).items():
            sd[f"{prefix}.{name}"] = t

    put("conv_pre", params["conv_pre"])
    put("conv_post", params["conv_post"])
    put("m_source.l_linear", params["m_source"]["l_linear"], kind="linear")
    nk = len(model.resblock_kernel_sizes)
    for i in range(2):
        put(f"ups.{i}", params[f"up_{i}"], kind="convt")
        put(f"noise_convs.{i}", params[f"noise_conv_{i}"])
        for j in range(nk):
            r = i * nk + j
            blk = params[f"resblock_{i}_{j}"]
            for c in range(3):
                put(f"resblocks.{r}.convs1.{c}", blk[f"conv1_{c}"])
                put(f"resblocks.{r}.convs2.{c}", blk[f"conv2_{c}"])

    ckpt = tmp_path / "model_ckpt_steps_1000.ckpt"
    torch.save({"state_dict": {"model_gen": sd}}, str(ckpt))
    out = tmp_path / "params.msgpack"

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, NSVB_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, "-m", "neuralsvb_tpu.convert.cli", "--kind", "hifigan",
         "--ckpt", str(ckpt), "--out", str(out),
         "--upsample_rates", "8,4", "--upsample_kernel_sizes", "16,8",
         "--upsample_initial_channel", "16"],
        cwd=repo, env=env, capture_output=True, text=True)
    assert res.returncode == 0, res.stderr[-2000:]
    restored = serialization.msgpack_restore(out.read_bytes())
    flat_orig = jax.tree_util.tree_leaves_with_path(
        serialization.to_state_dict(params))
    restored_flat = dict(jax.tree_util.tree_leaves_with_path(restored))
    for path, leaf in flat_orig:
        assert path in restored_flat, path
        np.testing.assert_allclose(restored_flat[path], np.asarray(leaf),
                                   atol=1e-6, err_msg=str(path))
