"""torch state_dict -> flax params conversion.

Tensor layout rules (verified by tests/test_convert.py against torch ops):

- Linear:        torch [out, in]        -> flax kernel [in, out]
- Conv1d:        torch [out, in, k]     -> flax Conv kernel [k, in, out]
- grouped Conv1d torch [out, in/g, k]   -> same transpose (flax groups match)
- ConvTranspose1d torch [in, out, k]    -> flax ConvTranspose kernel
                                           [k, out, in].T on io => see
                                           ``convt1d_to_flax`` (flipped taps)
- Embedding:     identical [V, d]
- BatchNorm:     scale/bias/mean/var copied 1:1

Weight-normed convs (torch ``weight_g``/``weight_v``) are folded into plain
weights — our modules are plain convs (see models/wn.py docstring).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint to {name: np.ndarray} without needing CUDA."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt
    for key in ("state_dict", "generator", "model", "model_gen"):
        if isinstance(state, dict) and key in state:
            state = state[key]
    # nested e.g. {'state_dict': {'model_gen': ...}}
    if isinstance(state, dict) and "model_gen" in state:
        state = state["model_gen"]
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in state.items() if hasattr(v, "shape")}


def fold_weight_norm(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fold weight_g/weight_v pairs into plain 'weight' entries."""
    out = dict(sd)
    for k in list(sd):
        if k.endswith("weight_v"):
            base = k[: -len("weight_v")]
            g = sd[base + "weight_g"]
            v = sd[k]
            axes = tuple(range(1, v.ndim))
            norm = np.sqrt((v ** 2).sum(axis=axes, keepdims=True))
            out[base + "weight"] = g * v / np.maximum(norm, 1e-12)
            del out[k], out[base + "weight_g"]
    return out


def linear_to_flax(w, b=None):
    p = {"kernel": np.ascontiguousarray(w.T)}
    if b is not None:
        p["bias"] = b
    return p


def conv1d_to_flax(w, b=None):
    # torch [out, in, k] -> flax [k, in, out]
    p = {"kernel": np.ascontiguousarray(w.transpose(2, 1, 0))}
    if b is not None:
        p["bias"] = b
    return p


def convt1d_to_flax(w, b=None):
    # torch ConvTranspose1d [in, out, k] -> flax ConvTranspose(transpose_kernel=True)
    # kernel [k, out, in] (validated in tests/test_vocoders.py)
    p = {"kernel": np.ascontiguousarray(w.transpose(2, 1, 0))}
    if b is not None:
        p["bias"] = b
    return p


def conv2d_to_flax(w, b=None):
    # torch [out, in, kh, kw] -> flax [kh, kw, in, out]
    p = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
    if b is not None:
        p["bias"] = b
    return p


def bn_to_flax(sd, prefix):
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}
    return params, stats


def _conv(sd, prefix, bias=True):
    return conv1d_to_flax(sd[f"{prefix}.weight"],
                          sd.get(f"{prefix}.bias") if bias else None)


# ---------------------------------------------------------------------------
# HiFiGAN-NSF (reference: modules/hifigan/hifigan.py:104-178)
# ---------------------------------------------------------------------------

def convert_hifigan(ckpt_path: str, model) -> Dict[str, Any]:
    sd = fold_weight_norm(load_state_dict(ckpt_path))
    num_kernels = len(model.resblock_kernel_sizes)
    p: Dict[str, Any] = {}
    p["conv_pre"] = _conv(sd, "conv_pre")
    p["conv_post"] = _conv(sd, "conv_post")
    if model.use_pitch_embed and "m_source.l_linear.weight" in sd:
        p["m_source"] = {
            "l_linear": linear_to_flax(sd["m_source.l_linear.weight"],
                                       sd.get("m_source.l_linear.bias")),
        }
    for i in range(len(model.upsample_rates)):
        p[f"up_{i}"] = convt1d_to_flax(sd[f"ups.{i}.weight"], sd.get(f"ups.{i}.bias"))
        if model.use_pitch_embed and f"noise_convs.{i}.weight" in sd:
            p[f"noise_conv_{i}"] = _conv(sd, f"noise_convs.{i}")
        for j in range(num_kernels):
            r = i * num_kernels + j
            blk: Dict[str, Any] = {}
            if model.resblock == "1":
                for c in range(3):
                    blk[f"conv1_{c}"] = _conv(sd, f"resblocks.{r}.convs1.{c}")
                    blk[f"conv2_{c}"] = _conv(sd, f"resblocks.{r}.convs2.{c}")
            else:
                for c in range(2):
                    blk[f"conv_{c}"] = _conv(sd, f"resblocks.{r}.convs.{c}")
            p[f"resblock_{i}_{j}"] = blk
    return p


# ---------------------------------------------------------------------------
# Parallel WaveGAN (reference: modules/parallel_wavegan/models/parallel_wavegan.py)
# ---------------------------------------------------------------------------

def convert_pwg(ckpt_path: str, model) -> Dict[str, Any]:
    sd = fold_weight_norm(load_state_dict(ckpt_path))
    p: Dict[str, Any] = {}
    p["first_conv"] = _conv(sd, "first_conv")
    up: Dict[str, Any] = {"conv_in": conv1d_to_flax(
        sd["upsample_net.conv_in.weight"], None)}
    # UpsampleNetwork interleaves Stretch2d (no params) and Conv2d at odd idx
    conv_idx = 0
    for k in sorted(sd):
        m = k.startswith("upsample_net.upsample.up_layers.") and k.endswith(".weight")
        if m:
            w = sd[k]  # [1, 1, kh, kw] over (freq, time); ours is (time, freq)
            upk = conv2d_to_flax(w.transpose(0, 1, 3, 2))
            up.setdefault("upsample", {})[f"conv_{conv_idx}"] = upk
            conv_idx += 1
    p["upsample_net"] = up
    for layer in range(model.layers):
        blk = {
            "conv": _conv(sd, f"conv_layers.{layer}.conv"),
            "conv1x1_aux": conv1d_to_flax(sd[f"conv_layers.{layer}.conv1x1_aux.weight"], None),
            "conv1x1_out": _conv(sd, f"conv_layers.{layer}.conv1x1_out"),
            "conv1x1_skip": _conv(sd, f"conv_layers.{layer}.conv1x1_skip"),
        }
        p[f"block_{layer}"] = blk
    p["last_conv_0"] = _conv(sd, "last_conv_layers.1")
    p["last_conv_1"] = _conv(sd, "last_conv_layers.3")
    return p


# ---------------------------------------------------------------------------
# GE2E speaker encoder (Resemblyzer VoiceEncoder)
# ---------------------------------------------------------------------------

def lstm_layer_to_flax(w_ih, w_hh, b_ih, b_hh) -> Dict[str, Any]:
    """torch LSTM layer -> flax OptimizedLSTMCell params.

    torch packs gates [4h, in] in order (i, f, g, o) and uses two biases;
    flax keeps one Dense per gate, bias only on the hidden projections.
    """
    h = w_hh.shape[1]
    gates = ["i", "f", "g", "o"]
    p: Dict[str, Any] = {}
    for gi, g in enumerate(gates):
        sl = slice(gi * h, (gi + 1) * h)
        p[f"i{g}"] = {"kernel": np.ascontiguousarray(w_ih[sl].T)}
        p[f"h{g}"] = {"kernel": np.ascontiguousarray(w_hh[sl].T),
                      "bias": b_ih[sl] + b_hh[sl]}
    return p


def convert_ge2e(ckpt_path: str) -> Dict[str, Any]:
    """Resemblyzer pretrained.pt -> flax VoiceEncoder params."""
    sd = load_state_dict(ckpt_path)
    p: Dict[str, Any] = {}
    for layer in range(3):
        p[f"lstm_{layer}"] = {"cell": lstm_layer_to_flax(
            sd[f"lstm.weight_ih_l{layer}"], sd[f"lstm.weight_hh_l{layer}"],
            sd[f"lstm.bias_ih_l{layer}"], sd[f"lstm.bias_hh_l{layer}"])}
    p["linear"] = linear_to_flax(sd["linear.weight"], sd.get("linear.bias"))
    return p
