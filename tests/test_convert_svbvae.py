"""Structural round-trip test for the SVBVAE/VCASR torch->jax converter:
synthesize a torch-style state_dict (reference module names, inverse layout
transforms) from a flax init, convert it back, and require exact tree +
value equality with the flax init. Catches missing entries, name drift and
layout transposition bugs on either side."""

import numpy as np
import pytest

import jax
from flax import serialization

from neuralsvb_tpu.convert import torch2jax as c
from neuralsvb_tpu.models.svb_vae import SVBVAE


def inv_linear(p):
    return {"weight": np.asarray(p["kernel"]).T,
            **({"bias": np.asarray(p["bias"])} if "bias" in p else {})}


def inv_conv(p):
    return {"weight": np.asarray(p["kernel"]).transpose(2, 1, 0),
            **({"bias": np.asarray(p["bias"])} if "bias" in p else {})}


inv_convt = inv_conv  # same transpose for transpose_kernel=True layout


def inv_bn(p, s):
    inner_p, inner_s = p["BatchNorm_0"], s["BatchNorm_0"]
    return {"weight": np.asarray(inner_p["scale"]),
            "bias": np.asarray(inner_p["bias"]),
            "running_mean": np.asarray(inner_s["mean"]),
            "running_var": np.asarray(inner_s["var"])}


def _flat(sd, prefix, d):
    for k, v in d.items():
        sd[f"{prefix}.{k}"] = v


def synthesize_sd(params, stats):
    """flax SVBVAE('mle') tree -> torch-style reference state_dict."""
    sd = {}
    sd["pitch_embed.weight"] = np.asarray(params["pitch_embed"]["Embed_0"]["embedding"])
    # pitch_encoder ConvStacks
    pe = params["pitch_encoder"]
    _flat(sd, "pitch_encoder.in_proj", inv_linear(pe["Dense_0"]))
    _flat(sd, "pitch_encoder.out_proj", inv_linear(pe["Dense_1"]))
    for i in range(3):
        blk = pe[f"ConvBlock_{i}"]
        _flat(sd, f"pitch_encoder.conv.{i}.conv.conv",
              inv_conv(blk["ConvNorm_0"]["Conv_0"]))
        sd[f"pitch_encoder.conv.{i}.norm.weight"] = np.asarray(
            blk["GroupNorm_0"]["scale"])
        sd[f"pitch_encoder.conv.{i}.norm.bias"] = np.asarray(
            blk["GroupNorm_0"]["bias"])
    # vc_asr prenet
    vp, vs = params["vc_asr"], stats["vc_asr"]
    for i in range(3):
        _flat(sd, f"vc_asr.mel_prenet.layers.{i}.0",
              inv_conv(vp["mel_prenet"][f"Conv_{i}"]))
        _flat(sd, f"vc_asr.mel_prenet.layers.{i}.2",
              inv_bn(vp["mel_prenet"][f"BatchNorm1d_{i}"],
                     vs["mel_prenet"][f"BatchNorm1d_{i}"]))
    _flat(sd, "vc_asr.mel_prenet.out_proj", inv_linear(vp["mel_prenet"]["Dense_0"]))
    # conformer layers
    n_enc = sum(1 for k in vp["content_encoder"] if k.startswith("layer_"))
    for i in range(n_enc):
        lp = vp["content_encoder"][f"layer_{i}"]
        ls = vs["content_encoder"][f"layer_{i}"]
        base = f"vc_asr.content_encoder.encoder_layers.{i}"
        _flat(sd, f"{base}.feed_forward_macaron.w_1",
              inv_conv(lp["ff_macaron"]["Conv_0"]))
        _flat(sd, f"{base}.feed_forward_macaron.w_2",
              inv_conv(lp["ff_macaron"]["Conv_1"]))
        _flat(sd, f"{base}.feed_forward.w_1", inv_conv(lp["ff"]["Conv_0"]))
        _flat(sd, f"{base}.feed_forward.w_2", inv_conv(lp["ff"]["Conv_1"]))
        at = lp["self_attn"]
        for nm in ("linear_q", "linear_k", "linear_v", "linear_out"):
            _flat(sd, f"{base}.self_attn.{nm}", inv_linear(at[nm]))
        sd[f"{base}.self_attn.linear_pos.weight"] = np.asarray(
            at["linear_pos"]["kernel"]).T
        sd[f"{base}.self_attn.pos_bias_u"] = np.asarray(at["pos_bias_u"])
        sd[f"{base}.self_attn.pos_bias_v"] = np.asarray(at["pos_bias_v"])
        cm = lp["conv_module"]
        _flat(sd, f"{base}.conv_module.pointwise_conv1", inv_conv(cm["Conv_0"]))
        _flat(sd, f"{base}.conv_module.pointwise_conv2", inv_conv(cm["Conv_2"]))
        dw = np.asarray(cm["Conv_1"]["kernel"]).transpose(2, 1, 0)  # [C,1,k]
        sd[f"{base}.conv_module.depthwise_conv.weight"] = dw
        if "bias" in cm["Conv_1"]:
            sd[f"{base}.conv_module.depthwise_conv.bias"] = np.asarray(
                cm["Conv_1"]["bias"])
        _flat(sd, f"{base}.conv_module.norm",
              inv_bn(cm["BatchNorm1d_0"], ls["conv_module"]["BatchNorm1d_0"]))
        for nm in ("norm_ff_macaron", "norm_mha", "norm_conv", "norm_ff",
                   "norm_final"):
            sd[f"{base}.{nm}.weight"] = np.asarray(lp[nm]["scale"])
            sd[f"{base}.{nm}.bias"] = np.asarray(lp[nm]["bias"])
    if "last_proj" in vp["content_encoder"]:
        _flat(sd, "vc_asr.content_encoder.layer_norm",
              inv_linear(vp["content_encoder"]["last_proj"]))
    # upsample layer
    up = params["upsample_layer"]
    _flat(sd, "upsample_layer.0.1", inv_conv(up["conv_0"]))
    _flat(sd, "upsample_layer.0.3", inv_bn(up["bn_0"],
                                           stats["upsample_layer"]["bn_0"]))
    _flat(sd, "upsample_layer.1", inv_conv(up["conv_out"]))
    _flat(sd, "spk_embed_proj", inv_linear(params["spk_embed_proj"]))
    _flat(sd, "encoded_embed_proj", inv_linear(params["encoded_embed_proj"]))
    # vae model
    vm, vms = params["vae_model"], stats["vae_model"]
    _flat(sd, "vae_model.g_pre_net.0", inv_conv(vm["g_pre_0"]))
    enc, encs = vm["encoder"], vms["encoder"]
    _flat(sd, "vae_model.encoder.pre_net.0", inv_conv(enc["pre_0"]))
    _flat(sd, "vae_model.encoder.out_proj", inv_conv(enc["out_proj"]))
    n_wn = sum(1 for k in enc["wn"] if k.startswith("in_layer_"))
    for i in range(n_wn):
        _flat(sd, f"vae_model.encoder.wn.in_layers.{i}",
              inv_conv(enc["wn"][f"in_layer_{i}"]))
        _flat(sd, f"vae_model.encoder.wn.res_skip_layers.{i}",
              inv_conv(enc["wn"][f"res_skip_{i}"]))
    _flat(sd, "vae_model.encoder.wn.cond_layer", inv_conv(enc["wn"]["cond_layer"]))
    for i, ci in enumerate((0, 3, 6)):
        _flat(sd, f"vae_model.encoder.poolings.{ci}", inv_conv(enc[f"pool_{i}"]))
    for i, bi in enumerate((2, 5)):
        _flat(sd, f"vae_model.encoder.poolings.{bi}",
              inv_bn(enc[f"pool_bn_{i}"], encs[f"pool_bn_{i}"]))
    dec = vm["decoder"]
    _flat(sd, "vae_model.decoder.pre_net.0", inv_convt(dec["pre_0"]))
    _flat(sd, "vae_model.decoder.out_proj", inv_conv(dec["out_proj"]))
    n_wn_d = sum(1 for k in dec["wn"] if k.startswith("in_layer_"))
    for i in range(n_wn_d):
        _flat(sd, f"vae_model.decoder.wn.in_layers.{i}",
              inv_conv(dec["wn"][f"in_layer_{i}"]))
        _flat(sd, f"vae_model.decoder.wn.res_skip_layers.{i}",
              inv_conv(dec["wn"][f"res_skip_{i}"]))
    _flat(sd, "vae_model.decoder.wn.cond_layer", inv_conv(dec["wn"]["cond_layer"]))
    # z mapping
    zm, zms = params["z_mapping_function"], stats["z_mapping_function"]
    for i, ci in enumerate((0, 3, 6)):
        _flat(sd, f"z_mapping_function.convs.{ci}", inv_conv(zm[f"conv_{i}"]))
    for i, bi in enumerate((1, 4)):
        _flat(sd, f"z_mapping_function.convs.{bi}",
              inv_bn(zm[f"bn_{i}"], zms[f"bn_{i}"]))
    _flat(sd, "z_mapping_function.spk_proj.0", inv_conv(zm["spk_proj_0"]))
    _flat(sd, "z_mapping_function.spk_proj.2", inv_conv(zm["spk_proj_1"]))
    return sd


def test_svbvae_converter_roundtrip(tmp_path, monkeypatch):
    model = SVBVAE(dict_size=20, hidden_size=16, latent_size=8, fvae_hidden=8,
                   fvae_enc_layers=2, fvae_dec_layers=2, asr_enc_layers=1,
                   asr_dec_layers=1, variant="mle")
    B, T = 1, 16
    mels = np.zeros((B, T, 80), np.float32)
    pitch = np.ones((B, T), np.int32)
    spk = np.zeros((B, 256), np.float32)
    align = np.zeros((B, T), np.int32)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    v = model.init(rngs, mels, mels, pitch, pitch, spk, align,
                   concurrent_ways=("a2a", "p2p", "a2p"))
    params = serialization.to_state_dict(v["params"])
    stats = serialization.to_state_dict(v.get("batch_stats", {}))

    sd = synthesize_sd(params, stats)
    monkeypatch.setattr(c, "load_state_dict", lambda path: dict(sd))
    conv_params, conv_stats = c.convert_svbvae_mle(
        "dummy.ckpt", fvae_enc_layers=2, fvae_dec_layers=2,
        asr_enc_layers=1, asr_dec_layers=1)

    def compare(a, b, path="", partial_ok=()):
        if isinstance(a, dict):
            for k in a:
                if k in b:
                    compare(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                       err_msg=path)

    # every converted leaf matches the flax original exactly
    compare(conv_params, params)
    compare(conv_stats, stats)

    # coverage: trainable (non-ASR-decoder) leaves are all converted
    def leaves(d, path=""):
        if isinstance(d, dict):
            out = []
            for k, v_ in d.items():
                out += leaves(v_, f"{path}/{k}")
            return out
        return [path]

    missing = [p for p in leaves(params)
               if p not in set(leaves(conv_params))
               and "asr_decoder" not in p and "token_embed" not in p
               and "pitch_encoder/Dropout" not in p]
    assert not missing, missing[:10]
