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
    # unwrap nested containers to fixpoint: covers our {'state_dict':
    # {'model_gen': ...}} and the OFFICIAL ParallelWaveGAN format
    # {'model': {'generator': ...}} (reference: vocoders/pwg.py:30)
    changed = True
    while changed and isinstance(state, dict):
        changed = False
        for key in ("state_dict", "model", "model_gen", "generator"):
            if key in state and isinstance(state[key], dict):
                state = state[key]
                changed = True
                break
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
# MelGAN generator (reference: modules/parallel_wavegan/models/melgan.py:18-158)
# ---------------------------------------------------------------------------

def convert_melgan_generator(sd: Dict[str, np.ndarray],
                             upsample_scales=(8, 8, 2, 2),
                             stacks: int = 3,
                             use_causal_conv: bool = False) -> Dict[str, Any]:
    """Map the reference MelGANGenerator state_dict (a flat torch Sequential
    named ``melgan.{i}``) onto our named Flax tree, mirroring the reference's
    construction order (melgan.py:66-137). The causal variant wraps convs in
    CausalConv1d/CausalConvTranspose1d whose params live under ``.conv`` /
    ``.deconv`` (layers/causal_conv.py:12-56)."""
    sd = fold_weight_norm(sd)
    p: Dict[str, Any] = {}

    def conv_at(i):
        pre = f"melgan.{i}.conv" if use_causal_conv else f"melgan.{i}"
        return _conv(sd, pre)

    i = 0
    if not use_causal_conv:
        i += 1  # ReflectionPad1d
    p["conv_pre"] = conv_at(i)
    i += 1
    for si in range(len(upsample_scales)):
        i += 1  # activation
        pre = f"melgan.{i}.deconv" if use_causal_conv else f"melgan.{i}"
        p[f"up_{si}"] = convt1d_to_flax(sd[f"{pre}.weight"],
                                        sd.get(f"{pre}.bias"))
        i += 1
        for j in range(stacks):
            base = f"melgan.{i}.stack"
            dil = (f"{base}.1.conv" if use_causal_conv else f"{base}.2")
            one = f"{base}.3" if use_causal_conv else f"{base}.4"
            p[f"stack_{si}_{j}"] = {
                "conv_dilated": _conv(sd, dil),
                "conv_1x1": _conv(sd, one),
                "skip": _conv(sd, f"melgan.{i}.skip_layer"),
            }
            i += 1
    i += 1  # activation
    if not use_causal_conv:
        i += 1  # ReflectionPad1d
    p["conv_post"] = conv_at(i)
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


# ---------------------------------------------------------------------------
# VCASR (PPG extractor) + SVBVAE — for the released 1009/1030 checkpoints
# (reference module structure: modules/voice_conversion/vc_modules.py,
#  modules/fastspeech/pe.py, modules/fastspeech/conformer/*,
#  modules/voice_conversion/{svb_vae.py,vae_models.py},
#  modules/fastspeech/fs2_vae.py)
# ---------------------------------------------------------------------------

def _linear(sd, prefix):
    return linear_to_flax(sd[f"{prefix}.weight"], sd.get(f"{prefix}.bias"))


def _bn_split(sd, prefix):
    """torch BatchNorm -> (flax BatchNorm1d params, batch stats) matching our
    BatchNorm1d wrapper (inner module name BatchNorm_0)."""
    p, s = bn_to_flax(sd, prefix)
    return {"BatchNorm_0": p}, {"BatchNorm_0": s}


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _mha_split(sd, prefix, bias=False):
    """fairseq-style combined in_proj -> separate q/k/v/out Dense
    (reference: common_layers.py:190-231)."""
    w = sd[f"{prefix}.in_proj_weight"]
    C = w.shape[1]
    out = {
        "q_proj": {"kernel": np.ascontiguousarray(w[:C].T)},
        "k_proj": {"kernel": np.ascontiguousarray(w[C:2 * C].T)},
        "v_proj": {"kernel": np.ascontiguousarray(w[2 * C:].T)},
        "out_proj": linear_to_flax(sd[f"{prefix}.out_proj.weight"],
                                   sd.get(f"{prefix}.out_proj.bias")),
    }
    if bias and f"{prefix}.in_proj_bias" in sd:
        b = sd[f"{prefix}.in_proj_bias"]
        out["q_proj"]["bias"] = b[:C]
        out["k_proj"]["bias"] = b[C:2 * C]
        out["v_proj"]["bias"] = b[2 * C:]
    return out


def convert_prenet(sd, prefix, n_layers=3):
    """modules/fastspeech/pe.py Prenet -> our Prenet (Conv_i + BatchNorm1d_i
    + Dense_0)."""
    params, stats = {}, {}
    for i in range(n_layers):
        params[f"Conv_{i}"] = conv1d_to_flax(sd[f"{prefix}.layers.{i}.0.weight"],
                                             sd.get(f"{prefix}.layers.{i}.0.bias"))
        bp, bs = _bn_split(sd, f"{prefix}.layers.{i}.2")
        params[f"BatchNorm1d_{i}"] = bp
        stats[f"BatchNorm1d_{i}"] = bs
    params["Dense_0"] = _linear(sd, f"{prefix}.out_proj")
    return params, stats


def convert_conformer(sd, prefix, n_layers, last_norm=True):
    """conformer/conformer.py ConformerLayers -> our ConformerLayers."""
    params, stats = {}, {}
    for i in range(n_layers):
        lp, ls = {}, {}
        base = f"{prefix}.encoder_layers.{i}"
        lp["ff_macaron"] = {
            "Conv_0": conv1d_to_flax(sd[f"{base}.feed_forward_macaron.w_1.weight"],
                                     sd.get(f"{base}.feed_forward_macaron.w_1.bias")),
            "Conv_1": conv1d_to_flax(sd[f"{base}.feed_forward_macaron.w_2.weight"],
                                     sd.get(f"{base}.feed_forward_macaron.w_2.bias"))}
        lp["ff"] = {
            "Conv_0": conv1d_to_flax(sd[f"{base}.feed_forward.w_1.weight"],
                                     sd.get(f"{base}.feed_forward.w_1.bias")),
            "Conv_1": conv1d_to_flax(sd[f"{base}.feed_forward.w_2.weight"],
                                     sd.get(f"{base}.feed_forward.w_2.bias"))}
        attn = f"{base}.self_attn"
        lp["self_attn"] = {
            "linear_q": _linear(sd, f"{attn}.linear_q"),
            "linear_k": _linear(sd, f"{attn}.linear_k"),
            "linear_v": _linear(sd, f"{attn}.linear_v"),
            "linear_out": _linear(sd, f"{attn}.linear_out"),
            "linear_pos": {"kernel": np.ascontiguousarray(
                sd[f"{attn}.linear_pos.weight"].T)},
            "pos_bias_u": sd[f"{attn}.pos_bias_u"],
            "pos_bias_v": sd[f"{attn}.pos_bias_v"],
        }
        conv = f"{base}.conv_module"
        cp = {
            "Conv_0": conv1d_to_flax(sd[f"{conv}.pointwise_conv1.weight"],
                                     sd.get(f"{conv}.pointwise_conv1.bias")),
            "Conv_2": conv1d_to_flax(sd[f"{conv}.pointwise_conv2.weight"],
                                     sd.get(f"{conv}.pointwise_conv2.bias")),
        }
        # depthwise: torch [C, 1, k] -> flax grouped conv kernel [k, 1, C]
        dw = sd[f"{conv}.depthwise_conv.weight"]
        cp["Conv_1"] = {"kernel": np.ascontiguousarray(dw.transpose(2, 1, 0))}
        if f"{conv}.depthwise_conv.bias" in sd:
            cp["Conv_1"]["bias"] = sd[f"{conv}.depthwise_conv.bias"]
        bp, bs = _bn_split(sd, f"{conv}.norm")
        cp["BatchNorm1d_0"] = bp
        lp["conv_module"] = cp
        ls["conv_module"] = {"BatchNorm1d_0": bs}
        for name in ("norm_ff_macaron", "norm_mha", "norm_conv", "norm_ff",
                     "norm_final"):
            lp[name] = _ln(sd, f"{base}.{name}")
        params[f"layer_{i}"] = lp
        stats[f"layer_{i}"] = ls
    if last_norm and f"{prefix}.layer_norm.weight" in sd:
        key = "last_norm" if sd[f"{prefix}.layer_norm.weight"].ndim == 1 else "last_proj"
        if sd[f"{prefix}.layer_norm.weight"].ndim == 1:
            params["last_norm"] = _ln(sd, f"{prefix}.layer_norm")
        else:
            params["last_proj"] = _linear(sd, f"{prefix}.layer_norm")
    return params, stats


def convert_vcasr(sd, prefix="vc_asr", asr_enc_layers=2, asr_dec_layers=2):
    """VCASR (vc_modules.py:56-80) -> our models/asr.py VCASR tree."""
    params, stats = {}, {}
    pn, ps = convert_prenet(sd, f"{prefix}.mel_prenet")
    params["mel_prenet"], stats["mel_prenet"] = pn, ps
    cp, cs = convert_conformer(sd, f"{prefix}.content_encoder", asr_enc_layers)
    params["content_encoder"], stats["content_encoder"] = cp, cs
    if f"{prefix}.token_embed.weight" in sd:
        params["token_embed"] = {"Embed_0": {
            "embedding": sd[f"{prefix}.token_embed.weight"]}}
        dec = {}
        for i in range(asr_dec_layers):
            base = f"{prefix}.asr_decoder.layers.{i}.op"
            dp = {
                "LayerNorm_0": _ln(sd, f"{base}.layer_norm1"),
                "LayerNorm_1": _ln(sd, f"{base}.layer_norm2"),
                "LayerNorm_2": _ln(sd, f"{base}.layer_norm3"),
                "MultiheadAttention_0": _mha_split(sd, f"{base}.self_attn"),
                "MultiheadAttention_1": _mha_split(sd, f"{base}.encoder_attn"),
                "TransformerFFNLayer_0": {
                    # LEFT padding: torch Sequential(pad, conv) -> ffn_1.1
                    "Conv_0": conv1d_to_flax(sd[f"{base}.ffn.ffn_1.1.weight"],
                                             sd.get(f"{base}.ffn.ffn_1.1.bias")),
                    "Dense_0": _linear(sd, f"{base}.ffn.ffn_2"),
                },
            }
            dec[f"layer_{i}"] = dp
        dec["layer_norm"] = _ln(sd, f"{prefix}.asr_decoder.layer_norm")
        dec["project_out"] = {"kernel": np.ascontiguousarray(
            sd[f"{prefix}.asr_decoder.project_out_dim.weight"].T)}
        params["asr_decoder"] = dec
    return params, stats


def convert_conv_stacks(sd, prefix, n_layers=3):
    """common_layers.py ConvStacks -> our ConvStacks (Dense_0, ConvBlock_i,
    Dense_1)."""
    params = {"Dense_0": _linear(sd, f"{prefix}.in_proj")}
    for i in range(n_layers):
        blk = {"ConvNorm_0": {"Conv_0": conv1d_to_flax(
            sd[f"{prefix}.conv.{i}.conv.conv.weight"],
            sd.get(f"{prefix}.conv.{i}.conv.conv.bias"))}}
        gn = f"{prefix}.conv.{i}.norm"
        if f"{gn}.weight" in sd:
            blk["GroupNorm_0"] = {"scale": sd[f"{gn}.weight"],
                                  "bias": sd[f"{gn}.bias"]}
        params[f"ConvBlock_{i}"] = blk
    params["Dense_1"] = _linear(sd, f"{prefix}.out_proj")
    return params


def convert_wn(sd, prefix, n_layers):
    """fs2_vae.py WN -> models/wn.py WN (weight norm folded upstream)."""
    p = {}
    if f"{prefix}.cond_layer.weight" in sd:
        p["cond_layer"] = conv1d_to_flax(sd[f"{prefix}.cond_layer.weight"],
                                         sd.get(f"{prefix}.cond_layer.bias"))
    for i in range(n_layers):
        p[f"in_layer_{i}"] = conv1d_to_flax(sd[f"{prefix}.in_layers.{i}.weight"],
                                            sd.get(f"{prefix}.in_layers.{i}.bias"))
        p[f"res_skip_{i}"] = conv1d_to_flax(
            sd[f"{prefix}.res_skip_layers.{i}.weight"],
            sd.get(f"{prefix}.res_skip_layers.{i}.bias"))
    return p


def convert_global_latent_map(sd, prefix):
    """vae_models.py GlobalLatentMap -> models/fvae.py GlobalLatentMap.
    torch Sequential indices: convs 0,3,6 conv / 1,4 BN; spk_proj 0,2."""
    params = {
        "conv_0": conv1d_to_flax(sd[f"{prefix}.convs.0.weight"],
                                 sd.get(f"{prefix}.convs.0.bias")),
        "conv_1": conv1d_to_flax(sd[f"{prefix}.convs.3.weight"],
                                 sd.get(f"{prefix}.convs.3.bias")),
        "conv_2": conv1d_to_flax(sd[f"{prefix}.convs.6.weight"],
                                 sd.get(f"{prefix}.convs.6.bias")),
        "spk_proj_0": conv1d_to_flax(sd[f"{prefix}.spk_proj.0.weight"],
                                     sd.get(f"{prefix}.spk_proj.0.bias")),
        "spk_proj_1": conv1d_to_flax(sd[f"{prefix}.spk_proj.2.weight"],
                                     sd.get(f"{prefix}.spk_proj.2.bias")),
    }
    stats = {}
    for i, ti in enumerate((1, 4)):
        bp, bs = _bn_split(sd, f"{prefix}.convs.{ti}")
        params[f"bn_{i}"] = bp
        stats[f"bn_{i}"] = bs
    return params, stats


def convert_global_fvae(sd, prefix, fvae_enc_layers=8, fvae_dec_layers=4):
    """vae_models.py GlobalFVAE -> our models/fvae.py FVAE(global_latent=True).
    Returns (params, batch_stats). ``sd`` must have weight norm folded."""
    vae, vae_stats = {}, {}
    vae["g_pre_0"] = conv1d_to_flax(sd[f"{prefix}.g_pre_net.0.weight"],
                                    sd.get(f"{prefix}.g_pre_net.0.bias"))
    enc = {"pre_0": conv1d_to_flax(sd[f"{prefix}.encoder.pre_net.0.weight"],
                                   sd.get(f"{prefix}.encoder.pre_net.0.bias")),
           "wn": convert_wn(sd, f"{prefix}.encoder.wn", fvae_enc_layers),
           "out_proj": conv1d_to_flax(sd[f"{prefix}.encoder.out_proj.weight"],
                                      sd.get(f"{prefix}.encoder.out_proj.bias"))}
    enc_stats = {}
    # poolings Sequential: conv@0, ReLU@1, BN@2, conv@3, ReLU@4, BN@5, conv@6
    for i, ci in enumerate((0, 3, 6)):
        enc[f"pool_{i}"] = conv1d_to_flax(
            sd[f"{prefix}.encoder.poolings.{ci}.weight"],
            sd.get(f"{prefix}.encoder.poolings.{ci}.bias"))
    for i, bi in enumerate((2, 5)):
        bp, bs = _bn_split(sd, f"{prefix}.encoder.poolings.{bi}")
        enc[f"pool_bn_{i}"] = bp
        enc_stats[f"pool_bn_{i}"] = bs
    vae["encoder"] = enc
    vae_stats["encoder"] = enc_stats
    dec = {"pre_0": convt1d_to_flax(sd[f"{prefix}.decoder.pre_net.0.weight"],
                                    sd.get(f"{prefix}.decoder.pre_net.0.bias")),
           "wn": convert_wn(sd, f"{prefix}.decoder.wn", fvae_dec_layers),
           "out_proj": conv1d_to_flax(sd[f"{prefix}.decoder.out_proj.weight"],
                                      sd.get(f"{prefix}.decoder.out_proj.bias"))}
    vae["decoder"] = dec
    return vae, vae_stats


def convert_svbvae_mle_sd(sd, fvae_enc_layers=8, fvae_dec_layers=4,
                          asr_enc_layers=2, asr_dec_layers=2):
    """MleSVBVAE (svb_vae.py:251-312) state_dict (weight norm folded) -> our
    models/svb_vae.py SVBVAE('mle'). Returns (params, batch_stats)."""
    params, stats = {}, {}
    params["pitch_embed"] = {"Embed_0": {"embedding": sd["pitch_embed.weight"]}}
    params["pitch_encoder"] = convert_conv_stacks(sd, "pitch_encoder", 3)
    vp, vs = convert_vcasr(sd, "vc_asr", asr_enc_layers, asr_dec_layers)
    params["vc_asr"], stats["vc_asr"] = vp, vs
    # CondUpsampler: torch Sequential([Sequential(Upsample, conv, ReLU, BN)],
    # final conv) -> upsample_layer.0.1 conv, .0.3 BN, .1 final conv
    up = {"conv_0": conv1d_to_flax(sd["upsample_layer.0.1.weight"],
                                   sd.get("upsample_layer.0.1.bias")),
          "conv_out": conv1d_to_flax(sd["upsample_layer.1.weight"],
                                     sd.get("upsample_layer.1.bias"))}
    bp, bs = _bn_split(sd, "upsample_layer.0.3")
    up["bn_0"] = bp
    params["upsample_layer"] = up
    stats["upsample_layer"] = {"bn_0": bs}
    params["spk_embed_proj"] = _linear(sd, "spk_embed_proj")
    params["encoded_embed_proj"] = _linear(sd, "encoded_embed_proj")

    vae, vae_stats = convert_global_fvae(sd, "vae_model",
                                         fvae_enc_layers, fvae_dec_layers)
    params["vae_model"] = vae
    stats["vae_model"] = vae_stats
    zp, zs = convert_global_latent_map(sd, "z_mapping_function")
    params["z_mapping_function"] = zp
    stats["z_mapping_function"] = zs
    return params, stats


def convert_svbvae_mle(ckpt_path: str, fvae_enc_layers=8, fvae_dec_layers=4,
                       asr_enc_layers=2, asr_dec_layers=2):
    """Checkpoint-file entry point for :func:`convert_svbvae_mle_sd`."""
    sd = fold_weight_norm(load_state_dict(ckpt_path))
    # strip the reference's top-level 'model.' prefix if present
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):] if k.startswith("model.") else k: v
              for k, v in sd.items()}
    return convert_svbvae_mle_sd(sd, fvae_enc_layers, fvae_dec_layers,
                                 asr_enc_layers, asr_dec_layers)
