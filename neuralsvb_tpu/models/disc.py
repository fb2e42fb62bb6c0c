"""Multi-window 2-D mel discriminator.

Re-design of the reference GAN discriminator (reference:
modules/fastspeech/multi_window_disc.py:6-199): per window length
(32/64/128 frames) a 3-block strided Conv2D tower over a randomly clipped
[win, 80] mel patch, linear head -> validity; reduction 'stack' returns
[B, n_windows].

JIT adaptation: the random window start is sampled from the module's
``'disc'`` rng collection with a traced upper bound (uniform * (T_end+1)),
and the clip is a ``dynamic_slice`` — window sizes stay static so XLA
compiles one program per window length. Callers may instead pass
``start_frames_wins`` to pin the windows (the reference's mechanism for
showing D the same windows for real/fake, svb_para.py:118-170).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class Discriminator2D(nn.Module):
    """3 stride-2 conv blocks + linear validity head."""
    time_length: int
    freq_length: int = 80
    kernel: Tuple[int, int] = (3, 3)
    hidden_size: int = 128
    norm_type: str = "bn"
    reduction: str = "stack"
    dropout: float = 0.25

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, win, 80, C_in]
        h_list = []
        for i in range(3):
            x = nn.Conv(self.hidden_size, self.kernel, strides=(2, 2),
                        padding=[(self.kernel[0] // 2,) * 2, (self.kernel[1] // 2,) * 2],
                        name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, 0.2)
            x = nn.Dropout(self.dropout)(x, deterministic=not train)
            if i > 0:
                if self.norm_type == "bn":
                    # the reference passes 0.8 positionally into BatchNorm2d,
                    # which is its eps (multi_window_disc.py:26)
                    x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                     epsilon=0.8, name=f"norm_{i}")(x)
                elif self.norm_type == "in":
                    mean = x.mean((1, 2), keepdims=True)
                    var = x.var((1, 2), keepdims=True)
                    x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
            h_list.append(x)
        B = x.shape[0]
        if self.reduction != "none":
            validity = nn.Dense(1, name="adv_layer")(x.reshape(B, -1))  # [B, 1]
        else:
            T_ = x.shape[1]
            validity = nn.Dense(1, name="adv_layer")(x.reshape(B, T_, -1))[..., 0]
        return validity, h_list


class MultiWindowDiscriminator(nn.Module):
    time_lengths: Sequence[int] = (32, 64, 128)
    freq_length: int = 80
    hidden_size: int = 128
    norm_type: str = "bn"
    reduction: str = "stack"
    cond_size: int = 0

    @nn.compact
    def __call__(self, x, x_len, cond=None, start_frames_wins=None,
                 train: bool = False):
        """x: [B, T, 80]; x_len: [B] valid frames. Returns
        (validity, start_frames_wins, hiddens)."""
        B, T, F = x.shape
        validity = []
        hiddens = []
        starts_out = []
        if start_frames_wins is None:
            start_frames_wins = [None] * len(self.time_lengths)
        # static-shape equivalent of the reference's T_end < 0 skip
        # (multi_window_disc.py:138-141): if ANY window exceeds the padded
        # length, the whole discriminator abstains (validity None).
        if any(win > T for win in self.time_lengths):
            return None, starts_out, hiddens
        for i, win in enumerate(self.time_lengths):
            t_end = jnp.maximum(x_len.max() - win, 0)
            start = start_frames_wins[i]
            if start is None:
                u = jax.random.uniform(self.make_rng("disc"))
                start = jnp.floor(u * (t_end + 1).astype(jnp.float32)).astype(jnp.int32)
            starts_out.append(start)
            clip = jax.lax.dynamic_slice_in_dim(x, start, win, axis=1)  # [B, win, 80]
            c_clip = None
            if cond is not None and self.cond_size > 0:
                c_clip = jax.lax.dynamic_slice_in_dim(cond, start, win, axis=1)
                clip = nn.Dense(self.freq_length, name=f"mel_proj_{i}")(clip)
                clip = clip + nn.Dense(self.freq_length, name=f"cond_proj_{i}")(c_clip)
            v, hs = Discriminator2D(win, self.freq_length,
                                    hidden_size=self.hidden_size,
                                    norm_type=self.norm_type,
                                    reduction=self.reduction,
                                    name=f"disc_{i}")(clip[..., None], train=train)
            validity.append(v)
            hiddens.extend(hs)
        if self.reduction == "sum":
            validity = sum(validity)
        elif self.reduction == "stack":
            validity = jnp.stack([v[:, 0] for v in validity], -1)  # [B, W]
        else:
            validity = jnp.concatenate(validity, -1)
        return validity, starts_out, hiddens


class Discriminator(nn.Module):
    """Top-level wrapper (reference: multi_window_disc.py:154-199)."""
    time_lengths: Sequence[int] = (32, 64, 128)
    freq_length: int = 80
    hidden_size: int = 128
    norm_type: str = "bn"
    reduction: str = "stack"
    cond_size: int = 0
    uncond_disc: bool = True

    @nn.compact
    def __call__(self, x, cond=None, start_frames_wins=None, train: bool = False):
        if x.ndim == 4:
            x = x[:, 0]
        x_len = (jnp.abs(x).sum(-1) > 0).astype(jnp.int32).sum(-1)  # [B]
        ret = {"y": None, "y_c": None}
        if self.uncond_disc:
            ret["y"], start_frames_wins, ret["h"] = MultiWindowDiscriminator(
                self.time_lengths, self.freq_length, self.hidden_size,
                self.norm_type, self.reduction, name="discriminator")(
                x, x_len, start_frames_wins=start_frames_wins, train=train)
        if self.cond_size > 0 and cond is not None:
            ret["y_c"], start_frames_wins, ret["h_c"] = MultiWindowDiscriminator(
                self.time_lengths, self.freq_length, self.hidden_size,
                self.norm_type, self.reduction, cond_size=self.cond_size,
                name="cond_disc")(
                x, x_len, cond, start_frames_wins=start_frames_wins, train=train)
        ret["start_frames_wins"] = start_frames_wins
        return ret
