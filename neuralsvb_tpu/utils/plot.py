"""TensorBoard figures: mel heatmaps, f0 overlays, duration plots
(reference: utils/plot.py:11-64)."""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

LINE_COLORS = ["w", "r", "y", "cyan", "m", "b", "lime"]


def spec_to_figure(spec, vmin=None, vmax=None, title=""):
    spec = np.asarray(spec)
    fig = plt.figure(figsize=(12, 6))
    plt.title(title)
    plt.pcolor(spec.T, vmin=vmin, vmax=vmax)
    return fig


def spec_f0_to_figure(spec, f0s, figsize=None):
    spec = np.asarray(spec)
    max_y = spec.shape[1]
    f0s = {k: np.asarray(v) / 10 for k, v in f0s.items()}
    fig = plt.figure(figsize=(12, 6) if figsize is None else figsize)
    plt.pcolor(spec.T)
    for i, (k, f0) in enumerate(f0s.items()):
        plt.plot(f0.clip(0, max_y), label=k, c=LINE_COLORS[i % len(LINE_COLORS)],
                 linewidth=1, alpha=0.8)
    plt.legend()
    return fig


def f0_to_figure(f0_gt, f0_cwt=None, f0_pred=None):
    fig = plt.figure(figsize=(12, 8))
    plt.plot(np.asarray(f0_gt), color="r", label="gt")
    if f0_cwt is not None:
        plt.plot(np.asarray(f0_cwt), color="b", label="cwt")
    if f0_pred is not None:
        plt.plot(np.asarray(f0_pred), color="green", label="pred")
    plt.legend()
    return fig


def dur_to_figure(dur_gt, dur_pred, txt):
    dur_gt = np.cumsum(np.asarray(dur_gt)).astype(int)
    dur_pred = np.cumsum(np.asarray(dur_pred)).astype(int)
    fig = plt.figure(figsize=(12, 6))
    for i in range(len(dur_gt)):
        shift = (i % 8) + 1
        plt.text(dur_gt[i], shift * 4, txt[i])
        plt.text(dur_pred[i], 40 + shift * 4, txt[i])
        plt.vlines(dur_gt[i], 0, 40, colors="b")
        plt.vlines(dur_pred[i], 40, 80, colors="r")
    plt.xlim(0, max(dur_gt[-1], dur_pred[-1]))
    return fig


_TB_AUDIO_WARNED = [False]


def tb_add_audio(logger, tag, wav, step, sr):
    """tensorboardX's add_audio imports soundfile, which this environment
    doesn't carry; degrade to a one-time warning instead of crashing
    validation."""
    try:
        logger.add_audio(tag, wav, step, sr)
    except (ImportError, ModuleNotFoundError):
        if not _TB_AUDIO_WARNED[0]:
            _TB_AUDIO_WARNED[0] = True
            print("| WARNING: soundfile unavailable; skipping TB audio logging.")
