"""LR schedules (reference: utils/common_schedulers.py:4-51 + torch StepLR)."""

from __future__ import annotations


def rsqrt_schedule(lr: float, warmup_updates: int, hidden_size: int):
    """warmup * rsqrt-decay * hidden^-0.5, floored at 1e-7."""
    def fn(step):
        step = max(int(step), 0)
        warmup = min(step / warmup_updates, 1.0)
        rsqrt_decay = max(warmup_updates, step) ** -0.5
        return max(lr * warmup * rsqrt_decay * hidden_size ** -0.5, 1e-7)
    return fn


def none_schedule(lr: float):
    return lambda step: lr


def step_lr_schedule(lr: float, step_size: int, gamma: float):
    """torch StepLR: lr * gamma ** (step // step_size)."""
    def fn(step):
        return lr * gamma ** (max(int(step), 0) // step_size)
    return fn
