"""LR schedules (reference: utils/common_schedulers.py:4-51 + torch StepLR).

Written with jnp so a schedule can be evaluated either eagerly (host float
per step) or with a traced ``step`` inside a jitted multi-step training
cycle (``lax.scan`` over steps, tasks/svb_vae_task.py training_cycle).
"""

from __future__ import annotations

import jax.numpy as jnp


def rsqrt_schedule(lr: float, warmup_updates: int, hidden_size: int):
    """warmup * rsqrt-decay * hidden^-0.5, floored at 1e-7."""
    def fn(step):
        step = jnp.maximum(jnp.asarray(step, jnp.float32), 0.0)
        warmup = jnp.minimum(step / warmup_updates, 1.0)
        rsqrt_decay = jnp.maximum(float(warmup_updates), step) ** -0.5
        return jnp.maximum(lr * warmup * rsqrt_decay * hidden_size ** -0.5,
                           1e-7)
    return fn


def none_schedule(lr: float):
    return lambda step: lr


def step_lr_schedule(lr: float, step_size: int, gamma: float):
    """torch StepLR: lr * gamma ** (step // step_size)."""
    def fn(step):
        step = jnp.maximum(jnp.asarray(step, jnp.int32), 0)
        return lr * gamma ** (step // step_size).astype(jnp.float32)
    return fn
