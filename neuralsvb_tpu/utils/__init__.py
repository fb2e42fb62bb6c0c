"""Shared host-side utilities (layer L1): text encoding, plotting,
profiling, metrics."""

import numpy as _np


def num_params(params, print_out: bool = True, model_name: str = "model"):
    """Trainable parameter count in millions
    (reference: utils/__init__.py:267-277 print_arch/num_params)."""
    import jax
    n = sum(_np.prod(x.shape) for x in jax.tree_util.tree_leaves(params)
            if hasattr(x, "shape"))
    if print_out:
        print(f"| {model_name} Trainable Parameters: {n / 1e6:.3f}M")
    return n


def tensors_to_np(d):
    """Device/JAX leaves -> numpy (reference: utils tensors_to_np)."""
    import jax
    return jax.tree_util.tree_map(
        lambda x: _np.asarray(x) if hasattr(x, "shape") else x, d)
