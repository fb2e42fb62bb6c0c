"""Checkpoint IO with the reference's retention/best semantics
(reference: utils/trainer.py:347-436, utils/ckpt_utils.py:8-69).

Format: one msgpack file (flax.serialization) per save named
``model_ckpt_steps_{N}.ckpt`` holding {epoch, global_step,
checkpoint_callback_best, state} where ``state`` is the full train-state
pytree. Atomic write via .part + os.replace; newest ``num_ckpt_keep`` kept;
optional ``model_ckpt_best.pt`` tracking min/max of the monitored metric.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Optional

import numpy as np
from flax import serialization


def get_all_ckpts(work_dir: str, steps=None):
    pattern = f"model_ckpt_steps_{steps if steps is not None else '*'}.ckpt"
    return sorted(glob.glob(os.path.join(work_dir, pattern)),
                  key=lambda x: -int(re.findall(r".*steps\_(\d+)\.ckpt", x)[0]))


def get_last_checkpoint(work_dir: str, steps=None):
    ckpts = get_all_ckpts(work_dir, steps)
    return ckpts[0] if ckpts else None


def save_checkpoint(state: Any, work_dir: str, global_step: int, epoch: int,
                    num_ckpt_keep: int = 3, best_val: Optional[float] = None,
                    is_best: bool = False) -> str:
    os.makedirs(work_dir, exist_ok=True)
    payload = {"epoch": epoch, "global_step": global_step,
               "checkpoint_callback_best": best_val, "state": state}
    path = os.path.join(work_dir, f"model_ckpt_steps_{global_step}.ckpt")
    tmp = path + ".part"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(
            serialization.to_state_dict(payload)))
    os.replace(tmp, path)
    for old in get_all_ckpts(work_dir)[num_ckpt_keep:]:
        os.remove(old)
        print(f"| Delete ckpt: {os.path.basename(old)}")
    if is_best:
        best_path = os.path.join(work_dir, "model_ckpt_best.pt")
        with open(path, "rb") as src, open(best_path + ".part", "wb") as dst:
            dst.write(src.read())
        os.replace(best_path + ".part", best_path)
    return path


def restore_checkpoint(state_template: Any, work_dir: str, steps=None):
    """Returns (state, global_step, epoch, best) or (template, 0, 0, None).
    ``steps`` pins a specific checkpoint (hparam resume_from_checkpoint)."""
    path = get_last_checkpoint(work_dir, steps)
    if path is None:
        return state_template, 0, 0, None
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())

    def lenient_merge(template, saved, prefix=""):
        """Take saved values where present; keep template (e.g. fresh
        optimizer state for converted external checkpoints) elsewhere."""
        if isinstance(saved, dict) and isinstance(
                serialization.to_state_dict(template), dict):
            tdict = serialization.to_state_dict(template)
            merged = {k: lenient_merge(tdict[k], saved[k], f"{prefix}/{k}")
                      if k in saved else tdict[k] for k in tdict}
            return serialization.from_state_dict(template, merged)
        return serialization.from_state_dict(template, saved)

    state = lenient_merge(state_template, raw.get("state", {}))
    print(f"| Restored ckpt: {path}")
    return (state, int(raw.get("global_step", 0)), int(raw.get("epoch", 0)),
            raw.get("checkpoint_callback_best"))


def load_ckpt_params(ckpt_path: str):
    """Load just the raw state dict of a ckpt file (cross-model loading,
    reference: utils/ckpt_utils.py:28-69)."""
    with open(ckpt_path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def load_sub_params(target_params, ckpt_dir_or_file: str, key_path=("state", "params")):
    """Extract a params subtree from a saved checkpoint, tolerating shape
    mismatches (dropped with a warning) — the reference's warm-start helper."""
    path = ckpt_dir_or_file
    if os.path.isdir(path):
        path = get_last_checkpoint(path)
    if path is None or not os.path.exists(path):
        print(f"| WARNING: no checkpoint at {ckpt_dir_or_file}; keeping init.")
        return target_params
    raw = load_ckpt_params(path)
    node = raw
    for k in key_path:
        if k in node:
            node = node[k]
    def merge(tgt, src, prefix=""):
        if not isinstance(tgt, dict):
            if src is None:
                return tgt
            src = np.asarray(src)
            if src.shape != np.asarray(tgt).shape:
                print(f"| skip mismatched {prefix}: {src.shape} vs {np.shape(tgt)}")
                return tgt
            return src
        return {k: merge(v, (src or {}).get(k), f"{prefix}/{k}")
                for k, v in tgt.items()}
    return merge(serialization.to_state_dict(target_params), node)
