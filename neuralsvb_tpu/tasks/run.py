"""CLI entry (layer L8): ``python -m neuralsvb_tpu.tasks.run --config <yaml>
--exp_name <name> [--infer] [--reset]`` (reference: tasks/run.py:5-15).

A compatibility shim at the repo root (``tasks/run.py``) keeps the exact
reference invocation working.
"""

import importlib
import os
import shutil

from ..hparams import hparams, set_hparams


def _save_codes():
    """Snapshot source dirs into the work dir (reference: base_task.py:342-349)."""
    dirs = hparams.get("save_codes") or []
    if not dirs or not hparams.get("work_dir"):
        return
    import time
    dst_root = os.path.join(hparams["work_dir"], "codes",
                            time.strftime("%Y%m%d%H%M%S"))
    for d in dirs:
        if os.path.isdir(d):
            shutil.copytree(d, os.path.join(dst_root, os.path.basename(d)),
                            ignore=shutil.ignore_patterns("__pycache__", "*.pyc"))
    print(f"| Saved codes to {dst_root}")


def run_task():
    assert hparams["task_cls"] != "", "config must define task_cls"
    if os.environ.get("NSVB_MULTIHOST") == "1":
        # multi-host SPMD: one process per host, all chips in one mesh
        # (SURVEY.md section 5.8; coordinator from JAX_COORDINATOR_ADDRESS etc.)
        import jax
        jax.distributed.initialize()
        print(f"| multihost: process {jax.process_index()}/{jax.process_count()},"
              f" {jax.device_count()} devices")
    if hparams.get("compute_dtype") == "bfloat16":
        # run matmuls/convs on the MXU in bf16 while keeping f32 params
        import jax
        jax.config.update("jax_default_matmul_precision", "bfloat16")
    if hparams.get("debug"):
        # numeric sanitizer mode (SURVEY.md section 5.2): fail fast on NaNs
        import jax
        jax.config.update("jax_debug_nans", True)
        print("| debug: jax_debug_nans enabled")
    if not hparams.get("infer"):
        _save_codes()
    pkg, cls_name = hparams["task_cls"].rsplit(".", 1)
    task_cls = getattr(importlib.import_module(pkg), cls_name)
    task_cls.start()


def main():
    set_hparams()
    run_task()


if __name__ == "__main__":
    main()
