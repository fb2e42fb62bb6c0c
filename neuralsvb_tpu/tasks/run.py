"""CLI entry (layer L8): ``python -m neuralsvb_tpu.tasks.run --config <yaml>
--exp_name <name> [--infer] [--reset]`` (reference: tasks/run.py:5-15).

A compatibility shim at the repo root (``tasks/run.py``) keeps the exact
reference invocation working.
"""

import importlib

from ..hparams import hparams, set_hparams


def run_task():
    assert hparams["task_cls"] != "", "config must define task_cls"
    pkg, cls_name = hparams["task_cls"].rsplit(".", 1)
    task_cls = getattr(importlib.import_module(pkg), cls_name)
    task_cls.start()


if __name__ == "__main__":
    set_hparams()
    run_task()
