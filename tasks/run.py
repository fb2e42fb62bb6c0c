"""Reference-CLI compatibility shim: `python tasks/run.py --config ... --exp_name ...`
forwards to neuralsvb_tpu.tasks.run (reference: tasks/run.py:5-15)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neuralsvb_tpu.hparams import set_hparams
from neuralsvb_tpu.tasks.run import run_task

if __name__ == "__main__":
    set_hparams()
    run_task()
