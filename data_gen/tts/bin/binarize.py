"""Reference-CLI compatibility shim: `python data_gen/tts/bin/binarize.py --config ...`
forwards to neuralsvb_tpu.data.binarize (reference: data_gen/tts/bin/binarize.py:9-20)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))))

from neuralsvb_tpu.hparams import set_hparams
from neuralsvb_tpu.data.binarize import binarize

if __name__ == "__main__":
    set_hparams()
    binarize()
