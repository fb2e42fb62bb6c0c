"""Binarize CLI: ``python -m neuralsvb_tpu.data.binarize --config <yaml>``
(reference: data_gen/tts/bin/binarize.py:9-20)."""

import importlib

from ..hparams import hparams, set_hparams


def binarize():
    binarizer_cls = hparams["binarizer_cls"]
    pkg, cls_name = binarizer_cls.rsplit(".", 1)
    cls = getattr(importlib.import_module(pkg), cls_name)
    print("| Binarizer:", cls)
    cls().process()


def main():
    set_hparams()
    binarize()


if __name__ == "__main__":
    main()
