"""Text processors: raw text -> (phonemes, normalized text)
(reference: data_gen/tts/txt_processors/{en,zh,zh_g2pM}.py).

The environment carries no g2p_en/g2pM models, so the English processor uses
grapheme fallback when g2p is unavailable and the Chinese processor emits
per-character units; both keep the reference's output contract
(space-separated phones with '|' word boundaries).
"""

from __future__ import annotations

import re
from typing import List, Tuple

from ..utils.text_norm import normalize_en, normalize_zh

REGISTERED_TEXT_PROCESSORS = {}


def register_txt_processors(name):
    def wrap(cls):
        REGISTERED_TEXT_PROCESSORS[name] = cls
        return cls
    return wrap


def get_txt_processor_cls(name):
    return REGISTERED_TEXT_PROCESSORS[name]


class BaseTxtProcessor:
    @classmethod
    def process(cls, txt: str, pre_align_args=None) -> Tuple[List[str], str]:
        raise NotImplementedError


@register_txt_processors("en")
class TxtProcessorEn(BaseTxtProcessor):
    _g2p = None

    @classmethod
    def _get_g2p(cls):
        if cls._g2p is None:
            try:
                from g2p_en import G2p
                cls._g2p = G2p()
            except ImportError:
                cls._g2p = False
        return cls._g2p

    @classmethod
    def process(cls, txt, pre_align_args=None):
        txt = normalize_en(txt)
        g2p = cls._get_g2p()
        phs: List[str] = []
        for word in txt.split(" "):
            if not word:
                continue
            if g2p:
                phs += [p for p in g2p(word) if p.strip()]
            else:
                phs += list(word)  # grapheme fallback
            phs.append("|")
        if phs and phs[-1] == "|":
            phs.pop()
        return phs, txt


@register_txt_processors("zh")
class TxtProcessorZh(BaseTxtProcessor):
    @classmethod
    def process(cls, txt, pre_align_args=None):
        txt = normalize_zh(txt)
        phs: List[str] = []
        for ch in txt:
            if re.match(r"\s", ch):
                continue
            phs.append(ch)
            phs.append("|")
        if phs and phs[-1] == "|":
            phs.pop()
        return phs, txt
