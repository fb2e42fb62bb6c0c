"""Text normalization for the text-label pipeline
(reference: utils/text_norm.py, 797 LoC of zh digit/punct rules +
data_gen/tts/txt_processors/en.py).

This is a pragmatic subset: English number expansion, abbreviation/punctuation
cleanup, and Chinese digit verbalization — enough to rebuild vocabularies from
the PopBuTFy text labels. The exotic zh cases (dates, fractions, idioms) are
out of scope for parity (the SVB path never reads text at train time)."""

from __future__ import annotations

import re

_EN_ABBREV = [(re.compile(rf"\b{k}\.", re.IGNORECASE), v) for k, v in [
    ("mrs", "missis"), ("mr", "mister"), ("dr", "doctor"), ("st", "saint"),
    ("co", "company"), ("jr", "junior"), ("gen", "general"), ("drs", "doctors"),
    ("rev", "reverend"), ("lt", "lieutenant"), ("hon", "honorable"),
    ("sgt", "sergeant"), ("capt", "captain"), ("esq", "esquire"),
    ("ltd", "limited"), ("col", "colonel"), ("ft", "fort"),
]]

_UNITS = ["", "one", "two", "three", "four", "five", "six", "seven", "eight",
          "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
          "sixteen", "seventeen", "eighteen", "nineteen"]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
         "eighty", "ninety"]


def _num_to_words(n: int) -> str:
    if n < 0:
        return "minus " + _num_to_words(-n)
    if n < 20:
        return _UNITS[n] or "zero"
    if n < 100:
        t, u = divmod(n, 10)
        return _TENS[t] + (f" {_UNITS[u]}" if u else "")
    if n < 1000:
        h, r = divmod(n, 100)
        return f"{_UNITS[h]} hundred" + (f" {_num_to_words(r)}" if r else "")
    for div, name in [(10 ** 9, "billion"), (10 ** 6, "million"), (1000, "thousand")]:
        if n >= div:
            q, r = divmod(n, div)
            return f"{_num_to_words(q)} {name}" + (f" {_num_to_words(r)}" if r else "")
    return str(n)


def expand_numbers_en(text: str) -> str:
    return re.sub(r"\d+", lambda m: _num_to_words(int(m.group())), text)


def normalize_en(text: str) -> str:
    text = text.lower()
    for pat, rep in _EN_ABBREV:
        text = pat.sub(rep, text)
    text = expand_numbers_en(text)
    text = re.sub(r"[\"()\[\]{}<>]", " ", text)
    text = re.sub(r"[;:]", ",", text)
    text = re.sub(r"\s+", " ", text).strip()
    return text


_ZH_DIGITS = "零一二三四五六七八九"


def _zh_number(n: int) -> str:
    if n < 10:
        return _ZH_DIGITS[n]
    if n < 20:
        return "十" + (_ZH_DIGITS[n % 10] if n % 10 else "")
    if n < 100:
        t, u = divmod(n, 10)
        return _ZH_DIGITS[t] + "十" + (_ZH_DIGITS[u] if u else "")
    return "".join(_ZH_DIGITS[int(c)] for c in str(n))


def normalize_zh(text: str) -> str:
    text = re.sub(r"\d+", lambda m: _zh_number(int(m.group())), text)
    text = re.sub(r"[，、]", ",", text)
    text = re.sub(r"[。！？]", ".", text)
    return text.strip()


class NormalizeText:
    """Dispatch by language (reference: txt_processors registry)."""

    @staticmethod
    def __call__(text: str, lang: str = "en") -> str:
        return normalize_en(text) if lang == "en" else normalize_zh(text)
