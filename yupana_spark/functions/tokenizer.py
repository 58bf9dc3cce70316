"""``tokens`` function: transliterate + light-stem item phrases.

Reference: yupana-utils/src/main/scala/org/yupana/utils/
  RussianTokenizer.scala:23-49 (split on non-letter/digit, lowercase,
  light-stem each word — Lucene's RussianLightStemmer algorithm),
  RussianTransliterator.scala (RU -> latin transliteration table).

The stemmer below implements the published Lucene ``RussianLightStemmer``
algorithm (org.apache.lucene.analysis.ru.RussianLightStemmer, public Apache-2.0
code): remove at most one of the known adjective/participle/verb/noun endings,
guarded by minimum stem length, then normalize doubled consonants and ``и``
endings.  English words get a minimal -s/-es strip so mixed-language item
names behave.

Implemented as a vectorized Pandas UDF (Arrow-batched) — the one place the
engine leaves the JVM (SURVEY.md §7.3 "custom: tokens/stemmer UDF").
"""

from __future__ import annotations

import re
from typing import List

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SPLIT_RE = re.compile(r"[^0-9a-zA-Zа-яА-ЯёЁ]+")

_VOWELS = set("аеиоуыэюя")


def _normalize(s: str) -> str:
    # collapse doubled trailing consonant, trailing 'и'/'ь' adjustments
    if len(s) > 3:
        if s.endswith("ь"):
            s = s[:-1]
        elif s.endswith("и") and len(s) > 4:
            s = s[:-1]
        if len(s) > 4 and s[-1] == s[-2]:
            s = s[:-1]
    return s


_ADJ_ENDINGS = [
    "ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие", "ые", "ое",
    "ей", "ий", "ый", "ой", "ем", "им", "ым", "ом", "их", "ых",
    "ую", "юю", "ая", "яя", "ою", "ею",
]
_NOUN_ENDINGS = [
    "иями", "ями", "ами", "иях", "ях", "ах", "ием", "ем", "ам", "ом",
    "ях", "ию", "ью", "ию", "ии", "ия", "ья", "я", "а", "е", "и",
    "й", "о", "у", "ы", "ю",
]


def stem_ru(word: str) -> str:
    """Light stemming: strip one known ending if the remaining stem is >= 3."""
    w = word
    for end in _ADJ_ENDINGS:
        if w.endswith(end) and len(w) - len(end) >= 3:
            return _normalize(w[: -len(end)])
    for end in _NOUN_ENDINGS:
        if w.endswith(end) and len(w) - len(end) >= 3:
            return _normalize(w[: -len(end)])
    return _normalize(w)


def stem_en(word: str) -> str:
    if len(word) > 4 and word.endswith("es"):
        return word[:-2]
    if len(word) > 3 and word.endswith("s") and not word.endswith("ss"):
        return word[:-1]
    return word


def _is_ru(word: str) -> bool:
    return any("а" <= ch <= "я" or ch in "ёЁ" for ch in word)


def stem(word: str) -> str:
    w = word.lower()
    return stem_ru(w) if _is_ru(w) else stem_en(w)


# RU -> latin transliteration (RussianTransliterator.scala table)
_TRANSLIT = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e", "ё": "e",
    "ж": "zh", "з": "z", "и": "i", "й": "j", "к": "k", "л": "l", "м": "m",
    "н": "n", "о": "o", "п": "p", "р": "r", "с": "s", "т": "t", "у": "u",
    "ф": "f", "х": "h", "ц": "c", "ч": "ch", "ш": "sh", "щ": "sch",
    "ъ": "", "ы": "y", "ь": "", "э": "e", "ю": "ju", "я": "ja",
}


def transliterate(s: str) -> str:
    return "".join(_TRANSLIT.get(ch, ch) for ch in s)


def tokenize(text: str) -> List[str]:
    """Split -> lowercase -> stem -> transliterate, drop empties."""
    if text is None:
        return []
    out = []
    for raw in _SPLIT_RE.split(text.lower()):
        if not raw:
            continue
        out.append(transliterate(stem(raw)))
    return out


@F.pandas_udf(T.ArrayType(T.StringType()))
def _tokens_udf(s: pd.Series) -> pd.Series:
    return s.map(tokenize)


@F.pandas_udf(T.ArrayType(T.StringType()))
def _tokens_arr_udf(s: pd.Series) -> pd.Series:
    def per_row(arr):
        if arr is None:
            return []
        out: List[str] = []
        for item in arr:
            out.extend(tokenize(item))
        return out

    return s.map(per_row)


_CUSTOM_UDFS: dict = {}


def tokens_column(col: Column, is_array: bool = False, fn=None) -> Column:
    """tokens() as a Column; ``fn`` overrides the tokenizer (Schema hook)."""
    if fn is None:
        return _tokens_arr_udf(col) if is_array else _tokens_udf(col)
    key = (id(fn), is_array)
    if key not in _CUSTOM_UDFS:
        if is_array:
            @F.pandas_udf(T.ArrayType(T.StringType()))
            def custom_arr(s: pd.Series) -> pd.Series:
                def per_row(arr):
                    out: List[str] = []
                    for item in arr or []:
                        out.extend(fn(item))
                    return out

                return s.map(per_row)

            _CUSTOM_UDFS[key] = custom_arr
        else:
            @F.pandas_udf(T.ArrayType(T.StringType()))
            def custom(s: pd.Series) -> pd.Series:
                return s.map(lambda x: [] if x is None else fn(x))

            _CUSTOM_UDFS[key] = custom
    return _CUSTOM_UDFS[key](col)
