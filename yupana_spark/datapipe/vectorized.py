"""Arrow-vectorized mirror of the Gopher repetition-signal folds (r15
experiment, judge r14 #6).

dp_text_stats' 10x profile shows ~2.8 s of residual wall in the
interpreted (CodegenFallback) higher-order-function folds that compute
the dup-word / dup-trigram / n-gram char-mass signals
(``text.repetition_stats`` + ``text._ngram_mass_fold``).  This module
computes the SAME four signals as ONE Arrow ``pandas_udf`` pass over the
staged word array — ``pd.factorize`` + flat numpy (no per-row Python in
the hot loops) — and returns RAW INTEGERS so the ratios and their
``round(x, 6)`` stay the exact JVM expressions they were: rounding
semantics are identical by construction, and the DuckDB oracle keeps
recomputing the published definitions.

Signal contracts mirrored exactly (pinned by
test_vectorized_signals_match_folds):

* ``n_uw``  — ``size(array_distinct(w))`` (distinct words);
* ``n_utg`` — ``size(array_distinct(word_shingles(w, 3)))``: windows are
  ' '-joins of 3-word slices, and sub-3-word docs have exactly ONE
  shingle (the join of all available words) — ' '-join is injective on
  whitespace-free tokens, so exact code triples are the same identity;
* ``bm2``   — ``_ngram_mass_fold(w, 2)['bm']``: count*mass of the
  most-frequent 2-gram, count ties resolved toward the larger mass,
  where mass = sum of word lengths + (n-1) separators;
* ``dm5``   — ``_ngram_mass_fold(w, 5)['dm']``: summed count*mass over
  5-grams occurring >= 2 times.

One deliberate deviation: the JVM fold hashes grams (xxhash64) while
this mirror uses EXACT identities (iterated pair-factorization), so the
mirror can only differ from the fold on a 64-bit hash collision — in
the fold's favor to report, never a new error source.

100 TB shape: a stateless per-batch map (ArrowEvalPython), no shuffle,
no driver state; parallelism = input partitions like every other
row-local signal.  Whether it actually beats whole-stage codegen is an
empirical question per deployment — tools/repfold_ab.py measures it
(numbers in docs/scale.md).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import LongType, StructField, StructType

SIGNAL_SCHEMA = StructType([
    StructField("n_uw", LongType()),
    StructField("n_utg", LongType()),
    StructField("bm2", LongType()),
    StructField("dm5", LongType()),
])


def _window_codes(codes: np.ndarray, n: int, card: int) -> tuple:
    """Exact identity codes for every length-``n`` window of the flat
    word-code array (cross-doc windows included — callers mask them):
    combine one position per step, re-factorizing with ``np.unique`` so
    the combination key stays bounded by card * vocab < 2^63.
    Returns (window_codes, cardinality)."""
    m = len(codes) - n + 1
    g = codes[:m].astype(np.int64)
    c = card
    for j in range(1, n):
        key = g * card + codes[j:j + m]
        uk, g = np.unique(key, return_inverse=True)
        c = len(uk)
    return g, c


def _per_doc_distinct(key_doc: np.ndarray, card: int, k: int,
                      g: np.ndarray) -> np.ndarray:
    uk = np.unique(key_doc * card + g)
    return np.bincount(uk // card, minlength=k).astype(np.int64)


def _mass_fold(codes, doc, clen, n, k, card):
    """Per-doc (best-gram count*mass with count-then-mass tie break,
    duplicated-gram summed count*mass) over length-``n`` word windows —
    the exact ``text._ngram_mass_fold`` outputs."""
    bm = np.zeros(k, np.int64)
    dm = np.zeros(k, np.int64)
    m = len(codes) - n + 1
    if m <= 0:
        return bm, dm
    g, c = _window_codes(codes, n, card)
    valid = doc[:m] == doc[n - 1:]
    if not valid.any():
        return bm, dm
    cs = np.concatenate(([0], np.cumsum(clen)))
    wmass = (cs[n:len(cs)] - cs[:m]) + (n - 1)
    g, wdoc, wmass = g[valid], doc[:m][valid], wmass[valid]
    kd, first, cnt = np.unique(wdoc * c + g, return_index=True,
                               return_counts=True)
    pdoc = (kd // c).astype(np.int64)
    pmass = wmass[first]
    mass_tot = cnt.astype(np.int64) * pmass
    dup = cnt >= 2
    if dup.any():
        np.add.at(dm, pdoc[dup], mass_tot[dup])
    # best gram per doc: count desc then mass desc — lexsort ascending,
    # take the LAST row of each doc run
    order = np.lexsort((mass_tot, cnt, pdoc))
    pdoc_s = pdoc[order]
    last = np.flatnonzero(np.r_[pdoc_s[1:] != pdoc_s[:-1], True])
    bm[pdoc_s[last]] = mass_tot[order][last]
    return bm, dm


def _signals_frame(w: pd.Series) -> pd.DataFrame:
    k = len(w)
    zeros = lambda: np.zeros(k, np.int64)
    out = {"n_uw": zeros(), "n_utg": zeros(), "bm2": zeros(),
           "dm5": zeros()}
    lens = np.fromiter((0 if ws is None else len(ws) for ws in w),
                       np.int64, k)
    total = int(lens.sum())
    if total == 0:
        # an all-empty batch still has ONE distinct shingle per doc
        # (word_shingles' greatest floor joins the empty slice to '')
        out["n_utg"] = np.ones(k, np.int64)
        return pd.DataFrame(out)
    flat = np.empty(total, dtype=object)
    pos = 0
    for ws in w:
        if ws is None or len(ws) == 0:
            continue
        flat[pos:pos + len(ws)] = np.asarray(ws, dtype=object)
        pos += len(ws)
    codes, uniq = pd.factorize(flat)
    card = len(uniq)
    wlen = np.fromiter((len(s) for s in uniq), np.int64, card)
    clen = wlen[codes]
    doc = np.repeat(np.arange(k), lens)
    out["n_uw"] = _per_doc_distinct(doc, card, k, codes)
    # trigram distinct: full windows for >=3-word docs; sub-3-word docs
    # (INCLUDING empty/NULL arrays, whose lone shingle is '') have
    # exactly one distinct shingle (word_shingles' greatest(n-2, 1)
    # floor over the slice join)
    m3 = total - 2
    if m3 > 0:
        g3, c3 = _window_codes(codes, 3, card)
        valid = doc[:m3] == doc[2:]
        n3 = _per_doc_distinct(doc[:m3][valid], c3, k, g3[valid])
    else:
        n3 = zeros()
    out["n_utg"] = np.where(lens < 3, 1, n3)
    out["bm2"], _ = _mass_fold(codes, doc, clen, 2, k, card)
    _, out["dm5"] = _mass_fold(codes, doc, clen, 5, k, card)
    return pd.DataFrame(out)


@pandas_udf(SIGNAL_SCHEMA)
def rep_ngram_signals(w: pd.Series) -> pd.DataFrame:
    return _signals_frame(w)


def rep_ngram_cols(sig: Column, w: Column, nc: Column) -> dict:
    """The dp_text_stats signal columns derived JVM-side from a STAGED
    ``rep_ngram_signals(w)`` struct column ``sig`` — same expressions,
    same ``round(x, 6)``, same sub-n guards as the fold versions, so
    swapping the integer source cannot move a rounded value."""
    # NULL word arrays: size() = -1, which the fold's guards collapse to
    # the all-zero signals — clamp to 0 so the mirror lands on the same
    # values ((0-0)/1, (1-1)/1, otherwise-0.0 branches)
    nw = F.greatest(F.size(w), F.lit(0))
    safe_w = F.greatest(nw, F.lit(1))
    n_t = F.greatest(nw - F.lit(2), F.lit(1))
    safe_nc = F.greatest(nc, F.lit(1))
    return {
        "dup_word_ratio": F.round((nw - sig["n_uw"]) / safe_w, 6),
        "dup_trigram_ratio": F.round((n_t - sig["n_utg"]) / n_t, 6),
        "top2_char_frac": F.when(
            nw >= 2, F.round(F.least(F.lit(1.0), sig["bm2"] / safe_nc), 6)
        ).otherwise(F.lit(0.0)),
        "dup5_char_frac": F.when(
            nw >= 5, F.round(F.least(F.lit(1.0), sig["dm5"] / safe_nc), 6)
        ).otherwise(F.lit(0.0)),
    }
