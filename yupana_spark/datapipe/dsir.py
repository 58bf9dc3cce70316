"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023).

Selects raw-corpus documents that look like a curated target corpus:

1. **Hashed n-gram features** — every word uni/bigram is hashed into one of
   ``n_buckets`` buckets (the paper uses 10k); a document is its bag of
   bucket hits.
2. **Bucket language models** — categorical distributions over buckets are
   fit on the target and on the raw corpus with add-``alpha`` smoothing.
3. **Importance weights** — per document, ``log w = sum_grams
   (log p_target[b] - log p_raw[b])``.
4. **Gumbel top-k resampling** — sampling k docs proportionally to ``w``
   without replacement is equivalent to taking the top k of ``log w + G_i``
   with ``G_i`` standard Gumbel noise (Vieira 2014).  The noise here is a
   *deterministic* Gumbel derived from ``md5(id)`` so the selected subset is
   reproducible across runs/engines (same posture as
   ``sample.deterministic_sample``).

Beyond the reference's surface (training-data pipeline extension;
BASELINE.json north star).  100 TB shape: the two LM fits are ONE
explode + groupBy(bucket) shuffle each over 8-byte bucket ids (gram text
never leaves the executor — buckets are hashed projections); the ratio
table is ``n_buckets`` rows, broadcast back; per-doc weights are one
groupBy(id) shuffle; selection is ``orderBy(key).limit(k)`` which Spark
executes as TakeOrderedAndProject (per-partition heaps + driver merge of
k-row heads), NOT a global sort.  Zero UDFs, zero driver-side fit.
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F

from .text import normalize_text, words

_U32 = 4294967296.0  # 2^32, the md5-prefix uniform denominator


def hashed_gram_buckets(col: Column, n_buckets: int = 4096,
                        bigrams: bool = True) -> Column:
    """array<long> of hashed word uni(+bi)gram bucket ids over the
    normalized text.  Bucket = first 24 md5 bits of the gram mod
    ``n_buckets`` — reproducible on any engine with md5 (the DuckDB oracle
    recomputes it verbatim)."""
    ws = words(normalize_text(col))
    grams = ws
    if bigrams:
        n = F.size(ws)
        bi = F.when(n >= 2, F.zip_with(
            F.slice(ws, 1, n - 1), F.slice(ws, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b))
        ).otherwise(F.array().cast("array<string>"))
        grams = F.concat(ws, bi)
    return F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g.cast("binary")), 1, 6),
                         16, 10).cast("long") % n_buckets)


def _exploded(df: DataFrame, text_col: str, id_col: Optional[str],
              n_buckets: int, bigrams: bool) -> DataFrame:
    cols = [F.col(id_col)] if id_col else []
    return df.select(
        *cols,
        F.explode(hashed_gram_buckets(F.col(text_col), n_buckets, bigrams))
        .alias("bucket"))


def dsir_log_ratio(target: DataFrame, raw: DataFrame, text_col: str = "text",
                   n_buckets: int = 4096, alpha: float = 0.5,
                   bigrams: bool = True) -> tuple[DataFrame, DataFrame]:
    """(ratio_table, totals): per-bucket ``lr = log p_target - log p_raw``
    under add-alpha smoothing, plus the single-row gram-total frame needed
    to price buckets unseen in either corpus.

    ``ratio_table`` covers every bucket seen in either corpus (full-outer
    of the two count frames); it has at most ``n_buckets`` rows and is
    broadcast by the consumers.  ``totals`` is a single-row aggregate frame
    (crossJoin-able under the audit's single-row rule).
    """
    tg = _exploded(target, text_col, None, n_buckets, bigrams)
    rg = _exploded(raw, text_col, None, n_buckets, bigrams)
    tc = tg.groupBy("bucket").agg(F.count("*").alias("c_t"))
    rc = rg.groupBy("bucket").agg(F.count("*").alias("c_r"))
    totals = (tg.agg(F.count("*").alias("n_t"))
              .crossJoin(rg.agg(F.count("*").alias("n_r"))))
    ab = F.lit(float(alpha) * n_buckets)
    a = F.lit(float(alpha))
    tbl = (rc.join(tc, "bucket", "full")
           .crossJoin(F.broadcast(totals))
           .select(
               "bucket",
               (F.log(F.coalesce(F.col("c_t"), F.lit(0)) + a)
                - F.log(F.col("n_t") + ab)
                - F.log(F.coalesce(F.col("c_r"), F.lit(0)) + a)
                + F.log(F.col("n_r") + ab)).alias("lr")))
    return tbl, totals


def dsir_log_weights(docs: DataFrame, target: DataFrame,
                     raw: Optional[DataFrame] = None,
                     text_col: str = "text", id_col: str = "doc_id",
                     n_buckets: int = 4096, alpha: float = 0.5,
                     bigrams: bool = True) -> DataFrame:
    """(id_col, logw, n_grams) per document with at least one gram.

    ``raw`` defaults to ``docs`` (score the corpus the raw LM was fit on).
    Documents whose normalized text yields zero grams carry no information
    for the estimator and are omitted — document the join back if full
    coverage is needed (same contract as ``dedup.duplicated_span_stats``).
    """
    raw = raw if raw is not None else docs
    tbl, totals = dsir_log_ratio(target, raw, text_col, n_buckets, alpha,
                                 bigrams)
    # unseen-bucket price: c_t = c_r = 0 under the same smoothing
    default_lr = F.log(F.col("n_t") + F.lit(float(alpha) * n_buckets)) * -1 \
        + F.log(F.col("n_r") + F.lit(float(alpha) * n_buckets))
    grams = _exploded(docs, text_col, id_col, n_buckets, bigrams)
    return (grams.join(F.broadcast(tbl), "bucket", "left")
            .crossJoin(F.broadcast(totals))
            .withColumn("lr", F.coalesce(F.col("lr"), default_lr))
            .groupBy(id_col)
            .agg(F.sum("lr").alias("logw"),
                 F.count("*").alias("n_grams")))


def gumbel_key(id_col: Column, logw: Column) -> Column:
    """Deterministic Gumbel-perturbed key: ``logw - ln(-ln(u))`` with
    ``u = (md5_32(id) + 0.5) / 2^32`` — u is in (0,1) exclusive, so the
    double ln never hits an infinity."""
    u = ((F.conv(F.substring(F.md5(id_col.cast("string").cast("binary")),
                             1, 8), 16, 10).cast("double") + F.lit(0.5))
         / F.lit(_U32))
    return logw - F.log(-F.log(u))


def dsir_select(docs: DataFrame, target: DataFrame, k: int,
                raw: Optional[DataFrame] = None, text_col: str = "text",
                id_col: str = "doc_id", n_buckets: int = 4096,
                alpha: float = 0.5, bigrams: bool = True,
                keep_cols: Optional[list] = None) -> DataFrame:
    """The k documents Gumbel-top-k resampling selects (id_col, logw,
    plus ``keep_cols`` carried from ``docs``).

    ``orderBy(key desc, id).limit(k)`` lowers to TakeOrderedAndProject —
    every partition keeps a k-row heap and only k-row heads reach the
    driver, so the selection is safe at any corpus size.  Sampling without
    replacement proportional-to-w == top-k by Gumbel-perturbed log weight
    (Vieira 2014); determinism comes from the md5-derived noise.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = dsir_log_weights(docs, target, raw, text_col, id_col, n_buckets,
                         alpha, bigrams)
    if keep_cols:
        w = w.join(docs.select(id_col, *keep_cols), id_col, "left")
    key = gumbel_key(F.col(id_col), F.col("logw"))
    return (w.withColumn("__key", key)
            .orderBy(F.col("__key").desc(), F.col(id_col))
            .limit(k)
            .drop("__key"))


def expected_gram_count(text: str, bigrams: bool = True) -> int:
    """Driver-side mirror of the gram count for tests: grams of the
    normalized text (uni + adjacent bigrams)."""
    toks = [t for t in
            " ".join("".join(ch for ch in text.lower()
                             if ch.isalnum() or ch.isspace()).split())
            .split(" ") if t]
    n = len(toks)
    return n + (max(n - 1, 0) if bigrams else 0)


def py_bucket(gram: str, n_buckets: int = 4096) -> int:
    """Driver-side mirror of the bucket hash for tests."""
    import hashlib

    return int(hashlib.md5(gram.encode()).hexdigest()[:6], 16) % n_buckets


def py_gumbel(doc_id, logw: float) -> float:
    """Driver-side mirror of gumbel_key for tests."""
    import hashlib

    u = (int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
         + 0.5) / _U32
    return logw - math.log(-math.log(u))
