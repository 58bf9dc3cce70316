"""Lexical retrieval: Okapi BM25 scoring and top-k over a document corpus.

The lexical complement to ``simsearch``'s embedding ANN — the classic
sparse-retrieval operator a training-data pipeline uses for query-based
corpus audits, targeted decontamination ("which training docs could have
answered this benchmark question?") and quality retrieval.  Robertson et
al.'s Okapi BM25 (public; the idf form below is the widely-published
Lucene variant, ``ln(1 + (N - df + 0.5)/(df + 0.5))``, which keeps idf
positive for terms in more than half the corpus).

Scale shape (the whole point): the QUERY is tiny and the corpus is not,
so the per-term work is filtered to the query's terms BEFORE anything
leaves the scan — the explode emits only query-term occurrences (at most
``|q|`` per document, not ``dl``), one groupBy(id, term) shuffle builds
term frequencies, the ≤``|q|``-row document-frequency side rides the
same frame, and the two corpus constants (N, avgdl) come from one
single-row aggregate (crossJoin over a single-row frame is the audited
house pattern).  No UDF, no window, no driver collect.

Tokenization is ``text.normalize_text`` + ``text.words`` — identical to
every other corpus operator here, so BM25 scores are consistent with the
dedup/decontamination view of a "term"; the query string is tokenized
driver-side with the exact Python mirror of that normalization.
"""

from __future__ import annotations

import math
import re
from typing import Optional

from pyspark.sql import DataFrame, functions as F

from .text import norm_words as _norm_words_col


def norm_words(text) -> list:
    """THE driver-side Python mirror of ``words(normalize_text(...))``:
    lowercase, strip non-alnum, collapse whitespace, split, drop empties
    (None -> []).  Single shared copy — ``tokenize_query`` and every
    pure-Python differential reference (``py_bm25``, the exactsubstr
    fuzz oracle) build on it, so a change to the Spark-side
    normalization has exactly one mirror to update.

    ``re.ASCII`` on both passes because Java's ``\\s`` is ASCII-only
    while Python's is Unicode-aware (review r11): Spark REMOVES U+00A0
    and friends via ``[^a-z0-9\\s]`` ('foo\\u00a0bar' -> 'foobar'),
    and an un-flagged Python mirror would split on them instead."""
    t = (text or "").lower()
    t = re.sub(r"[^a-z0-9\s]", "", t, flags=re.ASCII)
    t = re.sub(r"\s+", " ", t, flags=re.ASCII).strip(" \t\n\r\f\v")
    return [w for w in t.split(" ") if w]


def _words_safe(col):
    """Staged word array with NULL text mapped to the EMPTY array —
    Spark's legacy ``size(NULL) = -1`` would otherwise poison length
    arithmetic (avgdl, word counts) with -1 sentinels.  Shares
    ``text.norm_words``'s token definition with the dedup staged scan
    (identity pinned by test_staging_expressions_identical)."""
    return F.coalesce(_norm_words_col(col),
                      F.array().cast("array<string>"))


def tokenize_query(query: str) -> list:
    """Driver-side tokenization of the (tiny) query string via
    :func:`norm_words`.  Duplicate query terms are dropped — BM25 scores
    each distinct term once (the standard bag-of-distinct-terms query
    form)."""
    out, seen = [], set()
    for w in norm_words(query):
        if w not in seen:
            seen.add(w)
            out.append(w)
    return out


def corpus_stats(df: DataFrame, text_col: str = "text") -> tuple:
    """(N, avgdl): the two corpus constants BM25 needs — document count
    and mean normalized-word document length.  ONE single-row aggregate
    collected driver-side (bounded, the `_fixture_count` posture): at
    any scale this is a fit-time fact of the corpus, computed once and
    bound into scoring plans as literals — cheaper per action than a
    broadcast single-row crossJoin (measured ~0.35 s/action for the
    py4j/broadcast round-trip) and it keeps the scoring plan pure
    equi-joins."""
    r = (df.select(F.size(_words_safe(F.col(text_col))).alias("__dl"))
         .agg(F.count("*").cast("double").alias("n"),
              F.avg("__dl").alias("avgdl")).first())
    return float(r["n"]), float(r["avgdl"] or 0.0)


def bm25_scores(df: DataFrame, query: str, text_col: str = "text",
                id_col: str = "doc_id", k1: float = 1.2,
                b: float = 0.75,
                stats: Optional[tuple] = None) -> DataFrame:
    """(id, bm25): Okapi BM25 relevance of EVERY document to ``query`` —
    full coverage (one row per input doc, 0.0 when no query term occurs),
    so the score can ride as a per-doc column next to the other corpus
    stats.  ``score = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))``
    with ``idf_t = ln(1 + (N − df_t + 0.5)/(df_t + 0.5))``; ``dl`` is the
    normalized-word count and ``avgdl``/``N``/``df_t`` are corpus-wide.

    Values are rounded to 6 decimals AFTER assembling the per-doc sum in
    doubles — the repo's cross-engine float discipline (every factor is
    a deterministic double any SQL engine reproduces bit-close).

    ``stats`` is a :func:`corpus_stats` tuple; pass a memoized/persisted
    one on hot paths (the fit-once posture) — omitted, it is computed
    here with one bounded single-row aggregate.  Either way the
    constants bind as plan LITERALS, keeping the scoring plan pure
    equi-joins (no single-row crossJoin, no nested-loop node)."""
    qts = tokenize_query(query)
    if not qts:
        raise ValueError("bm25_scores needs a query with at least one "
                         "alphanumeric term")
    staged = df.select(F.col(id_col).alias("id"),
                       _words_safe(F.col(text_col)).alias("__w"))
    staged = staged.withColumn("__dl", F.size("__w"))
    if stats is None:
        stats = corpus_stats(df, text_col)
    return _bm25_scored(staged, qts, stats, k1, b).select(
        "id", F.round("__raw", 6).alias("bm25"))


def _bm25_scored(staged, qts, stats, k1: float, b: float) -> DataFrame:
    """(id, __raw): the UNROUNDED per-doc BM25 sum over a staged
    (id, __w, __dl) frame — shared by ``bm25_scores`` (rounds for the
    cross-engine hash) and ``bm25_topk`` (filters real matches on the
    raw sum, which a 6-decimal round could flush to zero for
    corpus-universal terms; review r11)."""
    n_docs, avgdl = float(stats[0]), float(stats[1])
    qlit = F.array(*[F.lit(t) for t in qts])
    # emit ONLY query-term occurrences: ≤|q| distinct terms per doc leave
    # the scan, never the full token stream
    occ = staged.select(
        "id", "__dl",
        F.explode(F.filter(F.col("__w"),
                           lambda w: F.array_contains(qlit, w))).alias("t"))
    tf = occ.groupBy("id", "t").agg(F.count("*").alias("__tf"),
                                    F.first("__dl").alias("__dl"))
    dfreq = occ.select("id", "t").distinct().groupBy("t") \
        .agg(F.count("*").cast("double").alias("__df"))
    scored = (tf.join(dfreq, "t")
              .withColumn("__idf", F.log(
                  F.lit(1.0) + (F.lit(n_docs) - F.col("__df") + F.lit(0.5))
                  / (F.col("__df") + F.lit(0.5))))
              .withColumn("__s", F.col("__idf") * F.col("__tf")
                          * F.lit(float(k1 + 1.0))
                          / (F.col("__tf") + F.lit(float(k1))
                             * (F.lit(float(1.0 - b)) + F.lit(float(b))
                                * F.col("__dl") / F.lit(avgdl))))
              .groupBy("id").agg(F.sum("__s").alias("__bm")))
    return (staged.select("id")
            .join(scored, "id", "left")
            .select("id", F.coalesce(F.col("__bm"), F.lit(0.0))
                    .alias("__raw")))


def bm25_topk(df: DataFrame, query: str, k: int = 10,
              text_col: str = "text", id_col: str = "doc_id",
              k1: float = 1.2, b: float = 0.75,
              stats: Optional[tuple] = None) -> DataFrame:
    """Top-k documents by BM25 — TakeOrderedAndProject (no global sort
    materialization, no collect), deterministic tie-break on id; rows
    whose RAW score is 0 (no query term occurs) are excluded so `k`
    means `k` hits — the filter runs before rounding, so a genuine
    match whose tiny idf rounds to 0.000000 still ranks (review r11)."""
    qts = tokenize_query(query)
    if not qts:
        raise ValueError("bm25_topk needs a query with at least one "
                         "alphanumeric term")
    staged = (df.select(F.col(id_col).alias("id"),
                        _words_safe(F.col(text_col)).alias("__w"))
              .withColumn("__dl", F.size("__w")))
    raw = _bm25_scored(staged, qts,
                       stats if stats is not None
                       else corpus_stats(df, text_col), k1, b)
    return (raw.filter(F.col("__raw") > 0.0)
            .select("id", F.round("__raw", 6).alias("bm25"))
            .orderBy(F.col("bm25").desc(), F.col("id"))
            .limit(k))


def bm25_probe_fit(df: DataFrame, query: str,
                   text_col: str = "text") -> dict:
    """Fit-time artifact for ROW-LOCAL BM25 probing: the corpus
    constants plus every per-query-term document frequency, computed in
    ONE single-row aggregate over one corpus scan (df_t =
    Σ array_contains — no explode, no groupBy, no id column needed).
    Terms absent from the corpus keep their (maximal) idf — a fresh
    stream document may introduce them.

    The fit runs once per (corpus, query); scoring against it needs no
    corpus-side work at all (see :func:`bm25_score_col`), which is what
    makes the probe STREAMING-SAFE: an incoming document's score depends
    only on its own words and these frozen constants — exactly the CCNet
    posture of scoring a stream against reference-corpus artifacts."""
    qts = tokenize_query(query)
    if not qts:
        raise ValueError("bm25_probe_fit needs a query with at least one "
                         "alphanumeric term")
    staged = df.select(_words_safe(F.col(text_col)).alias("__w"))
    # ONE corpus scan, ONE single-row aggregate: N, avgdl and every
    # per-term document frequency together (df_t = Σ array_contains —
    # no explode, no groupBy; review r11: the fit previously scanned
    # the reference corpus twice)
    aggs = [F.count("*").cast("double").alias("__n"),
            F.avg(F.size("__w")).alias("__avgdl")]
    aggs += [F.sum(F.array_contains(F.col("__w"), t).cast("long"))
             .alias(f"__df{i}") for i, t in enumerate(qts)]
    r = staged.agg(*aggs).first()
    n, avgdl = float(r["__n"]), float(r["__avgdl"] or 0.0)
    if n == 0.0 or avgdl == 0.0:
        # bm25_score_col divides dl by this avgdl literal; 0.0 would
        # NULL every streamed score (ADVICE r11) — fail at fit time.
        raise ValueError(
            "bm25_probe_fit: reference corpus is empty or has no "
            f"tokenizable text (N={n:g}, avgdl={avgdl:g}); a usable "
            "probe needs at least one non-empty document")
    idf = {}
    for i, t in enumerate(qts):
        d = float(r[f"__df{i}"] or 0)
        idf[t] = math.log(1.0 + (n - d + 0.5) / (d + 0.5))
    return {"terms": qts, "idf": idf, "n": n, "avgdl": avgdl}


def bm25_score_col(word_array, probe: dict, k1: float = 1.2,
                   b: float = 0.75):
    """Row-local BM25 against a :func:`bm25_probe_fit` artifact — a pure
    Column expression (no join, no UDF, no state), so the SAME expression
    scores a batch frame and a structured stream identically.

    ``word_array`` must be a staged ``words(normalize_text(...))``
    column.  Per term: ``tf = size(filter(words, == t))`` with the
    fitted idf bound as a literal; the per-doc sum adds in fixed term
    order and rounds at 6 like :func:`bm25_scores`."""
    dl = F.size(word_array)
    total = F.lit(0.0)
    for t in probe["terms"]:
        tf = F.size(F.filter(word_array, lambda w: w == F.lit(t)))
        contrib = (F.lit(float(probe["idf"][t])) * tf
                   * F.lit(float(k1 + 1.0))
                   / (tf + F.lit(float(k1))
                      * (F.lit(float(1.0 - b)) + F.lit(float(b))
                         * dl / F.lit(float(probe["avgdl"])))))
        total = total + F.when(tf > 0, contrib).otherwise(F.lit(0.0))
    return F.round(total, 6)


def idf_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(t, df, idf): corpus document-frequency table over ALL distinct
    terms — the reusable ingest-time artifact for repeated BM25 probes
    (same train-once posture as the ANN index frames).  ONE lazy plan:
    the document count rides as a broadcast single-row frame crossed
    onto the bounded per-term counts (the dsir totals posture — r12;
    the old form fired a separate eager ``staged.count()`` JOB at plan-
    build time, an anti-pattern for an artifact builder a pipeline may
    compose lazily), plus one distinct-explode + groupBy(term) shuffle;
    pure math after."""
    staged = df.select(_words_safe(F.col(text_col)).alias("__w"))
    n1 = staged.agg(F.count("*").cast("double").alias("__n"))
    per_doc = staged.select(
        F.explode(F.array_distinct(F.col("__w"))).alias("t"))
    return (per_doc.groupBy("t").agg(F.count("*").alias("df"))
            .crossJoin(F.broadcast(n1))
            .withColumn("idf", F.round(F.log(
                F.lit(1.0) + (F.col("__n") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))), 6))
            .drop("__n"))


def py_bm25(docs, query: str, k1: float = 1.2, b: float = 0.75) -> dict:
    """Pure-Python reference implementation (test oracle): same
    tokenization, same Lucene-idf BM25, same 6-decimal rounding.
    ``docs`` is an iterable of (id, text)."""
    from decimal import ROUND_HALF_UP, Decimal

    def r6(x: float) -> float:
        # Spark's round() is BigDecimal.valueOf(double).setScale(6,
        # HALF_UP) — valueOf goes through Double.toString's SHORTEST
        # repr, so the mirror must too (Decimal(repr(x)), not the exact
        # binary Decimal(x): 0.1234565's exact expansion ends ...4999
        # and would round DOWN where Spark rounds up; review r11)
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                               ROUND_HALF_UP))

    qts = tokenize_query(query)
    ws = {i: norm_words(t) for i, t in docs}
    n = len(ws)
    avgdl = sum(len(w) for w in ws.values()) / max(n, 1)
    dfreq = {t: sum(1 for w in ws.values() if t in w) for t in qts}
    out = {}
    for i, w in ws.items():
        s = 0.0
        for t in qts:
            tf = w.count(t)
            if not tf or not dfreq[t]:
                continue
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += (idf * tf * (k1 + 1.0)
                  / (tf + k1 * (1.0 - b + b * len(w) / avgdl)))
        out[i] = r6(s)
    return out
