"""Streaming BM25 probing: score an always-on document stream against a
FIXED query and frozen reference-corpus statistics.

The batch operator (``datapipe/retrieval.bm25_scores``) derives df/N/avgdl
from the corpus it scores; a stream has no corpus to derive from, so the
online form scores against a :func:`~..datapipe.retrieval.bm25_probe_fit`
artifact fitted on a reference corpus — the same artifact posture as the
streaming perplexity/decontamination rules (``streaming/filters.py``): fit
once, bind as literals, score row-locally.

Because the scorer is a pure Column expression (no join, no UDF, no
state), the streamed score of a document equals the batch row-local score
of the same document against the same probe BY CONSTRUCTION — and the
parity test additionally pins the row-local form against the relational
``bm25_scores`` on the probe's own corpus, closing the triangle.

Use case: incoming-crawl triage ("which documents in today's crawl are
relevant to this audit query?") without stopping the ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..datapipe.retrieval import _words_safe, bm25_score_col


def streaming_bm25_scores(stream: DataFrame, probe: dict,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """(id, bm25) per streamed document, scored row-locally against the
    fitted probe — stateless, append-mode-safe, rides the stream scan
    (NULL text scores 0 like an empty document).  The id column passes
    through UNCAST — string/uuid ids are as valid online as longs, and
    a cast would silently null them (review r11)."""
    staged = stream.withColumn("__w", _words_safe(F.col(text_col)))
    return staged.select(F.col(id_col).alias("id"),
                         bm25_score_col(F.col("__w"), probe).alias("bm25"))


def streaming_dsir_scores(stream: DataFrame, target: DataFrame,
                          raw: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id",
                          n_buckets: int = 4096, alpha: float = 0.5,
                          bigrams: bool = True,
                          cache_key: str = None, store=None,
                          store_token: str = None) -> DataFrame:
    """(id, logw, n_grams) per streamed document: DSIR log importance
    weights against bucket LMs fitted on STATIC ``target``/``raw``
    corpora — online data-selection triage ("does today's crawl look
    like the curated target?") without stopping the ingest.

    Same frozen-artifact posture as the BM25 probe: ``cache_key`` is
    REQUIRED so the fit is the train-once artifact
    (``dsir.dsir_ratio_fit`` — batch frames only; a stream cannot be
    fitted on), and scoring uses the ``row_local=True`` path — the
    bounded lr table folds into a literal weight array and ``logw``
    computes in-scan: no explode, no join, no groupBy, so the plan is
    stateless and append-mode-safe.  A replayed document's score equals
    the batch row-local score BY CONSTRUCTION (pure Column expression);
    the parity test pins streamed == batch anyway.  Zero-gram documents
    are omitted, the batch contract."""
    from ..datapipe.dsir import dsir_log_weights

    if cache_key is None:
        raise ValueError("streaming DSIR scoring requires cache_key: the "
                         "bucket-LM fit must be a train-once artifact "
                         "(a stream cannot be fitted on)")
    if target.isStreaming or raw.isStreaming:
        raise ValueError("target/raw must be BATCH frames — the bucket "
                         "LMs fit by explode+groupBy+collect, which a "
                         "streaming frame cannot execute (on a warm "
                         "artifact the fit is skipped, so the misuse "
                         "would otherwise surface only on cold stores)")
    return (dsir_log_weights(stream, target, raw, text_col, id_col,
                             n_buckets, alpha, bigrams,
                             cache_key=cache_key, store=store,
                             store_token=store_token, row_local=True)
            # the streaming decision-frame convention: the id column is
            # named 'id' (bm25 scores, dup flags, cap admissions alike)
            .withColumnRenamed(id_col, "id"))
