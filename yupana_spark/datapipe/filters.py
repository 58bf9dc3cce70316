"""Corpus filtering: the composed keep/drop decision of a training-data
pipeline (C4 / Gopher / RefinedWeb all end in this shape: per-document
rules -> keep flag + the reasons it was dropped).

Composition of the repo's own primitives — quality score, language ID,
exact-dup detection, benchmark decontamination — into ONE relational
decision: (id, keep, reasons).  Reasons are a SORTED comma-joined string so
the output is hash-stable and a SQL oracle can recompute it exactly.

100 TB shape: quality + language are row-local JVM expressions on the one
scan; the dup flag is the exact-dedup fingerprint window (one shuffle on
32-byte md5); decontamination is the broadcast n-gram semi-join.  Nothing
collects; the decision column composes with any downstream write.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F


def keep_reasons(cont: Column, is_dup: Column, lang_bad: Column,
                 quality: Column, min_quality: float,
                 model_low: Optional[Column] = None,
                 ppx_high: Optional[Column] = None) -> Column:
    """The ONE definition of the decision labels and their (alphabetical)
    order — shared by the batch and streaming operators so their
    pinned-equal decisions cannot drift apart.  ``model_low`` (optional)
    is the model-based rule's fire flag — 'model_quality' sorts after
    'low_quality'; ``ppx_high`` (optional) is the CCNet perplexity
    rule's — 'perplexity' sorts last, keeping the order alphabetical."""
    return F.array_join(
        F.filter(
            F.array(
                F.when(cont, F.lit("contaminated")),
                F.when(is_dup, F.lit("duplicate")),
                F.when(lang_bad, F.lit("lang")),
                F.when(quality < F.lit(float(min_quality)),
                       F.lit("low_quality")),
                F.when(model_low if model_low is not None else F.lit(False),
                       F.lit("model_quality")),
                F.when(ppx_high if ppx_high is not None else F.lit(False),
                       F.lit("perplexity")),
            ),
            lambda x: x.isNotNull()),
        ",")


def corpus_keep(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", min_quality: float = 0.7,
                langs: Optional[Sequence[str]] = ("en",),
                eval_docs: Optional[DataFrame] = None,
                lr_art=None, min_lr: float = 0.5,
                ppx_art=None, max_xent: float = 10.0) -> DataFrame:
    """(id, keep, reasons): keep iff NO rule fires; ``reasons`` lists the
    fired rules in fixed alphabetical order ('contaminated', 'duplicate',
    'lang', 'low_quality', 'model_quality', 'perplexity'), comma-joined
    ('' when kept).

    Rules (each optional):
    * quality_score < ``min_quality``          -> 'low_quality'
    * predicted language not in ``langs``      -> 'lang'  (None disables)
    * exact-duplicate (non-min-id fingerprint) -> 'duplicate'
    * shares a word-8-gram with ``eval_docs``  -> 'contaminated'
    * classifier score < ``min_lr``            -> 'model_quality'
      (``lr_art`` = a ``classify.quality_lr_fit`` artifact; the score is
      pure JVM arithmetic riding the same scan — the FineWeb-Edu/DCLM
      model-filter composed with the rule filters)
    * bigram-LM cross-entropy > ``max_xent``   -> 'perplexity'
      (``ppx_art`` = a ``ppx.bigram_lm_fit`` artifact; the CCNet-style
      statistical filter — Wenzek et al. 2020 drop the high-perplexity
      tail of the crawl.  Unlike the row-local rules this one joins the
      per-doc score frame on id; docs with < 2 words carry no bigram
      evidence and never fire it)
    """
    from .dedup import exact_dedup
    from .text import contaminated_ids, lang_id, quality_score

    mq = F.lit(False)
    if lr_art is not None:
        from .classify import quality_lr_score

        mq = quality_lr_score(F.col(text_col), lr_art) < F.lit(min_lr)
    out = exact_dedup(df, text_col, id_col).select(
        F.col(id_col).alias("id"),
        F.col("is_duplicate"),
        quality_score(F.col(text_col)).alias("__q"),
        lang_id(F.col(text_col)).alias("__lang"),
        mq.alias("__mq"),
    )
    if eval_docs is not None:
        flags = (contaminated_ids(df, eval_docs, text_col, id_col)
                 .select(F.col(id_col).alias("id"))
                 .withColumn("__cont", F.lit(True)))
        out = (out.join(flags, "id", "left")
               .withColumn("__cont", F.coalesce(F.col("__cont"),
                                                F.lit(False))))
    else:
        out = out.withColumn("__cont", F.lit(False))
    if ppx_art is not None:
        from .ppx import bigram_xent_scores

        xs = bigram_xent_scores(df, ppx_art, text_col, id_col)
        out = (out.join(xs, "id", "left")
               .withColumn("__px",
                           F.coalesce(F.col("big_xent")
                                      > F.lit(float(max_xent)),
                                      F.lit(False)))
               .drop("big_xent"))
    else:
        out = out.withColumn("__px", F.lit(False))
    lang_bad = (F.lit(False) if langs is None
                else ~F.col("__lang").isin(*langs))
    reasons = keep_reasons(F.col("__cont"), F.col("is_duplicate"),
                           lang_bad, F.col("__q"), min_quality,
                           model_low=F.col("__mq"),
                           ppx_high=F.col("__px"))
    return out.select(
        "id",
        (F.length(reasons) == 0).alias("keep"),
        reasons.alias("reasons"))
