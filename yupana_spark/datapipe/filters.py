"""Corpus filtering: the composed keep/drop decision of a training-data
pipeline (C4 / Gopher / RefinedWeb all end in this shape: per-document
rules -> keep flag + the reasons it was dropped).

Composition of the repo's own primitives — quality score, language ID,
exact-dup detection, benchmark decontamination — into ONE relational
decision: (id, keep, reasons).  Reasons are a SORTED comma-joined string so
the output is hash-stable and a SQL oracle can recompute it exactly.

100 TB shape: quality + language are row-local JVM expressions on the one
scan; the dup flag is the exact-dedup fingerprint min-id aggregate + join
(one shuffle on 32-byte md5, skew-splittable); decontamination is the
broadcast n-gram semi-join, or a caller-precomputed flag frame.  Nothing
collects; the decision column composes with any downstream write.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F


def keep_reasons(cont: Column, is_dup: Column, lang_bad: Column,
                 quality: Column, min_quality: float,
                 model_low: Optional[Column] = None,
                 ppx_high: Optional[Column] = None,
                 rep_high: Optional[Column] = None,
                 c4_bad: Optional[Column] = None) -> Column:
    """The ONE definition of the decision labels and their (alphabetical)
    order — shared by the batch and streaming operators so their
    pinned-equal decisions cannot drift apart.  ``model_low`` (optional)
    is the model-based rule's fire flag — 'model_quality' sorts after
    'low_quality'; ``ppx_high`` (optional) is the CCNet perplexity
    rule's; ``rep_high`` (optional) is the Gopher repetition/shape
    rule's — 'repetition' sorts last; ``c4_bad`` (optional) is the C4
    page rule's — 'c4' sorts first.  The order stays alphabetical."""
    return F.array_join(
        F.filter(
            F.array(
                F.when(c4_bad if c4_bad is not None else F.lit(False),
                       F.lit("c4")),
                F.when(cont, F.lit("contaminated")),
                F.when(is_dup, F.lit("duplicate")),
                F.when(lang_bad, F.lit("lang")),
                F.when(quality < F.lit(float(min_quality)),
                       F.lit("low_quality")),
                F.when(model_low if model_low is not None else F.lit(False),
                       F.lit("model_quality")),
                F.when(ppx_high if ppx_high is not None else F.lit(False),
                       F.lit("perplexity")),
                F.when(rep_high if rep_high is not None else F.lit(False),
                       F.lit("repetition")),
            ),
            lambda x: x.isNotNull()),
        ",")


#: The Gopher repetition/shape rule's default bars (Rae et al. 2021
#: appendix A1.1 for symbol/bullet/ellipsis; in-house analogues for the
#: duplicate word/trigram family) — the ONE definition shared by
#: ``repetition_flag``'s keyword defaults AND dp_text_stats' in-plan
#: decomposition over staged columns (ADVICE r14: the decomposition
#: duplicated these as literals, so a future default change would have
#: silently diverged the bundle from the operator with the oracle still
#: green; sharing the constants makes the pair move together, and the
#: hash-strict oracle — which recomputes the rule arithmetically — then
#: flags any change loudly).
REP_MAX_DUP_WORD = 0.3
REP_MAX_DUP_TRIGRAM = 0.2
REP_MAX_SYMBOL_WORD = 0.1
REP_MAX_BULLET_LINE = 0.9
REP_MAX_ELLIPSIS_LINE = 0.3


def repetition_flag(text: Column, word_array: Optional[Column] = None,
                    max_dup_word: float = REP_MAX_DUP_WORD,
                    max_dup_trigram: float = REP_MAX_DUP_TRIGRAM,
                    max_symbol_word: float = REP_MAX_SYMBOL_WORD,
                    max_bullet_line: float = REP_MAX_BULLET_LINE,
                    max_ellipsis_line: float = REP_MAX_ELLIPSIS_LINE) -> Column:
    """Row-local Gopher repetition/shape rule (Rae et al. 2021 A1.1):
    fires when ANY signal exceeds its bar.  ``symbol``/``bullet``/
    ``ellipsis`` bars are the paper's published thresholds (0.1 / 0.9 /
    0.3); the duplicate word/trigram bars are in-house analogues of the
    paper's duplicate-n-gram family (``text.ngram_char_frac``'s top/dup
    char-mass forms — row-local folds since r12, so composable on a
    stream too; these simpler fractions catch the same degenerate text
    and remain the oracled rule).

    Entirely row-local array/length expressions: identical in batch and
    streaming.  Pass a staged ``word_array`` on hot paths (the trigram
    lambda's per-element recomputation caveat, see
    ``text.repetition_stats``)."""
    from .text import (line_shape_stats, repetition_stats,
                       symbol_word_ratio, words)

    w = word_array if word_array is not None else words(F.lower(text))
    rep = repetition_stats(w, as_words=True)
    ls = line_shape_stats(text)
    return ((rep["dup_word_ratio"] > F.lit(float(max_dup_word)))
            | (rep["dup_trigram_ratio"] > F.lit(float(max_dup_trigram)))
            | (symbol_word_ratio(text, word_array=w)
               > F.lit(float(max_symbol_word)))
            | (ls["bullet_line_ratio"] > F.lit(float(max_bullet_line)))
            | (ls["ellipsis_line_ratio"] > F.lit(float(max_ellipsis_line))))


def corpus_keep(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", min_quality: float = 0.7,
                langs: Optional[Sequence[str]] = ("en",),
                eval_docs: Optional[DataFrame] = None,
                lr_art=None, min_lr: float = 0.5,
                ppx_art=None, max_xent: float = 10.0,
                rep_rule: bool = False,
                c4_rule: bool = False,
                contaminated_flags: Optional[DataFrame] = None,
                dup_flags: Optional[DataFrame] = None) -> DataFrame:
    """(id, keep, reasons): keep iff NO rule fires; ``reasons`` lists the
    fired rules in fixed alphabetical order ('c4', 'contaminated',
    'duplicate', 'lang', 'low_quality', 'model_quality', 'perplexity',
    'repetition'), comma-joined ('' when kept).

    Rules (each optional):
    * quality_score < ``min_quality``          -> 'low_quality'
    * predicted language not in ``langs``      -> 'lang'  (None disables)
    * exact-duplicate (non-min-id fingerprint) -> 'duplicate'
      (or pass ``dup_flags`` — a precomputed (id, is_duplicate) frame,
      e.g. from a memoized ingest-time fingerprint index — to skip the
      md5 fingerprint pass here; absent ids default to not-duplicate)
    * shares a word-8-gram with ``eval_docs``  -> 'contaminated'
      (or pass ``contaminated_flags`` — a precomputed one-``id``-column
      frame of contaminated docs, e.g. ``decontaminate_cut``'s
      ``contamination_frac > 0`` rows — to reuse a gram explode the
      pipeline already pays for instead of re-deriving it here)
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
    * Gopher repetition/shape rule fires       -> 'repetition'
      (``rep_rule=True``; row-local ``repetition_flag`` at its
      published default bars — custom bars compose the flag directly)
    * C4 page rule fires                        -> 'c4'
      (``c4_rule=True``; ``NOT text.c4_rules(...)["c4_keep"]`` at the
      paper's defaults — < 3 sentences in the cleaned lines, a curly
      brace, or 'lorem ipsum'; row-local like the Gopher rule)
    """
    from .dedup import exact_dedup
    from .text import contaminated_ids, lang_id, quality_score

    mq = F.lit(False)
    if lr_art is not None:
        from .classify import quality_lr_score

        mq = quality_lr_score(F.col(text_col), lr_art) < F.lit(min_lr)
    # staged word array: repetition_flag's trigram lambda would otherwise
    # re-split the text per element (text.repetition_stats caveat)
    from .text import words as _words

    rp = (repetition_flag(F.col(text_col), word_array=F.col("__rw"))
          if rep_rule else F.lit(False))
    if c4_rule:
        from .text import c4_rules

        c4 = ~c4_rules(F.col(text_col))["c4_keep"]
    else:
        c4 = F.lit(False)
    sig_cols = lambda frame: frame \
        .withColumn("__rw", _words(F.lower(F.col(text_col)))) \
        .select(
            F.col(id_col).alias("id"),
            F.col("is_duplicate"),
            quality_score(F.col(text_col)).alias("__q"),
            lang_id(F.col(text_col)).alias("__lang"),
            mq.alias("__mq"),
            rp.alias("__rp"),
            c4.alias("__c4"),
        )
    if dup_flags is not None:
        # precomputed (id, is_duplicate) frame — e.g. derived from a
        # memoized ingest-time fingerprint index — so the md5 fingerprint
        # pass over the full text is not re-paid here (r12); missing ids
        # default to NOT duplicate like exact_dedup's unique rows
        out = sig_cols(
            df.join(dup_flags.select(F.col("id").alias(id_col),
                                     "is_duplicate"),
                    id_col, "left")
            .withColumn("is_duplicate",
                        F.coalesce(F.col("is_duplicate"), F.lit(False))))
    else:
        out = sig_cols(exact_dedup(df, text_col, id_col))
    if contaminated_flags is not None:
        # precomputed contaminated-id frame (single ``id`` column, one
        # row per contaminated doc): a pipeline that already ran
        # decontaminate_cut/contamination_frac passes its own flags so
        # the corpus gram explode is paid ONCE, not re-derived here —
        # identical exchanges dedupe to a ReusedExchange in one plan
        # (review r12: dp_text_stats re-exploded the corpus for this
        # rule).  The frame's membership must be the same any-overlap
        # boolean contaminated_ids computes (contamination_frac > 0).
        flags = (contaminated_flags.select(F.col("id"))
                 .withColumn("__cont", F.lit(True)))
        out = (out.join(flags, "id", "left")
               .withColumn("__cont", F.coalesce(F.col("__cont"),
                                                F.lit(False))))
    elif eval_docs is not None:
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
                           ppx_high=F.col("__px"),
                           rep_high=F.col("__rp"),
                           c4_bad=F.col("__c4"))
    return out.select(
        "id",
        (F.length(reasons) == 0).alias("keep"),
        reasons.alias("reasons"))


def corpus_preprocess(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      eval_docs: Optional[DataFrame] = None,
                      min_quality: float = 0.7,
                      langs: Optional[Sequence[str]] = ("en",),
                      rep_rule: bool = True,
                      neardup_threshold: Optional[float] = None,
                      neardup_pairs: Optional[DataFrame] = None,
                      decontaminate: bool = True,
                      n: int = 8,
                      sample_rate: float = 1.0,
                      pii_scrub: bool = False) -> DataFrame:
    """The COMPOSED preprocessing recipe, applied end to end — the
    FineWeb/RefinedWeb pipeline order as one call: rule filters +
    exact dedup (``corpus_keep``), optional MinHash near-dup cluster
    resolution AMONG THE RULE-FILTER SURVIVORS (keep the min-id
    representative per connected component), optional
    benchmark-decontamination SPAN REMOVAL of the survivors, and a
    final deterministic Bernoulli sample.  ``pii_scrub=True`` prepends
    FineWeb's PII-anonymization stage (emails / IPv4 / phone runs →
    typed placeholders, ``text.scrub_pii``) to the raw text before any
    other stage — see the inline comment for why entry-side is the only
    placement that can work against the normalized output text.
    Known limitation (ADVICE r16): the scrub applies to the CORPUS text
    only, not to ``eval_docs`` — a decontamination n-gram fingerprint
    that spans an email/IP in a benchmark doc no longer matches the
    anonymized corpus text, so a contaminated span overlapping scrubbed
    PII can survive the cut.  Callers who need the symmetric behavior
    should pre-scrub the benchmark frame themselves
    (``eval_docs.withColumn(text_col, scrub_pii(...))``) — the recipe
    does not do it implicitly because eval sets are reference data that
    other tooling matches byte-for-byte against published benchmarks.

    Near-dup clusters are resolved over the docs whose ``corpus_keep``
    reasons are empty — the FineWeb/RefinedWeb order (dedup among
    filter survivors, keeping one copy), not over the full input
    (ADVICE r14: a full-input representative can itself be dropped by
    a rule filter, silently losing the whole cluster's content; here
    the representative is by construction a survivor).  Because both
    the LSH banding and the Jaccard verify are pairwise/per-doc,
    restricting the INPUT to survivors equals restricting full-corpus
    pairs to survivor endpoints — which is exactly what happens when a
    precomputed ``neardup_pairs`` frame (``(id_a, id_b, ...)``, e.g.
    ``minhash_dedup_pairs``/``ngram_jaccard_pairs`` output a pipeline
    already paid for) is passed instead of ``neardup_threshold``: its
    pairs are semi-joined to the survivor set before clustering.

    Returns one row per INPUT document — nothing is silently dropped:
    ``(id, keep, reasons, text_clean, n_words, n_cut_words, sampled)``
    where ``keep`` folds in the near-dup verdict (reason ``near_dup``
    sorts into the same alphabetical reason list the rule filters use),
    ``text_clean`` is the decontaminated normalized text for KEPT docs
    (NULL for dropped ones — there is nothing to train on), and
    ``sampled`` marks the kept docs admitted by the deterministic
    md5-threshold sample (``sample.deterministic_sample``'s predicate,
    so a replay admits the identical set).  Filter
    ``keep AND sampled`` and project ``text_clean`` to materialize the
    training corpus; keep the full frame for audit trails.

    100 TB shape: every stage is the already-audited operator —
    corpus_keep's one fingerprint shuffle, the banded LSH joins +
    bounded cluster resolution, the broadcast eval-gram decontamination
    cut, and a row-local sample predicate.  Composition adds only
    narrow id-keyed joins.

    Cache lifecycle (caller-owned, ADVICE r15): when a near-dup arm is
    active the recipe PERSISTS a narrow (id, reasons) verdict frame
    (MEMORY_AND_DISK) so the corpus_keep subtree does not execute
    twice per action.  That entry outlives this call — a long-lived
    driver invoking the recipe repeatedly should call
    :func:`release_cache` on the returned frame once it has been
    materialized (the handle rides the frame as ``_yupana_persisted``;
    lineage stays recomputable, so an early release can only cost
    recompute time, never correctness).

    Oracled first-class as the dp_corpus_preprocess bundle (r15 — the
    DuckDB oracle recomputes keep/reasons/text_clean/cuts/sampled end
    to end, with the Jaccard-pairs near-dup arm so the pair verdicts
    are SQL-recomputable); the MinHash arm and the composition laws
    (conservation, per-stage agreement, determinism, pairs-arm
    equivalence) stay pinned by test_corpus_preprocess_laws."""
    from .dedup import decontaminate_cut, minhash_dedup_pairs
    from .sample import bernoulli_keep, dedup_clusters

    # argument validation BEFORE any plan is built (the convention
    # _validate_mix_params set, ADVICE r13; lazy evaluation made the
    # post-hoc raise free at runtime but work-then-validate is backwards)
    if neardup_threshold is not None and neardup_pairs is not None:
        raise ValueError(
            "corpus_preprocess: pass neardup_threshold (the built-in "
            "MinHash arm) OR neardup_pairs (a precomputed pair frame), "
            "not both — a threshold would be silently ignored")
    if pii_scrub:
        # PII anonymization (FineWeb's published final stage: emails +
        # public IPs get typed placeholders) applied to the RAW text at
        # the recipe ENTRY, not the exit: normalize_text strips @/./+
        # downstream, so an exit-side scrub could never match a pattern
        # — and entry-side placement means fingerprints, MinHash
        # shingles, and quality signals all see the anonymized form, so
        # two docs differing only in a scrubbed email are the exact
        # dups they should be.  Row-local regexp_replace chain: a
        # zero-shuffle rewrite of the scan at any scale (text.scrub_pii
        # is content-pinned by the dp_text_stats scrub_md5 oracle
        # column; the composition point is pinned by
        # test_corpus_preprocess_laws' pre-scrubbed-equivalence law).
        from .text import scrub_pii

        df = df.withColumn(text_col, scrub_pii(F.col(text_col)))
    out = corpus_keep(df, text_col, id_col, min_quality=min_quality,
                      langs=langs, rep_rule=rep_rule,
                      eval_docs=eval_docs if decontaminate else None)
    if neardup_threshold is not None or neardup_pairs is not None:
        # dedup among the rule-filter survivors (FineWeb order): the
        # survivor set is a narrow id frame; the semi-joins below are
        # id-keyed and the minhash pass only pays for surviving text.
        # The verdict frame feeds BOTH the survivor branch and the final
        # reason fold, and no ReusedExchange fires between them (column
        # pruning differs per branch), so without materialization the
        # whole corpus_keep subtree — fingerprint shuffle, contamination
        # explode — executes twice per action.  Persist the NARROW
        # (id, reasons) frame instead (tens of bytes/doc at any scale):
        # MEMORY_AND_DISK with recomputable lineage, the same posture as
        # dedup._rung3_exact's screened set (r15).
        from pyspark import StorageLevel

        out = out.persist(StorageLevel.MEMORY_AND_DISK)
        persisted = out
        surv = out.filter(F.length("reasons") == 0).select("id")
        if neardup_pairs is not None:
            pairs = (neardup_pairs
                     .join(surv.select(F.col("id").alias("id_a")),
                           "id_a", "left_semi")
                     .join(surv.select(F.col("id").alias("id_b")),
                           "id_b", "left_semi"))
        else:
            surv_docs = df.join(surv.select(F.col("id").alias(id_col)),
                                id_col, "left_semi")
            pairs = minhash_dedup_pairs(surv_docs, text_col, id_col,
                                        threshold=neardup_threshold)
        clus = dedup_clusters(pairs)
        nd = (clus.filter(F.col("id") != F.col("cluster_id"))
              .select(F.col("id"), F.lit(True).alias("__nd")))
        out = (out.join(nd, "id", "left")
               .withColumn("__nd", F.coalesce(F.col("__nd"),
                                              F.lit(False))))
    else:
        persisted = None
        out = out.withColumn("__nd", F.lit(False))
    # fold the near-dup verdict into the SAME alphabetical reason list
    reasons = F.array_join(
        F.array_sort(F.filter(
            F.concat(F.split(F.col("reasons"), ","),
                     F.array(F.when(F.col("__nd"), F.lit("near_dup")))),
            lambda x: x.isNotNull() & (x != ""))), ",")
    out = (out.select("id", reasons.alias("reasons"))
           .withColumn("keep", F.length("reasons") == 0))
    # decontaminated edit of the survivors (one row per input doc comes
    # from the cut operator's coverage contract; the join is id-keyed)
    if decontaminate and eval_docs is not None:
        cut = decontaminate_cut(df, eval_docs, text_col, id_col, n=n)
        ed = cut.select("id", F.col("dc_cleaned").alias("__clean"),
                        F.col("dc_n_words").alias("n_words"),
                        F.col("dc_n_cut_words").alias("n_cut_words"))
    else:
        from .text import normalize_text
        from .text import words as _w

        st = df.withColumn(
            "__w", F.coalesce(_w(normalize_text(F.col(text_col))),
                              F.array()))
        ed = st.select(F.col(id_col).alias("id"),
                       F.array_join(F.col("__w"), " ").alias("__clean"),
                       F.size("__w").cast("long").alias("n_words"),
                       F.lit(0).cast("long").alias("n_cut_words"))
    out = out.join(ed, "id", "left")
    # deterministic Bernoulli admission (the sampler's predicate
    # verbatim — replay == batch)
    sampled = (F.lit(True) if sample_rate >= 1.0
               else bernoulli_keep(F.col("id"), float(sample_rate)))
    result = out.select(
        "id", "keep", "reasons",
        F.when(F.col("keep"), F.col("__clean")).alias("text_clean"),
        "n_words", "n_cut_words",
        (F.col("keep") & sampled).alias("sampled"))
    # cache lifecycle is CALLER-owned (ADVICE r15): the narrow verdict
    # persist above outlives this call so repeated recipes in a
    # long-lived driver would accumulate MEMORY_AND_DISK entries.  The
    # handle rides the returned frame; call release_cache(result) once
    # it is materialized (lineage stays recomputable, so an early
    # release can only cost recompute time, never correctness).
    result._yupana_persisted = () if persisted is None else (persisted,)
    return result


def release_cache(df: DataFrame) -> None:
    """Unpersist the cache entries a recipe attached to ``df``
    (``corpus_preprocess``'s narrow verdict frame).  Non-blocking and
    idempotent; a no-op for frames that carry none."""
    for frame in getattr(df, "_yupana_persisted", ()):
        frame.unpersist(False)
