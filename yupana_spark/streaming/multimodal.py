"""Streaming perceptual-hash near-dup probing — the multimodal family's
online twin (completes the per-family streaming coverage: text dedup,
near-dup LSH, BM25/DSIR scoring, curation, sampling, ANN/SemDeDup, and
now image/audio/video signatures).

Posture: identical to the other frozen-artifact probes.  The corpus'
perceptual signatures (``multimodal.image_blockhash`` /
``audio_blockhash`` / ``video_temphash`` — one ``(id, simhash)`` long
per media row) are an ingest-time index; :func:`prepare_phash_index`
folds them ONCE into per-(block, value) pigeonhole buckets using the
SAME span layout the batch self-join keys by
(``dedup.hamming_block_spans`` — shared, not re-derived), and arriving
media probe their ``max_hamming + 1`` bucket slots with bounded LEFT
joins: one row per slot key, so cardinality is preserved and the plan
stays append-safe — no aggregation, no watermark, no state.  The
hamming verify is the batch definition verbatim
(``bit_count(a XOR b) <= r``), evaluated row-locally over the joined
bucket members.

The arriving side is hashed by the SAME mapInPandas signature
functions the batch index uses (they are stateless, so they run on a
stream unchanged) — replay == batch bit-for-bit by construction, and
the parity test pins it anyway.

Use case: "is this incoming image/audio/video a re-encode of something
already in the training set?" without stopping the ingest — the
multimodal mirror of the SemDeDup probe.

100 TB note: each bucket holds the corpus rows agreeing on one
block value (~N / 2^block_bits for random bits); the bucket table is
corpus-sized in TOTAL but the probe touches ``max_hamming + 1``
buckets per arrival, and the stream-static equi-join shuffles only the
(tiny) arriving side when the index outgrows broadcast.  Buckets with
pathological skew (constant signatures) are the same hot spot the
batch self-join has — cap or salt them at ingest if a real corpus
shows one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..datapipe.dedup import (block_value, hamming_block_spans,
                              signature_blocks)


def prepare_phash_index(sigs: DataFrame,
                        max_hamming: int = 6) -> DataFrame:
    """Fold a batch ``(id, simhash)`` signature frame into the probe's
    bucket table: one row per (blk, bval) with the bucket's members as
    parallel id/signature arrays (one contiguous buffer each).  Run
    ONCE per corpus and persist — this is the index artifact; the span
    layout rides ``max_hamming`` and MUST match the probe's."""
    blocks = signature_blocks(sigs, max_hamming)
    return (blocks.groupBy("blk", "bval")
            .agg(F.sort_array(F.collect_list(F.struct("id", "simhash")))
                 .alias("__ms"))
            .select(F.lit(int(max_hamming)).alias("mh"),
                    "blk", "bval",
                    F.transform(F.col("__ms"), lambda s: s["id"])
                    .alias("mem_ids"),
                    F.transform(F.col("__ms"), lambda s: s["simhash"])
                    .alias("mem_sigs")))


def streaming_phash_probe(hashed: DataFrame, index: DataFrame,
                          max_hamming: int = 6,
                          id_col: str = "id",
                          sig_col: str = "simhash") -> DataFrame:
    """(id, simhash, best_id, best_hamming, is_dup) per arriving
    signature row (``hashed`` = a blockhash frame over the arriving
    media — batch or stream, the functions are stateless): probe the
    FROZEN bucket table on every pigeonhole slot, verify candidates
    with the exact hamming distance row-locally, and report the best
    corpus match (ties to the smallest id) plus the
    ``best_hamming <= max_hamming`` near-dup verdict.  A member with
    the arrival's own id is skipped (corpus self-replay must not
    self-match).  No matching bucket -> best_id NULL, best_hamming 65,
    is_dup false.  One LEFT join per slot — cardinality preserved,
    append-safe.

    The index MUST have been prepared with the same ``max_hamming`` —
    the span layout IS the bucket key space, and a mismatch would
    silently probe the wrong buckets.  The index carries its layout in
    the mandatory ``mh`` column (``prepare_phash_index``): a frame
    without it is rejected outright, and a radius mismatch fails loudly
    (one bounded limit-1 job against the static index frame at
    plan-build time).  An EMPTY index passes — with no members, every
    lookup missing is the correct answer, whatever the layout."""
    spans = hamming_block_spans(max_hamming)
    if "mh" not in index.columns:
        raise ValueError(
            "streaming_phash_probe: index frame carries no 'mh' layout "
            "column — build it with prepare_phash_index so the probe "
            "can verify the pigeonhole span layout (a silent mismatch "
            "would miss every bucket)")
    got = index.select("mh").limit(1).collect()
    if got and got[0]["mh"] != int(max_hamming):
        raise ValueError(
            f"streaming_phash_probe: index was prepared with "
            f"max_hamming={got[0]['mh']} but the probe was asked "
            f"for {max_hamming} — the pigeonhole span layouts "
            "differ, so every bucket lookup would silently miss; "
            "re-prepare the index or match the radius")
    sig = F.col(sig_col)
    out = hashed.select(F.col(id_col).alias("id"),
                        sig.alias("simhash"))
    for i, (start, mask) in enumerate(spans):
        mi = index.filter(F.col("blk") == i).select(
            F.col("bval").alias(f"__bv{i}"),
            F.col("mem_ids").alias(f"__mi{i}"),
            F.col("mem_sigs").alias(f"__msg{i}"))
        out = out.join(
            mi, block_value(F.col("simhash"), start, mask)
            == F.col(f"__bv{i}"), "left")
    from ..datapipe.colutil import bind_once

    empty_l = F.array().cast("array<bigint>")
    n = len(spans)
    # candidate (id, sig) pairs from every hit slot; a pair agreeing on
    # several blocks just repeats — the min-by fold is idempotent
    cand_ids = F.concat(*[F.coalesce(F.col(f"__mi{i}"), empty_l)
                          for i in range(n)])
    cand_sigs = F.concat(*[F.coalesce(F.col(f"__msg{i}"), empty_l)
                           for i in range(n)])

    def _resolve(zipped):
        # min over (hamming, id): ties to the smallest id, deterministic
        best = F.array_min(F.filter(
            zipped, lambda s: s["id"] != F.col("id")))
        def _with_best(b):
            bh = F.coalesce(b["h"], F.lit(65)).cast("int")
            return F.struct(
                b["id"].alias("best_id"),
                bh.alias("best_hamming"),
                (bh <= F.lit(int(max_hamming))).alias("is_dup"))
        return bind_once(best, _with_best)

    zipped = F.arrays_zip(
        F.transform(cand_sigs,
                    lambda s: F.bit_count(s.bitwiseXOR(F.col("simhash"))))
        .alias("h"),
        cand_ids.alias("id"))
    res = bind_once(zipped, _resolve)
    return (out.withColumn("__r", res)
            .select("id", "simhash",
                    F.col("__r.best_id").alias("best_id"),
                    F.col("__r.best_hamming").alias("best_hamming"),
                    F.col("__r.is_dup").alias("is_dup")))
