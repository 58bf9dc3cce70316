"""Streaming near-duplicate detection: online MinHash-LSH with per-bucket
state (applyInPandasWithState).

The batch pipeline (datapipe.dedup.minhash_dedup_pairs) answers "which pairs
in this corpus are near-dups"; an always-on ingest needs the ONLINE form:
"is this incoming document a near-dup of anything already seen".  The
reference has no streaming engine at all (SURVEY.md §2.9 — its online
surface is upsert ingestion, yupana-spark/.../ETLFunctions.scala), so this
is a Spark-native extension, built from the same public LSH construction as
the batch path.

Shape: signatures/band hashes are computed scan-side exactly as in batch
(same shingle/hash/band definitions — that is what makes the streaming
output provably a sound superset of the batch pairs on a replay, the
equivalence q_stream_dedup's verdict rows pin).  The only stateful step is
keyed by
(band, band_hash): each bucket holds the hashed shingle sets of its members,
an arriving doc is exact-Jaccard-verified against them (numpy set
intersection inside the state function), and (id_a, id_b, jaccard) matches
are emitted as they are discovered.  One shuffle on the bucket key — the
same layout as Spark's own streaming aggregation state.

Scale posture: with the default NoTimeout, bucket state grows with corpus
prefix size (band buckets are sparse, ~N/2^band_bits members each); the
``idle_timeout_ms`` knob turns on horizon eviction so a production run's
state is bounded by the horizon's arrival volume instead — wall-clock
(ProcessingTimeTimeout) by default, or data-deterministic event-time
(EventTimeTimeout, keyed to the watermark) when ``event_time_col`` is
given.  A pair colliding in several bands (or re-observed across
micro-batches for a re-sent id) is emitted once per collision — consumers
dedupe with a batch `dropDuplicates` (the conservation check does), or a
watermarked streaming distinct at production horizons.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState

from .horizon import arm_timeout, event_ms, timeout_mode

PAIR_SCHEMA = T.StructType([
    T.StructField("id_a", T.LongType()),
    T.StructField("id_b", T.LongType()),
    T.StructField("jaccard", T.DoubleType()),
])

# per-bucket state: member ids + their hashed shingle sets, flattened
# (fixed-type columns are the applyInPandasWithState contract)
BUCKET_STATE_SCHEMA = T.StructType([
    T.StructField("ids", T.ArrayType(T.LongType())),
    T.StructField("lens", T.ArrayType(T.IntegerType())),
    T.StructField("flat", T.ArrayType(T.LongType())),
])


def _make_bucket_update(threshold: float, idle_timeout_ms: int | None = None,
                        event_time_col: str | None = None):
    def _bucket_update(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                       state: GroupState) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.hasTimedOut:  # horizon policy: forget a quiet bucket
            state.remove()
            return
        if state.exists:
            ids, lens, flat = state.get
            ids = list(ids)
            sets = []
            off = 0
            for ln in lens:
                sets.append(np.asarray(flat[off:off + ln], dtype=np.int64))
                off += ln
        else:
            ids, sets = [], []
        out_a, out_b, out_j = [], [], []
        seen = set(ids)
        max_ev_ms = None
        for pdf in pdfs:
            if event_time_col is not None:
                ms = event_ms(pdf[event_time_col])
                if ms is not None:
                    max_ev_ms = (ms if max_ev_ms is None
                                 else max(max_ev_ms, ms))
            # deterministic arrival order within the micro-batch
            pdf = pdf.sort_values("id")
            for rid, hs in zip(pdf["id"], pdf["hs"]):
                rid = int(rid)
                if rid in seen:       # replayed id: state already has it
                    continue
                new = np.asarray(hs if hs is not None else [],
                                 dtype=np.int64)
                nn = len(new)
                if nn:
                    new_sorted = np.sort(new)
                    for oid, os_ in zip(ids, sets):
                        if not len(os_):
                            continue
                        inter = int(np.isin(os_, new_sorted,
                                            assume_unique=True).sum())
                        union = nn + len(os_) - inter
                        # HALF-UP at 6 dp in EXACT integer arithmetic, then
                        # cut on the rounded value — identical to the batch
                        # path's F.round(jaccard, 6) >= threshold for every
                        # rational inter/union: float emulations
                        # (floor(j*1e6+0.5), Python round()) both disagree
                        # with Spark's decimal HALF_UP on terminating-
                        # decimal ties like 323/640, integer division
                        # cannot
                        jr = ((2 * inter * 1_000_000 + union)
                              // (2 * union)) / 1e6 if union else 0.0
                        if jr >= threshold:
                            lo, hi = (rid, oid) if rid < oid else (oid, rid)
                            out_a.append(lo)
                            out_b.append(hi)
                            out_j.append(jr)
                ids.append(rid)
                sets.append(new)
                seen.add(rid)
        state.update((ids,
                      [int(len(s)) for s in sets],
                      [int(x) for s in sets for x in s]))
        # horizon policy: a bucket idle past the horizon is evicted
        # (hasTimedOut branch above) — pairs straddling the horizon are
        # then NOT re-found, the documented memory/recall trade
        arm_timeout(state, idle_timeout_ms, event_time_col, max_ev_ms)
        if out_a:
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b,
                                "jaccard": out_j})

    return _bucket_update


def streaming_neardup_pairs(stream: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", threshold: float = 0.5,
                            num_hashes: int = 32, bands: int = 8,
                            k: int = 5,
                            idle_timeout_ms: int | None = None,
                            event_time_col: str | None = None) -> DataFrame:
    """Streaming (id_a, id_b, jaccard) near-dup matches, id_a < id_b.

    Shingle/band/verification definitions are shared with the batch
    pipeline, so on an availableNow replay over a static corpus the
    distinct streamed pairs are a SUPERSET of
    `minhash_dedup_pairs(corpus, threshold)` (the batch path's rung-2
    signature screen may drop a borderline true pair by design; the
    streaming path exact-verifies every bucket collision, so it cannot),
    and every streamed pair is sound (exact Jaccard >= threshold by
    construction).  Those two directions are the equivalence the
    q_stream_dedup bundle's verdict rows check.

    ``idle_timeout_ms`` is the state-horizon knob (the same shape as
    ``stateful.running_totals``' idle_timeout): when set, a bucket that
    receives no member for that long is evicted, so per-bucket state is
    bounded by the horizon's arrival volume instead of the whole corpus
    prefix — at the cost that a near-dup of an evicted member is no longer
    found.  ``None`` (default) keeps NoTimeout, which an availableNow
    replay requires (the superset-of-batch guarantee in q_stream_dedup
    only holds with full-prefix state).

    ``event_time_col`` switches the horizon clock from WALL time
    (ProcessingTimeTimeout — replaying the same data at different speeds
    evicts differently) to EVENT time (EventTimeTimeout): a bucket is
    evicted when the stream's watermark passes its last member's event
    time + ``idle_timeout_ms``, making the eviction set a deterministic
    function of the data and the batch boundaries, independent of
    wall-clock pacing.  Requires ``idle_timeout_ms`` AND a watermark on
    ``event_time_col`` (``stream.withWatermark(...)`` before calling).
    """
    from ..datapipe.dedup import (band_explode, hashed_shingle_sets,
                                  minhash_signature_np)

    timeout = timeout_mode(idle_timeout_ms, event_time_col)
    carry = (event_time_col,) if event_time_col is not None else ()
    hashed = hashed_shingle_sets(stream, text_col, id_col, k, carry=carry)
    sig = hashed.select(
        F.col("id").cast("long").alias("id"), *carry, "hs",
        minhash_signature_np(F.col("hs"), num_hashes).alias("sig"))
    # the band hash is THE shared definition (dedup.band_explode) — the
    # streaming-vs-batch superset guarantee depends on it byte-for-byte
    banded = band_explode(sig, num_hashes, bands, "hs", *carry)
    return (banded.groupBy("band", "bhash")
            .applyInPandasWithState(
                _make_bucket_update(threshold, idle_timeout_ms,
                                    event_time_col), PAIR_SCHEMA,
                BUCKET_STATE_SCHEMA, "append", timeout))
