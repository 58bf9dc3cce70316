"""Streaming twin of the as-of join (datapipe/align.asof_join): enrich an
event stream with the most recent reference-stream value per key — the
online point-in-time feature join ("attach the latest known state at the
moment the event arrives").

Batch asof sorts the union once; a stream cannot sort across batches, so
the operator keeps ONE (ts, value) pair per key in
``applyInPandasWithState`` state — the newest reference row seen — and
resolves each micro-batch locally with ``pandas.merge_asof`` over
(carried state + this batch's reference rows).  Within a batch the
event-time order is reconstructed exactly; across batches the state
carries only forward, so the result equals the batch operator on an
EVENT-TIME-ORDERED replay (the law test_streaming_extra pins, same
contract as the streaming near-dup/filter twins), and degrades to
"latest known state" enrichment — the standard production semantics —
when reference rows arrive late.

State is one row per key (two scalars), shuffled once on the key: the
same keyed-state layout as the running-totals operator, bounded by key
cardinality, never by stream length.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("ts_r", T.TimestampType()),
    T.StructField("rv_r", T.DoubleType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("rts_us", T.LongType()),
    T.StructField("rv", T.DoubleType()),
])


def _update(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    pdf = pd.concat(list(pdfs), ignore_index=True)
    rights = pdf[pdf["side"] == 0][["ts", "rv"]]
    if state.exists:
        rts_us, rv = state.get
        carried = pd.DataFrame({"ts": [pd.Timestamp(rts_us, unit="us")],
                                "rv": [rv]})
        rights = pd.concat([carried, rights], ignore_index=True)
    rights = rights.sort_values("ts", kind="mergesort")
    lefts = (pdf[pdf["side"] == 1][["event_id", "ts", "lv"]]
             .sort_values("ts", kind="mergesort"))
    if len(lefts):
        if len(rights):
            m = pd.merge_asof(lefts, rights, on="ts", direction="backward")
        else:
            m = lefts.assign(rv=None)
            m["__rts"] = pd.NaT
        if len(rights):
            # merge_asof keeps only the value column; recover the matched
            # ts by asof-joining the ts itself
            m2 = pd.merge_asof(lefts[["ts"]],
                               rights.rename(columns={"ts": "__rts"})
                               .assign(ts=lambda d: d["__rts"]),
                               on="ts", direction="backward")
            m["__rts"] = m2["__rts"].values
        # unmatched rows must surface as NULL, not float NaN (merge_asof
        # leaves NaN; the batch operator and SQL both produce NULL)
        rts = pd.Series(m["__rts"].values)
        rv = [None if pd.isna(t) else float(v)
              for t, v in zip(rts, m["rv"].values)]
        out = pd.DataFrame({
            "k": key[0], "event_id": m["event_id"].values,
            "ts": m["ts"].values, "value": m["lv"].values,
            "ts_r": rts, "rv_r": pd.Series(rv, dtype=object),
        })
        yield out
    if len(rights):
        newest = rights.iloc[-1]
        state.update((int(pd.Timestamp(newest["ts"]).value // 1000),
                      float(newest["rv"])))


def streaming_asof_join(left: DataFrame, right: DataFrame,
                        on: str = "ts", by: str = "k",
                        id_col: str = "event_id",
                        left_val: str = "value",
                        right_val: str = "rv") -> DataFrame:
    """Union-tag the two streams and resolve per key with carried
    last-reference state.  ``left``/``right`` are streaming DataFrames;
    the result streams one row per left event with the matched reference
    (ts_r, rv_r), NULL before any reference row exists for the key."""
    lt = left.select(F.col(by).alias("k"), F.col(id_col).alias("event_id"),
                     F.col(on).alias("ts"), F.lit(1).alias("side"),
                     F.col(left_val).cast("double").alias("lv"),
                     F.lit(None).cast("double").alias("rv"))
    rt = right.select(F.col(by).alias("k"),
                      F.lit(None).cast("long").alias("event_id"),
                      F.col(on).alias("ts"), F.lit(0).alias("side"),
                      F.lit(None).cast("double").alias("lv"),
                      F.col(right_val).cast("double").alias("rv"))
    return (lt.unionByName(rt).groupBy("k")
            .applyInPandasWithState(_update, OUTPUT_SCHEMA, STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))
