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

STATE_SCHEMA = T.StructType([
    T.StructField("rts_us", T.LongType()),
    T.StructField("rv", T.DoubleType()),
])


def _out_schema(key_type: T.DataType, id_type: T.DataType) -> T.StructType:
    """Output schema derived from the input types — a string or int key
    both work; only ts (timestamp) and the value columns (cast to double
    by the operator) are fixed."""
    return T.StructType([
        T.StructField("k", key_type),
        T.StructField("event_id", id_type),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ts_r", T.TimestampType()),
        T.StructField("rv_r", T.DoubleType()),
    ])


def _update(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    pdf = pd.concat(list(pdfs), ignore_index=True)
    # NULL times match nothing (merge_asof raises on NaT keys, and a
    # failed micro-batch replays forever): NaT reference rows drop, NaT
    # left rows emit unmatched below — the batch twin's semantics
    rights = pdf[(pdf["side"] == 0) & pdf["ts"].notna()][["ts", "rv"]]
    # a reference row with NULL value still matches (its rv_r is NULL) —
    # state must NOT store NaN as a float, so track validity separately
    if state.exists:
        rts_us, rv = state.get
        carried = pd.DataFrame({"ts": [pd.Timestamp(rts_us, unit="us")],
                                "rv": [rv]})
        rights = pd.concat([carried, rights], ignore_index=True)
    rights = rights.sort_values("ts", kind="mergesort")
    all_lefts = pdf[pdf["side"] == 1][["event_id", "ts", "lv"]]
    lefts = all_lefts[all_lefts["ts"].notna()] \
        .sort_values("ts", kind="mergesort")
    nat_lefts = all_lefts[all_lefts["ts"].isna()]
    if len(lefts):
        if len(rights):
            # one merge: merge_asof keeps every right column, so carrying
            # the matched ts as an extra column avoids a second pass
            m = pd.merge_asof(lefts,
                              rights.assign(__rts=rights["ts"]),
                              on="ts", direction="backward")
        else:
            m = lefts.assign(rv=None, __rts=pd.NaT)
        # unmatched (or NULL-valued) matches must surface as NULL, not
        # float NaN (the batch operator and SQL both produce NULL)
        rts = pd.Series(m["__rts"].values)
        rv = [None if (pd.isna(t) or pd.isna(v)) else float(v)
              for t, v in zip(rts, m["rv"].values)]
        yield pd.DataFrame({
            "k": key[0], "event_id": m["event_id"].values,
            "ts": m["ts"].values, "value": m["lv"].values,
            "ts_r": rts, "rv_r": pd.Series(rv, dtype=object),
        })
    if len(nat_lefts):
        yield pd.DataFrame({
            "k": key[0], "event_id": nat_lefts["event_id"].values,
            "ts": nat_lefts["ts"].values, "value": nat_lefts["lv"].values,
            "ts_r": pd.Series([pd.NaT] * len(nat_lefts)),
            "rv_r": pd.Series([None] * len(nat_lefts), dtype=object),
        })
    if len(rights):
        newest = rights.iloc[-1]
        nv = newest["rv"]
        state.update((int(pd.Timestamp(newest["ts"]).value // 1000),
                      None if pd.isna(nv) else float(nv)))


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
                      F.lit(None).cast(left.schema[id_col].dataType)
                      .alias("event_id"),
                      F.col(on).alias("ts"), F.lit(0).alias("side"),
                      F.lit(None).cast("double").alias("lv"),
                      F.col(right_val).cast("double").alias("rv"))
    out_schema = _out_schema(left.schema[by].dataType,
                             left.schema[id_col].dataType)
    return (lt.unionByName(rt).groupBy("k")
            .applyInPandasWithState(_update, out_schema, STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))
