"""Scale levers: bucketed co-located joins, salted aggregation for skew.

These are the knobs SURVEY.md §4.2/BASELINE.md call out for the 100 TB
deployment; they are exercised by tests so the plans are verified, not
aspirational:

- ``write_bucketed`` / ``colocated_join``: persist both sides bucketed by the
  join key (Spark bucketing ≙ the reference's dimension-prefix row-key
  layout, TSDRowKey.scala) — the join then runs shuffle-free (no Exchange in
  the plan), which at fact-to-fact scale is the difference between a network
  shuffle of the whole table and a local zip of co-located buckets.
- ``salted_agg``: high-skew GROUP BY keys get a random salt fanned out to
  ``n_salts`` sub-keys (partial agg), then a second tiny agg over sub-results.
  AQE's skew-join handling covers joins; this covers pathological agg keys.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


def write_bucketed(df: DataFrame, table_name: str, bucket_col: str,
                   n_buckets: int = 16,
                   sort_col: str | None = None) -> None:
    """Persist as a bucketed table in the session catalog.

    Bucket metadata lives in the catalog, so readers of ``table_name`` get
    hash-partitioned, optionally sorted buckets — joins/aggs on the bucket
    column skip the shuffle entirely.
    """
    writer = (df.write.mode("overwrite")
              .bucketBy(n_buckets, bucket_col))
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def colocated_join(spark: SparkSession, left_table: str, right_table: str,
                   on: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed catalog tables — shuffle-free by construction."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def salted_agg(df: DataFrame, group_cols: Sequence[str],
               agg_exprs: dict, n_salts: int = 16) -> DataFrame:
    """Two-phase aggregation with key salting.

    ``agg_exprs``: {out_name: (col, fn)} with fn in {"sum", "count", "min",
    "max"} — the mergeable aggregates (avg = sum/count on top).  Phase 1
    aggregates (keys + salt), spreading one hot key over ``n_salts``
    reducers; phase 2 merges the per-salt partials (tiny input).
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    phase1_aggs = []
    for out, (col, fn) in agg_exprs.items():
        if fn == "count":
            phase1_aggs.append(F.count(col).alias(f"__p_{out}"))
        else:
            phase1_aggs.append(getattr(F, fn)(col).alias(f"__p_{out}"))
    p1 = salted.groupBy(*group_cols, "__salt").agg(*phase1_aggs)
    phase2_aggs = []
    for out, (col, fn) in agg_exprs.items():
        merge_fn = "sum" if fn in ("sum", "count") else fn
        phase2_aggs.append(getattr(F, merge_fn)(f"__p_{out}").alias(out))
    return p1.groupBy(*group_cols).agg(*phase2_aggs)
