"""Rollups: scheduled pre-aggregation from a source table into target tables.

Reference: yupana-api/.../schema/Rollup.scala:23-65 (Rollup(fromTable,
toTables, timeExpr, groupBy, fields)), instances
yupana-schema/.../ReceiptRollups.scala:26-56, Spark runner
yupana-spark/.../CustomRollup.scala:16-60; recalc windows come from the
changelog (TsdbBase.scala:415-423).

Spark design: one declarative groupBy/agg job per rollup; output written to
the warehouse partitioned by the (re-bucketed) day column.  ``recalculate``
limits work to the time intervals the changelog marks dirty — at scale this
is the difference between rewriting one day-partition and rescanning 100 TB.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

from pyspark.sql import DataFrame, functions as F

from .. import expressions as E
from ..compiler import ExpressionCompiler, _Ctx
from .writes import Warehouse


@dataclass(frozen=True)
class Rollup:
    name: str
    from_table: str
    to_table: str
    time_trunc: str  # day | week | month — ≙ Rollup.timeExpr
    group_by: Tuple[str, ...]  # dimension names carried over
    aggregates: Tuple[Tuple[E.AggExpr, str], ...]  # (agg expr, output name)


def run_rollup(wh: Warehouse, rollup: Rollup,
               from_time: Optional[_dt.datetime] = None,
               to_time: Optional[_dt.datetime] = None) -> DataFrame:
    """Execute one rollup window and upsert the result into the target table.

    The aggregation relies on HashAggregateExec partial/final (the
    reference's fold/combine/postCombine, TsdbBase.scala:241-267).
    """
    src = wh.read(rollup.from_table)
    if from_time is not None:
        src = src.filter(F.col("time") >= F.lit(from_time))
    if to_time is not None:
        src = src.filter(F.col("time") < F.lit(to_time))

    ec = ExpressionCompiler(wh.schema.tables.get(rollup.from_table))
    ctx = _Ctx()
    gcols = [F.date_trunc(rollup.time_trunc, F.col("time")).alias("time")]
    gcols += [F.col(d) for d in rollup.group_by]
    aggs = [ec.col(a, ctx).alias(nm) for a, nm in rollup.aggregates]
    out = src.groupBy(*gcols).agg(*aggs)

    if wh.exists(rollup.to_table) and (from_time or to_time):
        # incremental: merge only the recomputed buckets
        existing = wh.spark.read.parquet(wh.path(rollup.to_table))
        from .writes import BUCKET_COL

        if BUCKET_COL in existing.columns:
            existing = existing.drop(BUCKET_COL)
        keys = ["time"] + list(rollup.group_by)
        kept = existing.join(out.select("time").distinct(), ["time"],
                             "left_anti")
        merged = kept.unionByName(out)
        wh.write_table(rollup.to_table, merged)
    else:
        wh.write_table(rollup.to_table, out)
    return wh.read(rollup.to_table)


def _bucket_bounds(time_trunc: str, day: _dt.datetime):
    """[start, end) of the rollup bucket containing ``day``.

    A dirty DAY must recompute its whole enclosing week/month/year bucket:
    run_rollup's incremental merge replaces entire buckets, so feeding it a
    one-day window would overwrite a month aggregate with one day's partial
    sums."""
    day = _dt.datetime(day.year, day.month, day.day)
    if time_trunc == "day":
        return day, day + _dt.timedelta(days=1)
    if time_trunc == "week":  # ISO Monday, matching date_trunc('week')
        start = day - _dt.timedelta(days=day.weekday())
        return start, start + _dt.timedelta(days=7)
    if time_trunc == "month":
        start = day.replace(day=1)
        end = (start.replace(year=start.year + 1, month=1) if start.month == 12
               else start.replace(month=start.month + 1))
        return start, end
    if time_trunc == "year":
        start = day.replace(month=1, day=1)
        return start, start.replace(year=start.year + 1)
    raise ValueError(f"unsupported rollup time_trunc {time_trunc!r}")


def recalculate(wh: Warehouse, rollup: Rollup,
                since: Optional[_dt.datetime] = None,
                updated_by: Optional[str] = None) -> DataFrame:
    """Recompute only intervals the changelog marks as rewritten, widened to
    full rollup-bucket boundaries (TsdbBase.scala:415-423 recalc windows).

    ``since`` narrows to windows whose changelog entry was written at or
    after that wall-clock instant — the INCREMENTAL form: a scheduled
    rollup passes its last successful run time and touches only buckets
    dirtied since (the reference threads the same filter through its
    ChangelogDao, UpdatesIntervalsProvider.scala:95-117).  ``updated_by``
    narrows to one writer's changes."""
    from .writes import UpdatesIntervalsFilter

    if not wh.exists(rollup.to_table):
        # the target was never materialized: ANY recalc (filtered or not)
        # must build the full table first — replaying only the dirty
        # buckets would install a partial rollup that later incremental
        # runs never repair
        return run_rollup(wh, rollup)
    flt = UpdatesIntervalsFilter(
        table_name=rollup.from_table,
        updated_after=since,
        updated_by=updated_by)
    intervals = (wh.updates_intervals(flt)
                 .select("day").distinct().collect())
    if not intervals:
        if since is None and updated_by is None:
            return run_rollup(wh, rollup)     # no changelog: recompute all
        return wh.read(rollup.to_table)       # incremental: nothing dirty
    buckets = sorted({_bucket_bounds(rollup.time_trunc, row["day"])
                      for row in intervals})
    for start, end in buckets:
        run_rollup(wh, rollup, from_time=start, to_time=end)
    return wh.read(rollup.to_table)
