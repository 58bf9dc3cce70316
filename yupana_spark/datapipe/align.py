"""Point-in-time alignment operators: as-of join and interval (range) join.

Spark has no native ASOF JOIN (pandas ``merge_asof`` / DuckDB ``ASOF
JOIN`` semantics) and no bounded-cost interval join — the naive
formulations are a theta-join (BroadcastNestedLoopJoin: O(|L| x |R|)
comparisons, broadcast of a whole side) that dies at scale.  These are
the canonical time-series alignment steps of a training-data pipeline:
"enrich each example with the most recent feature snapshot AT THE TIME
the example was observed" (the point-in-time-correct feature join that
prevents label leakage) and "attach every event inside a validity
window".

The reference engine has no as-of operator either (its dialect's only
window function is lag, TSDB.scala:73-138) — this module is a flagged
extension like the session windows (SURVEY.md §2.9), built from the two
standard scalable decompositions:

* ``asof_join``: union the tagged sides and take a running ``last``
  ignoring nulls over a (by, time, side) window — ONE shuffle on the
  ``by`` keys, no theta-join, no broadcast, state bounded by the window
  frame (row -1..0), so it survives any |L| and |R|.  Same shape public
  implementations use (e.g. Databricks `tempo`'s union-asof).  Skew
  caveat: one window partition per ``by`` key — align on high-cardinality
  keys (same caveat as the dialect's lag partitioning, docs/yupanaql.md).
* ``interval_join``: quantize time into fixed-width bins; intervals
  explode to the bins they cover (bounded fan-out, validated), events
  map to exactly one bin, and the match becomes an EQUI-join on
  (by, bin) + an exact residual filter — Catalyst plans a shuffled hash
  / sort-merge join instead of a nested-loop, and the residual keeps the
  result exactly equal to the naive theta-join.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _secs(c) -> F.Column:
    """Epoch seconds (micro precision) of a timestamp/timestamp_ntz column.

    double's 53-bit mantissa resolves ~0.2 us at 2^31-second epochs, so
    micro-precision differences survive the cast exactly enough for
    tolerance comparisons (fixture timestamps carry microseconds)."""
    return F.col(c).cast("timestamp").cast("double")


def asof_join(left: DataFrame, right: DataFrame, on: str = "time",
              by: Sequence[str] = (), value_cols: Optional[Sequence[str]] = None,
              direction: str = "backward", tolerance: Optional[float] = None,
              strict: bool = False, suffix: str = "_r") -> DataFrame:
    """Left join each ``left`` row to the nearest ``right`` row at-or-before
    (``backward``) / at-or-after (``forward``) its ``on`` time, within the
    same ``by`` group — pandas ``merge_asof`` / DuckDB ``ASOF LEFT JOIN``
    semantics (inclusive unless ``strict``).

    Result: every ``left`` row (exactly once — never multiplied), plus
    ``{vc}{suffix}`` for each of ``value_cols`` and ``{on}{suffix}`` (the
    matched right time), all NULL when no right row qualifies.
    ``tolerance`` (seconds) additionally nulls matches farther than that
    from the left time — the row itself is kept, like merge_asof.

    The right side must be unique per (by, on) for a deterministic
    payload — pre-aggregate it (e.g. ``groupBy(by, on).agg(...)``) if it
    is not; this operator does not guess a tiebreak.

    Scale shape: one union + one window = ONE exchange on ``by`` — no
    theta-join, nothing broadcast, |R| can exceed |L| freely."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    by = list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in set(by) | {on}]
    value_cols = list(value_cols)

    # tagged union: left rows carry their payload, right rows carry the
    # matched-value columns; each side is NULL for the other's columns
    left_payload = [c for c in left.columns if c not in set(by) | {on}]
    matched = [f"{c}{suffix}" for c in value_cols] + [f"{on}{suffix}"]
    clash = (set(matched) | {"__side", "__m"}) & set(left.columns)
    if clash:
        raise ValueError(f"suffix collision with left columns: {sorted(clash)}")
    # a NULL right time matches nothing (merge_asof/ASOF JOIN semantics) —
    # and under asc ordering (nulls first) it would otherwise poison the
    # running last for every row
    right = right.filter(F.col(on).isNotNull())
    lsel = ([F.col(c) for c in by] + [F.col(on)] + [F.lit(1).alias("__side")]
            + [F.col(c) for c in left_payload]
            + [F.lit(None).cast(right.schema[v].dataType).alias(f"{v}{suffix}")
               for v in value_cols]
            + [F.lit(None).cast(left.schema[on].dataType)
               .alias(f"{on}{suffix}")])
    rsel = ([F.col(c) for c in by] + [F.col(on)] + [F.lit(0).alias("__side")]
            + [F.lit(None).cast(left.schema[c].dataType).alias(c)
               for c in left_payload]
            + [F.col(v).alias(f"{v}{suffix}") for v in value_cols]
            + [F.col(on).alias(f"{on}{suffix}")])
    u = left.select(*lsel).unionByName(right.select(*rsel))

    # window order: time asc (backward) / desc (forward).  Tie rank puts
    # the right row BEFORE the left row when inclusive (an equal-time
    # right row is visible to the left row) and AFTER when strict.
    t = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    tie = F.col("__side").asc() if not strict else F.col("__side").desc()
    w = (Window.partitionBy(*by).orderBy(t, tie)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # ONE running last over a struct of all matched columns: per-column
    # last(ignorenulls) would stitch the result from DIFFERENT right rows
    # whenever a right value is NULL (returning a stale value against a
    # newer matched time).  The struct is NULL on left rows (so
    # ignorenulls skips them) and non-null on every right row, even one
    # whose value fields are all NULL.
    u = u.withColumn("__m", F.when(F.col("__side") == 0,
                                   F.struct(*[F.col(m) for m in matched])))
    u = u.withColumn("__m", F.last("__m", ignorenulls=True).over(w))
    out = u.filter(F.col("__side") == 1).drop("__side")
    # a NULL left time matches nothing either (under desc ordering it
    # would otherwise see the whole right side)
    no_match = F.col(on).isNull()
    if tolerance is not None:
        mt = F.col("__m")[f"{on}{suffix}"]
        gap = ((_secs(on) - mt.cast("timestamp").cast("double"))
               if direction == "backward"
               else (mt.cast("timestamp").cast("double") - _secs(on)))
        no_match = no_match | mt.isNull() | (gap > F.lit(float(tolerance)))
    for m in matched:
        out = out.withColumn(m, F.when(~no_match, F.col("__m")[m]))
    return out.drop("__m")


def interval_join(events: DataFrame, intervals: DataFrame, t_col: str = "time",
                  start_col: str = "start", end_col: str = "end",
                  by: Sequence[str] = (), bin_width: float = 3600.0,
                  max_bins_per_interval: int = 4096) -> DataFrame:
    """INNER-join every ``events`` row to every ``intervals`` row whose
    half-open window ``[start, end)`` contains its time, within the same
    ``by`` group — exactly ``events JOIN intervals ON t >= start AND
    t < end`` but as an EQUI-join Catalyst can hash-partition.

    Each interval explodes to the fixed-width time bins it covers, each
    event maps to its single bin, the join runs on (by..., bin) and the
    exact residual predicate then clears bin-edge false candidates.  An
    event falls in exactly one bin, and an interval covers each bin at
    most once, so no dedup is needed — the result is row-for-row the
    theta-join's.

    ``bin_width`` (seconds) trades fan-out for candidate selectivity:
    pick it near the typical interval length so each interval explodes to
    ~1-2 bins.  A bounded validation aggregate (one small job over
    ``intervals`` only — never over ``events``) rejects a width that
    would explode any interval past ``max_bins_per_interval``, the guard
    against quadratic-ish blowup from one pathological interval."""
    by = list(by)
    if "__bin" in events.columns or "__bin" in intervals.columns:
        raise ValueError("__bin is reserved by interval_join")
    wsec = float(bin_width)
    smax = intervals.agg(
        F.max(_secs(end_col) - _secs(start_col)).alias("m")).first()["m"]
    if smax is not None and smax / wsec > max_bins_per_interval:
        raise ValueError(
            f"bin_width={bin_width}s explodes a {smax:.0f}s interval to "
            f"{int(smax / wsec) + 1} bins (> {max_bins_per_interval}); "
            f"raise bin_width or max_bins_per_interval")
    ebin = F.floor(_secs(t_col) / wsec)
    # last covered bin: end is EXCLUSIVE, so an interval ending exactly on
    # a bin edge does not cover that bin — subtract one microsecond
    first_bin = F.floor(_secs(start_col) / wsec).cast("long")
    last_bin = F.floor((_secs(end_col) - F.lit(1e-6)) / wsec).cast("long")
    ib = intervals.withColumn(
        "__bin", F.explode(F.sequence(first_bin,
                                      F.greatest(first_bin, last_bin))))
    eb = events.withColumn("__bin", ebin.cast("long"))
    return (eb.join(ib, by + ["__bin"])
            .filter((F.col(t_col) >= F.col(start_col))
                    & (F.col(t_col) < F.col(end_col)))
            .drop("__bin"))
