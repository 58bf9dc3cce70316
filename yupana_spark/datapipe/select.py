"""Corpus-selection operators: top-k per group and per-group quantiles.

Beyond the reference's surface (BASELINE.json north star).  The
quality-filtering step of a training-data pipeline needs "keep the best N
documents per domain" and "where is the p90 of the quality score" — both
expressed so no global sort ever happens:

* ``top_k_per_group`` ranks inside each partition of a window — one shuffle
  on the group key, then a row-local filter; at 100 TB this is the only
  shape that works (a global ORDER BY ... LIMIT materializes a total order).
* ``group_quantiles`` uses Spark's exact ``percentile`` aggregate —
  partial/final HashAggregate, one shuffle — not approx_percentile, so the
  result is engine-independent (DuckDB ``quantile_cont`` matches exactly).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F


def top_k_per_group(df: DataFrame, group_cols: Sequence[str],
                    order_col: str, k: int, descending: bool = True,
                    tiebreak: Optional[str] = None) -> DataFrame:
    """Best k rows per group by ``order_col``.

    Deterministic when ``tiebreak`` (a unique key) is given — required for
    reproducible corpus selection and for cross-engine comparison.  The
    window shuffles once on the group key; row_number + filter never
    materializes more than one partition's order.
    """
    order: List = [F.col(order_col).desc() if descending
                   else F.col(order_col).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*order)
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn"))


def group_quantiles(df: DataFrame, group_cols: Sequence[str],
                    value_col: str, quantiles: Sequence[float],
                    scale: int = 4) -> DataFrame:
    """Exact per-group quantiles (linear interpolation), one column per
    requested quantile named ``p<percent>`` and rounded to ``scale``.

    Exact ``percentile`` holds the group's values in the aggregation
    buffer: fine for bounded stats columns (scores, lengths); use
    approx_percentile(rsd) when the per-group value count itself is
    unbounded at the target scale.
    """
    aggs = [F.round(F.percentile(value_col, F.lit(q)), scale)
            .alias(f"p{int(round(q * 100))}")
            for q in quantiles]
    return df.groupBy(*[F.col(c) for c in group_cols]).agg(*aggs)


def group_quantiles_audited(df: DataFrame, group_cols: Sequence[str],
                            value_col: str, quantiles: Sequence[float],
                            scale: int = 4,
                            accuracy: int = 1000) -> DataFrame:
    """Exact per-group quantiles PLUS a rank-error audit of the scale path.

    At 100 TB the per-group value count is unbounded, so the production
    quantile is ``approx_percentile`` (Greenwald-Khanna sketch, public:
    SIGMOD'01), whose guarantee is an absolute RANK error <= n/accuracy.
    This operator returns the exact quantiles (the oracle-able answer at
    fixture scale) together with one boolean per quantile checking the
    sketch against its own contract, duplicate-safe: the count of group
    values strictly below the sketch's answer must not exceed the upper
    target rank, and the count at-or-below must reach the lower target
    rank (+-1 rank slack for the interpolation-definition seam).  A broken
    sketch path fails the constant-TRUE oracle; the exact columns keep
    their value oracle.
    """
    gcols = [F.col(c) for c in group_cols]
    exact = group_quantiles(df, group_cols, value_col, quantiles, scale)
    approx = df.groupBy(*gcols).agg(
        *[F.percentile_approx(value_col, F.lit(q), F.lit(accuracy))
          .alias(f"__a{i}") for i, q in enumerate(quantiles)])
    # NULL-SAFE equi-joins: groupBy keeps a NULL-keyed group, and a plain
    # equi-join would silently drop it from the audited output while the
    # exact side (and any SQL oracle's GROUP BY) keeps it
    def null_safe_join(left, right, payload_cols, broadcast=False):
        r = right.select(*[F.col(c).alias(f"__g{i}")
                           for i, c in enumerate(group_cols)],
                         *payload_cols)
        cond = None
        for i, c in enumerate(group_cols):
            piece = left[c].eqNullSafe(r[f"__g{i}"])
            cond = piece if cond is None else (cond & piece)
        out = left.join(F.broadcast(r) if broadcast else r, cond)
        return out.drop(*[f"__g{i}" for i in range(len(group_cols))])

    j = null_safe_join(df, approx,
                       [f"__a{i}" for i in range(len(quantiles))],
                       broadcast=True)
    eps = 1.0 / accuracy
    aggs = [F.count(value_col).alias("__n")]
    for i, _ in enumerate(quantiles):
        aggs.append(F.count(F.when(F.col(value_col) < F.col(f"__a{i}"), 1))
                    .alias(f"__lt{i}"))
        aggs.append(F.count(F.when(F.col(value_col) <= F.col(f"__a{i}"), 1))
                    .alias(f"__le{i}"))
    counts = j.groupBy(*gcols).agg(*aggs)
    oks = []
    for i, q in enumerate(quantiles):
        hi = (F.lit(q) + F.lit(eps)) * F.col("__n") + F.lit(1.0)
        lo = (F.lit(q) - F.lit(eps)) * F.col("__n") - F.lit(1.0)
        oks.append(((F.col(f"__lt{i}") <= hi)
                    & (F.col(f"__le{i}") >= lo))
                   .alias(f"p{int(round(q * 100))}_in_bound"))
    ok_names = [f"p{int(round(q * 100))}_in_bound" for q in quantiles]
    return null_safe_join(exact, counts.select(*gcols, *oks), ok_names)
