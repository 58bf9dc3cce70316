"""Point-in-time alignment operators (datapipe/align.py): as-of join and
interval join — differential against the naive theta-join formulation on
the events fixture, plus plan-shape guards (no nested-loop join, one
exchange for asof)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def clicks(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    return (ev.filter("event_type = 'click'")
            .select("event_id", "user_id", "ts", "value").cache())


@pytest.fixture(scope="module")
def purchases(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    # unique per (user_id, ts) — asof_join's determinism precondition
    return (ev.filter("event_type = 'purchase'")
            .groupBy("user_id", "ts").agg(F.max("value").alias("pval"))
            .cache())


def _naive_asof(clicks, purchases, direction="backward", strict=False):
    """Theta-join + row_number oracle for merge_asof semantics."""
    from pyspark.sql import Window

    if direction == "backward":
        cmp = (F.col("p.ts") < F.col("c.ts")) if strict \
            else (F.col("p.ts") <= F.col("c.ts"))
        order = F.col("p.ts").desc()
    else:
        cmp = (F.col("p.ts") > F.col("c.ts")) if strict \
            else (F.col("p.ts") >= F.col("c.ts"))
        order = F.col("p.ts").asc()
    j = (clicks.alias("c")
         .join(purchases.alias("p"),
               (F.col("c.user_id") == F.col("p.user_id")) & cmp, "left"))
    w = Window.partitionBy("c.event_id").orderBy(order)
    return (j.withColumn("__rn", F.row_number().over(w))
            .filter("__rn = 1")
            .select(F.col("c.event_id").alias("event_id"),
                    F.col("p.ts").alias("ts_r"),
                    F.col("p.pval").alias("pval_r")))


def _pairs(df):
    return {(r["event_id"], r["ts_r"], r["pval_r"]) for r in df.collect()}


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_naive(clicks, purchases, direction):
    from yupana_spark.datapipe.align import asof_join

    out = asof_join(clicks, purchases, on="ts", by=["user_id"],
                    value_cols=["pval"], direction=direction)
    assert out.count() == clicks.count()          # left rows never multiply
    got = _pairs(out.select("event_id", "ts_r", "pval_r"))
    want = _pairs(_naive_asof(clicks, purchases, direction))
    assert got == want
    assert any(t is not None for _, t, _ in got)  # non-vacuous


def test_asof_strict_excludes_equal_time(spark):
    from yupana_spark.datapipe.align import asof_join

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([(1, 1, t0)], "id long, k long, ts timestamp")
    right = spark.createDataFrame([(1, t0, 5.0)],
                                  "k long, ts timestamp, v double")
    inc = asof_join(left, right, on="ts", by=["k"], value_cols=["v"])
    assert inc.first()["v_r"] == 5.0
    exc = asof_join(left, right, on="ts", by=["k"], value_cols=["v"],
                    strict=True)
    assert exc.first()["v_r"] is None


def test_asof_tolerance_nulls_far_matches(clicks, purchases):
    from yupana_spark.datapipe.align import asof_join

    tol = 6 * 3600.0
    out = asof_join(clicks, purchases, on="ts", by=["user_id"],
                    value_cols=["pval"], tolerance=tol).cache()
    assert out.count() == clicks.count()          # rows kept, values nulled
    gap = F.col("ts").cast("timestamp").cast("double") - \
        F.col("ts_r").cast("timestamp").cast("double")
    assert out.filter(F.col("ts_r").isNotNull() & (gap > tol)).count() == 0
    # vs untolerated: every surviving match is the SAME match
    base = asof_join(clicks, purchases, on="ts", by=["user_id"],
                     value_cols=["pval"])
    got = _pairs(out.filter("ts_r IS NOT NULL")
                 .select("event_id", "ts_r", "pval_r"))
    want = _pairs(base.filter(
        (F.col("ts").cast("timestamp").cast("double")
         - F.col("ts_r").cast("timestamp").cast("double")) <= tol)
        .select("event_id", "ts_r", "pval_r"))
    assert got == want and len(got) > 0
    out.unpersist()


def test_asof_single_exchange_no_nested_loop(spark):
    """The scale contract: union + window = ONE shuffle on the by keys,
    and no nested-loop/cartesian anywhere.  Raw scans on both sides so the
    count isolates the operator's own exchanges (the purchases fixture's
    uniqueness groupBy would add its own)."""
    from yupana_spark.datapipe.align import asof_join

    ev = spark.read.parquet(f"{SF}/events.parquet")
    left = (ev.filter("event_type = 'click'")
            .select("event_id", "user_id", "ts", "value"))
    right = (ev.filter("event_type = 'purchase'")
             .select("user_id", "ts", F.col("value").alias("pval")))
    out = asof_join(left, right, on="ts", by=["user_id"],
                    value_cols=["pval"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    n_exch = plan.count("Exchange hashpartitioning")
    assert n_exch == 1, f"expected 1 exchange, got {n_exch}:\n{plan}"


def test_interval_join_matches_theta(clicks, purchases):
    from yupana_spark.datapipe.align import interval_join

    iv = (purchases.select("user_id",
                           F.col("ts").alias("start"),
                           (F.col("ts") + F.expr("INTERVAL 6 HOURS"))
                           .alias("end"), "pval"))
    out = interval_join(clicks, iv, t_col="ts", start_col="start",
                        end_col="end", by=["user_id"], bin_width=6 * 3600.0)
    got = {(r["event_id"], r["start"], r["pval"]) for r in out.collect()}
    naive = (clicks.alias("c").join(
        iv.alias("i"),
        (F.col("c.user_id") == F.col("i.user_id"))
        & (F.col("c.ts") >= F.col("i.start"))
        & (F.col("c.ts") < F.col("i.end"))))
    want = {(r["event_id"], r["start"], r["pval"]) for r in naive.collect()}
    assert got == want and len(got) > 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_exclusive_end_and_edges(spark):
    """Bin-edge cases: t == start (in), t == end (out), interval ending
    exactly on a bin edge must not leak into the next bin."""
    from yupana_spark.datapipe.align import interval_join

    h = 3600.0
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    ev = spark.createDataFrame(
        [(1, 1, at(0)), (2, 1, at(7200)), (3, 1, at(7199.999999)),
         (4, 1, at(3600))],
        "event_id long, k long, ts timestamp")
    iv = spark.createDataFrame([(1, at(0), at(7200))],
                               "k long, start timestamp, end timestamp")
    out = interval_join(ev, iv, t_col="ts", start_col="start",
                        end_col="end", by=["k"], bin_width=h)
    got = sorted(r["event_id"] for r in out.collect())
    assert got == [1, 3, 4]       # 2 is at the exclusive end


def test_interval_join_fanout_guard(spark):
    from yupana_spark.datapipe.align import interval_join

    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame([(1, 1, t0)],
                               "event_id long, k long, ts timestamp")
    iv = spark.createDataFrame(
        [(1, t0, t0 + dt.timedelta(days=365))],
        "k long, start timestamp, end timestamp")
    with pytest.raises(ValueError, match="bin_width"):
        interval_join(ev, iv, t_col="ts", start_col="start", end_col="end",
                      by=["k"], bin_width=60.0, max_bins_per_interval=100)


def test_asof_null_right_value_not_stitched(spark):
    """A matched right row whose VALUE is NULL must yield (its ts, NULL) —
    per-column running-last would stitch an older value onto the newer
    matched time (review finding r9)."""
    from yupana_spark.datapipe.align import asof_join

    t = dt.datetime(2024, 1, 1, 12, 0, 0)

    def at(s):
        return t + dt.timedelta(seconds=s)

    left = spark.createDataFrame([(1, 1, at(10))],
                                 "id long, k long, ts timestamp")
    right = spark.createDataFrame([(1, at(1), 10.0), (1, at(2), None)],
                                  "k long, ts timestamp, v double")
    r = asof_join(left, right, on="ts", by=["k"], value_cols=["v"]).first()
    assert r["ts_r"] == at(2) and r["v_r"] is None


def test_asof_null_times_match_nothing(spark):
    """NULL right times must not poison the running last (asc sorts nulls
    first); NULL left times must match nothing in either direction."""
    from yupana_spark.datapipe.align import asof_join

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([(1, 1, t), (2, 1, None)],
                                 "id long, k long, ts timestamp")
    right = spark.createDataFrame([(1, None, 99.0)],
                                  "k long, ts timestamp, v double")
    for direction in ("backward", "forward"):
        rows = {r["id"]: r for r in
                asof_join(left, right, on="ts", by=["k"], value_cols=["v"],
                          direction=direction).collect()}
        assert len(rows) == 2
        assert all(r["v_r"] is None and r["ts_r"] is None
                   for r in rows.values()), direction
    # and a real right row must still not reach the NULL-time left row
    right2 = spark.createDataFrame([(1, t, 7.0)],
                                   "k long, ts timestamp, v double")
    rows = {r["id"]: r for r in
            asof_join(left, right2, on="ts", by=["k"], value_cols=["v"],
                      direction="forward").collect()}
    assert rows[1]["v_r"] == 7.0 and rows[2]["v_r"] is None


def test_asof_multi_key_groups(spark):
    """Composite ``by`` keys partition independently."""
    from yupana_spark.datapipe.align import asof_join

    t0 = dt.datetime(2024, 1, 1)

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [(1, 1, "x", at(10)), (2, 1, "y", at(10)), (3, 2, "x", at(10))],
        "id long, k long, g string, ts timestamp")
    right = spark.createDataFrame(
        [(1, "x", at(5), 1.0), (1, "y", at(6), 2.0), (2, "x", at(7), 3.0)],
        "k long, g string, ts timestamp, v double")
    got = {r["id"]: r["v_r"] for r in
           asof_join(left, right, on="ts", by=["k", "g"],
                     value_cols=["v"]).collect()}
    assert got == {1: 1.0, 2: 2.0, 3: 3.0}
