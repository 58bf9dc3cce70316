"""Differential fuzzing for the alignment operators (datapipe/align.py):
randomly generated (events, right-side, parameters) cases where the
scalable decompositions — union+running-last asof, bin-quantized interval
join — are compared against two independent oracles:

* a NAIVE Spark theta-join formulation (row_number over all qualifying
  right rows / inequality join), and
* DuckDB's native ASOF JOIN / inequality join on the same rows,

so a tie-ordering, tolerance-edge or bin-boundary bug shows up as a
three-way diff.  Seeded: every failure reproduces.  Timestamps are drawn
on a COARSE grid (whole seconds, narrow range) precisely to generate
equal-time collisions and bin-edge hits that continuous draws would
almost never produce.
"""

import datetime as dt
import random

import duckdb
import pytest
from pyspark.sql import functions as F

T0 = dt.datetime(2024, 1, 1)


def _gen_case(rng: random.Random, nulls: bool = False):
    n_keys = rng.randint(1, 4)
    grid = rng.choice([1, 7, 60])          # seconds between possible ticks
    span = rng.randint(20, 200)            # ticks
    left, right = [], []
    for i in range(rng.randint(1, 60)):
        lt = (None if nulls and rng.random() < 0.1
              else T0 + dt.timedelta(seconds=grid * rng.randint(0, span)))
        left.append((i, rng.randint(0, n_keys - 1), lt,
                     round(rng.uniform(0, 100), 2)))
    seen = set()
    for j in range(rng.randint(0, 40)):
        k = rng.randint(0, n_keys - 1)
        if nulls and rng.random() < 0.1:
            right.append((k, None, round(rng.uniform(0, 100), 2)))
            continue
        ts = T0 + dt.timedelta(seconds=grid * rng.randint(0, span))
        if (k, ts) in seen:                # uniqueness precondition
            continue
        seen.add((k, ts))
        rv = None if nulls and rng.random() < 0.15 \
            else round(rng.uniform(0, 100), 2)
        right.append((k, ts, rv))
    return left, right, grid, span


def _frames(spark, left, right):
    lf = spark.createDataFrame(
        left, "event_id long, k long, ts timestamp, value double")
    rf = spark.createDataFrame(right, "k long, ts timestamp, rv double")
    return lf, rf


def _naive_asof(lf, rf, direction, strict, tolerance):
    from pyspark.sql import Window

    cmp_ops = {("backward", False): "<=", ("backward", True): "<",
               ("forward", False): ">=", ("forward", True): ">"}
    op = cmp_ops[(direction, strict)]
    cond = F.expr(f"r.ts {op} l.ts") if direction == "backward" \
        else F.expr(f"r.ts {op} l.ts")
    j = (lf.alias("l").join(rf.alias("r"),
                            (F.col("l.k") == F.col("r.k")) & cond, "left"))
    order = F.col("r.ts").desc() if direction == "backward" \
        else F.col("r.ts").asc()
    w = Window.partitionBy("l.event_id").orderBy(order)
    out = (j.withColumn("__rn", F.row_number().over(w)).filter("__rn = 1")
           .select(F.col("l.event_id").alias("event_id"),
                   F.col("l.ts").alias("ts"),
                   F.col("r.ts").alias("ts_r"),
                   F.col("r.rv").alias("rv_r")))
    if tolerance is not None:
        gap = (F.col("ts").cast("double") - F.col("ts_r").cast("double")
               if direction == "backward"
               else F.col("ts_r").cast("double") - F.col("ts").cast("double"))
        keep = F.col("ts_r").isNotNull() & (gap <= F.lit(float(tolerance)))
        out = (out.withColumn("ts_r", F.when(keep, F.col("ts_r")))
               .withColumn("rv_r", F.when(keep, F.col("rv_r"))))
    return out


def _rows(df):
    return sorted((r["event_id"], r["ts_r"], r["rv_r"]) for r in df.collect())


@pytest.mark.parametrize("seed", range(12))
def test_asof_three_way(spark, seed):
    from yupana_spark.datapipe.align import asof_join

    rng = random.Random(1000 + seed)
    left, right, _, _ = _gen_case(rng)
    direction = rng.choice(["backward", "forward"])
    strict = rng.random() < 0.3
    tolerance = rng.choice([None, 0.0, 30.0, 3600.0])
    lf, rf = _frames(spark, left, right)

    got = _rows(asof_join(lf, rf, on="ts", by=["k"], value_cols=["rv"],
                          direction=direction, strict=strict,
                          tolerance=tolerance))
    want = _rows(_naive_asof(lf, rf, direction, strict, tolerance))
    assert got == want, (seed, direction, strict, tolerance)

    # DuckDB native ASOF (inclusive only — its operator has no strict or
    # tolerance variant, so gate those off)
    if not strict and tolerance is None:
        con = duckdb.connect()
        con.execute("CREATE TABLE l(event_id BIGINT, k BIGINT, "
                    "ts TIMESTAMP, value DOUBLE)")
        con.execute("CREATE TABLE r(k BIGINT, ts TIMESTAMP, rv DOUBLE)")
        con.executemany("INSERT INTO l VALUES (?,?,?,?)", left)
        if right:
            con.executemany("INSERT INTO r VALUES (?,?,?)", right)
        op = ">=" if direction == "backward" else "<="
        duck = con.execute(
            f"SELECT l.event_id, r.ts, r.rv FROM l ASOF LEFT JOIN r "
            f"ON l.k = r.k AND l.ts {op} r.ts").fetchall()
        assert sorted((a, b, c) for a, b, c in duck) == want, (seed, direction)


@pytest.mark.parametrize("seed", range(8))
def test_interval_three_way(spark, seed):
    from yupana_spark.datapipe.align import interval_join

    rng = random.Random(2000 + seed)
    left, right, grid, span = _gen_case(rng)
    lf, rf = _frames(spark, left, right)
    # interval length on the same coarse grid -> frequent exact-edge hits
    length = grid * rng.randint(1, max(2, span // 4))
    iv = rf.select("k", F.col("ts").alias("start"),
                   (F.col("ts") + F.expr(f"INTERVAL {length} SECONDS"))
                   .alias("end"), "rv")
    # bin width sometimes equal to, sometimes off the interval length
    width = float(rng.choice([length, grid, 3600, length + grid]))
    out = interval_join(lf, iv, t_col="ts", start_col="start",
                        end_col="end", by=["k"], bin_width=width)
    got = sorted((r["event_id"], r["start"], r["rv"]) for r in out.collect())
    naive = (lf.alias("l").join(
        iv.alias("i"), (F.col("l.k") == F.col("i.k"))
        & (F.col("l.ts") >= F.col("i.start"))
        & (F.col("l.ts") < F.col("i.end"))))
    want = sorted((r["event_id"], r["start"], r["rv"])
                  for r in naive.collect())
    assert got == want, (seed, length, width)

    con = duckdb.connect()
    con.execute("CREATE TABLE l(event_id BIGINT, k BIGINT, ts TIMESTAMP, "
                "value DOUBLE)")
    con.execute("CREATE TABLE r(k BIGINT, ts TIMESTAMP, rv DOUBLE)")
    con.executemany("INSERT INTO l VALUES (?,?,?,?)", left)
    if right:
        con.executemany("INSERT INTO r VALUES (?,?,?)", right)
    duck = con.execute(
        f"SELECT l.event_id, r.ts, r.rv FROM l JOIN r ON l.k = r.k "
        f"AND l.ts >= r.ts AND l.ts < r.ts + INTERVAL {length} SECONDS"
    ).fetchall()
    assert sorted((a, b, c) for a, b, c in duck) == want, (seed, length)


@pytest.mark.parametrize("seed", range(8))
def test_asof_nulls_vs_naive(spark, seed):
    """NULL times and NULL right values, asof vs the naive theta-join
    (which realizes merge_asof NULL semantics naturally: a NULL never
    satisfies the join comparison; matched NULL values ride through)."""
    from yupana_spark.datapipe.align import asof_join

    rng = random.Random(3000 + seed)
    left, right, _, _ = _gen_case(rng, nulls=True)
    direction = rng.choice(["backward", "forward"])
    strict = rng.random() < 0.3
    lf, rf = _frames(spark, left, right)

    got = _rows(asof_join(lf, rf, on="ts", by=["k"], value_cols=["rv"],
                          direction=direction, strict=strict))
    want = _rows(_naive_asof(lf, rf, direction, strict, None))
    assert got == want, (seed, direction, strict)
