"""KMV / theta sketch (datapipe/sketch.py): estimator accuracy against
known cardinalities, prefilter-path equivalence, set-operation algebra."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    """Two overlapping value sets with known cardinalities:
    A = v0..v19999 (20k), B = v10000..v29999 (20k), |A ∩ B| = 10k,
    |A ∪ B| = 30k.  Values are strings so hashes are spread."""
    a = spark.range(0, 20000).select(
        F.lit("A").alias("g"), F.concat(F.lit("v"), "id").alias("v"))
    b = spark.range(10000, 30000).select(
        F.lit("B").alias("g"), F.concat(F.lit("v"), "id").alias("v"))
    return a.unionAll(b).cache()


def _sketches(corpus, k=256, prefilter=True):
    from yupana_spark.datapipe.sketch import kmv_sketch

    rows = {r["g"]: r for r in
            kmv_sketch(corpus, "v", by=["g"], k=k,
                       prefilter=prefilter).collect()}
    return rows


def test_distinct_estimate_within_bounds(spark, corpus):
    from yupana_spark.datapipe.sketch import (kmv_distinct_est, kmv_rse,
                                              kmv_sketch)

    k = 256
    est = (kmv_sketch(corpus, "v", by=["g"], k=k)
           .select("g", kmv_distinct_est(F.col("mins"), F.col("theta"),
                                         k).alias("est")))
    got = {r["g"]: r["est"] for r in est.collect()}
    for g in ("A", "B"):
        assert abs(got[g] - 20000) <= 4 * kmv_rse(k) * 20000, (g, got[g])


def test_small_group_is_exact(spark):
    from yupana_spark.datapipe.sketch import kmv_distinct_est, kmv_sketch

    df = spark.range(0, 37).select(F.lit("g").alias("g"),
                                   F.concat(F.lit("x"), "id").alias("v"))
    # duplicate every value: distinct stays 37
    out = (kmv_sketch(df.unionAll(df), "v", by=["g"], k=256)
           .select(kmv_distinct_est(F.col("mins"), F.col("theta"), 256)
                   .alias("est"), "theta"))
    r = out.first()
    assert r["est"] == 37.0           # < k distinct and theta == 1 -> exact
    assert r["theta"] == 1.0


def test_prefilter_equals_unfiltered_sketch(corpus):
    filt = _sketches(corpus, prefilter=True)
    raw = _sketches(corpus, prefilter=False)
    for g in ("A", "B"):
        assert filt[g]["mins"] == raw[g]["mins"]
        assert filt[g]["theta"] < 1.0 and raw[g]["theta"] == 1.0


def test_intersection_and_union_estimates(spark, corpus):
    from yupana_spark.datapipe.sketch import (kmv_intersect_est,
                                              kmv_union_est, kmv_sketch)

    k = 256
    sk = kmv_sketch(corpus, "v", by=["g"], k=k)
    a = sk.filter("g = 'A'").select(F.col("mins").alias("ma"),
                                    F.col("theta").alias("ta"))
    b = sk.filter("g = 'B'").select(F.col("mins").alias("mb"),
                                    F.col("theta").alias("tb"))
    est = a.crossJoin(b).select(
        kmv_intersect_est(F.col("ma"), F.col("ta"),
                          F.col("mb"), F.col("tb"), k).alias("inter"),
        kmv_union_est(F.col("ma"), F.col("ta"),
                      F.col("mb"), F.col("tb"), k).alias("union")).first()
    # intersection samples ~ theta * |A ∩ B| hashes -> wider tolerance
    assert abs(est["inter"] - 10000) <= 0.35 * 10000, est["inter"]
    assert abs(est["union"] - 30000) <= 0.25 * 30000, est["union"]


def test_no_python_udf_in_plan(corpus):
    from yupana_spark.datapipe.sketch import kmv_sketch

    plan = kmv_sketch(corpus, "v", by=["g"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan


def test_global_sketch_no_by(spark):
    """Ungrouped sketch (the signature default) — the prefilter join must
    handle an empty key list (review finding r9)."""
    from yupana_spark.datapipe.sketch import kmv_distinct_est, kmv_sketch

    df = spark.range(0, 20000).select(
        F.concat(F.lit("v"), "id").alias("v"))
    r = (kmv_sketch(df, "v")
         .select(kmv_distinct_est(F.col("mins"), F.col("theta"))
                 .alias("est"))).first()
    assert abs(r["est"] - 20000) <= 0.3 * 20000


def test_nulls_are_not_values(spark):
    """NULLs must not count as a distinct value (COUNT DISTINCT ignores
    them; xxhash64 would fold them all to the seed fraction)."""
    from yupana_spark.datapipe.sketch import kmv_distinct_est, kmv_sketch

    vals = spark.range(0, 37).select(
        F.lit("g").alias("g"), F.concat(F.lit("x"), "id").alias("v"))
    nulls = spark.range(0, 5).select(
        F.lit("g").alias("g"), F.lit(None).cast("string").alias("v"))
    r = (kmv_sketch(vals.unionAll(nulls), "v", by=["g"], k=256)
         .select(kmv_distinct_est(F.col("mins"), F.col("theta"), 256)
                 .alias("est"))).first()
    assert r["est"] == 37.0


@pytest.mark.parametrize("overlap", [0.0, 0.25, 0.75])
def test_intersection_across_overlap_fractions(spark, overlap):
    """Intersection estimates track the true overlap across regimes;
    deterministic (fixed hash, fixed data), so exact bounds hold every
    run.  Zero overlap must estimate exactly zero (no shared hashes)."""
    from yupana_spark.datapipe.sketch import kmv_intersect_est, kmv_sketch

    n = 20000
    off = int(n * (1 - overlap))
    a = spark.range(0, n).select(F.lit("A").alias("g"),
                                 F.concat(F.lit("v"), "id").alias("v"))
    b = spark.range(off, off + n).select(F.lit("B").alias("g"),
                                         F.concat(F.lit("v"), "id")
                                         .alias("v"))
    sk = kmv_sketch(a.unionAll(b), "v", by=["g"], k=256)
    sa = sk.filter("g = 'A'").select(F.col("mins").alias("ma"),
                                     F.col("theta").alias("ta"))
    sb = sk.filter("g = 'B'").select(F.col("mins").alias("mb"),
                                     F.col("theta").alias("tb"))
    est = sa.crossJoin(sb).select(
        kmv_intersect_est(F.col("ma"), F.col("ta"),
                          F.col("mb"), F.col("tb"), 256).alias("i")
    ).first()["i"]
    true = n * overlap
    if overlap == 0.0:
        assert est == 0.0
    else:
        assert abs(est - true) <= 0.4 * true, (overlap, est)


def test_carried_k_column_drives_estimators(spark):
    """The sketch row carries its build size ``k``; estimators fed the
    carried column are correct for ANY build size without the caller
    repeating the constant (advice r9: an int mismatch — build k=512,
    estimate left at the 256 default — silently skewed the estimate)."""
    from yupana_spark.datapipe.sketch import kmv_distinct_est, kmv_sketch

    df = spark.range(0, 20000).select(
        F.lit("g").alias("g"), F.concat(F.lit("v"), "id").alias("v"))
    for k in (128, 512):
        sk = kmv_sketch(df, "v", by=["g"], k=k)
        r = sk.select(
            F.col("k").alias("built_k"),
            kmv_distinct_est(F.col("mins"), F.col("theta"), F.col("k"))
            .alias("est")).first()
        assert r["built_k"] == k
        assert abs(r["est"] - 20000) <= 0.5 * 20000, (k, r["est"])


def test_intersect_mixed_k_sketches(spark):
    """Two sketches built with DIFFERENT k intersect correctly when each
    side's carried k column is passed (theta clamps to the coarser
    side's effective threshold)."""
    from yupana_spark.datapipe.sketch import kmv_intersect_est, kmv_sketch

    n = 20000
    a = spark.range(0, n).select(F.concat(F.lit("v"), "id").alias("v"))
    b = spark.range(n // 2, n // 2 + n).select(
        F.concat(F.lit("v"), "id").alias("v"))
    sa = kmv_sketch(a, "v", k=512).select(
        F.col("mins").alias("ma"), F.col("theta").alias("ta"),
        F.col("k").alias("ka"))
    sb = kmv_sketch(b, "v", k=128).select(
        F.col("mins").alias("mb"), F.col("theta").alias("tb"),
        F.col("k").alias("kb"))
    est = sa.crossJoin(sb).select(
        kmv_intersect_est(F.col("ma"), F.col("ta"),
                          F.col("mb"), F.col("tb"),
                          F.col("ka"), F.col("kb")).alias("i")
    ).first()["i"]
    assert abs(est - n / 2) <= 0.45 * (n / 2), est


def test_prefilter_sizes_gate_large_path(spark, monkeypatch):
    """Past the group-count gate the per-group threshold join must NOT
    broadcast (advice r9: an unconditional broadcast of one row per
    group is unbounded under high-cardinality ``by``); values identical
    on both paths."""
    import yupana_spark.datapipe.sketch as sk_mod
    from yupana_spark.datapipe.sketch import kmv_distinct_est, kmv_sketch

    df = spark.range(0, 4000).select(
        (F.col("id") % 7).cast("string").alias("g"),
        F.concat(F.lit("v"), "id").alias("v"))
    monkeypatch.setattr(sk_mod, "_SIZES_BCAST_GATE", 2)
    sk = kmv_sketch(df, "v", by=["g"], k=64)
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    got = {r["g"]: r for r in
           sk.select("g", kmv_distinct_est(F.col("mins"), F.col("theta"),
                                           F.col("k")).alias("est"))
           .collect()}
    monkeypatch.setattr(sk_mod, "_SIZES_BCAST_GATE", 1_000_000)
    want = {r["g"]: r for r in
            kmv_sketch(df, "v", by=["g"], k=64)
            .select("g", kmv_distinct_est(F.col("mins"), F.col("theta"),
                                          F.col("k")).alias("est"))
            .collect()}
    assert set(got) == set(want)
    for g in got:
        assert got[g]["est"] == want[g]["est"], g
