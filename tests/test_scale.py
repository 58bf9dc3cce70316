"""Scale levers: bucketed co-located joins (plan-verified shuffle-free),
salted aggregation, schema checker."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    from yupana_spark.operators.scale import colocated_join, write_bucketed

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try:
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        od = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        write_bucketed(li, "b_lineitem", "l_orderkey", 8, sort_col="l_orderkey")
        write_bucketed(od.withColumnRenamed("o_orderkey", "l_orderkey"),
                       "b_orders", "l_orderkey", 8, sort_col="l_orderkey")
        joined = colocated_join(spark, "b_lineitem", "b_orders", "l_orderkey")
        plan = _plan(joined)
        assert "Exchange" not in plan  # co-located: no shuffle at all
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_salted_agg_matches_plain(spark):
    from yupana_spark.operators.scale import salted_agg

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    salted = salted_agg(
        df, ["l_returnflag"],
        {"qty": ("l_quantity", "sum"), "cnt": ("l_quantity", "count"),
         "mx": ("l_quantity", "max")},
        n_salts=8)
    plain = df.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("qty"), F.count("l_quantity").alias("cnt"),
        F.max("l_quantity").alias("mx"))
    a = {r["l_returnflag"]: (r["qty"], r["cnt"], r["mx"])
         for r in salted.collect()}
    b = {r["l_returnflag"]: (r["qty"], r["cnt"], r["mx"])
         for r in plain.collect()}
    assert a == b


def test_schema_checker_ok(spark):
    from yupana_spark import default_schema
    from yupana_spark.operators.checker import check_schema

    issues = check_schema(spark, default_schema(), "/root/testdata/sf0.001")
    assert issues == []


def test_schema_checker_detects_mismatch(spark):
    from yupana_spark import types as yt
    from yupana_spark.operators.checker import check_schema
    from yupana_spark.schema import Dimension, Metric, Schema, Table

    bad = Schema().add(Table(
        name="lineitem", time_column="l_shipdate",
        dimensions=(Dimension("l_orderkey", yt.INT),      # actually BIGINT
                    Dimension("nope", yt.STRING)),        # missing
        metrics=(Metric("l_quantity", yt.DOUBLE),),
    ))
    issues = check_schema(spark, bad, "/root/testdata/sf0.001")
    problems = {(i.column, i.problem.split(":")[0]) for i in issues}
    assert ("l_orderkey", "type mismatch") in problems
    assert ("nope", "missing in storage") in problems


def test_ivf_neardup_plan_shape(spark):
    """IVF multi-assignment candidates must join on cell equality — never a
    cartesian/nested-loop product — and verify inside applyInPandas blocks
    (vectors ship once per cell, not once per pair)."""
    from yupana_spark.datapipe.dedup import embedding_neardup_pairs_ivf

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = _plan(embedding_neardup_pairs_ivf(emb, threshold=0.45))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "FlatMapGroupsInPandas" in plan or "MapInPandas" in plan


def test_chunking_is_shuffle_free(spark):
    """Context-window chunking is a narrow explode over the scan: one
    staged projection, zero Exchange."""
    from yupana_spark.datapipe.pack import chunk_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(chunk_documents(docs))
    assert "Exchange" not in plan
    assert "Generate" in plan  # the explode


def test_codec_features_single_python_stage(spark):
    """Decode runs as ONE mapInPandas pass over the binary column — no
    shuffle, no per-row Python round trip."""
    from yupana_spark.datapipe.multimodal import (codec_features,
                                                  synth_codec_media_table)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(codec_features(synth_codec_media_table(docs)))
    assert "Exchange" not in plan
    assert plan.count("MapInPandas (") == 2  # encode pass + decode pass
    assert "BatchEvalPython" not in plan     # no row-at-a-time UDF
