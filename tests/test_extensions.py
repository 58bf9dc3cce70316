"""LSH embedding dedup scale path, multimodal resize/audio stubs,
standard rollups, Tsdb.explain."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_embedding_lsh_matches_bruteforce(spark):
    from yupana_spark.datapipe.dedup import (embedding_neardup_pairs,
                                             embedding_neardup_pairs_lsh)

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    # add a near-identical twin so there's a true high-cosine pair
    twin = emb.filter("vec_id = 5").select(
        F.lit(88888).cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.001)).alias("embedding"),
        F.col("label"))
    df = emb.unionByName(twin)
    exact = {(r["id_a"], r["id_b"])
             for r in embedding_neardup_pairs(df, threshold=0.9).collect()}
    approx = {(r["id_a"], r["id_b"])
              for r in embedding_neardup_pairs_lsh(df, threshold=0.9).collect()}
    assert (5, 88888) in exact
    assert approx == exact  # hamming<=3 of 12 planes keeps all cos>=0.9 pairs


def test_resize_and_audio_stubs(spark):
    from yupana_spark.datapipe.multimodal import (audio_features,
                                                  resize_images,
                                                  synth_media_table)

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(20)
    media = synth_media_table(docs, kind="image")
    resized = resize_images(media, 32, 32).collect()
    target = (32 * 32) // 1024
    assert all(len(r["content"]) == target for r in resized)
    assert {r["media_id"] for r in resized} == {r["doc_id"]
                                                for r in docs.collect()}
    audio = audio_features(synth_media_table(docs, kind="audio"))
    rows = audio.collect()
    assert all(r["duration_s"] > 0 and r["sample_rate"] == 16000 for r in rows)
    with pytest.raises(NotImplementedError):
        resize_images(media, use_fake=False)
    with pytest.raises(NotImplementedError):
        audio_features(media, use_fake=False)


def test_standard_rollups(spark, tmp_path):
    from yupana_spark import Tsdb, default_schema
    from yupana_spark.catalog import standard_rollups
    from yupana_spark.operators.rollup import run_rollup

    tsdb = Tsdb(spark, default_schema(), SF,
                warehouse_root=str(tmp_path / "wh"))
    outs = {}
    for r in standard_rollups():
        outs[r.name] = run_rollup(tsdb.warehouse, r)
    assert outs["orders_by_day"].count() > outs["orders_by_week"].count() \
        > outs["orders_by_month"].count() > 0
    mon = outs["orders_by_month"]
    assert {"time", "o_orderstatus", "total_sum", "orders_count"} <= set(mon.columns)
    # a rolled-up month total equals the direct aggregation
    direct = tsdb.sql(
        "SELECT trunc_month(time) m, o_orderstatus, count(o_orderkey) c "
        "FROM orders WHERE time >= TIMESTAMP '1995-01-01' "
        "AND time < TIMESTAMP '2002-01-01' GROUP BY m, o_orderstatus")
    assert direct.count() == mon.count()


def test_explain_surface(tsdb):
    plan = tsdb.explain(
        "SELECT l_returnflag, sum(l_quantity) s FROM lineitem "
        "WHERE time >= TIMESTAMP '1995-01-01' AND time < TIMESTAMP '1996-01-01' "
        "GROUP BY l_returnflag")
    assert "HashAggregate" in plan
    assert "PushedFilters" in plan and "l_shipdate" in plan
