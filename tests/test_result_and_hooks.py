"""Result cursor (Result.scala semantics), Schema text hooks (§2.10),
session windows."""

import datetime as dt
from decimal import Decimal

import pytest

from yupana_spark import E, Tsdb, query
from yupana_spark.result import YupanaResult

FROM = dt.datetime(1995, 1, 1)
TO = dt.datetime(2002, 1, 1)


def test_result_cursor(tsdb):
    q = query(
        "lineitem", FROM, TO,
        fields=[
            (E.Field("l_returnflag"), "flag"),
            (E.sum_(E.Cast(E.Field("l_quantity"), "DECIMAL(18,4)")), "qty"),
            (E.count(E.Field("l_quantity")), "cnt"),
        ],
        group_by=[E.Field("l_returnflag")],
    )
    r = YupanaResult(tsdb.query(q))
    assert r.field_names == ["flag", "qty", "cnt"]
    seen = {}
    while r.next():
        assert not r.is_null("flag")
        assert isinstance(r.get_decimal("qty"), Decimal)
        seen[r.get_string("flag")] = r.get_long(2)  # by index too
    assert set(seen) == {"A", "N", "R"}
    assert all(v > 0 for v in seen.values())
    with pytest.raises(KeyError):
        r._pos("nope")


def test_custom_tokenizer_hook(spark):
    from yupana_spark.catalog import default_schema

    schema = default_schema()
    schema.tokenizer = lambda s: [w.upper() for w in s.split()]
    tsdb = Tsdb(spark, schema, "/root/testdata/sf0.001")
    df = tsdb.sql(
        "SELECT tokens(o_orderpriority) t, count(o_orderkey) c FROM orders "
        "WHERE time >= TIMESTAMP '1995-01-01' AND time < TIMESTAMP '2002-01-01' "
        "GROUP BY t")
    toks = [r["t"] for r in df.collect()]
    assert all(all(w.isupper() for w in t) for t in toks)


def test_item_fixer_hook(spark, tmp_path):
    from yupana_spark import types as yt
    from yupana_spark.schema import Dimension, Metric, Schema, Table

    schema = Schema(item_fixer=lambda s: s.strip().lower())
    schema.add(Table(
        name="items", time_column="time",
        dimensions=(Dimension("item", yt.STRING, kind="hash"),),
        metrics=(Metric("qty", yt.DOUBLE),),
    ))
    tsdb = Tsdb(spark, schema, str(tmp_path), warehouse_root=str(tmp_path / "wh"))
    base = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), "widget", 1.0)], "time timestamp, item string, qty double")
    tsdb.warehouse.write_table("items", base)
    tsdb.warehouse.upsert("items", spark.createDataFrame(
        [(dt.datetime(2024, 1, 2), "  WIDGET ", 2.0)],
        "time timestamp, item string, qty double"))
    rows = tsdb.warehouse.read("items").collect()
    assert {r["item"] for r in rows} == {"widget"}  # fixer canonicalized


def test_session_windows_batch(spark):
    from pyspark.sql import functions as F

    from yupana_spark.streaming.session import sessionize

    events = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 10, 0)),
         (1, dt.datetime(2024, 1, 1, 10, 10)),
         (1, dt.datetime(2024, 1, 1, 11, 30)),   # > 30min gap -> new session
         (2, dt.datetime(2024, 1, 1, 9, 0))],
        "user_id bigint, time timestamp")
    out = sessionize(events, gap="30 minutes", key_cols=["user_id"])
    rows = {(r["user_id"], r["session_start"]): r["n_events"]
            for r in out.collect()}
    assert rows[(1, dt.datetime(2024, 1, 1, 10, 0))] == 2
    assert rows[(1, dt.datetime(2024, 1, 1, 11, 30))] == 1
    assert rows[(2, dt.datetime(2024, 1, 1, 9, 0))] == 1


def test_session_windows_streaming(spark, tmp_path):
    import json

    from pyspark.sql import functions as F, types as T

    from yupana_spark.streaming.session import sessionize

    src = tmp_path / "sess_src"
    src.mkdir()
    rows = [{"user_id": 1, "ts": "2024-01-01 10:00:00"},
            {"user_id": 1, "ts": "2024-01-01 10:05:00"}]
    (src / "b.json").write_text("\n".join(json.dumps(r) for r in rows))
    schema = T.StructType([T.StructField("user_id", T.LongType()),
                           T.StructField("ts", T.StringType())])
    stream = (spark.readStream.schema(schema).json(str(src))
              .withColumn("time", F.to_timestamp("ts")))
    out = sessionize(stream, gap="30 minutes", key_cols=["user_id"],
                     watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("sess")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sess").collect()
    assert len(got) == 1 and got[0]["n_events"] == 2
