"""Watermarked tumbling-window streaming aggregation (ingest.windowed_counts)."""

import datetime as dt
import json


def test_windowed_counts_streaming(spark, tmp_path):
    from pyspark.sql import functions as F, types as T

    from yupana_spark.streaming.ingest import windowed_counts

    src = tmp_path / "wc_src"
    src.mkdir()
    rows = [
        {"user_id": 1, "ts": "2024-01-01 10:05:00", "event_type": "click"},
        {"user_id": 2, "ts": "2024-01-01 10:25:00", "event_type": "click"},
        {"user_id": 1, "ts": "2024-01-01 11:10:00", "event_type": "view"},
    ]
    (src / "b.json").write_text("\n".join(json.dumps(r) for r in rows))
    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.StringType()),
        T.StructField("event_type", T.StringType()),
    ])
    stream = (spark.readStream.schema(schema).json(str(src))
              .withColumn("time", F.to_timestamp("ts")))
    out = windowed_counts(stream, window="1 hour", watermark="2 hours",
                          group_cols=["event_type"])
    q = (out.writeStream.format("memory").queryName("wc")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["win"]["start"], r["event_type"]): r["cnt"]
           for r in spark.sql("SELECT * FROM wc").collect()}
    assert got[(dt.datetime(2024, 1, 1, 10), "click")] == 2
    assert got[(dt.datetime(2024, 1, 1, 11), "view")] == 1
