"""Batch file-ingest connectors (sources/files.py): CSV and JSON-lines land
through the standard upsert path — typed projection, missing/extra columns,
changelog and read-back all verified end-to-end."""

import json

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture()
def wh(spark, tmp_path):
    from yupana_spark import default_schema
    from yupana_spark.operators.writes import Warehouse

    return Warehouse(spark, default_schema(), SF_SMALL,
                     root=str(tmp_path / "wh"))


def test_ingest_csv(spark, wh, tmp_path):
    from yupana_spark.sources.files import ingest_file

    p = tmp_path / "batch.csv"
    p.write_text(
        "ts,event_id,user_id,event_type,value,extra_col\n"
        "2024-03-10 10:00:00,910001,7,csv_loaded,1.25,ignored\n"
        "2024-03-10 11:00:00,910002,8,csv_loaded,2.5,ignored\n")
    n = ingest_file(wh, "events", str(p))
    assert n == 2
    got = (wh.read("events")
           .filter("event_type = 'csv_loaded'")
           .orderBy("event_id").collect())
    assert [(r["event_id"], r["user_id"], r["value"]) for r in got] == \
        [(910001, 7, 1.25), (910002, 8, 2.5)]
    # the write logged its rewritten day in the changelog
    days = {(r["table_name"], r["day"].strftime("%Y-%m-%d"))
            for r in wh.updates_intervals().collect()}
    assert ("events", "2024-03-10") in days


def test_ingest_jsonl_missing_and_malformed_columns(spark, wh, tmp_path):
    from yupana_spark.sources.files import ingest_file

    p = tmp_path / "batch.jsonl"
    rows = [
        # 'time' spelled directly (not the source ts alias); props missing
        {"time": "2024-03-11 09:00:00", "event_id": 920001, "user_id": 9,
         "event_type": "json_loaded", "value": "3.75"},
        # malformed value -> typed NULL, not a failed batch
        {"time": "2024-03-11 10:00:00", "event_id": 920002, "user_id": 9,
         "event_type": "json_loaded", "value": "not-a-number"},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    assert ingest_file(wh, "events", str(p)) == 2
    got = {r["event_id"]: r for r in
           wh.read("events").filter("event_type = 'json_loaded'").collect()}
    assert got[920001]["value"] == 3.75
    assert got[920002]["value"] is None
    assert got[920001]["props"] is None


def test_infer_format_rejects_unknown(spark):
    from yupana_spark.sources.files import infer_format

    assert infer_format("/data/x.parquet") == "parquet"
    with pytest.raises(ValueError):
        infer_format("/data/x.avro")
