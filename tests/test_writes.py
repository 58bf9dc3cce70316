"""Write path: put / UPSERT / rollup / changelog / admin statements."""

import datetime as dt

import pytest

from yupana_spark import E, Tsdb, default_schema


@pytest.fixture()
def wtsdb(spark, tmp_path):
    return Tsdb(spark, default_schema(), "/root/testdata/sf0.001",
                warehouse_root=str(tmp_path / "wh"))


TB = "time >= TIMESTAMP '1995-01-01' AND time < TIMESTAMP '2002-01-01'"


def test_upsert_sql_roundtrip(wtsdb):
    before = wtsdb.sql(f"SELECT count(l_orderkey) c FROM lineitem WHERE {TB}") \
        .collect()[0]["c"]
    out = wtsdb.sql(
        "UPSERT INTO lineitem (time, l_orderkey, l_partkey, l_suppkey, "
        "l_linenumber, l_quantity) VALUES "
        "(TIMESTAMP '1996-06-06', 999999, 1, 1, 1, 42.0), "
        "(TIMESTAMP '1996-06-07', 999999, 1, 1, 2, 43.0)")
    assert out.collect()[0]["UPSERTED"] == 2
    after = wtsdb.sql(f"SELECT count(l_orderkey) c FROM lineitem WHERE {TB}") \
        .collect()[0]["c"]
    assert after == before + 2
    # idempotent by key: replaying the same upsert must not duplicate
    wtsdb.sql(
        "UPSERT INTO lineitem (time, l_orderkey, l_partkey, l_suppkey, "
        "l_linenumber, l_quantity) VALUES "
        "(TIMESTAMP '1996-06-06', 999999, 1, 1, 1, 50.0)")
    again = wtsdb.sql(f"SELECT count(l_orderkey) c FROM lineitem WHERE {TB}") \
        .collect()[0]["c"]
    assert again == after
    q = wtsdb.sql(f"SELECT sum(l_quantity) s FROM lineitem WHERE {TB} "
                  "AND l_orderkey = 999999").collect()[0]["s"]
    assert q == 50.0 + 43.0  # first row replaced, second kept


def test_put_rows(wtsdb):
    wh = wtsdb.warehouse
    row = {c: None for c in wh.read("events").columns}
    row.update(event_id=123456789, ts=dt.datetime(2024, 1, 15),
               time=dt.datetime(2024, 1, 15), user_id=1,
               event_type="synthetic", value=1.5, props="{}")
    n = wh.put_rows("events", [row])
    assert n == 1
    got = wtsdb.sql(
        "SELECT event_type et FROM events WHERE time >= TIMESTAMP '2024-01-15' "
        "AND time < TIMESTAMP '2024-01-16' AND event_id = 123456789").collect()
    assert got and got[0]["et"] == "synthetic"


def test_rollup_and_changelog(wtsdb):
    from yupana_spark.operators.rollup import Rollup, run_rollup

    r = Rollup(
        name="lineitem_by_day",
        from_table="lineitem",
        to_table="lineitem_by_day",
        time_trunc="day",
        group_by=("l_returnflag",),
        aggregates=(
            (E.sum_(E.Cast(E.Field("l_quantity", "DOUBLE"), "DECIMAL(18,4)")),
             "sum_qty"),
            (E.count(E.Field("l_quantity", "DOUBLE")), "cnt"),
        ),
    )
    out = run_rollup(wtsdb.warehouse, r)
    assert out.count() > 100
    # rollup result matches direct aggregation
    direct = wtsdb.sql(
        f"SELECT trunc_day(time) d, l_returnflag, count(l_quantity) c "
        f"FROM lineitem WHERE {TB} GROUP BY d, l_returnflag")
    assert out.count() == direct.count()


def test_updates_intervals_changelog(wtsdb):
    wtsdb.sql(
        "UPSERT INTO lineitem (time, l_orderkey, l_partkey, l_suppkey, "
        "l_linenumber, l_quantity) VALUES (TIMESTAMP '1997-03-03', 888888, 1, 1, 1, 1.0)")
    iv = wtsdb.sql("SHOW UPDATES_INTERVALS")
    rows = iv.collect()
    # statement-facing shape = the reference's five columns
    assert set(iv.columns) == {"table", "updated_at", "from", "to",
                               "updated_by"}
    assert any(r["table"] == "lineitem"
               and r["from"] == dt.datetime(1997, 3, 3)
               and r["to"] == dt.datetime(1997, 3, 4) for r in rows)


def test_admin_statements(wtsdb):
    tables = [r["TABLE_NAME"] for r in wtsdb.sql("SHOW TABLES").collect()]
    assert "lineitem" in tables and "orders" in tables
    cols = wtsdb.sql("SHOW COLUMNS FROM lineitem").collect()
    names = [r["COLUMN_NAME"] for r in cols]
    assert "time" in names and "l_quantity" in names
    assert any(n.startswith("PartLink_") for n in names)
    v = wtsdb.sql("SHOW VERSION").collect()[0]
    assert v["VERSION"]
    fns = [r["NAME"] for r in wtsdb.sql("SHOW FUNCTIONS FOR VARCHAR").collect()]
    assert "lower" in fns and "count" in fns
    qs = wtsdb.sql("SHOW QUERIES LIMIT 5").collect()
    assert len(qs) >= 1  # at least this session's statements
    ok = wtsdb.sql("SET spark.yupana.test = 'on'").collect()[0]
    assert ok["VALUE"] == "on"
    assert wtsdb.spark.conf.get("spark.yupana.test") == "on"
    deleted = wtsdb.sql("DELETE QUERIES WHERE STATE = 'FINISHED'").collect()[0]
    assert deleted["DELETED"] >= 1


def test_streaming_ingest(wtsdb, tmp_path):
    import json

    from yupana_spark.streaming.ingest import read_json_stream, save_data_points

    src = tmp_path / "stream_src"
    src.mkdir()
    events = wtsdb.warehouse.read("events")
    rows = [
        {"event_id": 555000 + i, "ts": f"2024-01-2{i} 00:00:00",
         "user_id": 7, "event_type": "streamed", "value": float(i),
         "props": "{}"}
        for i in range(3)
    ]
    (src / "batch1.json").write_text("\n".join(json.dumps(r) for r in rows))

    from pyspark.sql import functions as F, types as T

    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])
    stream = read_json_stream(wtsdb.spark, str(src), schema)
    stream = (stream.withColumn("ts", F.to_timestamp("ts"))
              .withColumn("time", F.col("ts")))
    q = save_data_points(stream, wtsdb.warehouse, "events",
                         str(tmp_path / "ckpt"), trigger_once=True)
    q.awaitTermination(120)
    got = wtsdb.sql(
        "SELECT count(event_id) c FROM events WHERE "
        "time >= TIMESTAMP '2024-01-20' AND time < TIMESTAMP '2024-01-25' "
        "AND event_type = 'streamed'").collect()[0]["c"]
    assert got == 3


def test_recalculate_month_rollup_preserves_full_bucket(wtsdb):
    """A dirty DAY must recompute its whole MONTH bucket: the incremental
    merge replaces entire buckets, so a one-day recompute window used to
    overwrite the month aggregate with a single day's partial sums."""
    from yupana_spark.operators.rollup import Rollup, recalculate, run_rollup

    r = Rollup(
        name="lineitem_by_month_recalc",
        from_table="lineitem",
        to_table="lineitem_by_month_recalc",
        time_trunc="month",
        group_by=("l_returnflag",),
        aggregates=((E.count(E.Field("l_quantity", "DOUBLE")), "cnt"),),
    )
    run_rollup(wtsdb.warehouse, r)

    def month_cnt():
        rows = wtsdb.warehouse.read("lineitem_by_month_recalc").filter(
            "time = TIMESTAMP '1997-03-01'").collect()
        return {x["l_returnflag"]: x["cnt"] for x in rows}

    before = month_cnt()
    # dirty one day inside 1997-03 via an upsert (writes the changelog too)
    wtsdb.sql(
        "UPSERT INTO lineitem (time, l_orderkey, l_partkey, l_suppkey, "
        "l_linenumber, l_quantity) VALUES "
        "(TIMESTAMP '1997-03-15', 777777, 1, 1, 1, 5.0)")
    recalculate(wtsdb.warehouse, r)
    after = month_cnt()
    # exactly one more row in the month bucket of that flag-partition set;
    # every other flag's full-month count must survive the recompute
    assert sum(after.values()) == sum(before.values()) + 1
    assert all(after[k] >= before[k] for k in before)
    # sanity: buckets hold multiple days' rows, so a one-day overwrite would
    # have collapsed counts (caught by the >= assertion above)
    assert min(before.values()) > 2


def test_show_queries_stage_breakdown(wtsdb):
    """SHOW QUERIES exposes per-stage timings (≙ TsdbQueryMetrics persisted
    create/filter/reduce stage metrics)."""
    wtsdb.sql(f"SELECT count(l_orderkey) c FROM lineitem WHERE {TB}").collect()
    rows = wtsdb.sql("SHOW QUERIES LIMIT 3").collect()
    cols = set(rows[0].asDict())
    assert {"PARSE_S", "ANALYZE_S", "COMPILE_S"} <= cols
    done = [r for r in rows if r["STATE"] == "FINISHED"
            and r["QUERY"].startswith("SELECT count")]
    assert done and done[0]["COMPILE_S"] > 0.0 and done[0]["PARSE_S"] > 0.0


def test_metrics_survive_new_tsdb(spark, tmp_path):
    """Persisted TsdbQueryMetrics parity: finished metrics land under the
    warehouse root and a NEW engine instance over the same root (simulated
    restart: live registry wiped) reads them back; DELETE QUERIES removes
    them durably."""
    from yupana_spark.operators.metrics import REGISTRY

    root = str(tmp_path / "wh")
    t1 = Tsdb(spark, default_schema(), "/root/testdata/sf0.001",
              warehouse_root=root)
    t1.sql(f"SELECT count(l_orderkey) c FROM lineitem WHERE {TB}").collect()
    qid = [m.query_id for m in REGISTRY.snapshot()
           if m.query.startswith("SELECT count(l_orderkey)")][-1]

    # simulated restart: in-memory registry gone, fresh Tsdb on same root
    REGISTRY.delete()
    t2 = Tsdb(spark, default_schema(), "/root/testdata/sf0.001",
              warehouse_root=root)
    rows = {r["QUERY_ID"]: r for r in t2.sql("SHOW QUERIES").collect()}
    assert qid in rows
    assert rows[qid]["STATE"] == "FINISHED"
    assert rows[qid]["PARSE_S"] > 0.0 and rows[qid]["COMPILE_S"] > 0.0

    deleted = t2.sql(f"DELETE QUERIES WHERE QUERY_ID = '{qid}'") \
        .collect()[0]["DELETED"]
    assert deleted == 1
    t3 = Tsdb(spark, default_schema(), "/root/testdata/sf0.001",
              warehouse_root=root)
    # the DELETE/SHOW statements themselves create new metric rows; the
    # original query id must be gone durably
    assert qid not in {r["QUERY_ID"]
                       for r in t3.sql("SHOW QUERIES").collect()}


def test_dictionary_ids_ingest_parity(spark, tmp_path):
    """Ingest-time dictionary ids (Dictionary.scala:24-105 insertion
    semantics): the first upsert seeds sorted-value ids for the pre-existing
    corpus, new values append after the max in arrival order — so a LATER
    value that sorts EARLIER keeps a higher id (sorted-value recomputation
    would renumber it), ids survive a new Tsdb over the same root, and
    replays are no-ops."""
    root = str(tmp_path / "wh")
    t1 = Tsdb(spark, default_schema(), "/root/testdata/sf0.001",
              warehouse_root=root)
    q = ("SELECT l_returnflag, id(l_returnflag) AS fid, "
         f"count(l_orderkey) AS c FROM lineitem WHERE {TB} "
         "GROUP BY l_returnflag, fid")
    base = {r["l_returnflag"]: r["fid"] for r in t1.sql(q).collect()}
    assert base == {"A": 1, "N": 2, "R": 3}  # sorted-value fixture ids

    def ins(flag, key):
        t1.sql("UPSERT INTO lineitem (time, l_orderkey, l_partkey, "
               "l_suppkey, l_linenumber, l_returnflag, l_quantity) VALUES "
               f"(TIMESTAMP '1996-02-02', {key}, 1, 1, 1, '{flag}', 1.0)")

    ins("Z", 888881)          # new value after seeding -> appended: id 4
    ins("B", 888882)          # sorts before N/R/Z but arrived LAST -> id 5
    ids = {r["l_returnflag"]: r["fid"] for r in t1.sql(q).collect()}
    assert ids == {"A": 1, "N": 2, "R": 3, "Z": 4, "B": 5}

    # survives a fresh engine instance over the same warehouse root
    t2 = Tsdb(spark, default_schema(), "/root/testdata/sf0.001",
              warehouse_root=root)
    ids2 = {r["l_returnflag"]: r["fid"] for r in t2.sql(q).collect()}
    assert ids2 == ids

    # replaying a known value never renumbers anything
    t1.sql("UPSERT INTO lineitem (time, l_orderkey, l_partkey, l_suppkey, "
           "l_linenumber, l_returnflag, l_quantity) VALUES "
           "(TIMESTAMP '1996-02-03', 888883, 1, 1, 1, 'Z', 2.0)")
    ids3 = {r["l_returnflag"]: r["fid"] for r in t1.sql(q).collect()}
    assert ids3 == ids


def test_updates_intervals_where_filters(spark, tmp_path):
    """SHOW UPDATES_INTERVALS WHERE per UpdatesIntervalsProvider.scala
    :95-117: the closed condition set filters, everything else rejects
    with the reference's 'Unsupported condition' message."""
    t = Tsdb(spark, default_schema(), "/root/testdata/sf0.001",
             warehouse_root=str(tmp_path / "wh"), user="alice")
    t.sql("UPSERT INTO lineitem (time, l_orderkey, l_partkey, l_suppkey, "
          "l_linenumber, l_quantity) VALUES "
          "(TIMESTAMP '1997-03-03', 888888, 1, 1, 1, 1.0)")
    t.sql("UPSERT INTO events (time, event_id, user_id, event_type, value) "
          "VALUES (TIMESTAMP '2024-03-01 10:00:00', 1, 1, 'x', 1.0)")

    def n(sql, params=None):
        return t.sql(sql, params=params).count()

    assert n("SHOW UPDATES_INTERVALS") == 2
    assert n("SHOW UPDATES_INTERVALS WHERE table = 'events'") == 1
    assert n("SHOW UPDATES_INTERVALS WHERE 'events' = table") == 1
    assert n("SHOW UPDATES_INTERVALS WHERE table = ?", ["lineitem"]) == 1
    assert n("SHOW UPDATES_INTERVALS WHERE updated_by = 'alice'") == 2
    assert n("SHOW UPDATES_INTERVALS WHERE updated_by = 'bob'") == 0
    # updated_at is wall-clock 'now': a wide window matches, an old one not
    assert n("SHOW UPDATES_INTERVALS WHERE updated_at BETWEEN "
             "TIMESTAMP '2000-01-01' AND TIMESTAMP '2100-01-01'") == 2
    assert n("SHOW UPDATES_INTERVALS WHERE updated_at BETWEEN "
             "TIMESTAMP '2000-01-01' AND TIMESTAMP '2001-01-01'") == 0
    # recalculated_at targets the rewritten day window [from, to)
    assert n("SHOW UPDATES_INTERVALS WHERE recalculated_at >= "
             "TIMESTAMP '2024-01-01'") == 1
    assert n("SHOW UPDATES_INTERVALS WHERE recalculated_at BETWEEN "
             "TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'") == 1
    # overlap arm: the range START falls inside the day window
    assert n("SHOW UPDATES_INTERVALS WHERE recalculated_at BETWEEN "
             "TIMESTAMP '1997-03-03 12:00:00' "
             "AND TIMESTAMP '1997-03-10'") == 1
    # AND-composition narrows
    assert n("SHOW UPDATES_INTERVALS WHERE table = 'events' AND "
             "updated_by = 'alice' AND recalculated_at BETWEEN "
             "TIMESTAMP '2024-02-01' AND TIMESTAMP '2024-04-01'") == 1
    for bad in [
        "SHOW UPDATES_INTERVALS WHERE value > 3",
        "SHOW UPDATES_INTERVALS WHERE table <> 'events'",
        "SHOW UPDATES_INTERVALS WHERE table = 'a' OR table = 'b'",
        "SHOW UPDATES_INTERVALS WHERE updated_at BETWEEN 1 AND 2",
    ]:
        with pytest.raises(Exception, match="Unsupported|required"):
            t.sql(bad)
    with pytest.raises(Exception, match="not defined"):
        t.sql("SHOW UPDATES_INTERVALS WHERE table = ?")
    # programmatic filter parity with ChangelogDaoHBase.dateRangeFilter:
    # a BEFORE-only updated_at bound is `case _ => None` — NO filter
    from yupana_spark.operators.writes import UpdatesIntervalsFilter

    wh = t.warehouse
    old = dt.datetime(2000, 1, 1)
    assert wh.updates_intervals(
        UpdatesIntervalsFilter(updated_before=old)).count() == 2
    assert wh.updates_intervals(
        UpdatesIntervalsFilter(updated_after=old)).count() == 2
    assert wh.updates_intervals(
        UpdatesIntervalsFilter(updated_after=dt.datetime(2100, 1, 1))
    ).count() == 0


def test_recalculate_incremental_since_filter(wtsdb):
    """Incremental recalc: `since` restricts to changelog entries written
    at or after that instant (the scheduled-rollup contract), and a
    future `since` with nothing dirty leaves the rollup untouched."""
    import datetime as dt2

    from yupana_spark.operators.rollup import Rollup, recalculate, \
        run_rollup

    r = Rollup(
        name="lineitem_by_month_inc",
        from_table="lineitem",
        to_table="lineitem_by_month_inc",
        time_trunc="month",
        group_by=("l_returnflag",),
        aggregates=((E.count(E.Field("l_quantity", "DOUBLE")), "cnt"),),
    )
    run_rollup(wtsdb.warehouse, r)

    def total():
        return sum(x["cnt"] for x in
                   wtsdb.warehouse.read("lineitem_by_month_inc").collect())

    base = total()
    # nothing written since the far future -> untouched (and no full rerun)
    out = recalculate(wtsdb.warehouse, r,
                      since=dt2.datetime(9000, 1, 1))
    assert sum(x["cnt"] for x in out.collect()) == base
    mark = dt2.datetime.now() - dt2.timedelta(seconds=1)
    wtsdb.sql(
        "UPSERT INTO lineitem (time, l_orderkey, l_partkey, l_suppkey, "
        "l_linenumber, l_quantity) VALUES "
        "(TIMESTAMP '1997-05-15', 777778, 1, 1, 1, 5.0)")
    recalculate(wtsdb.warehouse, r, since=mark)
    assert total() == base + 1
    # updated_by narrowing: this warehouse writes as 'anonymous'
    recalculate(wtsdb.warehouse, r, updated_by="somebody_else")
    assert total() == base + 1                 # nothing matched, unchanged


def test_recalculate_bootstraps_full_target_with_dirty_changelog(wtsdb):
    """A never-materialized rollup target + a NON-empty changelog must
    still bootstrap the FULL table — replaying only the dirty buckets
    would install a partial rollup that later runs never repair."""
    from yupana_spark.operators.rollup import Rollup, recalculate

    # dirty exactly one day BEFORE the target ever exists
    wtsdb.sql(
        "UPSERT INTO lineitem (time, l_orderkey, l_partkey, l_suppkey, "
        "l_linenumber, l_quantity) VALUES "
        "(TIMESTAMP '1997-07-07', 777779, 1, 1, 1, 2.0)")
    r = Rollup(
        name="lineitem_by_month_boot",
        from_table="lineitem",
        to_table="lineitem_by_month_boot",
        time_trunc="month",
        group_by=("l_returnflag",),
        aggregates=((E.count(E.Field("l_quantity", "DOUBLE")), "cnt"),),
    )
    out = recalculate(wtsdb.warehouse, r)
    months = {x["time"] for x in out.select("time").distinct().collect()}
    assert len(months) > 12          # full history, not just 1997-07


def test_compact_preserves_content_and_merges_files(wtsdb):
    """compact(): physical re-layout only — row multiset identical, file
    count per time-bucket partition drops to ~1, bucket pruning survives."""
    import pyspark.sql.functions as F

    wh = wtsdb.warehouse
    # seed a warehouse copy spread over many shuffle files
    src = wtsdb.schema.load(wtsdb.spark, wtsdb.sf_dir, "orders") \
        .repartition(8)
    wh.write_table("orders", src)
    before_rows = sorted(map(tuple, wh.read("orders").collect()))
    stats = wh.compact("orders")
    assert stats["files_after"] < stats["files_before"]
    after = wh.read("orders")
    assert sorted(map(tuple, after.collect())) == before_rows
    # one file per month partition
    import os

    path = wh.path("orders")
    per_part = {}
    for root, _, fs in os.walk(path):
        n = sum(1 for f in fs if f.endswith(".parquet"))
        if n:
            per_part[root] = n
    assert per_part and all(n == 1 for n in per_part.values())
    # still prunable + queryable through the engine
    got = wtsdb.sql(f"SELECT count(o_orderkey) c FROM orders WHERE {TB}") \
        .collect()[0]["c"]
    assert got == len(before_rows)


def test_compact_missing_table_raises(wtsdb):
    with pytest.raises(KeyError):
        wtsdb.warehouse.compact("orders")


def test_compact_pins_artifact_token(wtsdb):
    """compact() is content-identical, so the table's artifact token must
    survive it (no refits for a physical re-layout); the next real write
    must invalidate as usual."""
    wh = wtsdb.warehouse
    src = wtsdb.schema.load(wtsdb.spark, wtsdb.sf_dir, "orders") \
        .repartition(4)
    wh.write_table("orders", src)
    t0 = wh.table_token("orders")
    wh.compact("orders")
    assert wh.table_token("orders") == t0          # pinned across compact
    wh.compact("orders")
    assert wh.table_token("orders") == t0          # and across a re-compact
    wtsdb.sql(
        "UPSERT INTO orders (time, o_orderkey, o_custkey, o_orderstatus, "
        "o_orderpriority, o_totalprice) VALUES "
        "(TIMESTAMP '1996-06-01', 990001, 1, 'F', '1-URGENT', 9.5)")
    assert wh.table_token("orders") != t0          # real write invalidates


def test_compact_max_records_per_file_resplit(wtsdb):
    """max_records_per_file re-splits oversized partitions while content
    stays identical."""
    wh = wtsdb.warehouse
    src = wtsdb.schema.load(wtsdb.spark, wtsdb.sf_dir, "orders")
    wh.write_table("orders", src)
    n = wh.read("orders").count()
    before = sorted(map(tuple, wh.read("orders").collect()))
    st = wh.compact("orders", max_records_per_file=25)
    assert sorted(map(tuple, wh.read("orders").collect())) == before
    # every file holds <= 25 rows => at least ceil(n/25) files
    assert st["files_after"] >= (n + 24) // 25


def test_compact_keeps_adhoc_bucket_column(wtsdb):
    """A table bucketed ad-hoc via write_table(time_col='ts') whose frame
    ALSO contains a 'time' column must keep its ts-derived buckets across
    compact(): the bucketing column is read from the write-time BUCKET_PIN
    sidecar, never re-guessed from the schema (advice r9)."""
    import os

    import pyspark.sql.functions as F

    wh = wtsdb.warehouse
    spark = wtsdb.spark
    df = spark.range(0, 40).select(
        F.col("id"),
        F.lit(dt.datetime(1997, 3, 5)).alias("ts"),      # bucket source
        F.lit(dt.datetime(1995, 7, 1)).alias("time"))    # decoy column
    wh.write_table("scratch", df, time_col="ts")

    def _parts():
        return sorted(d for d in os.listdir(wh.path("scratch"))
                      if d.startswith("__month="))

    before = _parts()
    assert before and "1997-03" in before[0], before
    for _ in range(2):                       # pin survives a re-compact too
        wh.compact("scratch")
        assert _parts() == before
    got = sorted(r["id"] for r in wh.read("scratch").collect())
    assert got == list(range(40))


def test_swap_sweeps_leaked_old_dirs(wtsdb, monkeypatch):
    """A failed .old delete must not leak forever: the next write of the
    table sweeps stale .old.* (and crashed .compact.*) siblings
    (advice r9)."""
    import glob

    import yupana_spark.operators.writes as W

    wh = wtsdb.warehouse
    src = wtsdb.schema.load(wtsdb.spark, wtsdb.sf_dir, "orders").limit(50)
    wh.write_table("orders", src)
    real = W.shutil.rmtree

    def flaky(path, ignore_errors=False, **kw):
        if ignore_errors:
            return                     # sweep is a no-op while "broken"
        raise OSError("simulated EBUSY")

    monkeypatch.setattr(W.shutil, "rmtree", flaky)
    wh.write_table("orders", src)              # .old delete fails -> leak
    leaked = glob.glob(wh.path("orders") + ".old.*")
    assert leaked
    monkeypatch.setattr(W.shutil, "rmtree", real)
    # also simulate a crashed compact's tmp dir
    os_stale = wh.path("orders") + ".compact.deadbeef"
    import os

    os.makedirs(os_stale, exist_ok=True)
    wh.write_table("orders", src)
    # .old is always safe (a completed rename's target — never written
    # into), so it sweeps immediately...
    assert not glob.glob(wh.path("orders") + ".old.*")
    # ...but a YOUNG .compact tmp may be another writer's in-flight job
    assert glob.glob(wh.path("orders") + ".compact.*")
    # past the activity horizon the next write sweeps it too
    wh.SWEEP_AGE_S = -1.0
    wh.write_table("orders", src)
    assert not glob.glob(wh.path("orders") + ".compact.*")
    assert wh.read("orders").count() == 50
