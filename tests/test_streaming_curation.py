"""Streaming URL/domain curation twins (streaming/curation.py): replay ==
batch parity for blocklist flags (stateless, incl. the PSL path) and the
per-domain contribution cap (bounded keyed state, first-N admission)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _chunked_replay(spark, tmp_path, rows, schema, splits, name):
    src = tmp_path / f"{name}_src"
    src.mkdir()
    lo = 0
    for i, hi in enumerate(splits + (len(rows),)):
        spark.createDataFrame(rows[lo:hi], schema).coalesce(1) \
            .write.parquet(str(src / f"c{i}"))
        lo = hi
    fields = []
    for part in schema.split(","):
        nm, tp = part.split()
        fields.append(T.StructField(
            nm, {"long": T.LongType(), "string": T.StringType()}[tp]))
    return (spark.readStream.schema(T.StructType(fields))
            .option("maxFilesPerTrigger", 1).parquet(str(src / "*")))


def test_streaming_url_blocklist_matches_batch(spark, tmp_path):
    """Chunked replay of a URL corpus through streaming_url_blocklist
    (with a PSL frame) == the batch url_blocklist_flags decisions — the
    .com.sg row only blocks under PSL-exact extraction, proving the psl
    frame rides the stream-static join."""
    from yupana_spark.datapipe.curation import (prepare_psl,
                                                url_blocklist_flags)
    from yupana_spark.streaming.curation import streaming_url_blocklist

    rows = [
        (1, "https://www.shop.example.com.sg/p/1"),
        (2, "http://news.other.com/x"),
        (3, "sub.example.com.sg:8080/y"),
        (4, "https://clean.site.co.uk/z"),
        (5, None),
        (6, "example.com.sg"),
        # wildcard/exception grammar (r14): *.ck makes evil.ck a public
        # suffix (so a.evil.ck keys to a.evil.ck — blocked below);
        # !www.ck carves www.ck back out (x.www.ck keys to www.ck)
        (7, "https://a.evil.ck/p"),
        (8, "http://x.www.ck/q"),
    ]
    schema = "doc_id long, url string"
    docs = spark.createDataFrame(rows, schema)
    blocked = spark.createDataFrame([("https://Example.COM.SG/l",),
                                     ("a.evil.ck",), ("www.ck",)],
                                    "domain string")
    psl = prepare_psl(spark.createDataFrame(
        [("com.sg",), ("co.uk",), ("*.ck",), ("!www.ck",),
         ("// comment",)], "suffix string")).localCheckpoint(eager=True)
    batch = {r["doc_id"]: (r["domain"], r["url_blocked"])
             for r in url_blocklist_flags(docs, blocked,
                                          psl=psl).collect()}
    # PSL-exact: the subdomained .com.sg rows key to example.com.sg and
    # block; the heuristic would have keyed them to com.sg and missed
    assert batch[1] == ("example.com.sg", True)
    assert batch[3] == ("example.com.sg", True)
    assert batch[6] == ("example.com.sg", True)
    assert batch[2] == ("other.com", False)
    assert batch[5] == ("", False)
    assert batch[7] == ("a.evil.ck", True)     # wildcard suffix + 1
    assert batch[8] == ("www.ck", True)        # exception re-registers

    stream = _chunked_replay(spark, tmp_path, rows, schema, (2, 4), "bl")
    out = streaming_url_blocklist(stream, blocked, psl=psl)
    q = (out.writeStream.format("memory").queryName("sbl")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "bl_ck"))
         .trigger(availableNow=True).start())
    try:
        q.awaitTermination()
        streamed = {r["doc_id"]: (r["domain"], r["url_blocked"])
                    for r in spark.table("sbl").collect()}
    finally:
        q.stop()
        spark.catalog.dropTempView("sbl")
    assert streamed == batch


def test_streaming_domain_cap_matches_batch_on_ordered_replay(spark,
                                                              tmp_path):
    """The streaming per-domain cap admits the FIRST per_domain arrivals
    per registered domain with in-batch ties by id, so an id-ordered
    chunked replay equals the batch first-N-by-id frame; state carries
    across micro-batches (a domain filled in chunk 1 admits nothing
    later)."""
    from pyspark.sql.window import Window

    from yupana_spark.streaming.curation import streaming_domain_cap

    rows = [(i, f"https://www.site{i % 3}.com/p/{i}") for i in range(24)]
    schema = "doc_id long, url string"
    docs = spark.createDataFrame(rows, schema)
    # batch equivalent of arrival-order admission on an id-ordered
    # replay: row_number by id within each domain
    w = Window.partitionBy("domain").orderBy("doc_id")
    batch = {(r["doc_id"], r["domain"])
             for r in docs
             .withColumn("domain", F.concat(
                 F.lit("site"), (F.col("doc_id") % 3).cast("string"),
                 F.lit(".com")))
             .withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") <= 4)
             .select("doc_id", "domain").collect()}
    assert len(batch) == 12

    stream = _chunked_replay(spark, tmp_path, rows, schema, (8, 16),
                             "cap")
    out = streaming_domain_cap(stream, per_domain=4)
    q = (out.writeStream.format("memory").queryName("scap")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "cap_ck"))
         .trigger(availableNow=True).start())
    try:
        q.awaitTermination()
        streamed = {(r["id"], r["domain"])
                    for r in spark.table("scap").collect()}
    finally:
        q.stop()
        spark.catalog.dropTempView("scap")
    assert streamed == batch
    # cross-batch state: ids 0..8 fill every domain's budget of 4 by
    # id-order before chunk 3 begins, so nothing from ids 16.. survives
    assert all(i < 16 for i, _ in streamed)
    # the contract refuses a meaningless cap at plan time
    with pytest.raises(ValueError, match="per_domain"):
        streaming_domain_cap(stream, per_domain=0)


def test_streaming_samplers_match_batch(spark, tmp_path):
    """Streaming Bernoulli + temperature-mix admission (streaming/
    sample.py): a chunked replay selects EXACTLY the batch subsets —
    the Bernoulli predicate is row-local and the mix rates are a frozen
    artifact joined stream-static with the batch sampler's own
    membership expression."""
    from pyspark.sql import types as T

    from yupana_spark.datapipe.sample import (deterministic_sample,
                                              mix_tag_counts,
                                              temperature_mix_rates,
                                              temperature_mix_sample)
    from yupana_spark.streaming.sample import (streaming_bernoulli_sample,
                                               streaming_temperature_mix)

    rows = [(i, ["en", "en", "en", "de", "fr"][i % 5]) for i in range(60)]
    schema = "doc_id long, lang string"
    docs = spark.createDataFrame(rows, schema)
    b_bern = {r["doc_id"] for r in deterministic_sample(
        docs, "doc_id", 0.3, stratum_col="lang",
        stratum_rates={"en": 0.6}).collect()}
    b_mix = {r["doc_id"] for r in temperature_mix_sample(
        docs, "lang", "doc_id", alpha=0.3, target_total=30.0).collect()}
    assert 0 < len(b_bern) < 60 and 0 < len(b_mix) < 60
    rates = temperature_mix_rates(
        mix_tag_counts(docs, "lang"), "lang", alpha=0.3,
        target_total=30.0).localCheckpoint(eager=True)

    stream = _chunked_replay(spark, tmp_path, rows, schema, (20, 40),
                             "smp")
    outs = {}
    for name, out in (
        ("sbern", streaming_bernoulli_sample(
            stream, "doc_id", 0.3, stratum_col="lang",
            stratum_rates={"en": 0.6})),
        ("smix", streaming_temperature_mix(stream, rates,
                                           tag_col="lang")),
    ):
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / f"{name}_ck"))
             .trigger(availableNow=True).start())
        try:
            q.awaitTermination()
            outs[name] = {r["doc_id"]
                          for r in spark.table(name).collect()}
        finally:
            q.stop()
            spark.catalog.dropTempView(name)
    assert outs["sbern"] == b_bern
    assert outs["smix"] == b_mix


def test_streaming_domain_cap_string_ids(spark, tmp_path):
    """String/uuid ids pass through UNCAST (the bm25 r11 rule — a long
    cast would silently null them and the documented join-back would
    match nothing); in-batch ties order lexicographically."""
    from pyspark.sql import types as T

    from yupana_spark.streaming.curation import streaming_domain_cap

    rows = [(f"doc-{i:02d}", f"https://site{i % 2}.com/p") for i in
            range(8)]
    schema = "doc_id string, url string"
    src = tmp_path / "cs_src"
    src.mkdir()
    spark.createDataFrame(rows, schema).coalesce(1) \
        .write.parquet(str(src / "a"))
    stream = (spark.readStream
              .schema(T.StructType([T.StructField("doc_id", T.StringType()),
                                    T.StructField("url", T.StringType())]))
              .parquet(str(src / "*")))
    out = streaming_domain_cap(stream, per_domain=2)
    assert dict(out.dtypes)["id"] == "string"
    q = (out.writeStream.format("memory").queryName("scs")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "cs_ck"))
         .trigger(availableNow=True).start())
    try:
        q.awaitTermination()
        got = {r["id"] for r in spark.table("scs").collect()}
    finally:
        q.stop()
        spark.catalog.dropTempView("scs")
    # first 2 per domain by lexicographic id: site0 <- doc-00, doc-02;
    # site1 <- doc-01, doc-03 — and no NULLs
    assert got == {"doc-00", "doc-01", "doc-02", "doc-03"}


def test_streaming_domain_cap_event_time_eviction(spark, tmp_path):
    """EventTimeTimeout horizon on the cap state: a domain idle past the
    watermark horizon is evicted, so its budget RESETS (cap-per-horizon,
    the dup filter's eviction semantics) — the same replay without a
    horizon keeps the counter and rejects the late arrival forever."""
    import json
    import os

    from pyspark.sql import types as T

    from yupana_spark.streaming.curation import streaming_domain_cap

    docs = [  # (doc_id, url, event ts); horizon = 1h, per_domain = 1
        (1, "https://capped.com/a", "2024-01-01 00:00:00"),
        (50, "https://other.com/x", "2024-01-01 03:00:00"),   # watermark+
        (51, "https://third.com/y", "2024-01-01 03:00:30"),   # idle batch
        (3, "https://capped.com/b", "2024-01-01 03:01:00"),   # post-evict
    ]
    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("url", T.StringType()),
                           T.StructField("ts", T.TimestampType())])
    src = tmp_path / "ce_src"
    src.mkdir()
    for i, (did, url, ts) in enumerate(docs):
        p = src / f"f{i}.json"
        p.write_text(json.dumps({"doc_id": did, "url": url, "ts": ts}))
        os.utime(p, (1000 + i, 1000 + i))

    def run(name, idle_ms):
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).json(str(src))
                  .withWatermark("ts", "0 seconds"))
        out = streaming_domain_cap(
            stream, per_domain=1, idle_timeout_ms=idle_ms,
            event_time_col="ts" if idle_ms is not None else None)
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / f"{name}_ck"))
             .trigger(availableNow=True).start())
        try:
            q.awaitTermination()
            return {r["id"] for r in spark.table(name).collect()}
        finally:
            q.stop()
            spark.catalog.dropTempView(name)

    evicting = run("ce_ev", 3_600_000)
    persistent = run("ce_np", None)
    # with the horizon, capped.com's counter evicts before id 3 arrives,
    # so the domain's budget resets and 3 is admitted again
    assert evicting == {1, 50, 51, 3}
    # without it the counter persists and 3 stays rejected
    assert persistent == {1, 50, 51}
