import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pyspark.sql import SparkSession, functions as F
import duckdb

sf = "/root/testdata/sf0.001"
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(f"{sf}/documents.parquet")
from yupana_spark.datapipe.dsir import dsir_select, dsir_log_weights

t0 = time.time()
target = docs.filter(F.col("source") == "src0")
sel = dsir_select(docs, target, k=20, n_buckets=1024, alpha=0.5,
                  keep_cols=["lang"])
rows = sel.select("doc_id", "lang", F.round("logw", 6).alias("wt")) \
    .orderBy("doc_id").collect()
print("spark", time.time() - t0, len(rows))

B, A = 1024, 0.5
q = f"""
WITH d AS (
  SELECT doc_id, lang, source,
         list_filter(string_split_regex(trim(regexp_replace(regexp_replace(
             lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')),
             '\\s+'), x -> x <> '') AS ws
  FROM read_parquet('{sf}/documents.parquet')),
g AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(gram), 1, 6))::BIGINT % {B} AS bucket
  FROM (
    SELECT doc_id, source, unnest(ws) AS gram FROM d
    UNION ALL
    SELECT doc_id, source, ws[i] || ' ' || ws[i+1] AS gram
    FROM d, LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i) t)),
tc AS (SELECT bucket, count(*) AS c FROM g WHERE source = 'src0' GROUP BY 1),
rc AS (SELECT bucket, count(*) AS c FROM g GROUP BY 1),
tot AS (SELECT (SELECT count(*) FROM g WHERE source = 'src0') AS nt,
               (SELECT count(*) FROM g) AS nr),
lr AS (SELECT rc.bucket,
              ln(coalesce(tc.c, 0) + {A}) - ln(nt + {A}*{B})
              - ln(rc.c + {A}) + ln(nr + {A}*{B}) AS lr
       FROM rc LEFT JOIN tc USING (bucket), tot),
wt AS (SELECT g.doc_id, sum(lr.lr) AS logw
       FROM g JOIN lr USING (bucket) GROUP BY g.doc_id),
key AS (SELECT doc_id, logw,
               logw - ln(-ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                   1, 8))::BIGINT + 0.5) / 4294967296.0)) AS k
        FROM wt)
SELECT key.doc_id, d2.lang, round(key.logw, 6) AS wt
FROM key JOIN read_parquet('{sf}/documents.parquet') d2 USING (doc_id)
ORDER BY key.k DESC, key.doc_id LIMIT 20
"""
duck = sorted(duckdb.sql(q).fetchall())
sp = [(r["doc_id"], r["lang"], r["wt"]) for r in rows]
print("duck", len(duck))
mism = [(a, b) for a, b in zip(sp, duck) if a != b]
print("mismatches:", mism[:5], "OK" if not mism and len(sp) == len(duck) else "FAIL")
spark.stop()
