"""Local mirror of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, column
names, and order-insensitive values.

Usage: python tools/check_oracle.py [name ...]
"""

from __future__ import annotations

import sys
import time
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, Decimal):
        return f"{v.normalize():f}"
    if isinstance(v, float):
        return f"{v:.10g}"
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return str(v)


def rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in idx) for r in rows)


def main(only=None):
    import __spark_entry__ as ent
    from yupana_spark.session import get_spark

    spark = get_spark("oracle-check", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = ent.queries()
    oracles = ent.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(spark_rows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = [d[0] for d in rel.description]
            duck_rows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failed.append(name)
            continue
        if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in duck_cols):
            print(f"FAIL  {name}: columns {spark_cols} vs {duck_cols}")
            failed.append(name)
            continue
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL  {name}: rowcount {len(spark_rows)} vs {len(duck_rows)}")
            failed.append(name)
            continue
        s, d = rowset(spark_cols, spark_rows), rowset(duck_cols, duck_rows)
        if s != d:
            bad = next(i for i, (a, b) in enumerate(zip(s, d)) if a != b)
            print(f"FAIL  {name}: values differ, e.g. row {bad}:")
            print(f"      spark: {s[bad]}")
            print(f"      duck : {d[bad]}")
            failed.append(name)
            continue
        print(f"OK    {name} ({len(spark_rows)} rows, {time.time()-t0:.1f}s)")
    print()
    if failed:
        print(f"{len(failed)} FAILED: {failed}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main(set(sys.argv[1:]) or None)
