"""Command-line entry point: run YupanaQL against the fixture tables.

Usage:
    python -m yupana_spark.cli "SELECT ... FROM lineitem WHERE ..."
    python -m yupana_spark.cli --sf-dir /root/testdata/sf0.01 "SHOW TABLES"
    echo "SELECT ...;" | python -m yupana_spark.cli -

Replaces the reference's wire-server + JDBC story for interactive use
(alongside the pgwire server: the CLI covers the local human surface,
pgwire the remote-client one — SURVEY.md §2.1).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="yupana_spark.cli")
    ap.add_argument("sql", help="YupanaQL statement, or '-' for stdin")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=20,
                    help="max rows to print (display only)")
    ap.add_argument("--explain", action="store_true",
                    help="print the physical plan instead of rows")
    args = ap.parse_args(argv)

    sql = sys.stdin.read() if args.sql == "-" else args.sql

    from yupana_spark import Tsdb, default_schema
    from yupana_spark.session import get_spark

    spark = get_spark("yupana-cli")
    spark.sparkContext.setLogLevel("ERROR")
    tsdb = Tsdb(spark, default_schema(), args.sf_dir)
    if args.explain:
        print(tsdb.explain(sql))
        return 0
    df = tsdb.sql(sql)
    df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
