"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}.  Each query is timed as a full
plan+execute+collect cycle after a warm-up pass over the inputs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "q_day_rollup",
    "q_having",
    "q_post_agg_arith",
    "q_distinct_count",
    "q_lag_window",
    "q_arith_currency",
    "q_link_enrich",
    "q_link_two_hop",
    "q_yql_text",
    "q_tpch_q1",
    "q_tpch_q6",
    "dp_exact_dedup",
    "dp_minhash_dedup",
    "dp_lang_id",
    "dp_ann_bruteforce",
]


def main() -> None:
    import __spark_entry__ as ent
    from yupana_spark.session import get_spark

    spark = get_spark("yupana-bench")
    qs = ent.queries()
    names = [n for n in HEADLINE if n in qs]

    # warm-up: JVM codegen, Python workers, parquet footer caches
    # (excluded from timings — we report steady-state throughput)
    for n in names:
        qs[n](spark, SF_DIR).count()

    # best of 2 measured passes: single-JVM timings swing multi-x when the
    # host is busy (GC of a prior phase, lingering python workers); the min
    # is the honest steady-state figure
    timings = {}
    total = 0.0
    for n in names:
        best = None
        for _ in range(2):
            t0 = time.time()
            qs[n](spark, SF_DIR).count()
            dt_ = time.time() - t0
            best = dt_ if best is None else min(best, dt_)
        timings[n] = round(best, 3)
        total += best

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }))


if __name__ == "__main__":
    main()
