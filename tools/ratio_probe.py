"""Core-scaling probe: time the given queries bench.py-style (1 warm-up,
min of N passes, noop-write, construction included) in ONE session at
$SPARK_GRAFT_CPUS cores, print one JSON line.  Run it alternately at two
core counts to reproduce the driver's 8-vs-32 scaling block on specific
entries without paying for the whole 15-query bench per data point.

Usage: SPARK_GRAFT_CPUS=8 python tools/ratio_probe.py q1 [q2 ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("RATIO_PASSES", "2"))


def main() -> None:
    import __spark_entry__ as ent
    from yupana_spark.session import get_spark

    names = sys.argv[1:]
    spark = get_spark("ratio-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = ent.queries()

    def _noop(df):
        df.write.format("noop").mode("overwrite").save()

    out = {}
    for n in names:
        _noop(qs[n](spark, SF_DIR))
        best = None
        for _ in range(PASSES):
            t0 = time.time()
            _noop(qs[n](spark, SF_DIR))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[n] = round(best, 3)
    print(json.dumps({"cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
                      "sf_dir": SF_DIR, "passes": PASSES,
                      "queries": out}))


if __name__ == "__main__":
    main()
