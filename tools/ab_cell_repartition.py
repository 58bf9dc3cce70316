"""In-session interleaved A/B for the r18 _cell_repartition change:
AQE-coalesced (often 1-task) per-cell Python verify vs explicit
key-repartitioned (cores-wide) verify, on the full dp_neardup_scale
bundle.  A = identity (old), B = explicit repartition (new).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 6


def main() -> None:
    import __spark_entry__ as ent
    import yupana_spark.datapipe.dedup as dd
    from yupana_spark.session import get_spark

    spark = get_spark("ab-cell-repart")
    spark.sparkContext.setLogLevel("ERROR")

    def _noop(df):
        df.write.format("noop").mode("overwrite").save()

    orig = dd._cell_repartition

    def run(new: bool) -> float:
        dd._cell_repartition = orig if new else (
            lambda cells, *a, **kw: cells)
        try:
            t0 = time.time()
            _noop(ent.queries()["dp_neardup_scale"](spark, SF_DIR))
            return time.time() - t0
        finally:
            dd._cell_repartition = orig

    run(False)
    run(True)
    a, b = [], []
    for i in range(PAIRS):
        a.append(run(False))
        b.append(run(True))
        print(f"pair {i}: old {a[-1]:.3f}s  new {b[-1]:.3f}s")
    print(f"old min {min(a):.3f}s  new min {min(b):.3f}s  "
          f"speedup(min) {min(a) / min(b):.3f}x  "
          f"new faster in {sum(y < x for x, y in zip(a, b))}/{PAIRS}")


if __name__ == "__main__":
    main()
