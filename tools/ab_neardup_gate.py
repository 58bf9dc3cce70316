"""In-session interleaved A/B for the r18 dp_neardup_scale change:
per-pass rung-3 gate probe (old) vs ingest-time gate_small decision (new).

Both forms run in ONE warm JVM over the same memoized artifacts,
alternating passes (old, new, old, new, ...), construction included in the
timing exactly as bench.py does.  The old form is recovered by stripping
the gate_small kwarg before it reaches minhash_dedup_pairs, which restores
the per-pass probe path byte-for-byte.

Usage: python tools/ab_neardup_gate.py [pairs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def main() -> None:
    import __spark_entry__ as ent
    import yupana_spark.datapipe.dedup as dd
    from yupana_spark.session import get_spark

    spark = get_spark("ab-neardup-gate")
    spark.sparkContext.setLogLevel("ERROR")

    def _noop(df):
        df.write.format("noop").mode("overwrite").save()

    orig = dd.minhash_dedup_pairs

    def old_form(*a, **kw):
        kw.pop("gate_small", None)
        return orig(*a, **kw)

    def run(form) -> float:
        dd.minhash_dedup_pairs = form
        try:
            t0 = time.time()
            _noop(ent.queries()["dp_neardup_scale"](spark, SF_DIR))
            return time.time() - t0
        finally:
            dd.minhash_dedup_pairs = orig

    # warm both forms (artifacts memo + JIT)
    run(old_form)
    run(orig)
    olds, news = [], []
    for i in range(PAIRS):
        olds.append(run(old_form))
        news.append(run(orig))
        print(f"pair {i}: old {olds[-1]:.3f}s  new {news[-1]:.3f}s")
    print(f"old min {min(olds):.3f}s  new min {min(news):.3f}s  "
          f"speedup(min) {min(olds) / min(news):.3f}x  "
          f"new faster in {sum(n < o for o, n in zip(olds, news))}/{PAIRS}")


if __name__ == "__main__":
    main()
