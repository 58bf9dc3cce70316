"""In-session interleaved A/B for the r18 dedupe=False question:
dp_neardup_scale's mh/sh arms keep an internal pair-distinct that is
redundant with _completeness_row's own dropDuplicates.  Under the r17
probe/persist structure removing it was a measured net loss (the band
join re-executed inside the broadcast build instead of reusing the
distinct's exchange); with the r18 gate_small path the band join executes
inside the broadcast build ALWAYS, so the old reason is void — re-measure.

A = shipped tree (mh/sh dedupe=True), B = mh/sh dedupe=False.
One warm JVM, alternating passes, construction included like bench.py.
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

    spark = get_spark("ab-neardup-dedupe")
    spark.sparkContext.setLogLevel("ERROR")

    def _noop(df):
        df.write.format("noop").mode("overwrite").save()

    orig_mh, orig_sh = dd.minhash_dedup_pairs, dd.simhash_near_pairs

    def mh_nodedup(*a, **kw):
        kw["dedupe"] = False
        return orig_mh(*a, **kw)

    def sh_nodedup(*a, **kw):
        kw["dedupe"] = False
        return orig_sh(*a, **kw)

    def run(nodedup: bool) -> float:
        dd.minhash_dedup_pairs = mh_nodedup if nodedup else orig_mh
        dd.simhash_near_pairs = sh_nodedup if nodedup else orig_sh
        try:
            t0 = time.time()
            _noop(ent.queries()["dp_neardup_scale"](spark, SF_DIR))
            return time.time() - t0
        finally:
            dd.minhash_dedup_pairs, dd.simhash_near_pairs = orig_mh, orig_sh

    run(False)
    run(True)
    a, b = [], []
    for i in range(PAIRS):
        a.append(run(False))
        b.append(run(True))
        print(f"pair {i}: dedupe=True {a[-1]:.3f}s  dedupe=False {b[-1]:.3f}s")
    print(f"True min {min(a):.3f}s  False min {min(b):.3f}s  "
          f"speedup(min) {min(a) / min(b):.3f}x  "
          f"False faster in {sum(y < x for x, y in zip(a, b))}/{PAIRS}")


if __name__ == "__main__":
    main()
