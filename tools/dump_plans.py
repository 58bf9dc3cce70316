"""Dump .explain("formatted") for every queries() entry to plans/<tag>/.

Usage: python tools/dump_plans.py <tag> [suffix] [query ...]
  tag     plans/<tag>/ output directory (e.g. r17)
  suffix  filename suffix, default "before" -> <query>_before.txt
  query   optional subset (default: all entries)

Write entries (q_upsert_roundtrip, q_rollup_by_month) and the streaming
entry mutate private warehouses when BUILT, so their plan dump executes the
same side effects the bench does — harmless, but they are skipped by
default to keep the dump fast; pass them explicitly to include them.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# build side effects / long build steps: only dumped when asked for by name
SKIP_DEFAULT = {"q_upsert_roundtrip", "q_rollup_by_month", "q_show_meta",
                "q_stream_dedup"}


def main() -> None:
    import __spark_entry__ as ent
    from yupana_spark.session import get_spark

    tag = sys.argv[1] if len(sys.argv) > 1 else "r17"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:]) or None

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("plan-dump")
    qs = ent.queries()
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        if only is None and name in SKIP_DEFAULT:
            continue
        try:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(f"== {name} @ {SF_DIR} ==\n")
                f.write(buf.getvalue())
            print(f"{name}: ok")
        except Exception as e:  # noqa: BLE001 — dump what we can
            print(f"{name}: FAILED {e}")


if __name__ == "__main__":
    main()
