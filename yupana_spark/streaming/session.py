"""Session windows: gap-based event sessionization.

The reference has no event-time windowing at all (SURVEY.md §2.9) — this is
one of the Spark-native extensions the engine exposes because Structured
Streaming gives it for free.  ``F.session_window`` works identically over a
batch DataFrame and a stream (with a watermark); the stateful merge of
overlapping sessions is Spark's, not ours.

For fully custom per-key state the streaming module would use
``applyInPandasWithState``; session_window covers the common case without
any Python in the loop.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, functions as F


def sessionize(df: DataFrame, time_col: str = "time",
               gap: str = "30 minutes",
               key_cols: Optional[List[str]] = None,
               watermark: Optional[str] = None) -> DataFrame:
    """One row per (keys, session): start, end, event count.

    A session extends while consecutive events per key are within ``gap``.
    Works on batch and (with ``watermark``) streaming inputs.
    """
    keys = key_cols or []
    src = df
    if watermark is not None:
        src = src.withWatermark(time_col, watermark)
    gcols = [F.session_window(F.col(time_col), gap).alias("sw")] + [
        F.col(k) for k in keys
    ]
    return (src.groupBy(*gcols)
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(*keys,
                    F.col("sw.start").alias("session_start"),
                    F.col("sw.end").alias("session_end"),
                    "n_events"))
