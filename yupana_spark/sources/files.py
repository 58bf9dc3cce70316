"""Batch file-ingest connectors: CSV / JSON-lines / Parquet -> warehouse.

The reference's ETL surface accepts arbitrary row sources and funnels them
through ``put(dataPoints)`` (yupana-spark/.../ETLFunctions.scala:27-52,
TsdbBase.scala:362-413); on Spark the natural equivalent is a schema-
projected ``spark.read`` followed by the same idempotent upsert every other
write path uses — so dictionaries, the ItemFixer hook and the
updates-intervals changelog all apply to file ingest for free.

Scale posture: the readers stay plain ``spark.read`` scans (splittable,
predicate-pushdown-friendly for parquet; CSV/JSON parallelize by file
split), and the typed projection is a Column cast — no UDFs, no collect.
A 100 TB backfill is just this function pointed at a bigger glob.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from .. import types as yt
from ..schema import Table

_EXT_FORMATS = {".csv": "csv", ".json": "json", ".jsonl": "json",
                ".ndjson": "json", ".parquet": "parquet", ".orc": "orc"}


_COMPRESSION_EXTS = {".gz", ".bz2", ".zst", ".lz4", ".snappy", ".deflate"}


def infer_format(path: str) -> str:
    base = path.rstrip("/")
    ext = os.path.splitext(base)[1].lower()
    if ext in _COMPRESSION_EXTS:
        # Spark's text-source readers decompress these transparently; the
        # format comes from the next extension in (e.g. batch.jsonl.gz)
        base = os.path.splitext(base)[0]
        ext = os.path.splitext(base)[1].lower()
    fmt = _EXT_FORMATS.get(ext)
    if fmt is None:
        raise ValueError(
            f"cannot infer source format from {path!r}; pass fmt= "
            f"(one of {sorted(set(_EXT_FORMATS.values()))})")
    return fmt


def table_struct(table: Table) -> T.StructType:
    """Spark schema for a Table: time + declared dims + metrics, in order."""
    fields = [T.StructField("time", T.TimestampType())]
    for d in table.dimensions:
        fields.append(T.StructField(d.name, yt.spark_type(d.dtype)))
    for m in table.metrics:
        fields.append(T.StructField(m.name, yt.spark_type(m.dtype)))
    return T.StructType(fields)


def read_table_file(spark: SparkSession, path: str, table: Table,
                    fmt: Optional[str] = None) -> DataFrame:
    """Read a file/glob and project it onto ``table``'s declared schema.

    Column matching is by name (the table's ``time_column`` alias is also
    accepted for the time column); extra source columns are dropped, missing
    declared columns surface as typed NULLs (the upsert's null-safe keys
    handle them), and every kept column is cast to the declared type — a
    malformed cell becomes NULL rather than failing the batch, which is the
    posture a multi-terabyte backfill needs (quarantine, don't abort).
    """
    fmt = fmt or infer_format(path)
    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", "true")
    src = reader.format(fmt).load(path)
    want = table_struct(table)
    cols = []
    for f in want.fields:
        name = f.name
        have = name if name in src.columns else (
            table.time_column if name == "time"
            and table.time_column in src.columns else None)
        if have is None:
            cols.append(F.lit(None).cast(f.dataType).alias(name))
        else:
            # try_cast, not cast: malformed cells quarantine to NULL even
            # under ANSI mode instead of failing the whole batch
            cols.append(F.col(have).try_cast(f.dataType).alias(name))
    return src.select(*cols)


def ingest_file(warehouse, table_name: str, path: str,
                fmt: Optional[str] = None) -> int:
    """Read + upsert in one call; returns the ingested row count.

    Runs the standard write path, so last-write-wins key merge, ingest-time
    dictionary ids, the ItemFixer hook and the updates-intervals changelog
    all apply exactly as they do for SQL UPSERT.
    """
    table = warehouse.schema.table(table_name)
    df = read_table_file(warehouse.spark, path, table, fmt=fmt)
    return warehouse.upsert(table_name, df)
