"""Schema checker: declared schema vs physical storage.

Reference: yupana-api/.../schema/SchemaChecker.scala +
yupana-hbase/.../PersistentSchemaChecker.scala — the declared Scala schema is
checked against what the storage actually holds at startup; mismatches are
reported per column.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

from pyspark.sql import SparkSession

from .. import types as yt
from ..schema import Schema


@dataclass(frozen=True)
class SchemaIssue:
    table: str
    column: str
    problem: str


def check_schema(spark: SparkSession, schema: Schema, sf_dir: str) -> List[SchemaIssue]:
    """Compare every declared table against its parquet footprint.

    Returns a list of issues (empty = 'Ok', SchemaChecker semantics).
    """
    issues: List[SchemaIssue] = []
    for name, t in schema.tables.items():
        try:
            df = schema.load(spark, sf_dir, name)
        except Exception as exc:  # noqa: BLE001
            issues.append(SchemaIssue(name, "*", f"unreadable: {exc}"))
            continue
        actual = {f.name: f.dataType for f in df.schema.fields}
        declared = [("time", yt.TIMESTAMP)]
        declared += [(d.name, d.dtype) for d in t.dimensions]
        declared += [(m.name, m.dtype) for m in t.metrics]
        for col, dtype in declared:
            if col not in actual:
                issues.append(SchemaIssue(name, col, "missing in storage"))
                continue
            expected = yt.spark_type(dtype)
            got = actual[col]

            def norm(s: str) -> str:
                # yupana Time is a UTC instant; TIMESTAMP and TIMESTAMP_NTZ
                # parquet encodings are both acceptable storage for it
                return "timestamp" if s.startswith("timestamp") else s

            if norm(expected.simpleString()) != norm(got.simpleString()):
                issues.append(SchemaIssue(
                    name, col,
                    f"type mismatch: declared {expected.simpleString()}, "
                    f"storage has {got.simpleString()}"))
    return issues
