"""Table-less SELECT: constant expressions yield exactly one row.

Reference: yupana-core/.../TsdbBase.scala:192-207 — ``SELECT <const exprs>``
with no FROM.  Spark equivalent: select over ``spark.range(1)``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession

from ..compiler import ExpressionCompiler, _Ctx
from ..expressions import Expr


def select_constants(
    spark: SparkSession, fields: Sequence[Tuple[Expr, str]]
) -> DataFrame:
    ec = ExpressionCompiler()
    ctx = _Ctx()
    cols = [ec.col(e, ctx).alias(name) for e, name in fields]
    return spark.range(1).select(*cols)
