"""Analyzer: untyped SQL AST -> typed Query IR.

Mirrors yupana-core/.../sql/SqlQueryProcessor.scala:37-49 (createQuery):
resolve table (:119-126), fields (:128-157), WHERE (:469-479), GROUP BY with
alias references (:504-530), HAVING (:481-502); function lookup follows
FunctionRegistry.scala (aggregates :76-103, window :108, unary :74-174,
trunc aliases :128-143).

Link fields are referenced as ``LinkName_fieldName`` (Expression.scala:258-259).
"""

from __future__ import annotations

import difflib
from decimal import Decimal
from typing import Optional

from .. import expressions as E
from .. import types as yt
from ..expressions import InvalidQueryError
from ..query import Query, QueryField
from ..schema import Schema, Table
from . import ast as A

_AGGREGATES = {"sum", "min", "max", "count", "avg", "distinct_count",
               "hll_count", "distinct_random"}
_WINDOW = {"lag"}
_TRUNC_UNITS = {"year", "quarter", "month", "week", "day", "hour", "minute",
                "second"}
_UNARY = {"length", "lower", "upper", "split", "tokens", "abs",
          "array_to_string"}
_BINARY_ARRAY = {"contains", "contains_all", "contains_any", "contains_same"}

_TYPE_NAMES = {
    "varchar": yt.STRING, "string": yt.STRING,
    "double": yt.DOUBLE,
    "bigint": yt.LONG,
    "integer": yt.INT, "int": yt.INT,
    "smallint": yt.SHORT,
    "tinyint": yt.BYTE,
    "decimal": yt.DECIMAL,
    "currency": yt.CURRENCY,
    "timestamp": yt.TIMESTAMP,
    "boolean": yt.BOOLEAN,
    "blob": yt.BLOB,
}


def _type_name(tn: str) -> str:
    t = tn.lower()
    if t.startswith("decimal(") and t.endswith(")"):
        p, s = t[8:-1].split(",")
        return yt.decimal(int(p), int(s))
    if t in _TYPE_NAMES:
        return _TYPE_NAMES[t]
    raise InvalidQueryError(f"unknown type {tn}")


class Analyzer:
    def __init__(self, schema: Schema, table: Optional[Table]):
        self.schema = schema
        self.table = table

    # -- name resolution ------------------------------------------------------
    def _resolve_name(self, name: str) -> E.Expr:
        if name.lower() == "time":
            return E.TimeField()
        t = self.table
        if t is None:
            raise InvalidQueryError(f"field {name!r} without a table")
        if t.has_column(name):
            return E.Field(name, t.column_type(name))
        # LinkName_fieldName virtual column
        for link in t.external_links:
            prefix = f"{link.name}_"
            if name.startswith(prefix):
                fname = name[len(prefix):]
                try:
                    return E.LinkField(link.name, fname, link.field_type(fname))
                except KeyError:
                    pass
        known = ["time"] + [d.name for d in t.dimensions] + \
            [m.name for m in t.metrics] + \
            [f"{l.name}_{f.name}" for l in t.external_links for f in l.fields]
        hint = difflib.get_close_matches(name, known, n=3, cutoff=0.5)
        suffix = f"; did you mean {', '.join(hint)}?" if hint else ""
        raise InvalidQueryError(
            f"unknown field {name!r} in table {t.name!r}{suffix}"
        )

    def _const(self, v) -> E.Expr:
        if isinstance(v, A.PlaceholderV):
            return E.Placeholder(v.index)
        return E.const(v)

    # -- expression conversion -------------------------------------------------
    def expr(self, e: A.SqlExpr) -> E.Expr:
        if isinstance(e, A.FieldName):
            return self._resolve_name(e.name)
        if isinstance(e, A.Constant):
            return E.const(e.value)
        if isinstance(e, A.PlaceholderV):
            return E.Placeholder(e.index)
        if isinstance(e, A.UMinus):
            return E.Fun("-", (self.expr(e.expr),))
        if isinstance(e, A.BinOp):
            return E.BinaryOp(e.op, self.expr(e.left), self.expr(e.right))
        if isinstance(e, A.AndE):
            return E.And(tuple(self.expr(p) for p in e.parts))
        if isinstance(e, A.OrE):
            return E.Or(tuple(self.expr(p) for p in e.parts))
        if isinstance(e, A.NotE):
            return E.Not(self.expr(e.expr))
        if isinstance(e, A.InE):
            vals = tuple(
                v.value if isinstance(v, A.Constant) else v for v in e.values
            )
            return E.In(self.expr(e.expr), vals, e.negated)
        if isinstance(e, A.IsNullE):
            return E.IsNull(self.expr(e.expr), e.negated)
        if isinstance(e, A.BetweenE):
            return E.between(self.expr(e.expr), e.lo, e.hi)
        if isinstance(e, A.CaseE):
            return E.Case(
                tuple((self.expr(c), self.expr(v)) for c, v in e.branches),
                self.expr(e.otherwise),
            )
        if isinstance(e, A.CastE):
            return E.Cast(self.expr(e.expr), _type_name(e.type_name))
        if isinstance(e, A.TupleE):
            return E.Tuple2(self.expr(e.a), self.expr(e.b))
        if isinstance(e, A.ArrayE):
            return E.ArrayExpr(tuple(E.const(v) for v in e.items))
        if isinstance(e, A.FunctionCall):
            return self._function(e)
        raise InvalidQueryError(f"cannot analyze {type(e).__name__}")

    def _function(self, f: A.FunctionCall) -> E.Expr:
        n = f.name
        args = [self.expr(a) for a in f.args]
        if n in _AGGREGATES:
            if n == "hll_count":
                if len(f.args) != 2 or not isinstance(f.args[1], A.Constant):
                    raise InvalidQueryError("hll_count(expr, std_err)")
                return E.AggExpr("hll_count", args[0],
                                 float(f.args[1].value))
            if len(args) != 1:
                raise InvalidQueryError(f"{n} takes one argument")
            return E.AggExpr(n, args[0])
        if n in _WINDOW:
            return E.WindowExpr(n, args[0])
        if n == "now":
            return E.Now()
        if n == "database":
            return E.Fun("database", ())
        if n in _TRUNC_UNITS:  # alias: year(x) == trunc_year(x)
            return E.Fun(f"trunc_{n}", tuple(args))
        if n.startswith("trunc_") and n[6:] in _TRUNC_UNITS:
            return E.Fun(n, tuple(args))
        if n.startswith("extract_") and n[8:] in _TRUNC_UNITS:
            return E.Fun(n, tuple(args))
        if n in _UNARY:
            if len(args) != 1:
                raise InvalidQueryError(f"{n} takes one argument")
            return E.Fun(n, tuple(args))
        if n in _BINARY_ARRAY:
            if len(args) != 2:
                raise InvalidQueryError(f"{n} takes two arguments")
            return E.Fun(n, tuple(args))
        if n == "id":
            return E.Fun("id", tuple(args))
        raise InvalidQueryError(f"unknown function {n}")


def analyze(stmt: A.Statement, schema: Schema) -> Query:
    if not isinstance(stmt, A.Select):
        raise InvalidQueryError(f"not a SELECT: {type(stmt).__name__}")
    table = schema.table(stmt.table) if stmt.table is not None else None
    az = Analyzer(schema, table)

    # fields: SELECT * expands to time + dims + metrics (JdbcMetadataProvider
    # column order: time, dimensions, metrics)
    fields: list[QueryField] = []
    if stmt.fields is None:
        if table is None:
            raise InvalidQueryError("SELECT * needs a table")
        fields.append(QueryField(E.TimeField(), "time"))
        for d in table.dimensions:
            fields.append(QueryField(E.Field(d.name, d.dtype), d.name))
        for m in table.metrics:
            fields.append(QueryField(E.Field(m.name, m.dtype), m.name))
    else:
        for i, f in enumerate(stmt.fields):
            name = f.alias or _auto_name(f.expr) or f"_c{i}"
            fields.append(QueryField(az.expr(f.expr), name))

    by_alias = {qf.name: qf.expr for qf in fields}

    def resolve_aliased(e: A.SqlExpr) -> E.Expr:
        # GROUP BY / HAVING may reference select aliases
        # (SqlQueryProcessor.scala:504-530)
        if isinstance(e, A.FieldName) and e.name in by_alias:
            return by_alias[e.name]
        return az.expr(e)

    group_by = tuple(resolve_aliased(g) for g in stmt.group_by)
    having = resolve_aliased(stmt.having) if stmt.having is not None else None
    cond = az.expr(stmt.condition) if stmt.condition is not None else None

    return Query(
        table=stmt.table,
        fields=tuple(fields),
        filter=cond,
        group_by=group_by,
        having=having,
        limit=stmt.limit,
    )


def _auto_name(e: A.SqlExpr) -> Optional[str]:
    if isinstance(e, A.FieldName):
        return e.name
    if isinstance(e, A.FunctionCall):
        parts = [_auto_name(a) for a in e.args]
        if all(parts):
            return f"{e.name}({', '.join(parts)})"
        if not e.args:
            return f"{e.name}()"
    return None
