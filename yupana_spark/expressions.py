"""Typed expression IR mirroring the reference's Expression tree.

Reference: yupana-api/src/main/scala/org/yupana/api/query/Expression.scala:29-59
(nodes), ExprKind.scala:1-25 (Const/Simple/Aggregate/Window kind lattice; a
window expression and an aggregate expression may not mix in one tree).

The IR is deliberately Spark-free: compilation to pyspark Columns lives in
``yupana_spark.compiler``.  Each node exposes

- ``children`` — sub-expressions,
- ``key()`` — a stable structural key (used to dedupe aggregate subtrees and
  to match GROUP BY expressions inside projections),
- ``kind()`` — CONST / SIMPLE / AGG / WINDOW with the reference's mixing rule.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field
from decimal import Decimal
from typing import Any, Optional, Sequence, Tuple

from . import types as yt

# kinds (ExprKind.scala)
CONST = "const"
SIMPLE = "simple"
AGG = "aggregate"
WINDOW = "window"

_KIND_ORDER = {CONST: 0, SIMPLE: 1, AGG: 2, WINDOW: 3}


class InvalidQueryError(ValueError):
    pass


def _merge_kinds(kinds: Sequence[str]) -> str:
    out = CONST
    for k in kinds:
        if {k, out} == {AGG, WINDOW}:
            raise InvalidQueryError(
                "window and aggregate expressions cannot mix (ExprKind.scala)"
            )
        if _KIND_ORDER[k] > _KIND_ORDER[out]:
            out = k
    return out


@dataclass(frozen=True)
class Expr:
    def children(self) -> Tuple["Expr", ...]:
        return ()

    def key(self) -> str:
        args = ",".join(c.key() for c in self.children())
        return f"{type(self).__name__}({args})"

    def kind(self) -> str:
        # operations over constants stay Const (ExprKind.scala lattice);
        # leaves that read the row (Field/TimeField/LinkField) override this
        return _merge_kinds([CONST] + [c.kind() for c in self.children()])

    @property
    def dtype(self) -> str:  # overridden
        raise NotImplementedError(type(self).__name__)

    def contains_agg(self) -> bool:
        return isinstance(self, AggExpr) or any(
            c.contains_agg() for c in self.children()
        )

    def contains_window(self) -> bool:
        return isinstance(self, WindowExpr) or any(
            c.contains_window() for c in self.children()
        )


# ---------------------------------------------------------------------------
# Leaves
# ---------------------------------------------------------------------------
def _infer_const_type(v: Any) -> str:
    if v is None:
        return yt.NULL
    if isinstance(v, bool):
        return yt.BOOLEAN
    if isinstance(v, int):
        return yt.LONG if abs(v) > 2**31 - 1 else yt.INT
    if isinstance(v, float):
        return yt.DOUBLE
    if isinstance(v, Decimal):
        return yt.DECIMAL
    if isinstance(v, str):
        return yt.STRING
    if isinstance(v, _dt.datetime):
        return yt.TIMESTAMP
    if isinstance(v, _dt.timedelta):
        return yt.PERIOD
    if isinstance(v, (bytes, bytearray)):
        return yt.BLOB
    if isinstance(v, (list, tuple)):
        et = _infer_const_type(v[0]) if v else yt.STRING
        return yt.array_of(et)
    raise yt.YupanaTypeError(f"cannot type constant {v!r}")


@dataclass(frozen=True)
class Const(Expr):
    value: Any
    vtype: Optional[str] = None

    def key(self) -> str:
        return f"Const({self.value!r}:{self.dtype})"

    def kind(self) -> str:
        return CONST

    @property
    def dtype(self) -> str:
        return self.vtype or _infer_const_type(self.value)


@dataclass(frozen=True)
class Placeholder(Expr):
    """Positional ``?`` parameter (Expression.scala:196-207); bound pre-plan."""

    index: int  # 1-based
    vtype: str = yt.NULL

    def key(self) -> str:
        return f"Placeholder({self.index})"

    def kind(self) -> str:
        return CONST

    @property
    def dtype(self) -> str:
        return self.vtype


@dataclass(frozen=True)
class TimeField(Expr):
    def key(self) -> str:
        return "time"

    def kind(self) -> str:
        return SIMPLE

    @property
    def dtype(self) -> str:
        return yt.TIMESTAMP


@dataclass(frozen=True)
class Field(Expr):
    """Dimension or metric column reference; resolved against the table."""

    name: str
    vtype: str = yt.STRING

    def key(self) -> str:
        return f"Field({self.name})"

    def kind(self) -> str:
        return SIMPLE

    @property
    def dtype(self) -> str:
        return self.vtype


@dataclass(frozen=True)
class LinkField(Expr):
    """External-link virtual column ``link_field`` (Expression.scala:258-259)."""

    link: str
    field_name: str
    vtype: str = yt.STRING

    def key(self) -> str:
        return f"LinkField({self.link}.{self.field_name})"

    def kind(self) -> str:
        return SIMPLE

    @property
    def dtype(self) -> str:
        return self.vtype

    @property
    def out_name(self) -> str:
        return f"{self.link}_{self.field_name}"


@dataclass(frozen=True)
class Now(Expr):
    """now() — substituted once at query start (TsdbBase.scala:304)."""

    def key(self) -> str:
        return "now()"

    def kind(self) -> str:
        return CONST

    @property
    def dtype(self) -> str:
        return yt.TIMESTAMP


# ---------------------------------------------------------------------------
# Binary arithmetic / comparison / boolean
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class BinaryOp(Expr):
    op: str  # + - * / = <> < > <= >=
    left: Expr
    right: Expr

    def children(self) -> Tuple[Expr, ...]:
        return (self.left, self.right)

    def key(self) -> str:
        return f"({self.left.key()} {self.op} {self.right.key()})"

    @property
    def dtype(self) -> str:
        a, b = self.left.dtype, self.right.dtype
        if self.op == "+":
            return yt.plus_type(a, b)
        if self.op == "-":
            return yt.minus_type(a, b)
        if self.op == "*":
            return yt.times_type(a, b)
        if self.op == "/":
            return yt.div_type(a, b)
        return yt.BOOLEAN  # comparisons


@dataclass(frozen=True)
class And(Expr):
    conditions: Tuple[Expr, ...]

    def children(self) -> Tuple[Expr, ...]:
        return self.conditions

    @property
    def dtype(self) -> str:
        return yt.BOOLEAN


@dataclass(frozen=True)
class Or(Expr):
    conditions: Tuple[Expr, ...]

    def children(self) -> Tuple[Expr, ...]:
        return self.conditions

    @property
    def dtype(self) -> str:
        return yt.BOOLEAN


@dataclass(frozen=True)
class Not(Expr):
    expr: Expr

    def children(self) -> Tuple[Expr, ...]:
        return (self.expr,)

    @property
    def dtype(self) -> str:
        return yt.BOOLEAN


@dataclass(frozen=True)
class In(Expr):
    expr: Expr
    values: Tuple[Any, ...]
    negated: bool = False

    def children(self) -> Tuple[Expr, ...]:
        return (self.expr,)

    def key(self) -> str:
        return f"In({self.expr.key()},{self.values!r},{self.negated})"

    @property
    def dtype(self) -> str:
        return yt.BOOLEAN


@dataclass(frozen=True)
class IsNull(Expr):
    expr: Expr
    negated: bool = False

    def children(self) -> Tuple[Expr, ...]:
        return (self.expr,)

    def key(self) -> str:
        return f"IsNull({self.expr.key()},{self.negated})"

    @property
    def dtype(self) -> str:
        return yt.BOOLEAN


@dataclass(frozen=True)
class Case(Expr):
    """CASE WHEN ... THEN ... ELSE — ELSE is mandatory (SqlParser.scala:129-134)."""

    branches: Tuple[Tuple[Expr, Expr], ...]  # (condition, value)
    otherwise: Expr

    def children(self) -> Tuple[Expr, ...]:
        out: list[Expr] = []
        for c, v in self.branches:
            out += [c, v]
        return tuple(out) + (self.otherwise,)

    def key(self) -> str:
        bs = ";".join(f"{c.key()}->{v.key()}" for c, v in self.branches)
        return f"Case({bs};else->{self.otherwise.key()})"

    @property
    def dtype(self) -> str:
        return self.branches[0][1].dtype


@dataclass(frozen=True)
class Tuple2(Expr):
    """Arity-2 tuple, conditions only (DataType.scala:78-98)."""

    a: Expr
    b: Expr

    def children(self) -> Tuple[Expr, ...]:
        return (self.a, self.b)

    @property
    def dtype(self) -> str:
        return f"TUPLE<{self.a.dtype},{self.b.dtype}>"


# ---------------------------------------------------------------------------
# Functions (unary + array + time)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class Fun(Expr):
    """Scalar function call; names mirror FunctionRegistry.scala."""

    name: str
    args: Tuple[Expr, ...]

    def children(self) -> Tuple[Expr, ...]:
        return self.args

    def key(self) -> str:
        return f"{self.name}({','.join(a.key() for a in self.args)})"

    @property
    def dtype(self) -> str:
        n = self.name
        a0 = self.args[0].dtype if self.args else yt.NULL
        if n in ("extract_year", "extract_month", "extract_day", "extract_hour",
                 "extract_minute", "extract_second", "extract_quarter"):
            return yt.INT
        if n.startswith("trunc_"):
            return yt.TIMESTAMP
        if n in ("length",):
            return yt.INT
        if n in ("lower", "upper", "array_to_string"):
            return yt.STRING
        if n in ("split", "tokens"):
            return yt.array_of(yt.STRING) if not yt.is_array(a0) else a0
        if n in ("abs", "-"):
            return a0
        if n in ("contains", "contains_all", "contains_any", "contains_same"):
            return yt.BOOLEAN
        if n == "id":
            return yt.LONG
        if n == "database":
            return yt.STRING
        raise yt.YupanaTypeError(f"unknown function {n}")


@dataclass(frozen=True)
class ArrayExpr(Expr):
    """Array literal ``{a, b, c}`` (Expression.scala:558-571)."""

    items: Tuple[Expr, ...]

    def children(self) -> Tuple[Expr, ...]:
        return self.items

    @property
    def dtype(self) -> str:
        return yt.array_of(self.items[0].dtype if self.items else yt.STRING)


@dataclass(frozen=True)
class Cast(Expr):
    expr: Expr
    target: str

    def children(self) -> Tuple[Expr, ...]:
        return (self.expr,)

    def key(self) -> str:
        return f"Cast({self.expr.key()} as {self.target})"

    @property
    def dtype(self) -> str:
        return self.target


# ---------------------------------------------------------------------------
# Aggregates (Expression.scala:96-158) and windows (:70-83)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class AggExpr(Expr):
    name: str  # sum min max count avg distinct_count hll_count distinct_random
    expr: Expr
    param: Optional[float] = None  # hll_count std_err

    def children(self) -> Tuple[Expr, ...]:
        return (self.expr,)

    def key(self) -> str:
        return f"{self.name}({self.expr.key()},{self.param})"

    def kind(self) -> str:
        inner = self.expr.kind()
        if inner in (AGG, WINDOW):
            raise InvalidQueryError(f"cannot nest {inner} inside aggregate")
        return AGG

    @property
    def dtype(self) -> str:
        it = self.expr.dtype
        if self.name == "sum":
            # byte/short widen to int (FunctionRegistry.scala:76-91)
            return yt.INT if it in (yt.BYTE, yt.SHORT) else it
        if self.name in ("min", "max", "distinct_random"):
            return it
        if self.name == "count":
            return yt.LONG
        if self.name == "avg":
            return yt.DECIMAL  # numeric -> BigDecimal (Expression.scala:131-135)
        if self.name == "distinct_count":
            return yt.INT
        if self.name == "hll_count":
            if self.param is None or not (0.00003 < self.param < 0.367):
                raise yt.YupanaTypeError(
                    "hll_count std_err must be in (0.00003, 0.367)"
                )
            return yt.LONG
        raise yt.YupanaTypeError(f"unknown aggregate {self.name}")


@dataclass(frozen=True)
class WindowExpr(Expr):
    """lag(col) — the only window function (Expression.scala:70-83).

    Partition = GROUP BY exprs, order = time ascending (implicit).
    """

    name: str  # "lag"
    expr: Expr

    def children(self) -> Tuple[Expr, ...]:
        return (self.expr,)

    def key(self) -> str:
        return f"{self.name}({self.expr.key()})"

    def kind(self) -> str:
        inner = self.expr.kind()
        if inner in (AGG, WINDOW):
            raise InvalidQueryError(f"cannot nest {inner} inside window fn")
        return WINDOW

    @property
    def dtype(self) -> str:
        return self.expr.dtype


# ---------------------------------------------------------------------------
# Tree utilities
# ---------------------------------------------------------------------------
def transform(e: Expr, fn) -> Expr:
    """Post-order rebuild: transform children, then apply ``fn`` to the node."""
    import dataclasses

    def rebuild(v):
        if isinstance(v, Expr):
            return transform(v, fn)
        if isinstance(v, tuple):
            return tuple(rebuild(x) for x in v)
        return v

    flds = dataclasses.fields(e)
    if flds:
        kwargs = {f.name: rebuild(getattr(e, f.name)) for f in flds}
        e2 = type(e)(**kwargs)
    else:
        e2 = e
    return fn(e2)


def collect(e: Expr, pred) -> list:
    out = [e] if pred(e) else []
    for c in e.children():
        out.extend(collect(c, pred))
    return out


# ---------------------------------------------------------------------------
# Convenience constructors (mirrors yupana-api/.../query/syntax/All.scala)
# ---------------------------------------------------------------------------
def const(v: Any, vtype: Optional[str] = None) -> Const:
    return Const(v, vtype)


def time() -> TimeField:
    return TimeField()


def and_(*cs: Expr) -> Expr:
    return cs[0] if len(cs) == 1 else And(tuple(cs))


def or_(*cs: Expr) -> Expr:
    return cs[0] if len(cs) == 1 else Or(tuple(cs))


def eq(a: Expr, b: Expr) -> BinaryOp:
    return BinaryOp("=", a, b)


def ne(a: Expr, b: Expr) -> BinaryOp:
    return BinaryOp("<>", a, b)


def lt(a: Expr, b: Expr) -> BinaryOp:
    return BinaryOp("<", a, b)


def gt(a: Expr, b: Expr) -> BinaryOp:
    return BinaryOp(">", a, b)


def le(a: Expr, b: Expr) -> BinaryOp:
    return BinaryOp("<=", a, b)


def ge(a: Expr, b: Expr) -> BinaryOp:
    return BinaryOp(">=", a, b)


def between(e: Expr, lo: Any, hi: Any) -> Expr:
    """BETWEEN sugar -> >= AND <= (SqlParser.scala:202-204)."""
    lo_e = lo if isinstance(lo, Expr) else const(lo)
    hi_e = hi if isinstance(hi, Expr) else const(hi)
    return And((ge(e, lo_e), le(e, hi_e)))


def sum_(e: Expr) -> AggExpr:
    return AggExpr("sum", e)


def min_(e: Expr) -> AggExpr:
    return AggExpr("min", e)


def max_(e: Expr) -> AggExpr:
    return AggExpr("max", e)


def count(e: Expr) -> AggExpr:
    return AggExpr("count", e)


def avg(e: Expr) -> AggExpr:
    return AggExpr("avg", e)


def distinct_count(e: Expr) -> AggExpr:
    return AggExpr("distinct_count", e)


def hll_count(e: Expr, std_err: float) -> AggExpr:
    return AggExpr("hll_count", e, std_err)


def distinct_random(e: Expr) -> AggExpr:
    return AggExpr("distinct_random", e)


def lag(e: Expr) -> WindowExpr:
    return WindowExpr("lag", e)


def trunc(unit: str, e: Expr) -> Fun:
    return Fun(f"trunc_{unit}", (e,))


def extract(unit: str, e: Expr) -> Fun:
    return Fun(f"extract_{unit}", (e,))
