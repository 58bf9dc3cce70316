"""IR-level optimizer: constant folding + boolean simplification.

Reference: yupana-core/.../QueryOptimizer.scala:24-106 (simplifyCondition:
flatten nested AND/OR, drop TRUE from AND, short-circuit FALSE, distribute
OR-over-AND) and ConstantCalculator.scala:29-160 (pre-evaluate any
Const-kind subtree, including function calls over literals).

Catalyst re-does all of this on the Column tree, but folding on the IR keeps
the reference's *observable* behavior: time-bound validation and link-predicate
rewriting see the simplified/normalized condition (e.g. a tautological branch
doesn't defeat FlatAndCondition validation), exactly as in the reference
where optimize runs before TsdbBase.query plans the scan.
"""

from __future__ import annotations

import datetime as _dt
import math as _math
from decimal import Decimal
from typing import Any, Optional

from . import expressions as E
from . import types as yt
from .expressions import Expr
from .query import Query, QueryField


_INT_BITS = {yt.BYTE: 8, yt.SHORT: 16, yt.INT: 32, yt.LONG: 64}


def _wrap_integral(v: Any, dtype: str) -> Any:
    """Wrap a python int to the JVM two's-complement width of ``dtype``.

    The reference evaluates constant subtrees with JVM primitives
    (ConstantCalculator.scala:29-160 — scala ``Int``/``Long`` arithmetic),
    and Spark's non-ANSI codegen does the same, so both wrap on overflow
    while an unbounded python int would not.  Mask-and-sign-extend keeps
    the folder bit-identical to both engines; non-int values (bool,
    Decimal, float, str, ...) pass through untouched.
    """
    if type(v) is not int:
        return v
    bits = _INT_BITS.get(yt.base(dtype))
    if bits is None:
        return v
    half = 1 << (bits - 1)
    return ((v + half) & ((1 << bits) - 1)) - half


class ConstantCalculator:
    """Evaluate a Const-kind subtree to a python value
    (≙ ConstantCalculator.scala)."""

    def evaluate(self, e: Expr) -> Any:
        if isinstance(e, E.Const):
            return e.value
        if isinstance(e, E.BinaryOp):
            l, r = self.evaluate(e.left), self.evaluate(e.right)
            if l is None or r is None:
                return None
            op = e.op
            if op == "+":
                return _wrap_integral(l + r, e.dtype)
            if op == "-":
                return _wrap_integral(l - r, e.dtype)
            if op == "*":
                return _wrap_integral(l * r, e.dtype)
            if op == "/":
                lt, rt = e.left.dtype, e.right.dtype
                try:
                    if lt in yt.INTEGRAL and rt in yt.INTEGRAL:
                        q = abs(l) // abs(r)
                        q = q if (l >= 0) == (r >= 0) else -q
                        return _wrap_integral(q, e.dtype)
                    return l / r
                except ZeroDivisionError:
                    # engine dialect = Spark non-ANSI: x / 0 is NULL (the
                    # runtime Divide produces NULL, so the folded plan
                    # must too — an uncaught ZeroDivisionError here used
                    # to crash the optimizer on constant `1/0`)
                    return None
            if op == "=":
                return l == r
            if op == "<>":
                return l != r
            if op == "<":
                return l < r
            if op == ">":
                return l > r
            if op == "<=":
                return l <= r
            if op == ">=":
                return l >= r
        if isinstance(e, E.And):
            vals = [self.evaluate(c) for c in e.conditions]
            return all(bool(v) for v in vals)
        if isinstance(e, E.Or):
            vals = [self.evaluate(c) for c in e.conditions]
            return any(bool(v) for v in vals)
        if isinstance(e, E.Not):
            v = self.evaluate(e.expr)
            return None if v is None else not v
        if isinstance(e, E.In):
            v = self.evaluate(e.expr)
            res = v in e.values
            return (not res) if e.negated else res
        if isinstance(e, E.IsNull):
            v = self.evaluate(e.expr)
            return (v is not None) if e.negated else (v is None)
        if isinstance(e, E.Case):
            for cond, val in e.branches:
                if bool(self.evaluate(cond)):
                    return self.evaluate(val)
            return self.evaluate(e.otherwise)
        if isinstance(e, E.Fun):
            return self._fun(e)
        if isinstance(e, E.ArrayExpr):
            return [self.evaluate(i) for i in e.items]
        if isinstance(e, E.Cast):
            return self._cast(self.evaluate(e.expr), e.target)
        raise yt.YupanaTypeError(f"cannot fold {type(e).__name__}")

    def _fun(self, e: E.Fun) -> Any:
        args = [self.evaluate(a) for a in e.args]
        n = e.name
        if any(a is None for a in args) and n != "database":
            return None
        if n == "length":
            return len(args[0])
        if n == "lower":
            return args[0].lower()
        if n == "upper":
            return args[0].upper()
        if n == "abs":
            # JVM abs(MIN_VALUE) wraps back to MIN_VALUE; match it.
            return _wrap_integral(abs(args[0]), e.dtype)
        if n == "-":
            return _wrap_integral(-args[0], e.dtype)
        if n == "split":
            import re

            return [w for w in re.split(r"[^0-9a-zA-Zа-яА-ЯёЁ]+", args[0]) if w]
        if n == "tokens":
            from .functions.tokenizer import tokenize_for_index

            if isinstance(args[0], list):
                out = []
                for item in args[0]:
                    out.extend(tokenize_for_index(item))
                return out
            return tokenize_for_index(args[0])
        if n == "array_to_string":
            return ", ".join(str(x) for x in args[0])
        if n == "contains":
            return args[1] in args[0]
        if n == "contains_all":
            return set(args[1]) <= set(args[0])
        if n == "contains_any":
            return bool(set(args[1]) & set(args[0]))
        if n == "contains_same":
            return set(args[0]) == set(args[1])
        if n == "database":
            return "Yupana"
        if n.startswith("extract_"):
            unit = n[8:]
            t: _dt.datetime = args[0]
            if unit == "quarter":
                return (t.month - 1) // 3 + 1
            return getattr(t, {"year": "year", "month": "month", "day": "day",
                               "hour": "hour", "minute": "minute",
                               "second": "second"}[unit])
        if n.startswith("trunc_"):
            unit = n[6:]
            t = args[0]
            if unit == "year":
                return t.replace(month=1, day=1, hour=0, minute=0, second=0,
                                 microsecond=0)
            if unit == "quarter":
                qm = (t.month - 1) // 3 * 3 + 1
                return t.replace(month=qm, day=1, hour=0, minute=0, second=0,
                                 microsecond=0)
            if unit == "month":
                return t.replace(day=1, hour=0, minute=0, second=0,
                                 microsecond=0)
            if unit == "week":
                d = t - _dt.timedelta(days=t.weekday())
                return d.replace(hour=0, minute=0, second=0, microsecond=0)
            if unit == "day":
                return t.replace(hour=0, minute=0, second=0, microsecond=0)
            if unit == "hour":
                return t.replace(minute=0, second=0, microsecond=0)
            if unit == "minute":
                return t.replace(second=0, microsecond=0)
            if unit == "second":
                return t.replace(microsecond=0)
        raise yt.YupanaTypeError(f"cannot fold function {n}")

    def _cast(self, v: Any, target: str) -> Any:
        if v is None:
            return None
        t = yt.base(target)
        if t in yt.INTEGRAL:
            if isinstance(v, bool):
                return 1 if v else 0
            if isinstance(v, int):
                # integral -> integral: JVM l2i/i2b-style width wrap
                return _wrap_integral(v, t)
            if isinstance(v, (float, Decimal)):
                # Spark non-ANSI double->int SATURATES (JVM d2i), it does
                # not wrap — fold only the in-range case (where truncate-
                # toward-zero and saturation agree) and punt the rest to
                # Spark so the folded plan never diverges from runtime
                if isinstance(v, float) and not _math.isfinite(v):
                    raise yt.YupanaTypeError("cannot fold non-finite cast")
                tv = int(v)
                if _wrap_integral(tv, t) == tv:
                    return tv
                raise yt.YupanaTypeError("cannot fold out-of-range cast")
            # strings etc.: Spark's parse/NULL-on-overflow semantics are
            # not mirrored here — leave the cast to Spark
            raise yt.YupanaTypeError(
                f"cannot fold cast {type(v).__name__} -> {t}")
        if t == yt.DOUBLE:
            return float(v)
        if t in (yt.DECIMAL, yt.CURRENCY):
            return Decimal(str(v))
        if t == yt.STRING:
            return str(v)
        return v


_TRUE = E.Const(True)
_FALSE = E.Const(False)


def _is_true(e: Expr) -> bool:
    return isinstance(e, E.Const) and e.value is True


def _is_false(e: Expr) -> bool:
    return isinstance(e, E.Const) and e.value is False


def fold_constants(e: Expr) -> Expr:
    """Replace every maximal Const-kind subtree with its literal value."""
    calc = ConstantCalculator()

    def fn(x: Expr) -> Expr:
        if isinstance(x, (E.Const, E.Placeholder, E.Now)):
            return x
        try:
            if x.kind() == E.CONST:
                return E.Const(calc.evaluate(x), x.dtype)
        except (yt.YupanaTypeError, E.InvalidQueryError, KeyError):
            return x
        return x

    return E.transform(e, fn)


def simplify_condition(e: Expr) -> Expr:
    """Flatten AND/OR, drop TRUE in AND, short-circuit FALSE
    (QueryOptimizer.simplifyCondition:35-89)."""
    if isinstance(e, E.And):
        parts: list[Expr] = []
        for c in e.conditions:
            s = simplify_condition(c)
            if _is_false(s):
                return _FALSE
            if _is_true(s):
                continue
            if isinstance(s, E.And):
                parts.extend(s.conditions)
            else:
                parts.append(s)
        if not parts:
            return _TRUE
        return parts[0] if len(parts) == 1 else E.And(tuple(parts))
    if isinstance(e, E.Or):
        parts = []
        for c in e.conditions:
            s = simplify_condition(c)
            if _is_true(s):
                return _TRUE
            if _is_false(s):
                continue
            if isinstance(s, E.Or):
                parts.extend(s.conditions)
            else:
                parts.append(s)
        if not parts:
            return _FALSE
        return parts[0] if len(parts) == 1 else E.Or(tuple(parts))
    if isinstance(e, E.Not):
        s = simplify_condition(e.expr)
        if _is_true(s):
            return _FALSE
        if _is_false(s):
            return _TRUE
        return E.Not(s)
    return e


def optimize_condition(e: Optional[Expr]) -> Optional[Expr]:
    if e is None:
        return None
    return simplify_condition(fold_constants(e))


def optimize(q: Query) -> Query:
    """≙ QueryOptimizer.optimize: fold + simplify filter and having."""
    return Query(
        table=q.table,
        fields=tuple(QueryField(fold_constants(f.expr), f.name)
                     for f in q.fields),
        filter=optimize_condition(q.filter),
        group_by=tuple(fold_constants(g) for g in q.group_by),
        having=optimize_condition(q.having),
        limit=q.limit,
        hints=q.hints,
    )
