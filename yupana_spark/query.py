"""Typed Query IR + validation.

Reference: yupana-api/src/main/scala/org/yupana/api/query/Query.scala:38-46
(Query(table, fields, filter, groupBy, limit, postFilter)); Query.scala:90-135
auto-injects the mandatory time-range condition.  Time-bound validation
mirrors yupana-core/.../utils/FlatAndCondition.scala:1-145: the WHERE clause
is normalized into OR-of-AND blocks and **every** block must carry a closed
``time`` interval (lower and upper bound), else the reference raises
"Empty condition" (TsdbBase.scala:187-190).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple

from . import expressions as E
from .expressions import Expr, InvalidQueryError


@dataclass(frozen=True)
class QueryField:
    expr: Expr
    name: str


# ---------------------------------------------------------------------------
# QueryHint (Query.scala:26 trait QueryHint; Query.scala:45 hints: Seq[...])
# — planner directives a caller can attach without touching the query text.
# The reference's Spark runner ships ProgressHint (TsdbSparkBase.scala:74);
# the other two are the Spark-native knobs a 100 TB deployment actually
# needs from a hint surface.
# ---------------------------------------------------------------------------
class QueryHint:
    """Marker base class for planner hints."""


@dataclass(frozen=True)
class BroadcastLinksHint(QueryHint):
    """Force (True, default behavior) or forbid (False) broadcasting link
    sources — forbid when a link table is too large to broadcast and the
    planner should fall back to a shuffle join (AQE picks the strategy)."""

    enabled: bool = True


@dataclass(frozen=True)
class RepartitionHint(QueryHint):
    """Repartition the result, optionally by columns — for callers that
    feed the result into a co-partitioned downstream job or sink."""

    num_partitions: int
    columns: Tuple[str, ...] = ()


@dataclass(frozen=True)
class ProgressHint(QueryHint):
    """Append a JSON progress line (query id, table, per-stage seconds) to
    ``file_name`` when the plan is built (≙ ProgressHint,
    TsdbSparkBase.scala:74)."""

    file_name: str


@dataclass(frozen=True)
class Query:
    table: str
    fields: Tuple[QueryField, ...]
    filter: Optional[Expr] = None
    group_by: Tuple[Expr, ...] = ()
    having: Optional[Expr] = None
    limit: Optional[int] = None
    hints: Tuple[QueryHint, ...] = ()

    def hint(self, cls):
        for h in self.hints:
            if isinstance(h, cls):
                return h
        return None


def query(
    table: str,
    from_time: _dt.datetime,
    to_time: _dt.datetime,
    fields: Sequence[Tuple[Expr, str]],
    filter: Optional[Expr] = None,  # noqa: A002 - mirrors reference naming
    group_by: Sequence[Expr] = (),
    having: Optional[Expr] = None,
    limit: Optional[int] = None,
    hints: Sequence[QueryHint] = (),
) -> Query:
    """DSL constructor mirroring Query.scala:90-135 — injects the time range."""
    time_cond = E.and_(
        E.ge(E.time(), E.const(from_time)),
        E.lt(E.time(), E.const(to_time)),
    )
    full = time_cond if filter is None else E.and_(time_cond, filter)
    return Query(
        table=table,
        fields=tuple(QueryField(e, n) for e, n in fields),
        filter=full,
        group_by=tuple(group_by),
        having=having,
        limit=limit,
        hints=tuple(hints),
    )


# ---------------------------------------------------------------------------
# FlatAndCondition: flatten WHERE into OR-of-AND blocks
# ---------------------------------------------------------------------------
def flat_and_blocks(cond: Expr) -> list[list[Expr]]:
    if isinstance(cond, E.Or):
        out: list[list[Expr]] = []
        for c in cond.conditions:
            out.extend(flat_and_blocks(c))
        return out
    if isinstance(cond, E.And):
        blocks: list[list[Expr]] = [[]]
        for c in cond.conditions:
            sub = flat_and_blocks(c)
            blocks = [b + s for b in blocks for s in sub]
        return blocks
    return [[cond]]


def _is_time_bound(e: Expr, ops: tuple) -> bool:
    if not isinstance(e, E.BinaryOp):
        return False
    if e.op in ops and isinstance(e.left, E.TimeField) and e.right.kind() == E.CONST:
        return True
    flipped = {">": "<", "<": ">", ">=": "<=", "<=": ">="}
    return (
        flipped.get(e.op) in ops
        and isinstance(e.right, E.TimeField)
        and e.left.kind() == E.CONST
    )


def validate_time_bounds(cond: Optional[Expr]) -> None:
    """Every OR branch must carry ``time >= a AND time < b``."""
    if cond is None:
        raise InvalidQueryError(
            "query must have a time-bounded condition (TsdbBase.scala:187-190)"
        )
    for block in flat_and_blocks(cond):
        has_lower = any(_is_time_bound(e, (">=", ">")) for e in block)
        has_upper = any(_is_time_bound(e, ("<", "<=")) for e in block)
        if not (has_lower and has_upper):
            raise InvalidQueryError(
                "each OR branch of WHERE must bound time from both sides "
                "(FlatAndCondition.scala)"
            )


def validate(q: Query, require_time_bounds: bool = True) -> None:
    if not q.fields:
        raise InvalidQueryError("query has no fields")
    has_agg = any(f.expr.contains_agg() for f in q.fields) or (
        q.having is not None and q.having.contains_agg()
    )
    has_window = any(f.expr.contains_window() for f in q.fields)
    if has_agg and has_window:
        raise InvalidQueryError(
            "window and aggregate expressions cannot mix in one query "
            "(ExprKind.scala)"
        )
    for f in q.fields:
        f.expr.kind()  # raises on illegal nesting
    # force the guard matrix over every subtree: type errors (cur*cur,
    # string+number, ...) must surface at plan time, not mid-job
    all_exprs = [f.expr for f in q.fields] + list(q.group_by)
    all_exprs += [e for e in (q.filter, q.having) if e is not None]
    for top in all_exprs:
        for node in E.collect(top, lambda x: True):
            node.dtype  # noqa: B018 — property evaluates the guards
    if q.filter is not None and (
        q.filter.contains_agg() or q.filter.contains_window()
    ):
        raise InvalidQueryError("WHERE cannot contain aggregate/window functions")
    if require_time_bounds:
        validate_time_bounds(q.filter)
