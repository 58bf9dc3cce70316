"""Untyped SQL AST (≙ yupana-core/.../sql/parser/{SqlExpr,Statement}.scala)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple


class SqlExpr:
    pass


@dataclass(frozen=True)
class FieldName(SqlExpr):
    name: str


@dataclass(frozen=True)
class Constant(SqlExpr):
    value: Any  # python value; Decimal for numbers, datetime for timestamps
    type_hint: Optional[str] = None


@dataclass(frozen=True)
class PlaceholderV(SqlExpr):
    index: int


@dataclass(frozen=True)
class FunctionCall(SqlExpr):
    name: str
    args: Tuple[SqlExpr, ...]


@dataclass(frozen=True)
class BinOp(SqlExpr):
    op: str  # + - * / = <> < > <= >=
    left: SqlExpr
    right: SqlExpr


@dataclass(frozen=True)
class AndE(SqlExpr):
    parts: Tuple[SqlExpr, ...]


@dataclass(frozen=True)
class OrE(SqlExpr):
    parts: Tuple[SqlExpr, ...]


@dataclass(frozen=True)
class NotE(SqlExpr):
    expr: SqlExpr


@dataclass(frozen=True)
class InE(SqlExpr):
    expr: SqlExpr
    values: Tuple[Any, ...]
    negated: bool = False


@dataclass(frozen=True)
class IsNullE(SqlExpr):
    expr: SqlExpr
    negated: bool = False


@dataclass(frozen=True)
class BetweenE(SqlExpr):
    expr: SqlExpr
    lo: Any
    hi: Any


@dataclass(frozen=True)
class CaseE(SqlExpr):
    branches: Tuple[Tuple[SqlExpr, SqlExpr], ...]
    otherwise: SqlExpr


@dataclass(frozen=True)
class CastE(SqlExpr):
    expr: SqlExpr
    type_name: str


@dataclass(frozen=True)
class TupleE(SqlExpr):
    a: SqlExpr
    b: SqlExpr


@dataclass(frozen=True)
class ArrayE(SqlExpr):
    items: Tuple[Any, ...]  # literal values (SqlParser.scala:127)


@dataclass(frozen=True)
class UMinus(SqlExpr):
    expr: SqlExpr


# ---------------------------------------------------------------------------
# Statements
# ---------------------------------------------------------------------------
class Statement:
    pass


@dataclass(frozen=True)
class SqlField:
    expr: SqlExpr
    alias: Optional[str] = None


@dataclass(frozen=True)
class Select(Statement):
    table: Optional[str]
    fields: Optional[Tuple[SqlField, ...]]  # None = SELECT *
    condition: Optional[SqlExpr]
    group_by: Tuple[SqlExpr, ...] = ()
    having: Optional[SqlExpr] = None
    limit: Optional[int] = None


@dataclass(frozen=True)
class Upsert(Statement):
    table: str
    fields: Tuple[str, ...]
    values: Tuple[Tuple[Any, ...], ...]


@dataclass(frozen=True)
class ShowTables(Statement):
    pass


@dataclass(frozen=True)
class ShowVersion(Statement):
    pass


@dataclass(frozen=True)
class ShowColumns(Statement):
    table: str


@dataclass(frozen=True)
class ShowFunctions(Statement):
    type_name: str


@dataclass(frozen=True)
class ShowUsers(Statement):
    pass


@dataclass(frozen=True)
class ShowQueries(Statement):
    query_id: Optional[str] = None
    state: Optional[str] = None
    limit: Optional[int] = None


@dataclass(frozen=True)
class ShowUpdatesIntervals(Statement):
    condition: Optional[SqlExpr] = None


@dataclass(frozen=True)
class KillQuery(Statement):
    query_id: str


@dataclass(frozen=True)
class DeleteQueries(Statement):
    query_id: Optional[str] = None
    state: Optional[str] = None


@dataclass(frozen=True)
class SetValue(Statement):
    name: str
    value: Any


@dataclass(frozen=True)
class CreateUser(Statement):
    """≙ parser.CreateUser (SqlParser.scala:336-353)."""

    name: str
    password: Optional[str] = None
    role: Optional[str] = None


@dataclass(frozen=True)
class AlterUser(Statement):
    """≙ parser.AlterUser (SqlParser.scala:357-374)."""

    name: str
    password: Optional[str] = None
    role: Optional[str] = None


@dataclass(frozen=True)
class DropUser(Statement):
    """≙ parser.DropUser (SqlParser.scala:355)."""

    name: str
