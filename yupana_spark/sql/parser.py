"""YupanaQL parser: recursive descent over a hand-rolled tokenizer.

Grammar mirrors yupana-core/.../sql/parser/SqlParser.scala:233-379 and literal
forms mirror ValueParser.scala:

- single SELECT, no JOIN, no ORDER BY (reserved keyword only)
- ``SELECT fields FROM t WHERE cond GROUP BY g HAVING h LIMIT n``
- nested ``SELECT f FROM (SELECT ...)`` is *flattened* (inner exprs inlined,
  SqlParser.scala:235-251), not executed as a subquery
- literals: numbers, 'strings' (with \\ escapes), TRUE/FALSE, NULL,
  TIMESTAMP 'yyyy-MM-dd[ HH:mm:ss[.SSS]]' and {ts '...'},
  INTERVAL '[d ]HH:MM:SS[.mmm]' / INTERVAL 'n' UNIT, arrays ``{a, b}``,
  placeholders ``?`` / ``$n``
- UPSERT INTO t (cols) VALUES (...),(...)
- SHOW TABLES/COLUMNS/VERSION/QUERIES/FUNCTIONS/UPDATES_INTERVALS,
  KILL QUERY, DELETE QUERIES, SET name=value
"""

from __future__ import annotations

import datetime as dt
import re
from decimal import Decimal
from typing import Any, List, Optional, Tuple

from . import ast as A


class SqlParseError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<ts_brace>\{\s*ts\s*'[^']*'\s*\})
  | (?P<string>'(?:\\.|[^'\\])*')
  | (?P<number>\d+(?:\.\d+)?)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<dquoted>"[A-Za-z_][A-Za-z0-9_]*")
  | (?P<placeholder>\?|\$\d+)
  | (?P<op><>|!=|<=|>=|=|<|>|\+|-|\*|/|\(|\)|,|;|\{|\}|\.)
    """,
    re.VERBOSE,
)

KEYWORDS = {
    "select", "upsert", "delete", "kill", "alter", "drop", "from", "where",
    "and", "or", "as", "group", "order", "by", "limit", "case", "when",
    "then", "else", "having", "in", "is", "null", "not", "with", "set",
}


def _tokenize(sql: str) -> List[Tuple[str, str]]:
    out: List[Tuple[str, str]] = []
    pos = 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            raise SqlParseError(f"cannot tokenize at {sql[pos:pos + 10]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append((kind, m.group()))
    out.append(("end", ""))
    return out


def _unquote(s: str) -> str:
    body = s[1:-1]
    return re.sub(
        r"\\(.)",
        lambda m: {"n": "\n", "r": "\r", "t": "\t"}.get(m.group(1), m.group(1)),
        body,
    )


_TS_RE = re.compile(
    r"^(\d{4})-(\d{1,2})-(\d{1,2})(?: (\d{1,2}):(\d{2}):(\d{2})(?:\.(\d{1,6}))?)?$"
)


def parse_datetime(s: str) -> dt.datetime:
    m = _TS_RE.match(s)
    if not m:
        raise SqlParseError(f"bad timestamp literal {s!r}")
    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    h = int(m.group(4) or 0)
    mi = int(m.group(5) or 0)
    se = int(m.group(6) or 0)
    frac = m.group(7) or ""
    micros = int(frac.ljust(6, "0")) if frac else 0
    return dt.datetime(y, mo, d, h, mi, se, micros)


_IVL_RE = re.compile(r"^(?:(\d+) )?(\d{1,2}):(\d{2}):(\d{2})(?:\.(\d{1,3}))?$")
_IVL_UNITS = {
    "second": "seconds", "minute": "minutes", "hour": "hours", "day": "days",
    "week": "weeks",
}


class Parser:
    def __init__(self, sql: str):
        self.toks = _tokenize(sql)
        self.i = 0
        self.n_placeholders = 0

    # -- token helpers -----------------------------------------------------
    def peek(self) -> Tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> Tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def at_kw(self, *kws: str) -> bool:
        k, v = self.peek()
        return k == "name" and v.lower() in kws

    def eat_kw(self, *kws: str) -> bool:
        if self.at_kw(*kws):
            self.i += 1
            return True
        return False

    def expect_kw(self, kw: str) -> None:
        if not self.eat_kw(kw):
            raise SqlParseError(f"expected {kw.upper()}, got {self.peek()[1]!r}")

    def at_op(self, *ops: str) -> bool:
        k, v = self.peek()
        return k == "op" and v in ops

    def eat_op(self, *ops: str) -> bool:
        if self.at_op(*ops):
            self.i += 1
            return True
        return False

    def expect_op(self, op: str) -> None:
        if not self.eat_op(op):
            raise SqlParseError(f"expected {op!r}, got {self.peek()[1]!r}")

    def name(self) -> str:
        k, v = self.next()
        if k == "name":
            return v
        if k == "dquoted":
            return v[1:-1]
        raise SqlParseError(f"expected name, got {v!r}")

    # -- literal values (ValueParser) ---------------------------------------
    def try_value(self) -> Tuple[bool, Any]:
        """Literal or placeholder; returns (matched, value)."""
        k, v = self.peek()
        if k == "number":
            self.i += 1
            return True, (Decimal(v) if "." in v else int(v))
        if k == "op" and v == "-" and self.toks[self.i + 1][0] == "number":
            self.i += 2
            nv = self.toks[self.i - 1][1]
            return True, (-Decimal(nv) if "." in nv else -int(nv))
        if k == "string":
            self.i += 1
            return True, _unquote(v)
        if k == "ts_brace":
            self.i += 1
            inner = re.search(r"'([^']*)'", v).group(1)
            return True, parse_datetime(inner)
        if k == "placeholder":
            self.i += 1
            if v == "?":
                self.n_placeholders += 1
                return True, A.PlaceholderV(self.n_placeholders)
            return True, A.PlaceholderV(int(v[1:]))
        if k == "name":
            lv = v.lower()
            if lv == "null":
                self.i += 1
                return True, None
            if lv == "true":
                self.i += 1
                return True, True
            if lv == "false":
                self.i += 1
                return True, False
            if lv in ("timestamp", "ts") and self.toks[self.i + 1][0] == "string":
                self.i += 1
                s = _unquote(self.next()[1])
                return True, parse_datetime(s)
            if lv == "interval":
                self.i += 1
                return True, self._interval()
        return False, None

    def value(self) -> Any:
        ok, v = self.try_value()
        if not ok:
            raise SqlParseError(f"expected literal, got {self.peek()[1]!r}")
        return v

    def _interval(self) -> dt.timedelta:
        k, v = self.next()
        if k != "string":
            raise SqlParseError("expected interval string")
        body = _unquote(v)
        # INTERVAL 'n' UNIT form
        if re.fullmatch(r"-?\d+", body):
            unit = self.name().lower()
            if unit not in _IVL_UNITS:
                raise SqlParseError(f"unsupported interval unit {unit}")
            return dt.timedelta(**{_IVL_UNITS[unit]: int(body)})
        m = _IVL_RE.match(body)
        if not m:
            raise SqlParseError(f"bad interval literal {body!r}")
        days = int(m.group(1) or 0)
        ms = int((m.group(5) or "").ljust(3, "0")) if m.group(5) else 0
        return dt.timedelta(
            days=days, hours=int(m.group(2)), minutes=int(m.group(3)),
            seconds=int(m.group(4)), milliseconds=ms,
        )

    # -- expressions (precedence mirrors SqlParser) --------------------------
    def condition(self) -> A.SqlExpr:
        parts = [self.logical_term()]
        while self.eat_kw("or"):
            parts.append(self.logical_term())
        return parts[0] if len(parts) == 1 else A.OrE(tuple(parts))

    def logical_term(self) -> A.SqlExpr:
        parts = [self.logical_factor()]
        while self.eat_kw("and"):
            parts.append(self.logical_factor())
        return parts[0] if len(parts) == 1 else A.AndE(tuple(parts))

    def logical_factor(self) -> A.SqlExpr:
        if self.eat_kw("not"):
            return A.NotE(self.logical_factor())
        return self.equation()

    def equation(self) -> A.SqlExpr:
        a = self.bool_expr()
        if self.at_op("=", "<>", "!="):
            _, op = self.next()
            b = self.bool_expr()
            return A.BinOp("=" if op == "=" else "<>", a, b)
        return a

    def bool_expr(self) -> A.SqlExpr:
        e = self.math_expr()
        if self.at_op("<", ">", "<=", ">="):
            _, op = self.next()
            return A.BinOp(op, e, self.math_expr())
        if self.at_kw("in"):
            self.i += 1
            return A.InE(e, self._value_list())
        if self.at_kw("not") and self.toks[self.i + 1][1].lower() == "in":
            self.i += 2
            return A.InE(e, self._value_list(), negated=True)
        if self.at_kw("is"):
            self.i += 1
            if self.eat_kw("not"):
                self.expect_kw("null")
                return A.IsNullE(e, negated=True)
            self.expect_kw("null")
            return A.IsNullE(e)
        if self.at_kw("between"):
            self.i += 1
            lo = self.value()
            self.expect_kw("and")
            hi = self.value()
            return A.BetweenE(e, lo, hi)
        return e

    def _value_list(self) -> Tuple[Any, ...]:
        self.expect_op("(")
        vals = [self._value_or_tuple()]
        while self.eat_op(","):
            vals.append(self._value_or_tuple())
        self.expect_op(")")
        return tuple(vals)

    def _value_or_tuple(self) -> Any:
        if self.eat_op("("):
            a = self.value()
            self.expect_op(",")
            b = self.value()
            self.expect_op(")")
            return (a, b)
        return self.value()

    def math_expr(self) -> A.SqlExpr:
        if self.eat_op("-"):
            e: A.SqlExpr = A.UMinus(self.math_term())
        else:
            e = self.math_term()
        while self.at_op("+", "-"):
            _, op = self.next()
            e = A.BinOp(op, e, self.math_term())
        return e

    def math_term(self) -> A.SqlExpr:
        e = self.math_factor()
        while self.at_op("*", "/"):
            _, op = self.next()
            e = A.BinOp(op, e, self.math_factor())
        return e

    def math_factor(self) -> A.SqlExpr:
        k, v = self.peek()
        if k == "op" and v == "(":
            self.i += 1
            e = self.condition()
            if self.eat_op(","):
                b = self.condition()
                self.expect_op(")")
                return A.TupleE(e, b)
            self.expect_op(")")
            return e
        if k == "op" and v == "{":  # array literal {a, b}
            self.i += 1
            items = [self.value()]
            while self.eat_op(","):
                items.append(self.value())
            self.expect_op("}")
            return A.ArrayE(tuple(items))
        if k == "name":
            lv = v.lower()
            if lv == "cast":
                self.i += 1
                self.expect_op("(")
                e = self.condition()
                self.expect_kw("as")
                tn = self.name()
                # allow DECIMAL(p,s)-style params
                if self.eat_op("("):
                    p = self.value()
                    s = 0
                    if self.eat_op(","):
                        s = self.value()
                    self.expect_op(")")
                    tn = f"{tn}({p},{s})"
                self.expect_op(")")
                return A.CastE(e, tn)
            if lv == "case":
                self.i += 1
                branches = []
                while self.eat_kw("when"):
                    c = self.condition()
                    self.expect_kw("then")
                    val = self.condition()
                    branches.append((c, val))
                self.expect_kw("else")
                other = self.condition()
                if not branches:
                    raise SqlParseError("CASE needs at least one WHEN")
                # optional END tolerated (reference has no END)
                self.eat_kw("end")
                return A.CaseE(tuple(branches), other)
            # function call?
            if self.toks[self.i + 1][:2] == ("op", "(") and lv not in KEYWORDS:
                self.i += 2
                args: List[A.SqlExpr] = []
                if not self.at_op(")"):
                    args.append(self.condition())
                    while self.eat_op(","):
                        args.append(self.condition())
                self.expect_op(")")
                return A.FunctionCall(lv, tuple(args))
        ok, val = self.try_value()
        if ok:
            if isinstance(val, A.PlaceholderV):
                return val
            return A.Constant(val)
        if k in ("name", "dquoted"):
            nm = self.name()
            if self.eat_op("."):  # schema.field -> keep field
                nm = self.name()
            return A.FieldName(nm)
        raise SqlParseError(f"unexpected token {v!r}")

    # -- SELECT --------------------------------------------------------------
    def select(self) -> A.Select:
        self.expect_kw("select")
        fields: Optional[List[A.SqlField]]
        if self.eat_op("*"):
            fields = None
        else:
            fields = [self._field()]
            while self.eat_op(","):
                fields.append(self._field())

        table: Optional[str] = None
        inner: Optional[A.Select] = None
        if self.eat_kw("from"):
            if self.at_op("("):
                self.i += 1
                inner = self.select()
                self.expect_op(")")
                self.eat_kw("as")
                if self.peek()[0] == "name" and not self.at_kw(
                    "where", "group", "having", "limit"
                ):
                    self.next()  # subquery alias, ignored
            else:
                table = self.name()

        cond = self.condition() if self.eat_kw("where") else None
        group_by: List[A.SqlExpr] = []
        if self.eat_kw("group"):
            self.expect_kw("by")
            group_by.append(self._grouping())
            while self.eat_op(","):
                group_by.append(self._grouping())
        having = self.condition() if self.eat_kw("having") else None
        limit = None
        if self.eat_kw("limit"):
            limit = self.value()
            if not isinstance(limit, int):
                raise SqlParseError("LIMIT must be an integer")
        # trailing WHERE after nested select (SqlParser.scala:266)
        if cond is None and self.eat_kw("where"):
            cond = self.condition()

        sel = A.Select(
            table=table,
            fields=tuple(fields) if fields is not None else None,
            condition=cond,
            group_by=tuple(group_by),
            having=having,
            limit=limit,
        )
        if inner is not None:
            sel = _flatten_nested(sel, inner)
        return sel

    def _grouping(self) -> A.SqlExpr:
        # grammar: callOrField; we accept general exprs (superset)
        return self.condition()

    def _field(self) -> A.SqlField:
        e = self.condition()
        alias = None
        if self.eat_kw("as"):
            alias = self.name()
        elif self.peek()[0] in ("name", "dquoted") and not self.at_kw(*KEYWORDS):
            alias = self.name()
        return A.SqlField(e, alias)

    # -- other statements ------------------------------------------------------
    def upsert(self) -> A.Upsert:
        self.expect_kw("upsert")
        self.expect_kw("into")
        table = self.name()
        self.expect_op("(")
        cols = [self.name()]
        while self.eat_op(","):
            cols.append(self.name())
        self.expect_op(")")
        self.expect_kw("values")
        rows = []
        while True:
            self.expect_op("(")
            row = [self.value()]
            while self.eat_op(","):
                row.append(self.value())
            self.expect_op(")")
            if len(row) != len(cols):
                raise SqlParseError(
                    f"expected {len(cols)} values, got {len(row)}"
                )
            rows.append(tuple(row))
            if not self.eat_op(","):
                break
        return A.Upsert(table, tuple(cols), tuple(rows))

    def _metrics_filter(self) -> Tuple[Optional[str], Optional[str]]:
        qid = state = None
        self.expect_kw("where")
        key = self.name().lower()
        self.expect_op("=")
        val = self.value()
        if key == "query_id":
            qid = str(val)
        elif key == "state":
            state = str(val)
        else:
            raise SqlParseError(f"unknown metrics filter {key}")
        return qid, state

    def show(self) -> A.Statement:
        self.expect_kw("show")
        if self.eat_kw("tables"):
            return A.ShowTables()
        if self.eat_kw("version"):
            return A.ShowVersion()
        if self.eat_kw("columns"):
            self.expect_kw("from")
            return A.ShowColumns(self.name())
        if self.eat_kw("functions"):
            self.expect_kw("for")
            return A.ShowFunctions(self.name())
        if self.eat_kw("updates_intervals"):
            cond = self.condition() if self.eat_kw("where") else None
            return A.ShowUpdatesIntervals(cond)
        if self.eat_kw("users"):
            # SqlParser.scala:294 — the reference lists its user registry;
            # this engine runs unauthenticated (auth belongs to the
            # deployment), so the statement parses and reports the single
            # effective identity instead of rejecting (round-12 polish)
            return A.ShowUsers()
        if self.eat_kw("queries"):
            qid = state = limit = None
            if self.at_kw("where"):
                qid, state = self._metrics_filter()
            if self.eat_kw("limit"):
                limit = self.value()
            return A.ShowQueries(qid, state, limit)
        raise SqlParseError(f"cannot SHOW {self.peek()[1]!r}")

    # -- user-management DDL (SqlParser.scala:107-110, 336-374) --------------
    def _quoted_username(self, what: str = "user name") -> str:
        """Reference ``username`` rule: a QUOTED identifier, first char a
        letter then >=1 of [A-Za-z0-9_-] (SqlParser.scala:107-108) — an
        unquoted name is a parse error, exactly like the reference."""
        k, v = self.next()
        if k != "string":
            raise SqlParseError(
                f"expected quoted {what} (e.g. 'alice'), got {v!r}")
        u = _unquote(v)
        if not re.fullmatch(r"[A-Za-z][A-Za-z0-9_\-]+", u):
            raise SqlParseError(
                f"invalid {what} {u!r}: a letter followed by at least one "
                "letter/digit/_/- is required")
        return u

    def _quoted_password(self) -> str:
        k, v = self.next()
        if k != "string":
            raise SqlParseError(f"expected quoted password, got {v!r}")
        return _unquote(v)

    def user_ddl(self) -> A.Statement:
        """CREATE USER 'u' [WITH PASSWORD 'p' [WITH ROLE 'r'] | WITH ROLE
        'r' [WITH PASSWORD 'p']] / ALTER USER 'u' SET PASSWORD = 'p'
        [SET ROLE = 'r'] | SET ROLE = 'r' [SET PASSWORD = 'p'] / DROP
        USER 'u' — the reference grammar order-for-order
        (SqlParser.scala:336-374; roles parse with the username rule)."""
        verb = self.peek()[1].lower()
        self.i += 1
        self.expect_kw("user")
        if verb == "drop":
            return A.DropUser(self._quoted_username())
        if verb == "create":
            name = self._quoted_username()
            password = role = None
            if self.eat_kw("with"):
                if self.eat_kw("password"):
                    password = self._quoted_password()
                    if self.eat_kw("with"):
                        self.expect_kw("role")
                        role = self._quoted_username("role")
                elif self.eat_kw("role"):
                    role = self._quoted_username("role")
                    if self.eat_kw("with"):
                        self.expect_kw("password")
                        password = self._quoted_password()
                else:
                    raise SqlParseError(
                        "expected PASSWORD or ROLE after WITH")
            return A.CreateUser(name, password, role)
        name = self._quoted_username()
        self.expect_kw("set")
        password = role = None
        if self.eat_kw("password"):
            self.expect_op("=")
            password = self._quoted_password()
            if self.eat_kw("set"):
                self.expect_kw("role")
                self.expect_op("=")
                role = self._quoted_username("role")
        elif self.eat_kw("role"):
            self.expect_op("=")
            role = self._quoted_username("role")
            if self.eat_kw("set"):
                self.expect_kw("password")
                self.expect_op("=")
                password = self._quoted_password()
        else:
            raise SqlParseError("expected SET PASSWORD or SET ROLE")
        return A.AlterUser(name, password, role)

    def statement(self) -> A.Statement:
        if self.at_kw("select"):
            st: A.Statement = self.select()
        elif self.at_kw("upsert"):
            st = self.upsert()
        elif self.at_kw("show"):
            st = self.show()
        elif self.at_kw("kill"):
            self.i += 1
            self.expect_kw("query")
            qid, _ = self._metrics_filter()
            st = A.KillQuery(qid)
        elif self.at_kw("delete"):
            self.i += 1
            self.expect_kw("queries")
            qid, state = self._metrics_filter()
            st = A.DeleteQueries(qid, state)
        elif self.at_kw("set"):
            self.i += 1
            nm = self.name()
            while self.eat_op("."):  # dotted config names (spark.sql.*)
                nm += "." + self.name()
            self.expect_op("=")
            st = A.SetValue(nm, self.value())
        elif (self.at_kw("create") or self.at_kw("alter")
              or self.at_kw("drop")):
            st = self.user_ddl()
        else:
            raise SqlParseError(f"cannot parse statement at {self.peek()[1]!r}")
        self.eat_op(";")
        if self.peek()[0] != "end":
            raise SqlParseError(f"trailing input at {self.peek()[1]!r}")
        return st


def _flatten_nested(outer: A.Select, inner: A.Select) -> A.Select:
    """Inline inner select exprs into the outer (SqlParser.scala:276-290)."""
    inner_fields = inner.fields or ()
    by_name = {}
    for f in inner_fields:
        nm = f.alias or _proposed_name(f.expr)
        if nm:
            by_name[nm] = f.expr

    def subst(e: A.SqlExpr) -> A.SqlExpr:
        if isinstance(e, A.FieldName):
            return by_name.get(e.name, e)
        if isinstance(e, A.FunctionCall):
            return A.FunctionCall(e.name, tuple(subst(a) for a in e.args))
        if isinstance(e, A.BinOp):
            return A.BinOp(e.op, subst(e.left), subst(e.right))
        if isinstance(e, A.UMinus):
            return A.UMinus(subst(e.expr))
        if isinstance(e, A.AndE):
            return A.AndE(tuple(subst(p) for p in e.parts))
        if isinstance(e, A.OrE):
            return A.OrE(tuple(subst(p) for p in e.parts))
        if isinstance(e, A.NotE):
            return A.NotE(subst(e.expr))
        if isinstance(e, A.InE):
            return A.InE(subst(e.expr), e.values, e.negated)
        if isinstance(e, A.IsNullE):
            return A.IsNullE(subst(e.expr), e.negated)
        if isinstance(e, A.BetweenE):
            return A.BetweenE(subst(e.expr), e.lo, e.hi)
        if isinstance(e, A.CaseE):
            return A.CaseE(
                tuple((subst(c), subst(v)) for c, v in e.branches),
                subst(e.otherwise),
            )
        if isinstance(e, A.CastE):
            return A.CastE(subst(e.expr), e.type_name)
        if isinstance(e, A.TupleE):
            return A.TupleE(subst(e.a), subst(e.b))
        return e

    out_fields = None
    if outer.fields is not None:
        # keep the outer name: `SELECT y FROM (SELECT f(x) AS y ...)` stays `y`
        out_fields = tuple(
            A.SqlField(subst(f.expr), f.alias or _proposed_name(f.expr))
            for f in outer.fields
        )
    elif inner.fields is not None:
        out_fields = inner.fields

    conds = []
    if inner.condition is not None:
        conds.append(inner.condition)
    if outer.condition is not None:
        conds.append(subst(outer.condition))
    cond = conds[0] if len(conds) == 1 else (A.AndE(tuple(conds)) if conds else None)

    return A.Select(
        table=inner.table,
        fields=out_fields,
        condition=cond,
        group_by=tuple(subst(g) for g in outer.group_by) or inner.group_by,
        having=subst(outer.having) if outer.having is not None else inner.having,
        limit=outer.limit if outer.limit is not None else inner.limit,
    )


def _proposed_name(e: A.SqlExpr) -> Optional[str]:
    if isinstance(e, A.FieldName):
        return e.name
    if isinstance(e, A.FunctionCall) and len(e.args) == 1:
        inner = _proposed_name(e.args[0])
        if inner:
            return f"{e.name}({inner})"
    return None


def parse(sql: str) -> A.Statement:
    return Parser(sql.strip()).statement()
