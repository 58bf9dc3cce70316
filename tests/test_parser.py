"""Parser unit tests (≙ SqlParserTest.scala — SQL -> AST)."""

import datetime as dt
from decimal import Decimal

import pytest

from yupana_spark.sql import ast as A
from yupana_spark.sql.parser import SqlParseError, parse


def test_simple_select():
    s = parse("SELECT l_returnflag, l_quantity FROM lineitem "
              "WHERE time >= TIMESTAMP '1995-01-01' AND time < TIMESTAMP '1996-01-01'")
    assert isinstance(s, A.Select)
    assert s.table == "lineitem"
    assert len(s.fields) == 2
    assert isinstance(s.condition, A.AndE)


def test_aliases_and_functions():
    s = parse("SELECT trunc_day(time) AS d, sum(l_quantity) total FROM lineitem")
    assert s.fields[0].alias == "d"
    assert s.fields[1].alias == "total"
    assert isinstance(s.fields[0].expr, A.FunctionCall)


def test_timestamp_literals():
    s = parse("SELECT * FROM t WHERE time >= TIMESTAMP '2024-01-02 03:04:05.678' "
              "AND time < {ts '2024-02-01'}")
    lo = s.condition.parts[0].right
    hi = s.condition.parts[1].right
    assert lo.value == dt.datetime(2024, 1, 2, 3, 4, 5, 678000)
    assert hi.value == dt.datetime(2024, 2, 1)


def test_case_in_between_isnull():
    s = parse("SELECT CASE WHEN a IN ('x','y') THEN 1 ELSE 0 END c1 FROM t "
              "WHERE b BETWEEN 1 AND 5 AND c IS NOT NULL AND d NOT IN (3, 4)")
    case = s.fields[0].expr
    assert isinstance(case, A.CaseE)
    parts = s.condition.parts
    assert isinstance(parts[0], A.BetweenE)
    assert isinstance(parts[1], A.IsNullE) and parts[1].negated
    assert isinstance(parts[2], A.InE) and parts[2].negated


def test_arithmetic_precedence():
    s = parse("SELECT a + b * c FROM t")
    top = s.fields[0].expr
    assert top.op == "+"
    assert top.right.op == "*"


def test_array_literal_and_cast():
    s = parse("SELECT CAST(a AS DOUBLE), contains({1, 2, 3}, 2) FROM t")
    assert isinstance(s.fields[0].expr, A.CastE)
    fc = s.fields[1].expr
    assert isinstance(fc.args[0], A.ArrayE)
    assert fc.args[0].items == (1, 2, 3)


def test_placeholders():
    s = parse("SELECT a FROM t WHERE b = ? AND c = ?")
    assert s.condition.parts[0].right.index == 1
    assert s.condition.parts[1].right.index == 2


def test_group_having_limit():
    s = parse("SELECT a, count(b) FROM t GROUP BY a HAVING count(b) > 5 LIMIT 10")
    assert len(s.group_by) == 1
    assert s.having is not None
    assert s.limit == 10


def test_nested_select_flattening():
    # SqlParser.scala:235-251: inner exprs inlined, not a subquery
    s = parse("SELECT d, sum(q) FROM (SELECT trunc_day(time) d, l_quantity q "
              "FROM lineitem) GROUP BY d")
    assert s.table == "lineitem"
    assert isinstance(s.fields[0].expr, A.FunctionCall)  # d -> trunc_day(time)
    inner = s.fields[1].expr.args[0]
    assert isinstance(inner, A.FieldName) and inner.name == "l_quantity"


def test_upsert():
    s = parse("UPSERT INTO receipt (time, kkmId, totalSum) VALUES "
              "(TIMESTAMP '2024-01-01', 42, 99.95), (TIMESTAMP '2024-01-02', 43, 1.00)")
    assert isinstance(s, A.Upsert)
    assert s.fields == ("time", "kkmId", "totalSum")
    assert len(s.values) == 2
    assert s.values[0][1] == 42
    assert s.values[0][2] == Decimal("99.95")


def test_upsert_arity_mismatch():
    with pytest.raises(SqlParseError):
        parse("UPSERT INTO t (a, b) VALUES (1)")


def test_show_statements():
    assert isinstance(parse("SHOW TABLES"), A.ShowTables)
    assert isinstance(parse("SHOW VERSION"), A.ShowVersion)
    assert parse("SHOW COLUMNS FROM lineitem").table == "lineitem"
    assert parse("SHOW FUNCTIONS FOR VARCHAR").type_name == "VARCHAR"
    q = parse("SHOW QUERIES WHERE QUERY_ID = 'abc' LIMIT 5")
    assert q.query_id == "abc" and q.limit == 5
    assert isinstance(parse("SHOW UPDATES_INTERVALS"), A.ShowUpdatesIntervals)


def test_kill_delete_set():
    k = parse("KILL QUERY WHERE QUERY_ID = 'q1'")
    assert k.query_id == "q1"
    d = parse("DELETE QUERIES WHERE STATE = 'FINISHED'")
    assert d.state == "FINISHED"
    sv = parse("SET spark.foo = 'bar'")
    assert (sv.name, sv.value) == ("spark.foo", "bar")


def test_no_order_by():
    with pytest.raises(SqlParseError):
        parse("SELECT a FROM t ORDER BY a")


def test_no_joins():
    with pytest.raises(SqlParseError):
        parse("SELECT a FROM t JOIN u ON t.x = u.x")


def test_interval_literal():
    s = parse("SELECT a FROM t WHERE time >= TIMESTAMP '2024-01-01' "
              "AND time < TIMESTAMP '2024-01-01' + INTERVAL '1 00:00:00'")
    plus = s.condition.parts[1].right
    assert plus.op == "+"
    assert plus.right.value == dt.timedelta(days=1)


def test_user_management_ddl_parses():
    """CREATE/ALTER/DROP USER per the reference grammar
    (SqlParser.scala:336-374): quoted names, both WITH orders on CREATE,
    both SET orders on ALTER, and the quoted-username rule's rejects
    (SqlParser.scala:107-108 — a letter then >=1 of [A-Za-z0-9_-])."""
    import pytest

    from yupana_spark.sql import ast as A
    from yupana_spark.sql.parser import SqlParseError, parse

    s = parse("CREATE USER 'alice' WITH PASSWORD 'p' WITH ROLE 'ADMIN'")
    assert s == A.CreateUser("alice", "p", "ADMIN")
    s = parse("CREATE USER 'alice' WITH ROLE 'ADMIN' WITH PASSWORD 'p'")
    assert s == A.CreateUser("alice", "p", "ADMIN")
    assert parse("CREATE USER 'bob'") == A.CreateUser("bob", None, None)
    s = parse("ALTER USER 'bob' SET PASSWORD = 'q' SET ROLE = 'READ_ONLY'")
    assert s == A.AlterUser("bob", "q", "READ_ONLY")
    s = parse("ALTER USER 'bob' SET ROLE = 'READ_ONLY' SET PASSWORD = 'q'")
    assert s == A.AlterUser("bob", "q", "READ_ONLY")
    assert parse("ALTER USER 'bob' SET PASSWORD = 'q'") == \
        A.AlterUser("bob", "q", None)
    assert parse("DROP USER 'bob'") == A.DropUser("bob")
    # the username rule: unquoted names, one-char names, and names not
    # starting with a letter are parse errors, exactly like the reference
    for bad in ("CREATE USER alice",
                "CREATE USER 'u'",
                "DROP USER '9lives'",
                "ALTER USER 'bob'",                  # SET clause required
                "CREATE USER 'carl' WITH"):          # dangling WITH
        with pytest.raises(SqlParseError):
            parse(bad)


def test_show_users_parses():
    """SHOW USERS (SqlParser.scala:294) PARSES — unlike the user-management
    DDL it has a well-formed read-only answer (the single unauthenticated
    identity), so admin tools pointed at pgwire don't hit a parse error."""
    from yupana_spark.sql import ast as A
    from yupana_spark.sql.parser import parse

    assert isinstance(parse("SHOW USERS"), A.ShowUsers)
    assert isinstance(parse("show users;"), A.ShowUsers)
