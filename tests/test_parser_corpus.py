"""Extended parser corpus (≙ SqlParserTest.scala breadth)."""

import datetime as dt
from decimal import Decimal

import pytest

from yupana_spark.sql import ast as A
from yupana_spark.sql.parser import SqlParseError, parse


def sel(sql):
    s = parse(sql)
    assert isinstance(s, A.Select)
    return s


def test_keywords_case_insensitive():
    s = sel("select A fRoM t wHeRe b = 1 GrOuP bY a HaViNg count(b) > 2 LiMiT 3")
    assert s.table == "t" and s.limit == 3


def test_escaped_string_literals():
    s = sel(r"SELECT a FROM t WHERE b = 'it\'s \n ok\\'")
    assert s.condition.right.value == "it's \n ok\\"


def test_negative_numbers_and_unary_minus():
    s = sel("SELECT -a, 2 - -3 FROM t WHERE b > -5")
    assert isinstance(s.fields[0].expr, A.UMinus)
    # -5 after a comparison parses as UMinus(Const(5)); the optimizer folds it
    rhs = s.condition.right
    assert isinstance(rhs, A.UMinus) and rhs.expr.value == 5


def test_decimal_literals():
    s = sel("SELECT a FROM t WHERE b = 10.25")
    assert s.condition.right.value == Decimal("10.25")


def test_ms_access_ts_format():
    s = sel("SELECT a FROM t WHERE time >= {ts '2024-03-04 05:06:07'}")
    assert s.condition.right.value == dt.datetime(2024, 3, 4, 5, 6, 7)


def test_nested_function_calls():
    s = sel("SELECT upper(lower(trim_me(a))) FROM t")
    f = s.fields[0].expr
    assert f.name == "upper" and f.args[0].name == "lower"


def test_tuple_in_condition():
    s = sel("SELECT a FROM t WHERE (b, c) IN ((1, 'x'), (2, 'y'))")
    cond = s.condition
    assert isinstance(cond, A.InE) and isinstance(cond.expr, A.TupleE)
    assert cond.values == ((1, "x"), (2, "y"))


def test_dollar_placeholders():
    s = sel("SELECT a FROM t WHERE b = $2 AND c = $1")
    assert s.condition.parts[0].right.index == 2
    assert s.condition.parts[1].right.index == 1


def test_not_operator():
    s = sel("SELECT a FROM t WHERE NOT (b = 1 OR c = 2)")
    assert isinstance(s.condition, A.NotE)


def test_order_by_clause_rejected():
    # 'order' alone is an identifier (matches reference grammar); a full
    # ORDER BY clause is trailing garbage
    with pytest.raises(SqlParseError):
        parse("SELECT a FROM t WHERE x = 1 ORDER BY a")


def test_missing_else_rejected():
    with pytest.raises(SqlParseError):
        parse("SELECT CASE WHEN a = 1 THEN 2 END FROM t")


def test_quoted_identifiers():
    s = sel('SELECT "select_ish" FROM "t2"')
    assert s.table == "t2"
    assert s.fields[0].expr.name == "select_ish"


def test_alias_without_as():
    s = sel("SELECT sum(x) total, a b FROM t")
    assert s.fields[0].alias == "total" and s.fields[1].alias == "b"


def test_keyword_cannot_be_alias():
    # `FROM` after field list must parse as the FROM clause, not an alias
    s = sel("SELECT a FROM t")
    assert s.fields[0].alias is None


def test_semicolon_tolerated():
    assert sel("SELECT a FROM t;").table == "t"


def test_trailing_garbage_rejected():
    with pytest.raises(SqlParseError):
        parse("SELECT a FROM t garbage fields here")


def test_double_where_after_nested():
    s = sel("SELECT x FROM (SELECT a x FROM t WHERE b = 1) WHERE c = 2")
    # inner + outer conditions merged with AND
    assert isinstance(s.condition, A.AndE)


def test_upsert_multirow_types():
    u = parse("UPSERT INTO t (a, b, c, d) VALUES "
              "(1, 'x', TRUE, NULL), (2, 'y', FALSE, 3.5)")
    assert u.values[0] == (1, "x", True, None)
    assert u.values[1][3] == Decimal("3.5")


def test_array_in_function():
    s = sel("SELECT contains_any(tokens(a), {'x', 'y'}) FROM t")
    fc = s.fields[0].expr
    assert isinstance(fc.args[1], A.ArrayE)
    assert fc.args[1].items == ("x", "y")
