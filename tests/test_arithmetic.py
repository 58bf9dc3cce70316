"""Arithmetic & type-semantics corpus (≙ TsdbArithmeticTest.scala:52-196,
TsdbDataFilterTest.scala): runtime behavior of the guard matrix, casts,
time arithmetic, and null-handling — through the engine end to end."""

import datetime as dt
from decimal import Decimal

import pytest

from yupana_spark import E, query
from yupana_spark import types as yt
from yupana_spark.expressions import InvalidQueryError

FROM = dt.datetime(1995, 1, 1)
TO = dt.datetime(2002, 1, 1)
TB = "time >= TIMESTAMP '1995-01-01' AND time < TIMESTAMP '2002-01-01'"


def one(tsdb, expr, name="v", table="lineitem", limit=1):
    q = query(table, FROM, TO, fields=[(expr, name)], limit=limit)
    return tsdb.query(q).collect()[0][name]


def test_string_plus_is_concat(tsdb):
    v = one(tsdb, E.BinaryOp("+", E.Field("l_returnflag"),
                             E.Field("l_linestatus")))
    assert isinstance(v, str) and len(v) == 2


def test_string_plus_number_rejected(tsdb):
    with pytest.raises(yt.YupanaTypeError):
        one(tsdb, E.BinaryOp("+", E.Field("l_returnflag"),
                             E.Field("l_quantity")))


def test_time_minus_time_is_interval(tsdb):
    expr = E.BinaryOp("-", E.time(), E.trunc("year", E.time()))
    assert expr.dtype == yt.PERIOD
    v = one(tsdb, expr)
    assert isinstance(v, dt.timedelta)


def test_time_plus_period(tsdb):
    expr = E.BinaryOp("+", E.time(), E.const(dt.timedelta(days=1)))
    assert expr.dtype == yt.TIMESTAMP
    row = tsdb.query(query("lineitem", FROM, TO,
                           fields=[(E.time(), "t"), (expr, "t2")],
                           limit=1)).collect()[0]
    assert row["t2"] - row["t"] == dt.timedelta(days=1)


def test_currency_times_num(tsdb):
    cur = E.Cast(E.Field("l_extendedprice"), yt.CURRENCY)
    expr = E.BinaryOp("*", cur, E.const(2))
    assert expr.dtype == yt.CURRENCY
    q = query("lineitem", FROM, TO,
              fields=[(E.Field("l_extendedprice"), "p"), (expr, "p2")], limit=5)
    for r in tsdb.query(q).collect():
        assert r["p2"] == Decimal(str(round(r["p"], 2))) * 2


def test_currency_times_currency_rejected(tsdb):
    cur = E.Cast(E.Field("l_extendedprice"), yt.CURRENCY)
    with pytest.raises(yt.YupanaTypeError):
        one(tsdb, E.BinaryOp("*", cur, cur))


def test_currency_div_currency_is_double(tsdb):
    cur = E.Cast(E.Field("l_extendedprice"), yt.CURRENCY)
    expr = E.BinaryOp("/", cur, cur)
    assert expr.dtype == yt.DOUBLE
    assert one(tsdb, expr) == pytest.approx(1.0)


def test_sum_smallint_widens_to_int():
    # FunctionRegistry.scala:76-91: byte/short sums widen to Int
    e = E.AggExpr("sum", E.Field("x", yt.SHORT))
    assert e.dtype == yt.INT
    e2 = E.AggExpr("sum", E.Field("x", yt.LONG))
    assert e2.dtype == yt.LONG


def test_hll_count_rsd_bounds():
    with pytest.raises(yt.YupanaTypeError):
        E.hll_count(E.Field("x", yt.LONG), 0.5).dtype  # noqa: B018
    with pytest.raises(yt.YupanaTypeError):
        E.hll_count(E.Field("x", yt.LONG), 0.00001).dtype  # noqa: B018
    assert E.hll_count(E.Field("x", yt.LONG), 0.05).dtype == yt.LONG


def test_cast_ladder(tsdb):
    v = one(tsdb, E.Cast(E.Cast(E.Field("l_linenumber"), yt.LONG), yt.DOUBLE))
    assert isinstance(v, float)
    s = one(tsdb, E.Cast(E.Field("l_quantity"), yt.STRING))
    assert isinstance(s, str)


def test_unary_minus_and_abs(tsdb):
    row = tsdb.query(query(
        "lineitem", FROM, TO,
        fields=[(E.Fun("-", (E.Field("l_quantity"),)), "neg"),
                (E.Fun("abs", (E.Fun("-", (E.Field("l_quantity"),)),)), "ab"),
                (E.Field("l_quantity"), "q")],
        limit=1)).collect()[0]
    assert row["neg"] == -row["q"] and row["ab"] == row["q"]


def test_comparison_type_alignment(tsdb):
    # int literal vs double column (alignTypes, DataTypeUtils.scala:125)
    n = one(tsdb, E.count(E.Field("l_orderkey")), "c",
            limit=None) if False else None
    q = query("lineitem", FROM, TO,
              fields=[(E.count(E.Field("l_orderkey")), "c")],
              filter=E.gt(E.Field("l_quantity"), E.const(10)))
    assert tsdb.query(q).collect()[0]["c"] > 0


def test_division_by_zero_yields_null(tsdb):
    # non-ANSI division semantics: x/0 -> NULL, not an error
    q = query("lineitem", FROM, TO,
              fields=[(E.BinaryOp("/", E.Field("l_quantity"),
                                  E.const(0.0)), "d")],
              limit=1)
    assert tsdb.query(q).collect()[0]["d"] is None


def test_in_empty_semantics(tsdb):
    q = query("lineitem", FROM, TO,
              fields=[(E.count(E.Field("l_orderkey")), "c")],
              filter=E.In(E.Field("l_returnflag"), ("Z",)))
    assert tsdb.query(q).collect()[0]["c"] == 0


def test_integral_division_exact_and_null(spark):
    """The compiled integral `/` is exact long division (SQL div), not
    double-division-then-cast: (2^62+1)/1 must come back exactly (the
    double path was off by one above 2^53), MIN/-1 wraps like JVM int
    division, and /0 is NULL under the non-ANSI dialect."""
    from yupana_spark import E
    from yupana_spark.operators.tableless import select_constants

    big = (1 << 62) + 1
    row = select_constants(spark, [
        (E.BinaryOp("/", E.const(big, "BIGINT"), E.const(1, "BIGINT")),
         "exact"),
        (E.BinaryOp("/", E.const(-(2**31), "INTEGER"),
                    E.const(-1, "INTEGER")), "minwrap"),
        (E.BinaryOp("/", E.const(7), E.const(0)), "bzero"),
        (E.BinaryOp("/", E.const(-7), E.const(2)), "tozero"),
    ]).collect()[0]
    assert row["exact"] == big
    assert row["minwrap"] == -(2**31)
    assert row["bzero"] is None
    assert row["tozero"] == -3
