"""Property test: the IR ConstantCalculator agrees with Spark's evaluation
of the same constant expression tree (hypothesis-generated trees)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from yupana_spark import E
from yupana_spark.optimizer import ConstantCalculator

_ints = st.integers(min_value=-1000, max_value=1000)
_strs = st.text(alphabet="abcXYZ ", min_size=0, max_size=8)


def _num_expr(depth):
    if depth <= 0:
        return _ints.map(E.const)
    return st.deferred(lambda: st.one_of(
        _ints.map(E.const),
        st.tuples(st.sampled_from(["+", "-", "*"]),
                  _num_expr(depth - 1), _num_expr(depth - 1))
        .map(lambda t: E.BinaryOp(*t)),
        st.tuples(_num_expr(depth - 1)).map(lambda t: E.Fun("abs", t)),
    ))


def _bool_expr(depth):
    base = st.tuples(st.sampled_from(["=", "<>", "<", ">", "<=", ">="]),
                     _num_expr(1), _num_expr(1)).map(lambda t: E.BinaryOp(*t))
    if depth <= 0:
        return base
    return st.deferred(lambda: st.one_of(
        base,
        st.lists(_bool_expr(depth - 1), min_size=2, max_size=3)
        .map(lambda cs: E.And(tuple(cs))),
        st.lists(_bool_expr(depth - 1), min_size=2, max_size=3)
        .map(lambda cs: E.Or(tuple(cs))),
        _bool_expr(depth - 1).map(E.Not),
    ))


@st.composite
def const_exprs(draw):
    kind = draw(st.sampled_from(["num", "bool", "case", "str"]))
    if kind == "num":
        return draw(_num_expr(2))
    if kind == "bool":
        return draw(_bool_expr(2))
    if kind == "str":
        a, b = draw(_strs), draw(_strs)
        return E.Fun("upper", (E.BinaryOp("+", E.const(a), E.const(b)),))
    cond = draw(_bool_expr(1))
    t, f = draw(_num_expr(1)), draw(_num_expr(1))
    return E.Case(((cond, t),), f)


@pytest.fixture(scope="module")
def _spark_eval(spark):
    from yupana_spark.operators.tableless import select_constants

    def ev(exprs):
        df = select_constants(spark, [(e, f"c{i}") for i, e in enumerate(exprs)])
        return list(df.collect()[0])

    return ev


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(const_exprs(), min_size=1, max_size=8))
def test_fold_matches_spark(_spark_eval, exprs):
    calc = ConstantCalculator()
    folded = [calc.evaluate(e) for e in exprs]
    got = _spark_eval(exprs)
    for f, g in zip(folded, got):
        if isinstance(f, bool):
            assert bool(g) == f
        else:
            assert g == f
