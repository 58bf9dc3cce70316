"""Optimizer unit tests (≙ QueryOptimizerTest / ConstantCalculatorTest)."""

import datetime as dt
from decimal import Decimal

from yupana_spark import E
from yupana_spark.optimizer import (ConstantCalculator, fold_constants,
                                    optimize_condition, simplify_condition)


def test_fold_arithmetic():
    e = fold_constants(E.BinaryOp("+", E.const(2), E.BinaryOp("*", E.const(3),
                                                              E.const(4))))
    assert isinstance(e, E.Const) and e.value == 14


def test_fold_preserves_simple():
    e = E.BinaryOp("+", E.Field("x", "BIGINT"), E.const(0))
    out = fold_constants(e)
    assert isinstance(out, E.BinaryOp)  # not const-kind -> untouched
    assert isinstance(out.left, E.Field)


def test_fold_functions_and_tokens():
    calc = ConstantCalculator()
    assert calc.evaluate(E.Fun("lower", (E.const("ABC"),))) == "abc"
    assert calc.evaluate(E.Fun("length", (E.const("abc"),))) == 3
    # tokens('...') folds at plan time (QueryOptimizer folds it too);
    # stemming is Russian-only, latin words pass through
    toks = calc.evaluate(E.Fun("tokens", (E.const("Red Widgets"),)))
    assert toks == ["red", "widgets"]
    assert sorted(calc.evaluate(E.Fun("tokens", (E.const("аи95"),)))) == [
        "95", "ai", "ai95"]


def test_fold_time_functions():
    calc = ConstantCalculator()
    t = dt.datetime(2024, 5, 17, 13, 45, 10)
    assert calc.evaluate(E.trunc("month", E.const(t))) == dt.datetime(2024, 5, 1)
    assert calc.evaluate(E.trunc("quarter", E.const(t))) == dt.datetime(2024, 4, 1)
    assert calc.evaluate(E.extract("quarter", E.const(t))) == 2
    assert calc.evaluate(E.trunc("week", E.const(t))) == dt.datetime(2024, 5, 13)


def test_integral_division_truncation():
    calc = ConstantCalculator()
    assert calc.evaluate(E.BinaryOp("/", E.const(7), E.const(2))) == 3
    assert calc.evaluate(E.BinaryOp("/", E.const(-7), E.const(2))) == -3


def test_simplify_drops_true_and_flattens():
    f = E.Field("x", "BOOLEAN")
    g = E.Field("y", "BOOLEAN")
    e = E.And((E.const(True), E.And((f, g)), E.const(True)))
    out = simplify_condition(e)
    assert isinstance(out, E.And) and out.conditions == (f, g)


def test_simplify_short_circuits_false():
    f = E.Field("x", "BOOLEAN")
    assert simplify_condition(E.And((f, E.const(False)))).value is False
    assert simplify_condition(E.Or((f, E.const(True)))).value is True
    out = simplify_condition(E.Or((E.const(False), f)))
    assert out == f


def test_optimize_condition_end_to_end():
    # (1 < 2 AND x) -> x ; folding feeds simplification
    f = E.Field("x", "BOOLEAN")
    cond = E.And((E.lt(E.const(1), E.const(2)), f))
    assert optimize_condition(cond) == f


def test_folded_tautology_does_not_satisfy_time_bounds(tsdb):
    # WHERE 1 = 1 must still be rejected (no real time bounds)
    import pytest

    from yupana_spark.expressions import InvalidQueryError

    with pytest.raises(InvalidQueryError):
        tsdb.sql("SELECT l_returnflag f FROM lineitem WHERE 1 = 1")


def test_case_folding():
    calc = ConstantCalculator()
    e = E.Case(((E.gt(E.const(2), E.const(1)), E.const("yes")),),
               E.const("no"))
    assert calc.evaluate(e) == "yes"
