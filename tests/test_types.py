"""Guard-matrix unit tests (types/guards/{Plus,Minus,Times,Div}Guard.scala)."""

import pytest

from yupana_spark import types as yt


def test_numeric_widening():
    assert yt.plus_type(yt.BYTE, yt.SHORT) == yt.SHORT
    assert yt.plus_type(yt.INT, yt.LONG) == yt.LONG
    assert yt.plus_type(yt.LONG, yt.DOUBLE) == yt.DOUBLE
    # double + decimal -> decimal (PlusGuard.scala:51-63)
    assert yt.plus_type(yt.DOUBLE, yt.DECIMAL) == yt.DECIMAL


def test_string_concat():
    assert yt.plus_type(yt.STRING, yt.STRING) == yt.STRING
    with pytest.raises(yt.YupanaTypeError):
        yt.plus_type(yt.STRING, yt.INT)


def test_time_arithmetic():
    assert yt.plus_type(yt.TIMESTAMP, yt.PERIOD) == yt.TIMESTAMP
    assert yt.minus_type(yt.TIMESTAMP, yt.TIMESTAMP) == yt.PERIOD
    assert yt.minus_type(yt.TIMESTAMP, yt.PERIOD) == yt.TIMESTAMP


def test_currency_rules():
    # Currency.scala:21-60 + guards
    assert yt.plus_type(yt.CURRENCY, yt.CURRENCY) == yt.CURRENCY
    assert yt.times_type(yt.CURRENCY, yt.INT) == yt.CURRENCY
    assert yt.div_type(yt.CURRENCY, yt.CURRENCY) == yt.DOUBLE
    assert yt.div_type(yt.CURRENCY, yt.LONG) == yt.CURRENCY
    with pytest.raises(yt.YupanaTypeError):
        yt.times_type(yt.CURRENCY, yt.CURRENCY)
    with pytest.raises(yt.YupanaTypeError):
        yt.plus_type(yt.CURRENCY, yt.DOUBLE)


def test_integral_div():
    assert yt.div_type(yt.INT, yt.INT) == yt.INT
    assert yt.div_type(yt.LONG, yt.INT) == yt.LONG
