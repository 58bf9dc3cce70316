"""SQL-string end-to-end: parse -> analyze -> compile -> execute."""

import pytest

from yupana_spark.expressions import InvalidQueryError

TB = ("time >= TIMESTAMP '1995-01-01' AND time < TIMESTAMP '2002-01-01'")


def test_sql_agg(tsdb):
    df = tsdb.sql(f"SELECT l_returnflag, sum(l_quantity) AS s, count(l_quantity) c "
                  f"FROM lineitem WHERE {TB} GROUP BY l_returnflag")
    rows = {r["l_returnflag"]: r for r in df.collect()}
    assert set(rows) == {"A", "N", "R"}


def test_sql_alias_in_group_by(tsdb):
    # GROUP BY alias of a projected expr (SqlQueryProcessor.scala:504-530)
    df = tsdb.sql(f"SELECT trunc_month(time) AS m, count(l_orderkey) cnt "
                  f"FROM lineitem WHERE {TB} GROUP BY m")
    assert df.count() > 12


def test_sql_trunc_alias(tsdb):
    # year(x) is an alias of trunc_year(x) (FunctionRegistry.scala:128-143)
    df = tsdb.sql(f"SELECT year(time) y, count(l_orderkey) cnt FROM lineitem "
                  f"WHERE {TB} GROUP BY y")
    assert df.count() == 7


def test_sql_link_field(tsdb):
    df = tsdb.sql(
        "SELECT CustomerLink_c_mktsegment seg, count(o_orderkey) cnt "
        f"FROM orders WHERE {TB.replace('time', 'time')} "
        "GROUP BY seg")
    assert df.count() == 5


def test_sql_missing_time_bounds_rejected(tsdb):
    with pytest.raises(InvalidQueryError):
        tsdb.sql("SELECT l_returnflag FROM lineitem WHERE l_quantity > 5")


def test_sql_select_star(tsdb):
    df = tsdb.sql(f"SELECT * FROM lineitem WHERE {TB} AND l_orderkey = 1")
    assert "l_returnflag" in df.columns and "time" in df.columns
    assert df.count() > 0


def test_sql_tableless(tsdb):
    df = tsdb.sql("SELECT 1 + 1 AS two, upper('ab') u")
    r = df.collect()[0]
    assert r["two"] == 2 and r["u"] == "AB"


def test_sql_case_when(tsdb):
    df = tsdb.sql(
        "SELECT sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) a_cnt "
        f"FROM lineitem WHERE {TB}")
    assert df.collect()[0]["a_cnt"] > 0


def test_sql_placeholder(tsdb):
    df = tsdb.sql(f"SELECT count(l_orderkey) c FROM lineitem WHERE {TB} "
                  "AND l_returnflag = ?", params=["R"])
    assert df.collect()[0]["c"] > 0


def test_sql_unknown_field_error(tsdb):
    with pytest.raises(InvalidQueryError):
        tsdb.sql(f"SELECT nope FROM lineitem WHERE {TB}")


def test_sql_unknown_field_suggestion(tsdb):
    # near-miss field names get a "did you mean" hint
    with pytest.raises(InvalidQueryError, match="did you mean.*l_returnflag"):
        tsdb.sql(f"SELECT l_returnflg FROM lineitem WHERE {TB}")


def test_sql_lag(tsdb):
    df = tsdb.sql(
        "SELECT l_orderkey, time t, lag(time) prev_t FROM lineitem "
        "WHERE time >= TIMESTAMP '1995-01-01' AND time < TIMESTAMP '1995-02-01' "
        "GROUP BY l_returnflag HAVING lag(time) IS NOT NULL")
    rows = df.collect()
    assert rows and all(r["prev_t"] is not None for r in rows)
