"""Differential fuzzing: randomly generated YupanaQL executed by the engine
vs the equivalent ANSI SQL executed by DuckDB on the same parquet.

The static oracle corpus (check_oracle / the driver gate) covers 50
hand-written queries; this generator covers the combinatorial space around
them — random predicate trees, aggregate sets, GROUP BY arities and HAVING
bars — so a semantics bug in a corner the hand-written set misses (operator
precedence, null handling in a branch, an aggregate over a filtered-empty
group) shows up as a cross-engine diff.  Seeded: every failure reproduces.

Comparison is sorted-row with per-value tolerance (floats compare to 1e-9
relative) rather than the driver's strict string hash, so the generator is
free to emit float aggregates without decimal plumbing.
"""

import datetime as dt
import math
import random

import duckdb
import pytest

from tests.conftest import SF_SMALL

TB_Y = ("time >= TIMESTAMP '1995-01-01' AND time < TIMESTAMP '2002-01-01'")
TB_D = ("l_shipdate >= TIMESTAMP '1995-01-01' "
        "AND l_shipdate < TIMESTAMP '2002-01-01'")

DIMS = ["l_returnflag", "l_linestatus"]
NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
KEY_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]


def _predicate(rng: random.Random):
    """One random residual predicate, as (yupanaql, duckdb) strings —
    identical except for dialect-neutral pieces, so one renderer serves
    both; returns a pair anyway to keep the seam explicit."""
    def leaf():
        kind = rng.choice(["num", "key", "dim", "dim_in", "null"])
        if kind == "num":
            col = rng.choice(NUM_COLS)
            op = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
            val = round(rng.uniform(0, 40), 2)
            return f"{col} {op} {val}"
        if kind == "key":
            col = rng.choice(KEY_COLS)
            op = rng.choice(["<", ">", "<>"])
            val = rng.randint(1, 4000)
            return f"{col} {op} {val}"
        if kind == "dim":
            col = rng.choice(DIMS)
            val = rng.choice(["A", "N", "R", "O", "F"])
            op = rng.choice(["=", "<>"])
            return f"{col} {op} '{val}'"
        if kind == "dim_in":
            col = rng.choice(DIMS)
            vals = rng.sample(["A", "N", "R", "O", "F"], rng.randint(1, 3))
            neg = rng.choice(["", "NOT "])
            lst = ", ".join(f"'{v}'" for v in vals)
            return f"{col} {neg}IN ({lst})"
        return f"{rng.choice(NUM_COLS)} IS NOT NULL"

    n = rng.randint(1, 3)
    parts = [leaf() for _ in range(n)]
    glue = rng.choice([" AND ", " OR "])
    pred = glue.join(f"({p})" for p in parts)
    return pred, pred


def _aggregates(rng: random.Random):
    """Random aggregate list as (alias, yupanaql_expr, duckdb_expr)."""
    out = [("cnt", "count(l_orderkey)", "count(l_orderkey)")]
    for i in range(rng.randint(0, 3)):
        col = rng.choice(NUM_COLS)
        fn = rng.choice(["sum", "min", "max"])
        out.append((f"a{i}", f"{fn}({col})", f"{fn}({col})"))
    return out


def gen_query(rng: random.Random):
    pred_y, pred_d = _predicate(rng)
    group = rng.sample(DIMS, rng.randint(0, 2))
    aggs = _aggregates(rng)
    sel = ", ".join(group + [f"{y} AS {a}" for a, y, _ in aggs])
    sel_d = ", ".join(group + [f"{d} AS {a}" for a, _, d in aggs])
    gb = f" GROUP BY {', '.join(group)}" if group else ""
    having = ""
    if group and rng.random() < 0.4:
        having = f" HAVING count(l_orderkey) > {rng.randint(0, 500)}"
    yql = (f"SELECT {sel} FROM lineitem WHERE {TB_Y} AND ({pred_y})"
           f"{gb}{having}")
    sql = (f"SELECT {sel_d} FROM lineitem WHERE {TB_D} AND ({pred_d})"
           f"{gb}{having}")
    return yql, sql


def _canon(rows):
    import decimal

    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, decimal.Decimal):
                vals.append(round(float(v), 6))
            elif isinstance(v, float):
                vals.append(round(v, 6))
            elif isinstance(v, dt.datetime):
                vals.append(v.isoformat())
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def _close(a, b):
    if isinstance(a, float) and isinstance(b, (int, float)):
        return math.isclose(a, float(b), rel_tol=1e-9, abs_tol=1e-9)
    return a == b


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"'{SF_SMALL}/lineitem.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("seed", [20260814, 7, 991])
def test_differential_random_aggregates(tsdb, duck, seed):
    rng = random.Random(seed)
    n_nonempty = 0
    for i in range(30):
        yql, sql = gen_query(rng)
        got = _canon([tuple(r) for r in tsdb.sql(yql).collect()])
        exp = _canon([tuple(r) for r in duck.sql(sql).fetchall()])
        assert len(got) == len(exp), f"seed-case {i}: {yql!r}\n{sql!r}"
        for gr, er in zip(got, exp):
            assert len(gr) == len(er) and all(
                _close(g, e) for g, e in zip(gr, er)), \
                f"seed-case {i} row diff: {gr} != {er}\n{yql!r}"
        n_nonempty += bool(got)
    # the generator must actually exercise data, not vacuous empties
    assert n_nonempty >= 15



TRUNCS = [("trunc_month(time)", "CAST(date_trunc('month', l_shipdate) AS TIMESTAMP)"),
          ("trunc_year(time)", "CAST(date_trunc('year', l_shipdate) AS TIMESTAMP)"),
          ("extract_year(time)", "CAST(extract(year FROM l_shipdate) AS INTEGER)"),
          ("extract_month(time)", "CAST(extract(month FROM l_shipdate) AS INTEGER)")]


@pytest.mark.parametrize("seed", [3, 44])
def test_differential_scalar_groupbys(tsdb, duck, seed):
    """Time-function GROUP BYs and CASE-gated aggregates — the
    dialect-divergent corner (trunc_*/extract_* vs date_trunc/extract,
    mandatory ELSE) where a renderer-level mix-up would silently shift
    every bucket."""
    rng = random.Random(seed)
    for i in range(12):
        ty, td = rng.choice(TRUNCS)
        dim = rng.choice(DIMS)
        val = rng.choice(["A", "N", "R"])
        col = rng.choice(NUM_COLS)
        pred_y, pred_d = _predicate(rng)
        yql = (f"SELECT {ty} AS g, {dim}, "
               f"sum(CASE WHEN {dim} = '{val}' THEN {col} ELSE 0 END) AS s, "
               f"count(l_orderkey) AS cnt "
               f"FROM lineitem WHERE {TB_Y} AND ({pred_y}) "
               f"GROUP BY g, {dim}")
        sql = (f"SELECT {td} AS g, {dim}, "
               f"sum(CASE WHEN {dim} = '{val}' THEN {col} ELSE 0 END) AS s, "
               f"count(l_orderkey) AS cnt "
               f"FROM lineitem WHERE {TB_D} AND ({pred_d}) "
               f"GROUP BY 1, {dim}")
        got = _canon([tuple(r) for r in tsdb.sql(yql).collect()])
        exp = _canon([tuple(r) for r in duck.sql(sql).fetchall()])
        assert len(got) == len(exp), f"seed-case {i}: {yql!r}"
        for gr, er in zip(got, exp):
            assert all(_close(g, e) for g, e in zip(gr, er)), \
                f"seed-case {i} row diff: {gr} != {er}\n{yql!r}"


def _rich_predicate(rng: random.Random):
    """Predicates over the dialect surface the basic generator skips:
    scalar string functions, BETWEEN, tuple-valued IN."""
    def leaf():
        kind = rng.choice(["between", "tuple_in", "strfn", "num", "case"])
        if kind == "between":
            col = rng.choice(NUM_COLS)
            lo = round(rng.uniform(0, 20), 2)
            hi = round(lo + rng.uniform(0, 20), 2)
            return f"{col} BETWEEN {lo} AND {hi}"
        if kind == "tuple_in":
            pairs = {(rng.choice("ANR"), rng.choice("OF"))
                     for _ in range(rng.randint(1, 3))}
            lst = ", ".join(f"('{a}', '{b}')" for a, b in sorted(pairs))
            neg = rng.choice(["", "NOT "])
            return (f"(l_returnflag, l_linestatus) {neg}IN ({lst})")
        if kind == "strfn":
            fn, val = rng.choice([("lower", "'a'"), ("upper", "'A'"),
                                  ("length", "1")])
            op = rng.choice(["=", "<>"])
            return f"{fn}(l_returnflag) {op} {val}"
        if kind == "case":
            col = rng.choice(NUM_COLS)
            bar = round(rng.uniform(0, 30), 2)
            return (f"CASE WHEN l_returnflag = 'A' THEN {col} "
                    f"ELSE 0 END > {bar}")
        col = rng.choice(NUM_COLS)
        return f"abs({col} - {round(rng.uniform(0, 10), 2)}) < 5"

    parts = [leaf() for _ in range(rng.randint(1, 2))]
    return rng.choice([" AND ", " OR "]).join(f"({p})" for p in parts)


def _rich_aggregates(rng: random.Random):
    """(alias, yql, sql) including the engine-specific spellings: avg's
    decimal result, distinct_count vs count(DISTINCT), post-aggregate
    arithmetic (compiler _compile_agg split + post-agg projection)."""
    out = [("cnt", "count(l_orderkey)", "count(l_orderkey)")]
    kinds = rng.sample(["avg", "dc", "post", "absagg"], rng.randint(1, 3))
    for i, kind in enumerate(kinds):
        col = rng.choice(NUM_COLS)
        if kind == "avg":
            out.append((f"r{i}", f"avg({col})", f"avg({col})"))
        elif kind == "dc":
            key = rng.choice(KEY_COLS)
            out.append((f"r{i}", f"distinct_count({key})",
                        f"count(DISTINCT {key})"))
        elif kind == "post":
            c2 = rng.choice(NUM_COLS)
            op = rng.choice(["+", "-", "*"])
            out.append((f"r{i}", f"sum({col}) {op} max({c2})",
                        f"sum({col}) {op} max({c2})"))
        else:
            out.append((f"r{i}", f"sum(abs({col} - 1))",
                        f"sum(abs({col} - 1))"))
    return out


@pytest.mark.parametrize("seed", [60260814, 17, 5150])
def test_differential_rich_surface(tsdb, duck, seed):
    """Scalar functions in predicates, BETWEEN/tuple-IN sugar, avg/
    distinct_count, and post-aggregate arithmetic — the corners where the
    compiler does real rewriting (agg split, post-agg projection, tuple
    lowering) rather than pass-through."""
    rng = random.Random(seed)
    n_nonempty = 0
    for i in range(15):
        pred = _rich_predicate(rng)
        group = rng.sample(DIMS, rng.randint(0, 2))
        aggs = _rich_aggregates(rng)
        sel_y = ", ".join(group + [f"{y} AS {a}" for a, y, _ in aggs])
        sel_d = ", ".join(group + [f"{d} AS {a}" for a, _, d in aggs])
        gb = f" GROUP BY {', '.join(group)}" if group else ""
        having = ""
        if group and rng.random() < 0.5:
            # HAVING over an aggregate NOT necessarily in the select list —
            # the post-aggregate filter path (compiler HAVING handling)
            col = rng.choice(NUM_COLS)
            bar = round(rng.uniform(0, 3000), 2)
            having = f" HAVING sum({col}) > {bar}"
        yql = (f"SELECT {sel_y} FROM lineitem WHERE {TB_Y} AND ({pred})"
               f"{gb}{having}")
        sql = (f"SELECT {sel_d} FROM lineitem WHERE {TB_D} AND ({pred})"
               f"{gb}{having}")
        got = _canon([tuple(r) for r in tsdb.sql(yql).collect()])
        exp = _canon([tuple(r) for r in duck.sql(sql).fetchall()])
        assert len(got) == len(exp), f"seed-case {i}: {yql!r}"
        for gr, er in zip(got, exp):
            assert len(gr) == len(er) and all(
                _close(g, e) for g, e in zip(gr, er)), \
                f"seed-case {i} row diff: {gr} != {er}\n{yql!r}"
        n_nonempty += bool(got)
    assert n_nonempty >= 7
