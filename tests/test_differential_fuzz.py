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
    for t in ("lineitem", "orders", "customer", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{SF_SMALL}/{t}.parquet'")
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


# ---------------------------------------------------------------------------
# link surface (≙ ExternalLinkUtils.scala:41-148 rewrites): link fields in
# SELECT / GROUP BY compile to a broadcast LEFT join; link predicates in
# WHERE to semi-/anti-join pushes.  DuckDB mirror: explicit LEFT JOIN
# customer with c.* spellings, same predicate text — the generator renders
# each fragment in both dialects.
# ---------------------------------------------------------------------------
TB_O_Y = ("time >= TIMESTAMP '1995-01-01' AND time < TIMESTAMP '1997-01-01'")
TB_O_D = ("o.o_orderdate >= TIMESTAMP '1995-01-01' "
          "AND o.o_orderdate < TIMESTAMP '1997-01-01'")

SEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
LINK_GROUPS = [("CustomerLink_c_mktsegment", "c.c_mktsegment"),
               ("CustomerLink_c_nationkey", "c.c_nationkey"),
               ("o_orderstatus", "o.o_orderstatus"),
               ("o_orderpriority", "o.o_orderpriority")]


def _link_predicate(rng: random.Random):
    """(yql, duck) link/plain predicate pair over orders+CustomerLink."""
    def leaf():
        kind = rng.choice(["seg_eq", "seg_in", "acctbal", "nation", "plain"])
        if kind == "seg_eq":
            op = rng.choice(["=", "<>"])
            v = rng.choice(SEGS)
            return (f"CustomerLink_c_mktsegment {op} '{v}'",
                    f"c.c_mktsegment {op} '{v}'")
        if kind == "seg_in":
            vals = rng.sample(SEGS, rng.randint(1, 3))
            neg = rng.choice(["", "NOT "])
            lst = ", ".join(f"'{v}'" for v in sorted(vals))
            return (f"CustomerLink_c_mktsegment {neg}IN ({lst})",
                    f"c.c_mktsegment {neg}IN ({lst})")
        if kind == "acctbal":
            op = rng.choice(["<", ">", "<=", ">="])
            v = round(rng.uniform(-900, 9000), 2)
            return (f"CustomerLink_c_acctbal {op} {v}",
                    f"c.c_acctbal {op} {v}")
        if kind == "nation":
            op = rng.choice(["<", ">", "=", "<>"])
            v = rng.randint(0, 24)
            return (f"CustomerLink_c_nationkey {op} {v}",
                    f"c.c_nationkey {op} {v}")
        v = rng.choice(["F", "O", "P"])
        op = rng.choice(["=", "<>"])
        return (f"o_orderstatus {op} '{v}'", f"o.o_orderstatus {op} '{v}'")

    n = rng.randint(1, 3)
    leaves = [leaf() for _ in range(n)]
    glue = rng.choice([" AND ", " OR "])
    return (glue.join(f"({y})" for y, _ in leaves),
            glue.join(f"({d})" for _, d in leaves))


@pytest.mark.parametrize("seed", [81411, 23, 777, 4242])
def test_differential_link_surface(tsdb, duck, seed):
    """Random link-enrichment / semi- / anti-join queries vs DuckDB LEFT
    JOIN SQL: group keys and predicates drawn across own dims and
    CustomerLink fields, so a broken join rewrite (wrong join type, a
    dropped NULL row, an un-broadcast filter) diffs immediately."""
    rng = random.Random(seed)
    n_nonempty = 0
    for i in range(25):
        pred_y, pred_d = _link_predicate(rng)
        groups = rng.sample(LINK_GROUPS, rng.randint(1, 2))
        aggs = [("cnt", "count(o_orderkey)", "count(o.o_orderkey)")]
        if rng.random() < 0.6:
            fn = rng.choice(["sum", "min", "max"])
            aggs.append(("m0", f"{fn}(o_totalprice)",
                         f"{fn}(o.o_totalprice)"))
        sel_y = ", ".join([f"{y} AS g{j}" for j, (y, _) in enumerate(groups)]
                          + [f"{y} AS {a}" for a, y, _ in aggs])
        sel_d = ", ".join([f"{d} AS g{j}" for j, (_, d) in enumerate(groups)]
                          + [f"{d} AS {a}" for a, _, d in aggs])
        gb_y = ", ".join(y for y, _ in groups)
        gb_d = ", ".join(d for _, d in groups)
        having = ""
        if rng.random() < 0.3:
            having = f" HAVING count(o_orderkey) > {rng.randint(0, 40)}"
        having_d = having.replace("o_orderkey", "o.o_orderkey")
        yql = (f"SELECT {sel_y} FROM orders WHERE {TB_O_Y} AND ({pred_y}) "
               f"GROUP BY {gb_y}{having}")
        sql = (f"SELECT {sel_d} FROM orders o "
               f"LEFT JOIN customer c ON o.o_custkey = c.c_custkey "
               f"WHERE {TB_O_D} AND ({pred_d}) GROUP BY {gb_d}{having_d}")
        got = _canon([tuple(r) for r in tsdb.sql(yql).collect()])
        exp = _canon([tuple(r) for r in duck.sql(sql).fetchall()])
        assert len(got) == len(exp), f"seed-case {i}: {yql!r}\n{sql!r}"
        for gr, er in zip(got, exp):
            assert len(gr) == len(er) and all(
                _close(g, e) for g, e in zip(gr, er)), \
                f"seed-case {i} row diff: {gr} != {er}\n{yql!r}"
        n_nonempty += bool(got)
    assert n_nonempty >= 12


# ---------------------------------------------------------------------------
# window surface (≙ TSDB.scala:73-138): lag partitioned by the GROUP BY
# keys, implicit (time, dims) ascending order, HAVING filtering computed
# rows.  DuckDB mirror: explicit OVER (PARTITION BY ... ORDER BY time,
# o_orderkey) — o_orderkey is unique, so the tiebreak totalizes the order.
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("seed", [91525, 31, 6006])
def test_differential_window_surface(tsdb, duck, seed):
    rng = random.Random(seed)
    slices = [("1995-01-01", "1995-04-01"), ("1996-03-01", "1996-07-01"),
              ("1997-01-01", "1997-02-01")]
    n_nonempty = 0
    for i in range(20):
        lo, hi = rng.choice(slices)
        tb_y = f"time >= TIMESTAMP '{lo}' AND time < TIMESTAMP '{hi}'"
        tb_d = (f"o_orderdate >= TIMESTAMP '{lo}' "
                f"AND o_orderdate < TIMESTAMP '{hi}'")
        groups = rng.sample(["o_orderstatus", "o_orderpriority"],
                            rng.randint(0, 2))
        lag_col, lag_d = rng.choice([
            ("lag(time)", "lag(o_orderdate)"),
            ("lag(o_totalprice)", "lag(o_totalprice)"),
            ("lag(o_custkey)", "lag(o_custkey)")])
        part = f"PARTITION BY {', '.join(groups)} " if groups else ""
        over = (f"OVER ({part}ORDER BY o_orderdate, o_orderkey, o_custkey"
                + "".join(f", {g}" for g in ("o_orderstatus",
                                             "o_orderpriority")
                          if g not in groups) + ")")
        having = ""
        having_d = ""
        if rng.random() < 0.6:
            having = f" HAVING {lag_col} IS NOT NULL"
            having_d = " WHERE prev IS NOT NULL"
        sel_y = ", ".join(groups + ["o_orderkey", "time AS t",
                                    f"{lag_col} AS prev"])
        sel_d_in = ", ".join(groups + ["o_orderkey", "o_orderdate AS t",
                                       f"{lag_d} {over} AS prev"])
        gb = f" GROUP BY {', '.join(groups)}" if groups else ""
        yql = f"SELECT {sel_y} FROM orders WHERE {tb_y}{gb}{having}"
        sql = (f"SELECT * FROM (SELECT {sel_d_in} FROM orders "
               f"WHERE {tb_d}){having_d}")
        got = _canon([tuple(r) for r in tsdb.sql(yql).collect()])
        exp = _canon([tuple(r) for r in duck.sql(sql).fetchall()])
        assert len(got) == len(exp), f"seed-case {i}: {yql!r}\n{sql!r}"
        for gr, er in zip(got, exp):
            assert len(gr) == len(er) and all(
                _close(g, e) for g, e in zip(gr, er)), \
                f"seed-case {i} row diff: {gr} != {er}\n{yql!r}"
        n_nonempty += bool(got)
    assert n_nonempty >= 10


# ---------------------------------------------------------------------------
# events surface: the TIMESTAMP(NANOS) source (Schema.load rewrites the
# mandatory time condition over raw int64 nanos before the scan) — a broken
# nanos prefilter or a unit mix-up in trunc_/extract_ shifts every bucket
# ---------------------------------------------------------------------------
EV_TYPES = ["click", "view", "purchase", "signup", "error"]
EV_TRUNCS = [("trunc_day(time)",
              "CAST(date_trunc('day', ts) AS TIMESTAMP)"),
             ("trunc_hour(time)",
              "CAST(date_trunc('hour', ts) AS TIMESTAMP)"),
             ("extract_day(time)",
              "CAST(extract(day FROM ts) AS INTEGER)")]


@pytest.mark.parametrize("seed", [24011, 86, 515])
def test_differential_events_nanos(tsdb, duck, seed):
    rng = random.Random(seed)
    for i in range(15):
        d0 = rng.randint(1, 20)
        d1 = d0 + rng.randint(1, 9)
        tb_y = (f"time >= TIMESTAMP '2024-01-{d0:02d}' "
                f"AND time < TIMESTAMP '2024-01-{d1:02d}'")
        tb_d = (f"ts >= TIMESTAMP '2024-01-{d0:02d}' "
                f"AND ts < TIMESTAMP '2024-01-{d1:02d}'")
        ty, td = rng.choice(EV_TRUNCS)
        types = rng.sample(EV_TYPES, rng.randint(1, 3))
        lst = ", ".join(f"'{t}'" for t in sorted(types))
        neg = rng.choice(["", "NOT "])
        uid_bar = rng.randint(1, 200)
        pred_y = (f"(event_type {neg}IN ({lst})) "
                  f"AND (user_id < {uid_bar} OR value > "
                  f"{round(rng.uniform(0, 50), 2)})")
        pred_d = pred_y
        yql = (f"SELECT {ty} AS g, event_type, count(event_id) AS cnt, "
               f"sum(value) AS sv, min(value) AS mn "
               f"FROM events WHERE {tb_y} AND ({pred_y}) "
               f"GROUP BY g, event_type")
        sql = (f"SELECT {td} AS g, event_type, count(event_id) AS cnt, "
               f"sum(value) AS sv, min(value) AS mn "
               f"FROM events WHERE {tb_d} AND ({pred_d}) "
               f"GROUP BY 1, event_type")
        got = _canon([tuple(r) for r in tsdb.sql(yql).collect()])
        exp = _canon([tuple(r) for r in duck.sql(sql).fetchall()])
        assert len(got) == len(exp), f"seed-case {i}: {yql!r}\n{sql!r}"
        for gr, er in zip(got, exp):
            assert len(gr) == len(er) and all(
                _close(g, e) for g, e in zip(gr, er)), \
                f"seed-case {i} row diff: {gr} != {er}\n{yql!r}"


# ---------------------------------------------------------------------------
# placeholder binding (`?` / `$n`): a bound query must produce exactly the
# frame its inlined-literal twin produces — for every predicate shape, both
# placeholder spellings, and out-of-order $n references
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("seed", [40461, 12])
def test_differential_placeholder_binding(tsdb, seed):
    rng = random.Random(seed)
    for i in range(20):
        v_num = round(rng.uniform(0, 40), 2)
        v_key = rng.randint(1, 4000)
        v_dim = rng.choice(["A", "N", "R"])
        col = rng.choice(NUM_COLS)
        key = rng.choice(KEY_COLS)
        dim = rng.choice(DIMS)
        op1 = rng.choice(["<", "<=", ">", ">="])
        op2 = rng.choice(["<", ">", "<>"])
        tail = (f"({col} {op1} {{p1}}) AND ({key} {op2} {{p2}}) "
                f"OR ({dim} = {{p3}})")
        base = (f"SELECT {dim}, count(l_orderkey) AS cnt, "
                f"sum({col}) AS s FROM lineitem "
                f"WHERE {TB_Y} AND ({tail}) GROUP BY {dim}")
        inline = base.format(p1=v_num, p2=v_key, p3=f"'{v_dim}'")
        got_inline = _canon([tuple(r) for r in tsdb.sql(inline).collect()])

        qmark = base.format(p1="?", p2="?", p3="?")
        got_q = _canon([tuple(r) for r in tsdb.sql(
            qmark, params=[v_num, v_key, v_dim]).collect()])
        assert got_q == got_inline, f"seed-case {i} ?-bind: {qmark!r}"

        # $n spelling, deliberately out of order in the text
        dollar = base.format(p1="$2", p2="$3", p3="$1")
        got_d = _canon([tuple(r) for r in tsdb.sql(
            dollar, params=[v_dim, v_num, v_key]).collect()])
        assert got_d == got_inline, f"seed-case {i} $n-bind: {dollar!r}"


# ---------------------------------------------------------------------------
# tableless scalar surface: random constant expressions through the
# dialect's non-ANSI spellings ('+' concatenates strings, {..} array
# literals) vs the ANSI equivalents in DuckDB — rendered per dialect
# ---------------------------------------------------------------------------
def _scalar_expr(rng: random.Random):
    """(yql, duckdb) for one random scalar expression of the same value."""
    kind = rng.choice(["arith", "concat", "strfn", "case", "array"])
    if kind == "arith":
        a, b, c = (rng.randint(-99, 99) for _ in range(3))
        op1, op2 = rng.choice(["+", "-", "*"]), rng.choice(["+", "-"])
        e = f"abs({a} {op1} {b}) {op2} {c}"
        return e, e
    if kind == "concat":
        parts = [rng.choice(["abc", "x", "", "12"])
                 for _ in range(rng.randint(2, 4))]
        y = " + ".join(f"'{p}'" for p in parts)
        d = " || ".join(f"'{p}'" for p in parts)
        return y, d
    if kind == "strfn":
        s = rng.choice(["Hello", "aBc", "", "MiXeD12"])
        fn = rng.choice(["upper", "lower", "length"])
        y = f"{fn}('{s}')"
        d = f"len('{s}')" if fn == "length" else y
        return y, d
    if kind == "case":
        a, bar = rng.randint(0, 9), rng.randint(0, 9)
        v1, v2 = rng.randint(-5, 5), rng.randint(-5, 5)
        e = f"CASE WHEN {a} > {bar} THEN {v1} ELSE {v2} END"
        return e, e
    vals = [rng.choice(["p", "q", "r", "s"]) for _ in range(rng.randint(1, 4))]
    probe = rng.choice(["p", "q", "z"])
    lst_y = ", ".join(f"'{v}'" for v in vals)
    y = rng.choice([
        (f"length({{{lst_y}}})", f"CAST(len([{lst_y}]) AS INTEGER)"),
        (f"contains({{{lst_y}}}, '{probe}')",
         f"list_contains([{lst_y}], '{probe}')"),
        (f"array_to_string({{{lst_y}}})",
         f"array_to_string([{lst_y}], ', ')"),
    ])
    return y


@pytest.mark.parametrize("seed", [70707, 99])
def test_differential_tableless_scalars(tsdb, duck, seed):
    rng = random.Random(seed)
    for i in range(25):
        pairs = [_scalar_expr(rng) for _ in range(rng.randint(1, 4))]
        sel_y = ", ".join(f"{y} AS c{j}" for j, (y, _) in enumerate(pairs))
        sel_d = ", ".join(f"{d} AS c{j}" for j, (_, d) in enumerate(pairs))
        got = _canon([tuple(r) for r in tsdb.sql(f"SELECT {sel_y}").collect()])
        exp = _canon([tuple(r) for r in duck.sql(f"SELECT {sel_d}").fetchall()])
        assert len(got) == len(exp) == 1, f"seed-case {i}: {sel_y!r}"
        for g, e in zip(got[0], exp[0]):
            assert _close(g, e), f"seed-case {i}: {g!r} != {e!r}\n{sel_y!r}"
