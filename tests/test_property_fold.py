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
        st.tuples(st.sampled_from(["+", "-", "*", "/"]),
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


# ---------------------------------------------------------------------------
# chunking coverage law (round 7: token-level chunker)
# ---------------------------------------------------------------------------
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.lists(st.sampled_from(["a", "bb", "c"]),
                         min_size=0, max_size=25),
                min_size=1, max_size=6),
       st.integers(min_value=2, max_value=8),
       st.integers(min_value=1, max_value=8))
def test_chunk_token_sequences_coverage_law(spark, docs, window, stride):
    """Every token is covered exactly once per window position, chunk
    count follows the documented formula, and concatenating
    stride-sized prefixes of consecutive chunks (plus the tail) restores
    the original token sequence when stride <= window."""
    from yupana_spark.datapipe.pack import chunk_token_sequences

    stride = min(stride, window)
    df = spark.createDataFrame(
        [(i, toks) for i, toks in enumerate(docs)],
        "doc_id long, tokens array<string>")
    rows = chunk_token_sequences(df, window=window, stride=stride).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, toks in enumerate(docs):
        n = len(toks)
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_no"])
        want_k = 1 if n <= window else -(-(n - window) // stride) + 1
        assert len(chunks) == want_k
        # reconstruct: stride-prefix of every chunk + remainder of last
        rebuilt = []
        for c in chunks[:-1]:
            rebuilt.extend(c["chunk_tokens"][:stride])
        rebuilt.extend(chunks[-1]["chunk_tokens"])
        assert rebuilt == toks
        for c in chunks:
            assert c["n_tokens"] == len(c["chunk_tokens"])
            assert c["start_tok"] == c["chunk_no"] * stride


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.lists(st.sampled_from(
    ["boiler plate", "fresh one", "fresh two", "", "  "]),
    min_size=0, max_size=5), min_size=1, max_size=8))
def test_duplicated_line_stats_laws(spark, docs):
    """Invariants for any corpus: full id coverage, n_dup_lines <=
    n_lines, ratios in [0,1], cleaned contains exactly the non-dup lines
    (blanks preserved in place) in order, and global dup counting is
    symmetric (a trimmed line is dup for everyone or no one)."""
    from yupana_spark.datapipe.dedup import duplicated_line_stats

    df = spark.createDataFrame(
        [(i, "\n".join(lines)) for i, lines in enumerate(docs)],
        "doc_id long, text string")
    out = {r["id"]: r for r in duplicated_line_stats(df).collect()}
    assert set(out) == set(range(len(docs)))
    # recompute expected globally in python
    from collections import Counter

    counts = Counter()
    for lines in docs:
        for ln in lines:
            if ln.strip():
                counts[ln.strip()] += 1
    for i, lines in enumerate(docs):
        part = [ln for ln in lines if ln.strip()]
        dup = [ln for ln in part if counts[ln.strip()] >= 2]
        r = out[i]
        assert r["n_lines"] == len(part)
        assert r["n_dup_lines"] == len(dup)
        assert 0.0 <= r["dup_line_ratio"] <= 1.0
        assert 0.0 <= r["dup_line_char_ratio"] <= 1.0
        kept = [ln for ln in lines
                if not (ln.strip() and counts[ln.strip()] >= 2)]
        assert r["cleaned"] == "\n".join(kept)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.text(
    alphabet="aB zü9!.-\t\n'", min_size=0, max_size=40),
    min_size=1, max_size=8))
def test_norm_words_token_equal_property(spark, texts):
    """r13 law: text.norm_words(col) yields exactly the same token array
    as the classic words(normalize_text(col)) composition on arbitrary
    unicode/whitespace/punct salads — the equality every staged word
    array (dedup cuts, BM25, DSIR grams) and its oracles depend on."""
    from pyspark.sql import functions as F

    from yupana_spark.datapipe.text import (norm_words, normalize_text,
                                            words)

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)] + [(10_000, None)],
        "i long, t string")
    got = {r["i"]: (r["a"], r["b"]) for r in df.select(
        "i", norm_words(F.col("t")).alias("a"),
        words(normalize_text(F.col("t"))).alias("b")).collect()}
    for i, (a, b) in got.items():
        assert a == b, (i, a, b)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.lists(st.sampled_from(
    ["dup line", "uniq §1", "", "  ", "x", "longer unique line!"]),
    min_size=0, max_size=6), min_size=1, max_size=8))
def test_line_dedup_narrow_length_law(spark, docs):
    """r13 law: rebuild=False's arithmetic cleaned_len equals
    len(cleaned) from the rebuilt form on arbitrary corpora (blanks,
    all-removed docs, empty docs), and the stat columns agree."""
    from yupana_spark.datapipe.dedup import duplicated_line_stats

    df = spark.createDataFrame(
        [(i, "\n".join(lines)) for i, lines in enumerate(docs)],
        "doc_id long, text string")
    full = {r["id"]: r for r in duplicated_line_stats(df).collect()}
    narrow = {r["id"]: r
              for r in duplicated_line_stats(df, rebuild=False).collect()}
    assert set(full) == set(narrow)
    for i in full:
        assert narrow[i]["cleaned_len"] == len(full[i]["cleaned"]), i
        for c in ("n_lines", "n_dup_lines", "dup_line_ratio",
                  "dup_line_char_ratio"):
            assert narrow[i][c] == full[i][c], (i, c)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.data())
def test_registered_domain_psl_law(spark, data):
    """Hypothesis law for the full PSL algorithm (r14): for ANY random
    rule list (plain / wildcard / exception over a tiny label alphabet,
    plus comment and blank noise) and ANY random hosts built from the
    same alphabet, Spark's extraction equals the pure-Python
    full-algorithm mirror (tests/test_datapipe_fuzz.py)."""
    from test_datapipe_fuzz import (_py_parse_psl_rules,
                                    _py_registered_domain_psl)

    from yupana_spark.datapipe.curation import with_registered_domain

    labels = st.sampled_from(["a", "bb", "cde", "x"])
    suffix = st.lists(labels, min_size=1, max_size=4).map(".".join)
    rule = st.one_of(
        suffix,
        suffix.map(lambda s: "*." + s),
        suffix.map(lambda s: "!" + s),
        st.just("// comment line"),
        st.just(""),
    )
    rules_raw = data.draw(st.lists(rule, min_size=1, max_size=12))
    host = st.lists(labels, min_size=1, max_size=6).map(".".join)
    hosts = data.draw(st.lists(host, min_size=1, max_size=15))
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "i long, url string")
    psl = spark.createDataFrame([(r,) for r in rules_raw],
                                "suffix string")
    got = {r["i"]: r["domain"]
           for r in with_registered_domain(df, "url", psl).collect()}
    rules = _py_parse_psl_rules(rules_raw)
    for i, h in enumerate(hosts):
        assert got[i] == _py_registered_domain_psl(h, rules), \
            (rules_raw, h, got[i])
