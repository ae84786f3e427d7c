"""Milvus filter-expression compiler: grammar corners + semantics.

Each case filters a tiny in-memory frame with the compiled Column and
checks the surviving ids against a hand-evaluated set — the suite query
``milvus_expr_filter`` is the oracle-checked twin over real tables.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from milvus_cdc_spark.functions.expr import ExprError, compile_expr


@pytest.fixture(scope="module")
def ent(spark):
    rows = [
        # id, size, price, brand, name, tags,            props(json),           meta(json)
        (1, 4, 10.0, "B1", "gold ring", ["green", "red"], '{"grade": 1}', '{"mfgr": "M1"}'),
        (2, 10, 40.0, "B2", "steel cap", ["blue"], '{"grade": 3, "extra": "x"}', '{"mfgr": "M2"}'),
        (3, 15, 25.0, "B1", "golden rod", ["green", "blue", "ivory"], '{"grade": 5}', '{"mfgr": "M1"}'),
        (4, 20, 5.5, "B3", "iron bar", [], '{"grade": 2, "tags": ["a","b"]}', '{"mfgr": "M3"}'),
        (5, 25, 99.9, "B2", "tin cup", ["red"], '{"grade": 4, "n": [1,2,3]}', '{"mfgr": "M1"}'),
    ]
    return (
        spark.createDataFrame(
            rows, "id int, size int, price double, brand string, name string, "
            "tags array<string>, props string, meta string"
        )
        .cache()
    )


def ids(ent, expr, **kw):
    col = compile_expr(expr, ent, **kw)
    return sorted(r.id for r in ent.filter(col).select("id").collect())


def test_comparisons_and_logic(ent):
    assert ids(ent, "size >= 10 && size < 25") == [2, 3, 4]
    assert ids(ent, "size == 4 || size == 25") == [1, 5]
    assert ids(ent, "not (size == 10 || size == 20)") == [1, 3, 5]
    assert ids(ent, "!(brand != 'B1')") == [1, 3]


def test_chained_binary_range(ent):
    # Milvus binary-range shape: adjacent pairs AND together
    assert ids(ent, "10 <= size < 25") == [2, 3, 4]
    assert ids(ent, "4 < size <= 15 <= price") == [2, 3]


def test_is_null_nullable_fields(spark):
    """Milvus 2.5 nullable fields: `f is null` / `f is not null`; a JSON
    path is null when the key is missing or explicitly null."""
    df = spark.createDataFrame(
        [
            (1, None, '{"a": 1}'),
            (2, 5, '{"a": null}'),
            (3, 7, "{}"),
            (4, None, '{"a": "x"}'),
        ],
        "id int, size int, props string",
    )
    assert ids(df, "size is null", json_fields=("props",)) == [1, 4]
    assert ids(df, "size is not null", json_fields=("props",)) == [2, 3]
    assert ids(df, 'props["a"] is null', json_fields=("props",)) == [2, 3]
    assert ids(df, 'props["a"] is not null', json_fields=("props",)) == [1, 4]
    assert ids(df, "size is null and props['a'] is not null",
               json_fields=("props",)) == [1, 4]
    with pytest.raises(ExprError):
        ids(df, "size is 5", json_fields=("props",))


def test_text_match_and_phrase_match(spark):
    """TEXT_MATCH = any analyzed term present; PHRASE_MATCH = terms
    consecutive in analyzer order; both use the shared alnum analyzer
    (punctuation splits, case folds)."""
    df = spark.createDataFrame(
        [
            (1, "The quick brown fox"),
            (2, "quick-BROWN dogs"),
            (3, "a brownstone house"),
            (4, "fox ... quick"),
        ],
        "id int, text string",
    )
    # any-term OR semantics
    assert ids(df, "text_match(text, 'quick fox')") == [1, 2, 4]
    assert ids(df, "text_match(text, 'brownstone')") == [3]
    assert ids(df, "not text_match(text, 'quick')") == [3]
    # phrase: consecutive, analyzer order; 'quick-BROWN' tokenizes to
    # quick,brown so it matches the phrase
    assert ids(df, "phrase_match(text, 'quick brown')") == [1, 2]
    assert ids(df, "phrase_match(text, 'quick Brown', 0)") == [1, 2]
    assert ids(df, "phrase_match(text, 'brown fox')") == [1]
    assert ids(df, "phrase_match(text, 'fox quick')") == [4]
    with pytest.raises(ExprError):
        ids(df, "phrase_match(text, 'quick brown', 2)")  # slop unsupported
    with pytest.raises(ExprError):
        ids(df, "text_match(text, '...')")  # analyzes to zero terms


def test_expr_match_agrees_with_posting_retrieval(spark, sf_dir):
    """The expr predicates and the posting-list retrieval must select the
    same documents — one analyzer, two access paths."""
    from milvus_cdc_spark.analytics import textrank
    from milvus_cdc_spark.catalog import load_table
    from milvus_cdc_spark.functions.expr import compile_expr

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    phrase = "data pipeline"
    via_expr = {
        r.doc_id
        for r in docs.filter(
            compile_expr(f"phrase_match(text, '{phrase}')", docs)
        ).select("doc_id").collect()
    }
    via_index = {
        r.doc_id
        for r in textrank.phrase_match(docs, phrase.split()).collect()
    }
    assert via_expr == via_index


def test_like_underscore_is_literal(spark):
    """Milvus's grammar wildcards only '%': a literal '_' (ubiquitous in
    ids) must NOT behave as Spark LIKE's any-single-char."""
    df = spark.createDataFrame(
        [(1, "doc_1"), (2, "docX1"), (3, "doc_12"), (4, "a_b_c"), (5, "aXbYc")],
        "id int, name string",
    )
    assert ids(df, "name like 'doc_1'") == [1]          # not docX1
    assert ids(df, "name like 'doc_1%'") == [1, 3]
    assert ids(df, "name like 'a_b_c'") == [4]          # not aXbYc
    assert ids(df, "name like '%_1'") == [1]
    assert ids(df, "name not like 'doc_%'") == [2, 4, 5]


def test_string_escapes_interpreted():
    from milvus_cdc_spark.functions.expr import _unquote

    assert _unquote(r"'a\nb'") == "a\nb"
    assert _unquote(r"'a\tb'") == "a\tb"
    assert _unquote(r"'a\\b'") == "a\\b"
    assert _unquote(r"'it\'s'") == "it's"
    assert _unquote(r"'\q'") == "q"  # unknown escape: char itself


def test_in_like(ent):
    assert ids(ent, 'brand in ["B1", "B3"]') == [1, 3, 4]
    assert ids(ent, 'brand not in ["B1", "B3"]') == [2, 5]
    assert ids(ent, "name like 'gold%'") == [1, 3]
    assert ids(ent, "name not like '%cup'") == [1, 2, 3, 4]


def test_arithmetic_precedence(ent):
    assert ids(ent, "price / 2 + 100 > size * 6") == [1, 2, 3]
    assert ids(ent, "size % 5 == 0") == [2, 3, 4, 5]
    assert ids(ent, "size ** 2 > 400") == [5]
    assert ids(ent, "-size < -20") == [5]
    assert ids(ent, "size in [-4, 4]") == [1]


def test_array_field(ent):
    assert ids(ent, 'array_contains(tags, "green")') == [1, 3]
    assert ids(ent, 'array_contains_any(tags, ["green", "blue"])') == [1, 2, 3]
    assert ids(ent, 'array_contains_all(tags, ["green", "blue"])') == [3]
    assert ids(ent, "array_length(tags) == 2") == [1]
    assert ids(ent, 'tags[0] == "green"') == [1, 3]  # 0-based ARRAY access


def test_json_field(ent):
    j = dict(json_fields=("props",))
    assert ids(ent, 'props["grade"] >= 3', **j) == [2, 3, 5]
    assert ids(ent, 'props["grade"] == 5', **j) == [3]
    assert ids(ent, 'exists props["extra"]', **j) == [2]
    assert ids(ent, 'props["extra"] == "x"', **j) == [2]
    assert ids(ent, 'json_contains(props["tags"], "a")', **j) == [4]
    assert ids(ent, 'json_contains_any(props["n"], [2, 9])', **j) == [5]
    assert ids(ent, 'json_contains_all(props["n"], [1, 3])', **j) == [5]
    assert ids(ent, 'array_length(props["n"]) == 3', **j) == [5]
    # arithmetic over a JSON number: cast at the comparison site
    assert ids(ent, 'props["grade"] * 10 >= 40', **j) == [3, 5]


def test_dynamic_meta_field(ent):
    # 'mfgr' is not a declared column → resolves through meta_col ($meta)
    assert ids(ent, 'mfgr == "M1"', meta_col=F.col("meta")) == [1, 3, 5]
    assert ids(ent, 'mfgr in ["M2", "M3"]', meta_col=F.col("meta")) == [2, 4]


def test_errors(ent):
    with pytest.raises(ExprError, match="unknown field"):
        compile_expr("nosuch > 1", ent)
    with pytest.raises(ExprError, match="expected"):
        compile_expr("size >", ent)
    with pytest.raises(ExprError, match="trailing"):
        compile_expr("size > 1 size", ent)
    with pytest.raises(ExprError, match="bad character"):
        compile_expr("size > 1 @ 2", ent)
    with pytest.raises(ExprError, match="unknown function"):
        compile_expr("frobnicate(size)", ent)
    with pytest.raises(ExprError, match="trailing|must precede"):
        compile_expr("size not > 3", ent)


def test_pushdown_reaches_scan(spark, sf_dir):
    """Compiled predicates are ordinary Catalyst filters: a compiled
    comparison on a parquet column must appear in PushedFilters."""
    from milvus_cdc_spark import catalog

    part = catalog.load_table(spark, sf_dir, "part")
    pred = compile_expr('p_size >= 10 && p_brand == "Brand#12"', part)
    plan = part.filter(pred)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "p_size" in plan.split("PushedFilters")[1][:300]


def test_filtered_topk_accepts_expr_string(spark, sf_dir):
    """similarity.filtered_topk(filter="...") — the string a Milvus client
    sends — must match the hand-written Column predicate exactly."""
    from milvus_cdc_spark import catalog
    from milvus_cdc_spark.analytics import similarity

    emb = catalog.load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    via_str = similarity.filtered_topk(emb, queries, "label % 2 == 0", k=3)
    via_col = similarity.filtered_topk(emb, queries, F.col("label") % 2 == 0, k=3)
    assert sorted(map(tuple, via_str.collect())) == sorted(
        map(tuple, via_col.collect())
    )


def test_render_expr_template(spark):
    """pymilvus filter_params parity: typed substitution composing with
    the compiler; unknown/unused params raise."""
    import pytest

    from milvus_cdc_spark.functions.expr import (
        ExprError,
        compile_expr,
        render_expr_template,
    )

    df = spark.createDataFrame(
        [(1, "B1", 4.0, True), (2, "B2", 9.5, False), (3, 'B"3', 1.0, True)],
        "id long, brand string, size double, live boolean",
    )
    r = render_expr_template
    assert r("id in {ids}", {"ids": [1, 3]}) == "id in [1, 3]"
    assert r("size > {s} and live == {l}", {"s": 2.5, "l": True}) == (
        "size > 2.5 and live == true"
    )
    tmpl = r('brand == {b}', {"b": 'B"3'})
    assert tmpl == 'brand == "B\\"3"'

    def ids(expr, params):
        c = compile_expr(render_expr_template(expr, params), df)
        return sorted(x.id for x in df.filter(c).collect())

    assert ids("id in {ids}", {"ids": [1, 3]}) == [1, 3]
    assert ids("brand == {b}", {"b": 'B"3'}) == [3]
    assert ids("size > {s} and live == {l}", {"s": 2.0, "l": True}) == [1]
    with pytest.raises(ExprError):
        r("id in {missing}", {})
    with pytest.raises(ExprError):
        r("id > 1", {"extra": 5})
    with pytest.raises(ExprError):
        r("id == {x}", {"x": object()})


def test_random_sample_gate(ent):
    """random_sample(p): deterministic md5-nibble permille gate over the
    declared sample_key — reproducible across calls, composes with other
    predicates, rejects out-of-range fractions and a missing key."""
    from milvus_cdc_spark.analytics.corpus import portable_nibble_hash

    key = F.col("id")
    kept = ids(ent, "random_sample(0.5)", sample_key=key)
    again = ids(ent, "random_sample(0.5)", sample_key=key)
    assert kept == again  # deterministic, not an RNG
    expected = sorted(
        r.id
        for r in ent.filter((portable_nibble_hash(key) % 1000) < 500)
        .select("id")
        .collect()
    )
    assert kept == expected
    both = ids(ent, "size > 5 and random_sample(0.5)", sample_key=key)
    assert both == sorted(set(kept) & set(ids(ent, "size > 5")))
    with pytest.raises(ExprError):
        ids(ent, "random_sample(1.5)", sample_key=key)
    with pytest.raises(ExprError):
        ids(ent, "random_sample(0.5)")  # no sample_key declared


def test_expr_st_within_and_dwithin(spark):
    from pyspark.sql import functions as F

    from milvus_cdc_spark.functions import geo
    from milvus_cdc_spark.functions.expr import ExprError, compile_expr

    df = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 10.0, 10.0), (3, -1.0, 0.5)],
        "pk bigint, x double, y double",
    )
    ent = df.select(
        "pk", geo.wkt_point(F.col("x"), F.col("y")).alias("loc")
    )
    tri = "POLYGON ((0 0, 4 0, 0 4, 0 0))"
    got = sorted(
        r.pk
        for r in ent.filter(
            compile_expr(f"st_within(loc, '{tri}')", ent)
        ).collect()
    )
    assert got == [1]
    got2 = sorted(
        r.pk
        for r in ent.filter(
            compile_expr("st_dwithin(loc, 'POINT (0 0)', 2.0)", ent)
        ).collect()
    )
    assert got2 == [1, 3]
    import pytest as _pytest

    with _pytest.raises(ExprError):
        compile_expr("st_within(loc, 'LINESTRING (0 0, 1 1)')", ent)
    with _pytest.raises(ExprError):
        compile_expr("st_dwithin(loc, 'POINT (0 0)', true)", ent)


# ---------------------------------------------------------------------------
# Round-6 adversarial property: random expressions from a paired-render
# grammar — each AST renders once in Milvus filter syntax (compiled by
# compile_expr into a Catalyst predicate over the real documents table)
# and once in ANSI SQL (evaluated by DuckDB on the same parquet file, a
# fully independent engine). Surviving doc_id sets must be identical for
# every generated expression: comparison/arithmetic/ternary-range
# operators, IN lists, LIKE, and arbitrarily nested and/or/not.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hst

_PROP_SF_DIR = "/root/testdata/sf0.001"
_INT_COLS = ("doc_id", "n_chars")
_LANGS = ("en", "de", "fr", "es", "zh", "ru")
_CMP = (("==", "="), ("!=", "!="), ("<", "<"), ("<=", "<="),
        (">", ">"), (">=", ">="))


def _int_leaf():
    return hst.tuples(
        hst.sampled_from(_INT_COLS), hst.sampled_from(_CMP),
        hst.integers(min_value=0, max_value=600),
    ).map(lambda t: (f"{t[0]} {t[1][0]} {t[2]}", f"{t[0]} {t[1][1]} {t[2]}"))


def _mod_leaf():
    return hst.tuples(
        hst.sampled_from(_INT_COLS),
        hst.integers(min_value=2, max_value=9),
        hst.integers(min_value=0, max_value=8),
    ).map(lambda t: (f"{t[0]} % {t[1]} == {t[2]}",
                     f"{t[0]} % {t[1]} = {t[2]}"))


def _arith_leaf():
    return hst.tuples(
        hst.sampled_from(_INT_COLS),
        hst.sampled_from(("+", "-", "*")),
        hst.integers(min_value=1, max_value=7),
        hst.sampled_from(_CMP),
        hst.integers(min_value=-100, max_value=1200),
    ).map(lambda t: (f"{t[0]} {t[1]} {t[2]} {t[3][0]} {t[4]}",
                     f"{t[0]} {t[1]} {t[2]} {t[3][1]} {t[4]}"))


def _range_leaf():
    # Milvus chained binary range: a <= col < b
    return hst.tuples(
        hst.sampled_from(_INT_COLS),
        hst.integers(min_value=0, max_value=300),
        hst.integers(min_value=0, max_value=300),
    ).map(lambda t: (
        f"{t[1]} <= {t[0]} < {t[1] + t[2]}",
        f"({t[1]} <= {t[0]} AND {t[0]} < {t[1] + t[2]})",
    ))


def _in_leaf():
    return hst.tuples(
        hst.sampled_from(("lang", "source")),
        hst.lists(hst.sampled_from(_LANGS + ("src0", "src1", "src9")),
                  min_size=1, max_size=4, unique=True),
        hst.booleans(),
    ).map(lambda t: (
        f"{t[0]} {'not ' if t[2] else ''}in [{', '.join(repr(v) for v in t[1])}]",
        f"{t[0]} {'NOT ' if t[2] else ''}IN ({', '.join(repr(v) for v in t[1])})",
    ))


def _like_leaf():
    return hst.sampled_from(("src%", "%1", "e%", "src2%")).map(
        lambda pat: (f'source like "{pat}"', f"source LIKE '{pat}'")
    )


def _str_eq_leaf():
    return hst.tuples(
        hst.sampled_from(("lang", "source")),
        hst.sampled_from(_LANGS + ("src3",)),
        hst.sampled_from((("==", "="), ("!=", "!="))),
    ).map(lambda t: (f'{t[0]} {t[2][0]} "{t[1]}"', f"{t[0]} {t[2][1]} '{t[1]}'"))


def _combine(children):
    def binop(pair):
        (m1, s1), (m2, s2), kind = pair
        if kind == "and":
            return (f"({m1}) and ({m2})", f"(({s1}) AND ({s2}))")
        if kind == "or":
            return (f"({m1}) || ({m2})", f"(({s1}) OR ({s2}))")
        return (f"not ({m1})", f"(NOT ({s1}))")

    return hst.tuples(children, children,
                      hst.sampled_from(("and", "or", "not"))).map(binop)


expr_pairs = hst.recursive(
    hst.one_of(_int_leaf(), _mod_leaf(), _arith_leaf(), _range_leaf(),
               _in_leaf(), _like_leaf(), _str_eq_leaf()),
    _combine,
    max_leaves=6,
)


@given(expr_pairs)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_expr_compiler_matches_duckdb(spark, pair):
    import duckdb

    milvus_expr, sql_where = pair
    docs = spark.read.parquet(f"{_PROP_SF_DIR}/documents.parquet")
    got = {
        r.doc_id
        for r in docs.filter(compile_expr(milvus_expr, docs))
        .select("doc_id").collect()
    }
    want = {
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM read_parquet('{_PROP_SF_DIR}/documents.parquet') "
            f"WHERE {sql_where}"
        ).fetchall()
    }
    assert got == want, (milvus_expr, sql_where)
