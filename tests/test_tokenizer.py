"""Tokenizer goldens + 4-way agreement (SURVEY.md §5 rebuild test plan #1).

Golden cases ported in spirit from the reference unit tests
(/root/reference/src/test/java/.../service/MorphologyServiceTest.java).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from posik_engine_spark import spec
from posik_engine_spark.functions.tokenizer import (
    _tokenize_series,
    tokenize_expr,
    tokenize_py,
    tokenize_sql_duckdb,
    tokenize_udf,
)

GOLDENS = [
    # reference MorphologyServiceTest.java:26-32 — lowercase + stop removal
    (
        "This is a simple input string, really SIMPLE one!",
        ["this", "simple", "input", "string", "really", "simple", "one"],
    ),
    # :35-68 — empty / whitespace / punctuation-only -> []
    ("", []),
    ("   \n\t  ", []),
    ("!!! ... ### ;;; ,,,", []),
    # :53-59 — digits kept
    ("31 июня", ["31"]),
    ("line 42 value 007", ["line", "42", "value", "007"]),
    # :71-77 — hyphenated words kept whole
    ("block-max top-k pruning", ["block-max", "top-k", "pruning"]),
    # spec §7 M0 — identifier splitting + 1->N whole-form expansion
    # (reference MorphologyService.java:28-38 emits MULTIPLE normal
    # forms per word, each counted — MorphologyServiceTest.java:156-164)
    ("parseHttpRequest", ["parse", "http", "request", "parsehttprequest"]),
    ("snake_case_name", ["snake", "case", "name", "snakecasename"]),
    (
        "HTTPServer XMLParser",
        ["http", "server", "xml", "parser", "httpserver", "xmlparser"],
    ),
    # camel and snake variants share the whole form
    ("parse_http_request", ["parse", "http", "request", "parsehttprequest"]),
    # single-part words do NOT double-emit
    ("Server simple", ["server", "simple"]),
    # stop words only -> []
    ("the and of in on", []),
    # mixed code line
    (
        "def parse_http(x): return x-1",
        ["def", "parse", "http", "x", "return", "x-1", "parsehttp"],
    ),
]


@pytest.mark.parametrize("text,expected", GOLDENS)
def test_python_goldens(text, expected):
    assert tokenize_py(text) == expected


def test_none_is_empty():
    assert tokenize_py(None) == []


def test_four_way_agreement(spark):
    texts = [t for t, _ in GOLDENS] + [
        "ImportError while importing def-block 3-14-159",
        "A--B  __x__ 0xDEADbeef CamelCASEMix endsWithCap_X",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    got_udf = {
        r["id"]: r["toks"]
        for r in df.select("id", tokenize_udf("text").alias("toks")).collect()
    }
    got_expr = {
        r["id"]: r["toks"]
        for r in df.select("id", tokenize_expr("text").alias("toks")).collect()
    }
    con = duckdb.connect()
    got_sql = dict(
        con.execute(
            f"SELECT i, {tokenize_sql_duckdb('t')} FROM (SELECT unnest(range({len(texts)})) i, "
            f"unnest($1) t)",
            [texts],
        ).fetchall()
    )
    for i, t in enumerate(texts):
        expect = tokenize_py(t)
        assert got_udf[i] == expect, (t, got_udf[i], expect)
        assert got_expr[i] == expect, (t, got_expr[i], expect)
        assert got_sql[i] == expect, (t, got_sql[i], expect)


def test_expr_stays_jvm_side(spark):
    """tokenize_expr must not invoke a Python worker (whole-stage codegen)."""
    df = spark.createDataFrame([("a",)], "text string")
    plan = df.select(tokenize_expr("text")).queryExecution().executedPlan().toString() \
        if hasattr(df, "queryExecution") else \
        df.select(tokenize_expr("text"))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_stop_tokens_frozen():
    # guard against accidental spec drift: stop set is part of rank identity
    assert "the" in spec.STOP_TOKENS and "def" not in spec.STOP_TOKENS
    assert len(spec.STOP_TOKENS) == 25


def test_series_form_fuzz_matches_python():
    """_tokenize_series == tokenize_py on random ASCII/camel/underscore
    soup (no Spark — exercises the pandas form directly, at volume).
    Pins the whole-form prefilter's length-trick: the camel passes'
    length delta + a literal '_' check must equal MULTI_WORD_RE.search
    on every input, or flagged docs would silently lose whole-form
    tokens."""
    import random
    import string

    import pandas as pd

    rng = random.Random(20260818)
    alpha = string.ascii_letters + string.digits + "_ -./\n"
    texts = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(0, 40)))
        for _ in range(5000)
    ] + ["ABCDef", "aB", "A_b", "_", "AB", "ABc", "xYz", "", "a-b",
         "HTTPResponse", "fooBar_baz", "ABCdef", "aAb", "endsWithCap_X"]
    got = _tokenize_series(pd.Series(texts)).tolist()
    expect = [tokenize_py(t) for t in texts]
    assert got == expect


def test_four_way_agreement_randomized(spark):
    """Seeded random strings — ASCII identifiers, unicode, punctuation
    soup, underscore/camel edge shapes — through all four forms in ONE
    batched comparison (the 4-way contract is the engine's most
    load-bearing invariant; goldens alone cover too little space)."""
    import random

    rng = random.Random(20260817)
    frags = [
        "foo", "BAR", "Baz", "x", "9", "42", "_", "__", "-", "--", " ", "\t",
        "parseHttpRequest", "snake_case", "HTTPServer", "a_B", "X9y",
        "ё", "июня", "漢字", "é", "!", ".", ",", "#", "block-max", "top-k",
        "CamelCASEMix", "0xDEADbeef", "endsWithCap_X", "A", "ab", "aB",
    ]
    texts = [
        "".join(rng.choice(frags) for _ in range(rng.randint(0, 12)))
        for _ in range(200)
    ]
    expect = [tokenize_py(t) for t in texts]

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got_udf = {
        r["id"]: r["toks"]
        for r in df.select("id", tokenize_udf("text").alias("toks")).collect()
    }
    got_expr = {
        r["id"]: r["toks"]
        for r in df.select("id", tokenize_expr("text").alias("toks")).collect()
    }
    con = duckdb.connect()
    got_sql = dict(
        con.execute(
            f"SELECT i, {tokenize_sql_duckdb('t')} FROM "
            f"(SELECT unnest(range({len(texts)})) i, unnest($1) t)",
            [texts],
        ).fetchall()
    )
    for i, t in enumerate(texts):
        assert got_udf[i] == expect[i], (t, got_udf[i], expect[i])
        assert got_expr[i] == expect[i], (t, got_expr[i], expect[i])
        assert got_sql[i] == expect[i], (t, got_sql[i], expect[i])


def test_count_series_fuzz_matches_tokenize_series():
    """_count_series (the fused build hot path) == Counter over
    _tokenize_series, doc by doc, on random camel/underscore/unicode
    soup — both plain and through a 1->N normalizer (where the
    expansion must run AFTER the stop filter and count every normal
    form). Also pins the coarse [A-Z_] gate: lowercase-only docs must
    produce identical counts despite skipping the camel passes."""
    import random
    import string
    from collections import Counter

    import pandas as pd

    from posik_engine_spark.functions.stemmer import resolve
    from posik_engine_spark.functions.tokenizer import _count_series

    rng = random.Random(20260818)
    alpha = string.ascii_letters + string.digits + "_ -./\n" + "яЁё"
    texts = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(0, 40)))
        for _ in range(4000)
    ] + ["ABCDef", "aB", "A_b", "", "the and with", "a-b the A_B",
         "HTTPResponse fooBar_baz", "all lowercase prose only",
         "Тест тесто", None]
    s = pd.Series(texts)
    toks = _tokenize_series(s)
    counters, lengths = _count_series(s)
    assert [dict(c) for c in counters] == [dict(Counter(t)) for t in toks]
    assert lengths == [len(t) for t in toks]

    norm = resolve("bilingual+exact")
    toks_n = _tokenize_series(s, norm.token_re).map(norm.flat)
    counters_n, lengths_n = _count_series(s, norm.token_re, forms=norm)
    assert [dict(c) for c in counters_n] == [dict(Counter(t)) for t in toks_n]
    assert lengths_n == [len(t) for t in toks_n]
