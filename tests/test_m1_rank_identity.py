"""M1 end-to-end: DataFrame BM25 path == pure-Python oracle, exactly.

Exact float equality of scores (not approx) — this validates the float
discipline in spec.py / operators/build.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from posik_engine_spark import corpus
from posik_engine_spark.functions.tokenizer import tokenize_py
from posik_engine_spark.operators import build, score
from posik_engine_spark.oracle import build_oracle_index, oracle_topk


@pytest.fixture(scope="module")
def fixture_state(spark):
    pdf = corpus.synthetic_docs_pdf(300, seed=42)
    docs = spark.createDataFrame(pdf)
    prepared = build.prepare_docs(docs, n_shards=4, with_token_arrays=True).cache()
    tf = build.term_freqs(prepared).cache()
    meta = build.corpus_meta(prepared)
    stats = build.term_stats(tf).cache()
    # oracle over the engine's own doc_ids (dedup'd, same identity)
    rows = prepared.select("doc_id", "repo", "path", "content").collect()
    ix = build_oracle_index([r.asDict() for r in rows])
    return docs, prepared, tf, meta, stats, ix


def test_meta_matches_oracle(fixture_state):
    _, _, _, meta, _, ix = fixture_state
    assert meta.n_docs == ix.n_docs
    assert meta.sum_len_path == ix.sum_len_path
    assert meta.sum_len_content == ix.sum_len_content
    assert meta.avgdl == ix.avgdl  # exact: same int sums, same float op


def test_term_stats_match_oracle(fixture_state):
    _, _, _, _, stats, ix = fixture_state
    got = {r["term"]: (r["df"], r["ctf"]) for r in stats.collect()}
    expect = {t: (len(p), ix.ctf[t]) for t, p in ix.postings.items()}
    assert got == expect


def test_salted_equals_plain_groupby(fixture_state):
    _, _, tf, _, stats, _ = fixture_state
    plain = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum(F.col("tf_path") + F.col("tf_content")).alias("ctf"),
    )
    assert sorted(map(tuple, stats.collect())) == sorted(map(tuple, plain.collect()))


QUERY_TERM_SETS = [
    ["varint"],
    ["def"],
    ["posting", "merge"],
    ["parse", "http", "request"],
    ["block-max", "score"],
    ["42"],
    ["index", "token", "merge", "block"],
]


@pytest.mark.parametrize("terms", QUERY_TERM_SETS, ids=[" ".join(t) for t in QUERY_TERM_SETS])
def test_rank_identity_dataframe_path(fixture_state, terms):
    _, _, tf, meta, stats, ix = fixture_state
    idfs = build.idf_map(stats, meta, terms)
    assert set(idfs) == set(terms), f"missing terms in dict: {set(terms) - set(idfs)}"
    got = score.topk(score.score_terms(tf, idfs, meta.avgdl), limit=20).collect()
    expect = oracle_topk(ix, terms, limit=20)
    assert [(r["doc_id"], r["score"]) for r in got] == expect  # exact equality


def test_content_sha_invariant(fixture_state, spark):
    """Per-row invariant: engine's content_sha equals sha256 of the
    source content (BASELINE.json input_hint)."""
    import hashlib

    _, prepared, _, _, _, _ = fixture_state
    for r in prepared.select("content", "content_sha").limit(50).collect():
        assert hashlib.sha256((r["content"] or "").encode()).hexdigest() == r["content_sha"]


def test_tokenizer_consistency_in_build(fixture_state):
    _, prepared, _, _, _, _ = fixture_state
    for r in prepared.select("content", "content_tokens").limit(30).collect():
        assert r["content_tokens"] == tokenize_py(r["content"])
