"""Degenerate-input robustness: empty corpus, single doc, empty pairs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from posik_engine_spark.operators import build, dedup
from posik_engine_spark.operators.search import SearchEngine
from posik_engine_spark.oracle import SearchError

DOCS_SCHEMA = "repo string, path string, commit string, lang string, content string"


def test_empty_corpus_search(spark):
    docs = spark.createDataFrame([], DOCS_SCHEMA)
    engine = SearchEngine.from_docs(spark, docs, n_shards=4)
    resp = engine.search("anything at all")
    assert resp.count == 0 and resp.hits == []
    stats = engine.statistics()
    assert stats["total"]["pages"] == 0 and stats["total"]["lemmas"] == 0


def test_single_doc_corpus_theta_quirk(spark):
    """With one doc, EVERY present term has df = n_docs >= theta*n_docs
    and is dropped by the popularity filter — the reference's kept
    quirk (SURVEY.md §8.3): a 1-page site can't match anything."""
    docs = spark.createDataFrame(
        [("r", "a.py", "c1", "py", "alpha beta gamma alpha")], DOCS_SCHEMA
    )
    engine = SearchEngine.from_docs(spark, docs, n_shards=4)
    resp = engine.search("alpha")
    assert resp.count == 0 and resp.surviving_terms == []


def test_tiny_corpus_hit(spark):
    docs = spark.createDataFrame(
        [
            ("r", "a.py", "c1", "py", "alpha beta gamma alpha"),
            ("r", "b.py", "c1", "py", "delta epsilon"),
            ("r", "c.py", "c1", "py", "zeta eta theta"),
        ],
        DOCS_SCHEMA,
    )
    engine = SearchEngine.from_docs(spark, docs, n_shards=4)
    resp = engine.search("alpha")
    assert resp.count == 1
    assert resp.hits[0][5] == 1.0  # normalized relevance of the only hit
    assert "<b>alpha</b>" in resp.hits[0][4]


def test_empty_query_errors(spark):
    docs = spark.createDataFrame(
        [("r", "a.py", "c1", "py", "alpha")], DOCS_SCHEMA
    )
    engine = SearchEngine.from_docs(spark, docs, n_shards=2)
    with pytest.raises(SearchError):
        engine.search("   ")
    with pytest.raises(SearchError):
        engine.search("... !!! ...")  # garbage-only -> no tokens


def test_dup_clusters_empty_pairs(spark):
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert dedup.dup_clusters(pairs).count() == 0


def test_prepare_docs_null_content(spark):
    docs = spark.createDataFrame(
        [("r", "a", "c", "py", None), ("r", "b", "c", "py", "x y")], DOCS_SCHEMA
    )
    p = build.prepare_docs(docs, n_shards=2)
    rows = {r["path"]: r for r in p.collect()}
    assert rows["a"]["len_content"] == 0 and rows["a"]["counts"] == []
    # sha256("") for the null-content row (coalesce to empty string)
    assert rows["a"]["content_sha"] == (
        "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
    )
