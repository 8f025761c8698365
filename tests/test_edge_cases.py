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
    # reference parity: nothing found after relaxation -> error
    # (SearchService.java:62-64)
    with pytest.raises(SearchError, match="nothing found"):
        engine.search("anything at all")
    stats = engine.statistics()
    assert stats["total"]["pages"] == 0 and stats["total"]["lemmas"] == 0


def test_single_doc_corpus_theta_quirk(spark):
    """With one doc, EVERY present term has df = n_docs >= theta*n_docs
    and is dropped by the popularity filter — the reference's kept
    quirk (SURVEY.md §8.3): a 1-page site can't match anything, and
    nothing-found raises per reference error semantics."""
    docs = spark.createDataFrame(
        [("r", "a.py", "c1", "py", "alpha beta gamma alpha")], DOCS_SCHEMA
    )
    engine = SearchEngine.from_docs(spark, docs, n_shards=4)
    with pytest.raises(SearchError, match="nothing found"):
        engine.search("alpha")


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


def test_dup_clusters_nonconvergence_raises(spark):
    # chain 0-1-2-...-5 needs ~5 propagation rounds; max_iters=2 must
    # raise instead of silently emitting non-minimal labels
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.dup_clusters(pairs, max_iters=2)


def test_index_format_version_guard(spark, tmp_path):
    import json

    from posik_engine_spark.operators import index as ix_mod
    from posik_engine_spark.operators.lifecycle import IndexBuilder

    docs = spark.createDataFrame(
        [("r", "a.py", "c", "py", "alpha beta")], DOCS_SCHEMA
    )
    out = str(tmp_path / "ix")
    ix = ix_mod.build_index(docs, n_shards=2)
    ix_mod.save_index(ix, out)
    # tampered version -> load refuses
    with open(f"{out}/meta.json") as f:
        meta = json.load(f)
    meta["format_version"] = 1
    with open(f"{out}/meta.json", "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="format_version"):
        ix_mod.load_index(spark, out)

    # builder dir stamped with an older version -> init refuses
    bdir = str(tmp_path / "bld")
    IndexBuilder(spark, bdir, n_shards=2)  # stamps current version
    with open(f"{bdir}/_format_version", "w") as f:
        f.write("1")
    with pytest.raises(ValueError, match="format_version=1"):
        IndexBuilder(spark, bdir, n_shards=2)

    # pre-versioning partial state (markers, no stamp) -> init refuses
    import os
    legacy = str(tmp_path / "legacy")
    os.makedirs(f"{legacy}/_markers")
    with pytest.raises(ValueError, match="predates"):
        IndexBuilder(spark, legacy, n_shards=2)


def test_sessionize_batch_subsecond_gap(spark):
    import datetime as dt

    from posik_engine_spark.streaming.sessionize import sessionize_batch

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 1.0),
        # 1800.5s later: JUST over the 30-min gap -> new session;
        # whole-second truncation would call it 1800 -> same session
        (1, t0 + dt.timedelta(seconds=1800, microseconds=500_000), 2.0),
    ]
    e = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = sessionize_batch(e, gap_minutes=30).collect()
    assert len(out) == 2, out


def test_search_engine_from_index_dir(spark, tmp_path):
    from posik_engine_spark.operators.lifecycle import IndexBuilder
    from posik_engine_spark.operators.search import SearchEngine

    docs = spark.createDataFrame(
        [
            ("r", "a.py", "c", "py", "alpha beta gamma"),
            ("r", "b.py", "c", "py", "delta beta"),
            ("r", "c.py", "c", "py", "epsilon zeta"),
        ],
        DOCS_SCHEMA,
    )
    out = str(tmp_path / "ix")
    IndexBuilder(spark, out, n_shards=2).build(docs)
    engine = SearchEngine.from_index_dir(spark, out, docs)
    resp = engine.search("beta")
    assert resp.count == 2
    engine.close()


def test_offset_past_end_relaxes_like_reference(spark):
    """Reference relaxes on an empty PAGINATED slice (the SQL result
    already has limit/offset applied): offset past the AND-match set
    must drop the rarest term and serve the relaxed query's page —
    engine and pure-python oracle must agree exactly."""
    from posik_engine_spark.oracle import build_oracle_index, oracle_search

    docs = spark.createDataFrame(
        [
            ("r", "a.py", "c", "py", "alpha beta common one"),
            ("r", "b.py", "c", "py", "beta common two"),
            ("r", "c.py", "c", "py", "common three"),
        ],
        DOCS_SCHEMA,
    )
    engine = SearchEngine.from_docs(spark, docs, n_shards=2)
    resp = engine.search("alpha beta", offset=1, limit=5)
    prepared = build.prepare_docs(docs, n_shards=2)
    rows = prepared.select("doc_id", "repo", "path", "content").collect()
    oracle_ix = build_oracle_index([r.asDict() for r in rows])
    exp_hits, exp_terms = oracle_search(oracle_ix, "alpha beta", offset=1, limit=5)
    assert resp.surviving_terms == exp_terms == ["beta"]
    got = [(h[0], h[6]) for h in resp.hits]
    assert got == exp_hits and len(got) == 1
    assert resp.count == 1  # reference count = window size
