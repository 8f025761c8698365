"""Detailed statistics parity (round-2 VERDICT item 4): per-repo lemma
counts + the status/statusTime/error triple from build lineage —
reference dto/statistics/Detailed.java:13-19, StatisticsService.java:33-39,
LemmaRepository.java:13."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from posik_engine_spark import corpus
from posik_engine_spark.operators import build as B
from posik_engine_spark.operators import lifecycle
from posik_engine_spark.operators.search import SearchEngine

DETAILED_KEYS = {"url", "name", "status", "statusTime", "error", "pages", "lemmas"}


def _expected_lemmas(docs):
    """repo -> distinct engine terms, via the build dataflow itself."""
    prepared = B.prepare_docs(docs, n_shards=2)
    tf = B.term_freqs(prepared)
    ids = B.doc_stats(prepared).select("doc_id", "repo")
    return {
        r["repo"]: int(r["n"])
        for r in tf.select("doc_id", "term")
        .join(ids, "doc_id")
        .groupBy("repo")
        .agg(F.countDistinct("term").alias("n"))
        .collect()
    }


def test_detailed_statistics_from_index_dir(spark, tmp_path):
    docs = corpus.synthetic_docs(spark, 50, seed=51).cache()
    out = str(tmp_path / "ix")
    b = lifecycle.IndexBuilder(spark, out, n_shards=2)
    b.build(docs)
    expect = _expected_lemmas(docs)
    with SearchEngine.from_index_dir(spark, out, docs) as eng:
        st = eng.statistics()
        assert st["total"]["isIndexing"] is False
        for d in st["detailed"]:
            assert set(d) == DETAILED_KEYS
            assert d["status"] == "INDEXED"
            assert d["statusTime"] is not None and d["error"] is None
            assert d["name"] == d["url"]
            assert d["lemmas"] == expect[d["url"]], d
        assert sum(d["pages"] for d in st["detailed"]) == st["total"]["pages"]


def test_detailed_statistics_in_memory_engine(spark):
    docs = corpus.synthetic_docs(spark, 40, seed=53).cache()
    expect = _expected_lemmas(docs)
    with SearchEngine.from_docs(spark, docs, n_shards=2) as eng:
        st = eng.statistics()
        for d in st["detailed"]:
            assert set(d) == DETAILED_KEYS
            # no builder dir: INDEXED, no durable state machine
            assert d["status"] == "INDEXED" and d["statusTime"] is None
            assert d["lemmas"] == expect[d["url"]], d


def test_status_flips_across_build_fail_recover(spark, tmp_path, monkeypatch):
    docs = corpus.synthetic_docs(spark, 40, seed=57).cache()
    out = str(tmp_path / "ix")
    b = lifecycle.IndexBuilder(spark, out, n_shards=4, shard_batches=2)

    # in-flight: crash-partial build (markers partial, no failed stage)
    with pytest.raises(lifecycle.BuildAborted):
        b.build(docs, fail_after_batch=0)
    st = lifecycle.build_status(out)
    assert st["status"] == "INDEXING" and st["error"] is None

    # complete the build -> INDEXED
    b.build(docs)
    st = lifecycle.build_status(out)
    assert st["status"] == "INDEXED" and st["error"] is None
    t_indexed = st["status_time"]

    # failed attempt INSIDE a stage -> FAILED with the error surfaced
    changed = docs.withColumn(
        "content", F.concat(F.col("content"), F.lit(" newword"))
    )

    def boom(*a, **k):
        raise RuntimeError("injected block-build failure")

    monkeypatch.setattr(lifecycle, "build_blocks", boom)
    with pytest.raises(RuntimeError, match="injected block-build"):
        b.incremental_update(changed)
    st = lifecycle.build_status(out)
    assert st["status"] == "FAILED"
    assert "injected block-build" in st["error"]
    assert st["status_time"] >= t_indexed

    # the serving engine sees the same live state
    with SearchEngine.from_index_dir(spark, out, docs) as eng:
        d0 = eng.statistics()["detailed"][0]
        assert d0["status"] == "FAILED" and "injected" in d0["error"]

    # recover: the real incremental succeeds -> INDEXED again
    monkeypatch.undo()
    b.incremental_update(changed)
    st = lifecycle.build_status(out)
    assert st["status"] == "INDEXED" and st["error"] is None
