"""Regression tests for the round-1 advisor findings (ADVICE.md):

1. big-vocab `_term_info` must not drop already-cached terms of the
   CURRENT query when the bounded lookup cache is evicted,
2. AQE conf must be restored even when callers never close() the
   engine (finalizer / context-manager),
3. load_index / IndexBuilder.load must not serve an index whose
   incremental commit crashed half-way (pending intent file).
"""

from __future__ import annotations

import gc

import pytest
from pyspark.sql import functions as F

from posik_engine_spark import corpus, spec
from posik_engine_spark.operators import lifecycle
from posik_engine_spark.operators.index import load_index
from posik_engine_spark.operators.search import SearchEngine


@pytest.fixture(scope="module")
def small_engine(spark):
    docs = corpus.synthetic_docs(spark, 60, seed=7).cache()
    eng = SearchEngine.from_docs(spark, docs, n_shards=4)
    yield eng
    eng.close()


def test_term_cache_eviction_keeps_current_query_terms(small_engine, monkeypatch):
    """ADVICE #1: evicting the bounded term cache mid-query must not
    silently drop in-vocabulary terms that were already cached."""
    eng = small_engine
    vocab = [r["term"] for r in eng.ix.term_stats.orderBy("term").limit(4).collect()]
    assert len(vocab) == 4
    t1, t2, t3, t4 = vocab

    # force the big-vocab path with a tiny cache bound
    monkeypatch.setattr(spec, "DRIVER_DICT_MAX_TERMS", 2)
    monkeypatch.setattr(eng, "_dict_complete", False)
    eng._term_cache.clear()

    # overfill the cache past the bound
    info = eng._term_info([t1, t2, t3])
    assert set(info) == {t1, t2, t3}
    assert len(eng._term_cache) == 3  # > bound, next call evicts

    # t1 is cached, t4 is not; pre-fix the eviction ran AFTER computing
    # `missing`, so t1 was dropped from the result (silent AND change)
    info = eng._term_info([t1, t4])
    assert set(info) == {t1, t4}


def test_aqe_restored_by_finalizer_and_context_manager(spark):
    docs = corpus.synthetic_docs(spark, 30, seed=9).cache()
    prev = spark.conf.get("spark.sql.adaptive.enabled")

    # context-manager restores on exit
    with SearchEngine.from_docs(spark, docs, n_shards=2):
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    assert spark.conf.get("spark.sql.adaptive.enabled") == prev

    # abandoned engine (no close) restores at GC via weakref.finalize
    eng = SearchEngine.from_docs(spark, docs, n_shards=2)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    del eng
    gc.collect()
    assert spark.conf.get("spark.sql.adaptive.enabled") == prev


def test_statistics_is_indexing_live(spark, tmp_path):
    """A3: statistics() derives isIndexing from builder markers/intent —
    True while a build is in flight (crash-partial via fail_after_batch),
    False once the resumed build completes."""
    docs = corpus.synthetic_docs(spark, 40, seed=13).cache()
    out = str(tmp_path / "ix")
    b = lifecycle.IndexBuilder(spark, out, n_shards=4, shard_batches=3)
    with pytest.raises(lifecycle.BuildAborted):
        b.build(docs, fail_after_batch=0)
    assert b.is_indexing() and lifecycle.is_indexing(out)

    # a serving engine over the partial dir reports the live state
    eng = SearchEngine.from_index_dir(spark, out, docs)
    try:
        assert eng.statistics()["total"]["isIndexing"] is True
        # resume to completion in-place; the SAME engine re-reads the
        # builder state on the next statistics() call
        b.build(docs)
        assert not lifecycle.is_indexing(out)
        assert eng.statistics()["total"]["isIndexing"] is False
    finally:
        eng.close()

    # from_docs engines have no builder dir -> always False
    with SearchEngine.from_docs(spark, docs, n_shards=2) as mem_eng:
        assert mem_eng.statistics()["total"]["isIndexing"] is False


def test_load_refuses_or_replays_pending_incremental_intent(spark, tmp_path):
    docs_v1 = corpus.synthetic_docs(spark, 40, seed=11).cache()
    snap_v2 = docs_v1.withColumn(
        "content",
        F.when(
            F.col("path").contains("mod_2"),
            F.concat(F.col("content"), F.lit("\nchanged marker")),
        ).otherwise(F.col("content")),
    ).cache()

    out = str(tmp_path / "ix")
    b = lifecycle.IndexBuilder(spark, out, n_shards=4)
    b.build(docs_v1)

    # crash just before the commit applies: stage everything, write the
    # intent, raise — the live tables are untouched but the intent is
    # pending, i.e. the on-disk state is mid-commit
    orig = lifecycle.IndexBuilder._finish_incremental_commit

    def crash(self):
        raise RuntimeError("injected crash before commit")

    lifecycle.IndexBuilder._finish_incremental_commit = crash
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            b.incremental_update(snap_v2)
    finally:
        lifecycle.IndexBuilder._finish_incremental_commit = orig

    import os

    assert os.path.exists(b._intent_path)

    # standalone load_index must refuse the inconsistent dir outright
    with pytest.raises(ValueError, match="pending incremental commit"):
        load_index(spark, out)

    # IndexBuilder.load replays the intent, then serves the v2 state
    ix = b.load()
    assert not os.path.exists(b._intent_path)
    full = lifecycle.IndexBuilder(spark, str(tmp_path / "full"), n_shards=4)
    ix_full = full.build(snap_v2)
    rows_a = sorted(map(tuple, ix.blocks.collect()))
    rows_b = sorted(map(tuple, ix_full.blocks.collect()))
    assert rows_a == rows_b


def test_big_vocab_distributed_dict_search_parity(spark, monkeypatch):
    """With the driver dict disabled (vocab > DRIVER_DICT_MAX_TERMS),
    the engine probes the distributed term_stats per query — results
    must equal the preloaded-dict engine exactly."""
    docs = corpus.synthetic_docs(spark, 80, seed=3).cache()
    with SearchEngine.from_docs(spark, docs, n_shards=4) as eng_small:
        # hits tuples: (doc_id, repo, uri, title, snippet, relevance, score)
        expect = [(h[0], h[6]) for h in eng_small.search("varint merge").hits]
        monkeypatch.setattr(spec, "DRIVER_DICT_MAX_TERMS", 1)
        with SearchEngine.from_docs(spark, docs, n_shards=4) as eng_big:
            assert not eng_big._dict_complete
            got = [(h[0], h[6]) for h in eng_big.search("varint merge").hits]
            assert got == expect
            # stop-word-only and relaxation behavior survive too
            with pytest.raises(Exception):
                eng_big.search("the and of")
            r = eng_big.search("varint zzznonexistent")
            assert r.surviving_terms == ["varint"]


def test_aqe_refcounted_across_overlapping_engines(spark):
    """Two engines overlapping on one session: AQE stays disabled until
    the LAST one closes, then restores the TRUE pre-engine value —
    FIFO close order must not corrupt the saved conf (code-review
    finding: last-writer-loses save/restore)."""
    docs = corpus.synthetic_docs(spark, 30, seed=29).cache()
    key = "spark.sql.adaptive.enabled"
    prev = spark.conf.get(key)
    a = SearchEngine.from_docs(spark, docs, n_shards=2)
    b = SearchEngine.from_docs(spark, docs, n_shards=2)
    assert spark.conf.get(key) == "false"
    a.close()  # FIFO: the first engine closes first
    assert spark.conf.get(key) == "false", "b is still serving"
    b.close()
    assert spark.conf.get(key) == prev


def test_statistics_only_engine(spark, tmp_path):
    """from_index_dir with NO content source serves statistics but
    refuses search with a clear error (search_cli --statistics path)."""
    from posik_engine_spark.operators.index import build_index, save_index
    from posik_engine_spark.oracle import SearchError

    docs = corpus.synthetic_docs(spark, 30, seed=31).cache()
    ix_dir = str(tmp_path / "ix")
    save_index(build_index(docs, n_shards=2, cache=False), ix_dir)
    with SearchEngine.from_index_dir(spark, ix_dir) as eng:
        st = eng.statistics()
        assert st["total"]["pages"] > 0
        with pytest.raises(SearchError, match="no content source"):
            eng.search("varint")
