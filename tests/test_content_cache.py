"""Driver-side content-row LRU (snippet assembly): hot result docs
render snippets with zero Spark jobs, the bytes budget bounds heap,
eviction never drops the current window's docs, and snippets stay
identical. Together with the term-block cache a fully-warm repeat
query runs NO Spark jobs at all."""

from __future__ import annotations

import pytest

from posik_engine_spark import corpus, spec
from posik_engine_spark.operators.search import SearchEngine


@pytest.fixture(scope="module")
def docs(spark):
    return corpus.synthetic_docs(spark, 80, seed=77).cache()


def _full(resp):
    return [tuple(h) for h in resp.hits]


class _Boom:
    def filter(self, *a, **k):
        raise AssertionError("content-cache miss reached the corpus scan")


def test_warm_repeat_query_runs_no_jobs_at_all(spark, docs):
    """Second identical query: term stats from the dict, blocks from the
    block cache, content from the content cache — poison BOTH the index
    frame and the content frame and the repeat must still serve."""
    with SearchEngine.from_docs(spark, docs, n_shards=4) as ref, \
         SearchEngine.from_docs(spark, docs, n_shards=4) as eng:
        q = "varint merge"
        expect = _full(ref.search(q, limit=10))
        assert _full(eng.search(q, limit=10)) == expect
        assert eng._content_cache and eng._content_cache_bytes > 0

        real_blocks, real_content = eng.ix.blocks, eng._content
        eng.ix.blocks = _Boom()
        eng._content = _Boom()
        try:
            again = _full(eng.search(q, limit=10))
        finally:
            eng.ix.blocks, eng._content = real_blocks, real_content
        assert again == expect


def test_eviction_bounded_and_results_identical(spark, docs, monkeypatch):
    monkeypatch.setattr(spec, "DRIVER_CONTENT_CACHE_MAX_BYTES", 1)
    with SearchEngine.from_docs(spark, docs, n_shards=4) as ref, \
         SearchEngine.from_docs(spark, docs, n_shards=4) as eng:
        from pyspark.sql import functions as F

        vocab = [
            r["term"]
            for r in ref.ix.term_stats.orderBy(F.desc("ctf"), "term")
            .limit(6)
            .collect()
        ]
        queries = [f"{vocab[i]} {vocab[i + 3]}" for i in range(3)]
        for _pass in range(2):
            for q in queries:
                assert _full(eng.search(q, limit=10)) == _full(
                    ref.search(q, limit=10)
                ), (q, _pass)
                # a 1-byte budget evicts everything but the current
                # window's docs (which are never evicted mid-insert)
                assert len(eng._content_cache) <= 10


def test_close_clears_content_cache(spark, docs):
    eng = SearchEngine.from_docs(spark, docs, n_shards=2)
    eng.search("varint")
    assert eng._content_cache
    eng.close()
    assert not eng._content_cache and eng._content_cache_bytes == 0
