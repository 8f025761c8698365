"""Driver-side term-block LRU (serving hybrid): hot terms serve with
zero index-scan jobs, the postings budget bounds heap, eviction never
drops the current query's terms, and results stay rank-identical."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from posik_engine_spark import corpus, spec
from posik_engine_spark.operators.search import SearchEngine


@pytest.fixture(scope="module")
def docs(spark):
    return corpus.synthetic_docs(spark, 80, seed=77).cache()


def _hits(resp):
    return [(h[0], h[6]) for h in resp.hits]


def test_cache_hit_skips_index_scan_and_stays_identical(spark, docs):
    with SearchEngine.from_docs(spark, docs, n_shards=4) as ref, \
         SearchEngine.from_docs(spark, docs, n_shards=4) as eng:
        q = "varint merge"
        expect = _hits(ref.search(q, limit=10))
        first = _hits(eng.search(q, limit=10))
        assert first == expect
        assert eng._block_cache and eng._block_cache_postings > 0

        # poison the index frame: a repeat of the same query must be
        # served ENTIRELY from the cache (no .filter on ix.blocks)
        real_blocks = eng.ix.blocks

        class _Boom:
            def filter(self, *a, **k):
                raise AssertionError("cache miss reached the index scan")

        eng.ix.blocks = _Boom()
        try:
            again = _hits(eng.search(q, limit=10))
        finally:
            eng.ix.blocks = real_blocks
        assert again == expect


def test_cache_eviction_bounded_and_never_drops_current_terms(
    spark, docs, monkeypatch
):
    monkeypatch.setattr(spec, "DRIVER_BLOCK_CACHE_MAX_POSTINGS", 1)
    with SearchEngine.from_docs(spark, docs, n_shards=4) as ref, \
         SearchEngine.from_docs(spark, docs, n_shards=4) as eng:
        vocab = [
            r["term"]
            for r in ref.ix.term_stats.orderBy(F.desc("ctf"), "term")
            .limit(8)
            .collect()
        ]
        queries = [f"{vocab[i]} {vocab[(i + 3) % 8]}" for i in range(8)]
        for _pass in range(2):
            for q in queries:
                assert _hits(eng.search(q, limit=10)) == _hits(
                    ref.search(q, limit=10)
                ), (q, _pass)
                # budget of 1 posting forces eviction down to just the
                # current query's terms (which are never evicted)
                assert set(eng._block_cache) <= set(
                    t for qq in queries for t in qq.split()
                )
                assert len(eng._block_cache) <= 4, eng._block_cache.keys()


def test_close_clears_cache(spark, docs):
    eng = SearchEngine.from_docs(spark, docs, n_shards=2)
    eng.search("varint")
    assert eng._block_cache
    eng.close()
    assert not eng._block_cache and eng._block_cache_postings == 0
