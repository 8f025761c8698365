"""Regression tests for the round-2 advisor findings (ADVICE.md r2):

1. `_aqe_release` restores the AQE conf INSIDE the lock — a concurrent
   acquire can no longer capture the still-'false' value as its prev,
2. `ngram_jaccard_pairs(max_shingle_df=...)` no longer persists the hot
   shingle frame (leaked cached partitions across calls),
3. `html_body_without_h1` keys its fallback on the OPENING <body> tag —
   an unclosed <body> must not leak <title>/head text into the body
   field,
4. `IndexBuilder` refuses a dir whose markers exist but whose
   `_build_plan.json` is missing instead of fabricating a plan from the
   new builder's args (which would desync is_indexing forever).
"""

from __future__ import annotations

import os
import threading

import pytest
from pyspark.sql import functions as F

from posik_engine_spark import corpus
from posik_engine_spark.functions.html import html_fields
from posik_engine_spark.operators import dedup, lifecycle
from posik_engine_spark.operators.search import _aqe_acquire, _aqe_release


def test_aqe_release_restore_race(spark):
    """Hammer acquire/release from two threads: with the restore outside
    the lock, an acquire interleaved between state-deletion and restore
    captures 'false' as prev and the final state sticks at 'false'.
    With the restore inside the lock, the conf always returns to the
    true pre-engine value."""
    key = "spark.sql.adaptive.enabled"
    prev = spark.conf.get(key)
    assert prev != "false" or pytest.skip("fixture session already false")

    def churn():
        for _ in range(200):
            _aqe_acquire(spark)
            _aqe_release(spark)

    threads = [threading.Thread(target=churn) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert spark.conf.get(key) == prev


def test_ngram_cap_does_not_leak_persisted_rdds(spark):
    docs = (
        corpus.synthetic_docs(spark, 30, seed=17)
        .select(
            F.xxhash64("repo", "path").alias("doc_id"),
            F.col("content").alias("text"),
        )
        .cache()
    )
    docs.count()
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    out = dedup.ngram_jaccard_pairs(docs, tau=0.05, n=3, max_shingle_df=2)
    out.count()
    after = len(spark.sparkContext._jsc.getPersistentRDDs())
    assert after == before, "hot-shingle frame leaked a persisted RDD"


def test_unclosed_body_does_not_leak_title(spark):
    rows = [
        # unclosed <body>: body text is tag-to-end, title stays out
        ("u1", "<html><head><title>SecretTitle</title></head>"
               "<body><p>visible body text"),
        # closed body unchanged
        ("u2", "<html><title>T2</title><body>closed body</body></html>"),
        # no body tag at all: whole-document fallback (title included,
        # jsoup-normalized behavior for tagless fragments)
        ("u3", "<html><title>T3</title>fragment text</html>"),
        # explicitly empty body stays empty
        ("u4", "<html><title>T4</title><body></body></html>"),
    ]
    df = html_fields(spark.createDataFrame(rows, "url string, html string"))
    got = {r["url"]: (r["title"], r["body"]) for r in df.collect()}
    assert got["u1"] == ("SecretTitle", "visible body text")
    assert got["u2"] == ("T2", "closed body")
    assert got["u3"][1] == "T3 fragment text"
    assert got["u4"] == ("T4", "")


def test_driver_cache_eviction_rank_identity_over_many_queries(spark, monkeypatch):
    """Round-2 VERDICT item 6: with the driver dictionary disabled and
    the bounded lookup cache forced to evict repeatedly (tiny
    DRIVER_DICT_MAX_TERMS, many distinct query terms, two passes so
    every query also replays against a post-eviction cache), every
    search stays rank-identical to a complete-dictionary engine — the
    r1 ADVICE bug (eviction dropping current-query terms) lived exactly
    here; pin it forever."""
    from posik_engine_spark import spec
    from posik_engine_spark.operators.search import SearchEngine

    docs = corpus.synthetic_docs(spark, 80, seed=71).cache()
    with SearchEngine.from_docs(spark, docs, n_shards=4) as ref:
        assert ref._dict_complete
        vocab = [
            r["term"]
            for r in ref.ix.term_stats.orderBy(F.desc("ctf"), "term")
            .limit(12)
            .collect()
        ]
        queries = [f"{vocab[i]} {vocab[(i + 5) % len(vocab)]}" for i in range(12)]
        expected = {
            q: [(h[0], h[6]) for h in ref.search(q, limit=10).hits] for q in queries
        }

        monkeypatch.setattr(spec, "DRIVER_DICT_MAX_TERMS", 2)
        with SearchEngine.from_docs(spark, docs, n_shards=4) as eng:
            assert not eng._dict_complete
            for _pass in range(2):
                for q in queries:
                    got = [(h[0], h[6]) for h in eng.search(q, limit=10).hits]
                    assert got == expected[q], (q, _pass)
                    # the lookup cache stays bounded: at most the bound
                    # plus the current query's own terms survive a call
                    assert len(eng._term_cache) <= 2 + 4, q


def test_builder_refuses_markers_without_plan(spark, tmp_path):
    docs = corpus.synthetic_docs(spark, 20, seed=23).cache()
    out = str(tmp_path / "ix")
    b = lifecycle.IndexBuilder(spark, out, n_shards=2, shard_batches=2)
    b.build(docs)
    os.remove(os.path.join(out, "_build_plan.json"))
    with pytest.raises(ValueError, match="_build_plan.json is missing"):
        lifecycle.IndexBuilder(spark, out, n_shards=2, shard_batches=1)
    # the refusal must not have fabricated a new plan file
    assert not os.path.exists(os.path.join(out, "_build_plan.json"))
