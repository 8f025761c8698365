"""M2: block index + block-max WAND == DataFrame path == oracle, exactly.

SURVEY.md §7 M2 equivalence requirement: 'WAND result == brute-force
result, always'.
"""

from __future__ import annotations

import pytest

from posik_engine_spark import corpus
from posik_engine_spark.operators import build, index, score, wand
from posik_engine_spark.oracle import build_oracle_index, oracle_topk


@pytest.fixture(scope="module")
def ix_state(spark):
    docs = corpus.synthetic_docs(spark, 400, seed=7)
    ix = index.build_index(docs, n_shards=8)
    prepared = build.prepare_docs(docs, n_shards=8)
    rows = prepared.select("doc_id", "repo", "path", "content").collect()
    oracle_ix = build_oracle_index([r.asDict() for r in rows])
    tf = build.term_freqs(prepared).cache()
    return ix, oracle_ix, tf


QUERIES = [
    (["varint"], 20),
    (["def"], 10),            # hot term: ~90% of docs -> exercises WAND cut
    (["def"], 3),             # tiny k, strong early termination
    (["posting", "merge"], 20),
    (["parse", "http", "request"], 20),
    (["block-max", "score"], 20),
    (["index", "token", "merge", "block"], 20),
    (["42"], 20),
    (["def", "import"], 5),   # two hot terms
]


@pytest.mark.parametrize("terms,k", QUERIES, ids=[f"{'-'.join(t)}@{k}" for t, k in QUERIES])
def test_wand_equals_oracle_and_dataframe(ix_state, terms, k):
    ix, oracle_ix, tf = ix_state
    info = ix.term_info(terms)
    assert set(info) == set(terms)
    idfs = {t: v[0] for t, v in info.items()}
    dfs = {t: v[1] for t, v in info.items()}

    got_wand = [
        (r["doc_id"], r["score"])
        for r in wand.wand_topk(ix, idfs, dfs, k).collect()
    ]
    got_driver = [
        (r["doc_id"], r["score"])
        for r in wand.wand_topk_driver(ix, idfs, dfs, k)
    ]
    got_df = [
        (r["doc_id"], r["score"])
        for r in score.topk(score.score_terms(tf, idfs, ix.meta.avgdl), limit=k).collect()
    ]
    expect = oracle_topk(oracle_ix, terms, limit=k)
    assert got_wand == expect, "WAND path diverges from oracle"
    assert got_driver == expect, "driver-local WAND diverges from oracle"
    assert got_df == expect, "DataFrame path diverges from oracle"


def test_repo_scoped_wand(ix_state):
    ix, oracle_ix, _ = ix_state
    terms = ["posting", "merge"]
    info = ix.term_info(terms)
    idfs = {t: v[0] for t, v in info.items()}
    dfs = {t: v[1] for t, v in info.items()}
    got = [
        (r["doc_id"], r["score"])
        for r in wand.wand_topk(ix, idfs, dfs, 20, repos=["repo-00"]).collect()
    ]
    got_driver = [
        (r["doc_id"], r["score"])
        for r in wand.wand_topk_driver(ix, idfs, dfs, 20, repos=["repo-00"])
    ]
    expect = oracle_topk(oracle_ix, terms, limit=20, repos=["repo-00"])
    assert got == expect
    assert got_driver == expect


def test_blocks_respect_block_size(ix_state):
    ix, _, _ = ix_state
    from posik_engine_spark import spec

    bad = ix.blocks.filter(f"n_docs > {spec.BLOCK_SIZE} or n_docs < 1").count()
    assert bad == 0


def test_multi_block_terms_and_wand(ix_state):
    """Force multiple blocks per (term, shard) via a tiny block size and
    re-verify WAND equality — exercises block-range pruning + per-block
    max_kernel bounds across block boundaries."""
    ix, oracle_ix, tf = ix_state
    small_blocks = index.build_blocks(tf, ix.doc_stats, block_size=8).cache()
    hot = small_blocks.filter("term = 'def'").groupBy("shard").count().collect()
    assert any(r["count"] > 1 for r in hot)
    ix_small = index.Index(small_blocks, ix.doc_stats, ix.term_stats, ix.meta)
    for terms, k in [(["def"], 5), (["def", "import"], 7), (["posting", "merge"], 20)]:
        info = ix_small.term_info(terms)
        idfs = {t: v[0] for t, v in info.items()}
        dfs = {t: v[1] for t, v in info.items()}
        got = [
            (r["doc_id"], r["score"])
            for r in wand.wand_topk(ix_small, idfs, dfs, k).collect()
        ]
        assert got == oracle_topk(oracle_ix, terms, limit=k)


def test_save_load_roundtrip(ix_state, spark, tmp_path):
    ix, oracle_ix, _ = ix_state
    path = str(tmp_path / "ix")
    index.save_index(ix, path)
    ix2 = index.load_index(spark, path)
    assert ix2.meta == ix.meta
    terms = ["varint"]
    info = ix2.term_info(terms)
    got = [
        (r["doc_id"], r["score"])
        for r in wand.wand_topk(ix2, {t: v[0] for t, v in info.items()},
                                {t: v[1] for t, v in info.items()}, 20).collect()
    ]
    assert got == oracle_topk(oracle_ix, terms, limit=20)


def test_compression_ratio(ix_state):
    """Index blocks must be materially smaller than raw postings."""
    import pyspark.sql.functions as F

    ix, _, _ = ix_state
    r = ix.blocks.agg(
        F.sum(F.length("docs") + F.length("tfp") + F.length("tfc")).alias("bytes"),
        F.sum("n_docs").alias("postings"),
    ).collect()[0]
    assert r["bytes"] / r["postings"] < 12.0  # raw would be >= 16 bytes/posting
