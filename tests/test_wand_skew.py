"""WAND pruning effectiveness on a REALISTIC Zipf-skewed corpus built
through the full Spark pipeline (VERDICT r3 next-round item 3): the
uniform bench suite's terms match everywhere, so decode_ratio sits at
~1.0 by construction; the rare∧common AND workload over corpus.zipf_docs
is where the ordinal block-range pruning must demonstrably fire.

Regression bound: decode_ratio <= 0.8 on this scenario (measured ~0.1
at 2k docs — the bound leaves room for block-size/shard-count drift,
not for the lever dying). Result parity vs the distributed DataFrame
scoring path guards that pruning never changes answers.
"""

from __future__ import annotations

import pytest

from posik_engine_spark import corpus
from posik_engine_spark.functions.tokenizer import tokenize_py
from posik_engine_spark.operators.search import SearchEngine
from posik_engine_spark.operators.wand import wand_topk, wand_topk_driver

N_DOCS = 2_000  # 20 repos x 100 docs; rare<r> in the first 10 of each


@pytest.fixture(scope="module")
def engine(spark):
    eng = SearchEngine.from_docs(
        spark, corpus.zipf_docs(spark, N_DOCS), n_shards=4
    )
    yield eng
    eng.close()


def _diag_for(engine, query: str, agg: dict) -> list[str]:
    terms = engine.filter_query_terms(tokenize_py(query))
    info = engine._term_info(terms)
    terms = [t for t in terms if t in info]
    assert len(terms) == 2, f"query {query!r} lost terms: {terms}"
    wand_topk_driver(
        engine.ix,
        {t: info[t][0] for t in terms},
        {t: info[t][1] for t in terms},
        k=20,
        diag=agg,
    )
    return terms


def test_rare_common_decode_ratio_bound(engine):
    agg: dict = {}
    for q in ["rare3 common1", "rare7 common2", "rare12 common1"]:
        _diag_for(engine, q, agg)
    ratio = agg["postings_decoded"] / agg["postings_total"]
    assert ratio <= 0.8, agg
    # the common term's posting mass dominates postings_total; with 10
    # clustered candidates per query the decode should skip far more
    # than the bound requires — record the real number in the assert
    # message for drift visibility
    assert agg["postings_decoded"] < agg["postings_total"], agg


def test_theta_filter_drops_the_universal_term(engine):
    # common0 (df == n_docs) must be theta-filtered, like the
    # reference's 0.97 DF cap — the scenario would otherwise bench a
    # stop word
    assert engine.filter_query_terms(["common0", "rare3"]) == ["rare3"]


def test_pruned_results_match_distributed_path(engine, spark):
    """Driver-WAND (pruned) top-k == distributed wand_topk top-k on the
    same index — pruning must never change answers."""
    terms = engine.filter_query_terms(tokenize_py("rare5 common2"))
    info = engine._term_info(terms)
    idfs = {t: info[t][0] for t in terms}
    dfs = {t: info[t][1] for t in terms}
    drv = wand_topk_driver(engine.ix, idfs, dfs, k=20)
    dist = wand_topk(engine.ix, idfs, dfs, k=20)
    got_drv = [(r["doc_id"], round(r["score"], 9)) for r in drv]
    got_dist = [(r["doc_id"], round(r["score"], 9)) for r in dist.collect()]
    assert sorted(got_drv) == sorted(got_dist)
    assert len(got_drv) > 0
