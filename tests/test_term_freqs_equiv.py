"""Shuffle-free term_freqs must equal the explode+groupBy formulation."""

from __future__ import annotations

from posik_engine_spark import corpus
from posik_engine_spark.operators import build


def test_fused_equals_shuffle(spark):
    docs = corpus.synthetic_docs(spark, 120, seed=3)
    prepared = build.prepare_docs(docs, n_shards=4, with_token_arrays=True).cache()
    fused = sorted(map(tuple, build.term_freqs(prepared).collect()))
    shuffled = sorted(map(tuple, build.term_freqs_shuffle(prepared).collect()))
    assert fused == shuffled
