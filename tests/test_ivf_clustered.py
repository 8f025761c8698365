"""Persisted IVF on CLUSTERED embeddings (round-4 verdict item 5):
the bench's testdata embeddings are near-random in cosine space —
IVF's hardest case — so the recall numbers there say little about a
deployment, where embeddings have per-repo/topic neighborhoods. The
Gaussian-mixture synthetic (corpus.clustered_embeddings) is that
deployment shape; this pins the recall/scan trade-off the verdict
asked for: recall@10 >= 0.9 at scan fraction <= 0.15, iters=2.
bench.ivf_recall_clustered reports the full curve (and the iters=5
comparison) at bench scale.
"""

from __future__ import annotations

import pytest

from posik_engine_spark import corpus
from posik_engine_spark.operators import similarity

N_VECTORS = 1_000
N_CLUSTERS = 16
K = 10


@pytest.fixture(scope="module")
def emb(spark):
    df = corpus.clustered_embeddings(
        spark, n_vectors=N_VECTORS, n_clusters=N_CLUSTERS
    ).drop("cluster").cache()
    df.count()
    yield df
    df.unpersist()


def test_clustered_recall_meets_target(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "store")
    similarity.save_ivf(emb, path, n_centroids=None, iters=2)
    store = similarity.IVFStore(spark, path)
    n_cent = len(store.centroids)
    nprobe = 4
    scan_fraction = nprobe / n_cent
    assert scan_fraction <= 0.15, (nprobe, n_cent)

    qvecs = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter("vec_id % 125 = 3").collect()  # 8 spread queries
    ]
    assert len(qvecs) == 8
    recalls = []
    for qv in qvecs:
        brute = {r["vec_id"] for r in similarity.cosine_topk(emb, qv, k=K).collect()}
        got = {vid for vid, _ in store.topk_rows(qv, k=K, nprobe=nprobe)}
        recalls.append(len(brute & got) / K)
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.9, (mean_recall, recalls)


def test_clustered_generator_is_deterministic():
    a = corpus.clustered_embeddings_pdf(n_vectors=64, n_clusters=8)
    b = corpus.clustered_embeddings_pdf(n_vectors=64, n_clusters=8)
    assert a["embedding"].map(tuple).equals(b["embedding"].map(tuple))
    # round-robin membership: every cluster has n/k members
    assert (a["cluster"].value_counts() == 8).all()
