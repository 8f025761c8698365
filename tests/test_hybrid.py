"""Hybrid lexical+semantic RRF fusion (operators/hybrid.py).

The oracle-checked integration (hybrid_rrf_topk vs DuckDB) lives in
test_entry_contract.py via the queries()/oracle_sql() registry; these
tests pin the operator semantics and the driver-side serving fusion.
"""

import pytest
from pyspark.sql import functions as F

from posik_engine_spark.operators import hybrid


def test_rrf_fuse_rows_math():
    # doc 7 is rank 1 lexically and rank 2 semantically:
    # 1/61 + 1/62 beats doc 3's 1/62 + 1/61 tie -> id tiebreak, and
    # both beat single-list docs
    out = hybrid.rrf_fuse_rows([[7, 3, 9], [3, 7]], topk=4)
    assert [d for d, _ in out] == [3, 7, 9]
    s = dict(out)
    # scores are round-6 canonical (the DataFrame path's F.round)
    assert s[3] == round(1 / 62 + 1 / 61, 6)
    assert s[7] == round(1 / 61 + 1 / 62, 6)
    assert s[9] == round(1 / 63, 6)
    # identical scores tie-break on the smaller id
    assert out[0][0] == 3 and out[0][1] == out[1][1]


def test_rrf_fuse_df_matches_rows(spark):
    lex = spark.createDataFrame(
        [(7, 3.0), (3, 2.0), (9, 1.0)], "doc_id long, score double"
    )
    sem = spark.createDataFrame(
        [(3, 0.9), (7, 0.8), (11, 0.1)], "vec_id long, cosine double"
    )
    got = {
        r["doc_id"]: (r["lex_rank"], r["sem_rank"], r["rrf"])
        for r in hybrid.rrf_fuse(lex, sem, topk=10).collect()
    }
    want = dict(hybrid.rrf_fuse_rows([[7, 3, 9], [3, 7, 11]], topk=10))
    assert set(got) == set(want)
    for d, (lr, sr, rrf) in got.items():
        assert rrf == pytest.approx(want[d], abs=1e-6)
    assert got[7] == (1, 2, pytest.approx(1 / 61 + 1 / 62, abs=1e-6))
    assert got[11][0] is None and got[11][1] == 3


def test_rrf_depth_cut_is_deterministic(spark):
    # ties at the depth boundary cut by id: depth=2 over three docs
    # scoring 5,5,5 keeps ids 1,2
    lex = spark.createDataFrame(
        [(3, 5.0), (1, 5.0), (2, 5.0)], "doc_id long, score double"
    )
    sem = spark.createDataFrame([], "vec_id long, cosine double")
    out = hybrid.rrf_fuse(lex, sem, depth=2, topk=10).collect()
    assert sorted(r["doc_id"] for r in out) == [1, 2]


def test_serving_fusion_engine_plus_ivf(spark, tmp_path):
    """Driver-side fusion of the two real indexes: BM25 SearchEngine
    hits + IVFStore.topk rows, fused with rrf_fuse_rows — the serving
    path runs zero extra Spark jobs beyond the two index probes."""
    from posik_engine_spark import corpus
    from posik_engine_spark.operators import similarity
    from posik_engine_spark.operators.search import SearchEngine

    docs = corpus.synthetic_docs(spark, 24, seed=11).cache()
    eng = SearchEngine.from_docs(spark, docs, n_shards=2)
    # pick a mid-frequency term: df-max terms can exceed the theta=0.97
    # DF stop filter and leave no scorable term at this corpus size
    vocab = [
        r["term"]
        for r in eng.ix.term_stats.filter("df >= 3 AND df <= 12")
        .orderBy(F.desc("df"), "term")
        .limit(1)
        .collect()
    ]
    assert vocab
    resp = eng.search(vocab[0], limit=5)
    lex_ids = [h[0] for h in resp.hits]  # RESULT_SCHEMA: doc_id first
    assert lex_ids
    emb = spark.createDataFrame(
        [(i, [float(i == j) for j in range(4)], 0) for i in range(8)],
        "vec_id long, embedding array<float>, label int",
    )
    path = str(tmp_path / "ivf")
    similarity.save_ivf(emb, path, n_centroids=2, iters=0)
    store = similarity.IVFStore(spark, path)
    sem_ids = [r["vec_id"] for r in store.topk([1.0, 0.0, 0.0, 0.0], k=5).collect()]
    fused = hybrid.rrf_fuse_rows([lex_ids, sem_ids], topk=5)
    assert len(fused) >= 1
    # every fused id came from one of the two lists, scores descend
    ids = {d for d, _ in fused}
    assert ids <= set(lex_ids) | set(sem_ids)
    scores = [s for _, s in fused]
    assert scores == sorted(scores, reverse=True)


def test_rrf_fuse_rows_rounds_to_6_like_dataframe_path():
    """Cross-path determinism: the driver-side fusion must emit the
    SAME round-6 canonical scores as rrf_fuse's F.round(...,6) — raw
    doubles would order sub-1e-6 differences that the DataFrame path
    deliberately ties (then breaks by doc_id)."""
    from posik_engine_spark.operators.hybrid import rrf_fuse_rows

    out = dict(rrf_fuse_rows([[1, 2], [2, 1]], topk=2))
    # both docs: 1/61 + 1/62 = 0.03252... -> exactly 6 decimals
    assert out[1] == out[2]
    assert out[1] == round(1 / 61 + 1 / 62, 6)
    solo = dict(rrf_fuse_rows([[7]], topk=1))
    assert solo[7] == 0.016393  # 1/61 canonicalized, not 0.0163934...


# ------------------------- round-5: one-call serving API (verdict #3)


def _mk_embeddings(spark, doc_ids, dim=6):
    """Deterministic per-doc vectors KEYED BY THE ENGINE'S doc_id (the
    search_hybrid contract: embed the docs you index, same id space)."""
    import hashlib

    def vec(d):
        h = hashlib.md5(str(d).encode()).digest()
        return [((h[j] / 255.0) * 2.0 - 1.0) for j in range(dim)]

    return spark.createDataFrame(
        [(int(d), vec(d)) for d in doc_ids],
        "vec_id long, embedding array<float>",
    )


def test_ivf_topk_rows_matches_spark_path(spark, tmp_path):
    """IVFStore.topk_rows (driver-direct pyarrow probe) returns the
    IDENTICAL rows as the Spark topk() DataFrame — same probes, same
    round-6 cosine, same (cosine desc, vec_id) order — for several
    query vectors and nprobe settings, without any Spark job."""
    from posik_engine_spark.operators import similarity

    emb = _mk_embeddings(spark, range(100, 160))
    path = str(tmp_path / "ivf")
    similarity.save_ivf(emb, path, n_centroids=6, iters=1)
    store = similarity.IVFStore(spark, path)
    qvecs = [r["embedding"] for r in emb.orderBy("vec_id").limit(3).collect()]
    qvecs.append([1.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    for q in qvecs:
        for nprobe in (1, 3, 6):
            want = [
                (r["vec_id"], r["cosine"])
                for r in store.topk(q, k=7, nprobe=nprobe).collect()
            ]
            assert store.topk_rows(q, k=7, nprobe=nprobe) == want


def test_search_hybrid_matches_dataframe_path(spark, tmp_path):
    """The one-call serving API == the oracle-checked DataFrame path:
    search_hybrid (driver WAND + pyarrow IVF probe + rrf_fuse_rows)
    must order exactly like rrf_fuse(wand_topk DF, IVFStore.topk DF) —
    each serving component vs its distributed twin, fused by the same
    round-6 RRF the hybrid_rrf_topk oracle pins against DuckDB."""
    from posik_engine_spark import corpus
    from posik_engine_spark.operators import similarity, wand
    from posik_engine_spark.operators.search import SearchEngine

    docs = corpus.synthetic_docs(spark, 40, seed=17).cache()
    with SearchEngine.from_docs(spark, docs, n_shards=2) as eng:
        vocab = [
            r["term"]
            for r in eng.ix.term_stats.filter("df >= 4 AND df <= 20")
            .orderBy(F.desc("df"), "term")
            .limit(2)
            .collect()
        ]
        assert len(vocab) == 2
        query = " ".join(vocab)
        doc_ids = [r["doc_id"] for r in eng.ix.doc_stats.select("doc_id").collect()]
        emb = _mk_embeddings(spark, doc_ids)
        path = str(tmp_path / "ivf")
        similarity.save_ivf(emb, path, n_centroids=4, iters=1)
        store = similarity.IVFStore(spark, path)
        qvec = [0.3, -0.2, 0.9, 0.1, -0.5, 0.4]

        got = eng.search_hybrid(query, qvec, store, depth=15, limit=8, nprobe=2)

        terms = eng.filter_query_terms(eng._q_tokens(query))
        info = eng.ix.term_info(terms)
        idfs = {t: v[0] for t, v in info.items()}
        dfs = {t: v[1] for t, v in info.items()}
        lex_df = wand.wand_topk(eng.ix, idfs, dfs, k=15)
        sem_df = store.topk(qvec, k=15, nprobe=2)
        want = [
            (r["doc_id"], r["rrf"])
            for r in hybrid.rrf_fuse(
                lex_df, sem_df, depth=15, topk=8
            ).collect()
        ]
        assert got == want
        assert got  # non-degenerate: fusion actually returned rows


def test_search_hybrid_fully_warm_runs_zero_jobs(spark, tmp_path):
    """Warm repeat of the SAME hybrid call serves entirely from driver
    state: term dict + block/docmeta LRUs (lexical), pyarrow dataset
    (semantic) — poison every Spark-backed frame on both stores and
    the repeat must still return the identical fusion."""
    from posik_engine_spark import corpus
    from posik_engine_spark.operators import similarity
    from posik_engine_spark.operators.search import SearchEngine

    class _Boom:
        def filter(self, *a, **k):
            raise AssertionError("warm hybrid call touched a Spark frame")

    docs = corpus.synthetic_docs(spark, 24, seed=11).cache()
    with SearchEngine.from_docs(spark, docs, n_shards=2) as eng:
        vocab = [
            r["term"]
            for r in eng.ix.term_stats.filter("df >= 3 AND df <= 12")
            .orderBy(F.desc("df"), "term")
            .limit(1)
            .collect()
        ]
        doc_ids = [r["doc_id"] for r in eng.ix.doc_stats.select("doc_id").collect()]
        emb = _mk_embeddings(spark, doc_ids)
        path = str(tmp_path / "ivf")
        similarity.save_ivf(emb, path, n_centroids=3, iters=0)
        store = similarity.IVFStore(spark, path)
        qvec = [0.5, 0.5, -0.5, 0.2, 0.0, 1.0]

        first = eng.search_hybrid(vocab[0], qvec, store, depth=10, limit=5)
        assert first
        real_blocks, real_df = eng.ix.blocks, store._df
        eng.ix.blocks = _Boom()
        store._df = _Boom()
        try:
            again = eng.search_hybrid(vocab[0], qvec, store, depth=10, limit=5)
        finally:
            eng.ix.blocks, store._df = real_blocks, real_df
        assert again == first


def test_ivf_topk_rows_pads_null_cosines_like_spark(spark, tmp_path):
    """Under-filled probes (round-5 review finding): zero-norm vectors
    score NULL cosine, and Spark's desc is NULLS LAST — so when probed
    partitions hold fewer than k non-null matches, topk() pads the
    tail with (vec_id asc, cosine=NULL) rows. topk_rows must return
    the IDENTICAL rows, not drop the NULLs."""
    from posik_engine_spark.operators import similarity

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
            (2, [0.0] * 6),  # zero-norm -> NULL cosine
            (3, [0.0] * 6),
            (4, [0.9, 0.1, 0.0, 0.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "ivf")
    similarity.save_ivf(emb, path, n_centroids=1, iters=0)
    store = similarity.IVFStore(spark, path)
    q = [1.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    want = [
        (r["vec_id"], r["cosine"]) for r in store.topk(q, k=4, nprobe=1).collect()
    ]
    got = store.topk_rows(q, k=4, nprobe=1)
    assert got == want
    assert [v for v, c in got if c is None] == [2, 3]  # padded tail, id asc
    # k small enough that non-null rows fill it: no padding appears
    assert store.topk_rows(q, k=2, nprobe=1) == want[:2]
    # zero-norm QUERY vector: every cosine NULL, both paths agree
    qz = [0.0] * 6
    wantz = [
        (r["vec_id"], r["cosine"]) for r in store.topk(qz, k=3, nprobe=1).collect()
    ]
    assert store.topk_rows(qz, k=3, nprobe=1) == wantz == [(1, None), (2, None), (3, None)]


def test_search_hybrid_repo_scope_filters_both_lists(spark, tmp_path):
    """repo= scopes BOTH fusion inputs (round-5 review finding): a
    semantic candidate from another repo must never reach the fused
    ranking. The scoped semantic list is the over-fetched global top-k
    filtered to the scope with COMPACTED ranks — symmetric with the
    lexical side, whose ranks also count only in-scope docs."""
    from posik_engine_spark import corpus, spec
    from posik_engine_spark.operators import similarity
    from posik_engine_spark.operators.search import SearchEngine

    docs = corpus.synthetic_docs(spark, 40, seed=17).cache()
    with SearchEngine.from_docs(spark, docs, n_shards=2) as eng:
        meta = eng.ix.doc_stats.select("doc_id", "repo").collect()
        scope = "repo-00"
        in_scope = {int(r["doc_id"]) for r in meta if r["repo"] == scope}
        assert in_scope and len(in_scope) < len(meta)
        emb = _mk_embeddings(spark, [int(r["doc_id"]) for r in meta])
        path = str(tmp_path / "ivf")
        similarity.save_ivf(emb, path, n_centroids=4, iters=1)
        store = similarity.IVFStore(spark, path)
        qvec = [0.3, -0.2, 0.9, 0.1, -0.5, 0.4]
        depth = 10
        # precondition: the UNSCOPED semantic top-depth must contain an
        # out-of-scope doc, or this test cannot observe a leak
        unscoped = [v for v, _ in store.topk_rows(qvec, depth, nprobe=4)]
        assert any(v not in in_scope for v in unscoped)
        vocab = [
            r["term"]
            for r in eng.ix.term_stats.filter("df >= 4 AND df <= 25")
            .orderBy(F.desc("df"), "term")
            .limit(1)
            .collect()
        ]
        got = eng.search_hybrid(
            vocab[0], qvec, store, depth=depth, limit=20, nprobe=4, repo=scope
        )
        assert got and all(d in in_scope for d, _ in got)
        # and the ranking equals the manual fusion of the two scoped lists
        terms = eng.filter_query_terms(eng._q_tokens(vocab[0]))
        lex_ids = [int(h["doc_id"]) for h in eng._topk(terms, depth, [scope])]
        cand = [
            int(v)
            for v, _ in store.topk_rows(
                qvec, spec.HYBRID_SCOPE_OVERFETCH * depth, nprobe=4
            )
        ]
        sem_ids = [v for v in cand if v in in_scope][:depth]
        assert got == hybrid.rrf_fuse_rows([lex_ids, sem_ids], topk=20)
