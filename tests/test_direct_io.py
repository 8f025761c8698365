"""Driver-direct serving reads (operators/direct_io.py — round-4
verdict item 1), the hash-bucketed term dictionary (item 4), and the
round-4 advisor hardening of the WAND tie handling:

- every direct pyarrow point read returns exactly what its pruned
  Spark plan returns (blocks, ord resolution, dictionary probes,
  content fetch);
- a COLD query on a file-backed engine serves end-to-end without
  touching ANY Spark index/content frame (the poison test — the whole
  point of the direct path is removing per-query Spark jobs);
- the dictionary probe partition-prunes to the queried terms' buckets
  and the driver-side bucket function agrees with the Spark-side one;
- the keep-ties survivor set is capped (duplicate-heavy corpora must
  not make per-shard output scale with the tie-group size);
- the distributed resolution path fails LOUDLY on a registry missing
  scored ordinals (it used to truncate silently where the driver path
  raised), and wand_topk_rows == wand_topk exactly.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from posik_engine_spark import corpus, spec
from posik_engine_spark.operators import index as I
from posik_engine_spark.operators import wand as W
from posik_engine_spark.operators.content_store import (
    ContentStore,
    save_content_store,
)
from posik_engine_spark.operators.direct_io import (
    DirectIndexReader,
    available,
    term_bucket,
)
from posik_engine_spark.operators.search import SearchEngine

QUERIES = ["varint merge", "spark", "merge sort stream", "qzzqx varint"]


@pytest.fixture(scope="module")
def docs(spark):
    return corpus.synthetic_docs(spark, 140, seed=31).cache()


@pytest.fixture(scope="module")
def ixdir(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("direct_ix"))
    I.save_index(I.build_index(docs, n_shards=4, cache=False), d)
    return d


@pytest.fixture(scope="module")
def contentdir(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("direct_cs"))
    save_content_store(docs, d, n_buckets=8)
    return d


# --------------------------------------------------- direct == Spark


def test_available_detects_index_dirs(ixdir, tmp_path):
    assert available(ixdir)
    assert not available(str(tmp_path))
    assert not available(None)


def test_blocks_direct_match_spark(spark, ixdir):
    ix = I.load_index(spark, ixdir)
    rd = DirectIndexReader(ixdir)
    terms = ["varint", "merge", "qzzqx-not-a-term"]

    def key(r):
        return (r["term"], int(r["shard"]), int(r["block_id"]))

    got = {key(r): r for r in rd.blocks_for_terms(terms)}
    want = {
        key(r): r.asDict()
        for r in ix.blocks.filter(F.col("term").isin(terms)).collect()
    }
    assert set(got) == set(want) and got
    for k, g in got.items():
        w = want[k]
        assert set(g) == set(w)
        for c in g:
            gv, wv = g[c], w[c]
            if isinstance(gv, (bytes, bytearray)) or isinstance(
                wv, (bytes, bytearray)
            ):
                assert bytes(gv) == bytes(wv), (k, c)
            else:
                assert gv == wv, (k, c)


def test_resolve_ords_direct_matches_spark(spark, ixdir):
    ix = I.load_index(spark, ixdir)
    rd = DirectIndexReader(ixdir)
    keys = [
        (int(r["shard"]), int(r["ord"]))
        for r in ix.doc_stats.select("shard", "ord").limit(17).collect()
    ]
    assert keys
    got = rd.resolve_ords(keys)
    want = W._resolve_ords_spark(ix, keys)
    assert got == want and set(got) == set(keys)
    assert rd.resolve_ords([]) == {}
    # absent keys simply don't resolve (the caller raises, same as the
    # Spark path's contract)
    assert rd.resolve_ords([(0, 10**9)]) == {}


def test_term_info_direct_matches_spark(spark, ixdir):
    ix = I.load_index(spark, ixdir)
    rd = DirectIndexReader(ixdir)
    vocab = [r["term"] for r in ix.term_stats.limit(12).collect()]
    probe = vocab + ["qzzqx-not-a-term"]
    got = {r["term"]: (int(r["df"]), int(r["ctf"])) for r in rd.term_info_rows(probe)}
    want = {t: (df, ctf) for t, (_idf, df, ctf) in ix.term_info(probe).items()}
    assert got == want and set(got) == set(vocab)


def test_content_store_direct_matches_spark(spark, contentdir):
    direct = ContentStore(spark, contentdir)
    via_spark = ContentStore(spark, contentdir, direct=False)
    assert direct._direct is not None and via_spark._direct is None
    ids = [r["doc_id"] for r in direct._df.select("doc_id").limit(9).collect()]
    a, b = direct.fetch(ids), via_spark.fetch(ids)
    assert set(a) == set(b) == set(ids)
    for i in ids:
        assert a[i].asDict() == b[i].asDict()


# ------------------------------------------------- bucketed dictionary


def test_term_bucket_driver_matches_spark(spark, ixdir):
    ix = I.load_index(spark, ixdir)
    rows = (
        I.with_term_bucket(ix.term_stats.select("term"), spec.TERM_STATS_BUCKETS)
        .select("term", "tbucket")
        .collect()
    )
    assert rows
    for r in rows:
        assert term_bucket(r["term"], spec.TERM_STATS_BUCKETS) == int(
            r["tbucket"]
        ), r["term"]


def test_dictionary_probe_prunes_to_buckets(spark, ixdir):
    """A dictionary probe must partition-prune on tbucket (hive) and
    push the term filter into the files — verdict item 4's 'probe reads
    one bucket' claim, pinned in the physical plan."""
    ix = I.load_index(spark, ixdir)
    terms = ["varint", "merge"]
    n = ix.term_buckets or spec.TERM_STATS_BUCKETS
    cond = F.col("tbucket").isin([term_bucket(t, n) for t in terms]) & F.col(
        "term"
    ).isin(terms)
    plan = (
        ix.term_stats.filter(cond)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    part = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "tbucket" in part, plan
    assert "In(term" in plan.split("PushedFilters:")[1], plan


def test_bucketed_write_is_not_single_file(ixdir):
    import glob
    import os

    bdirs = glob.glob(os.path.join(ixdir, "term_stats", "tbucket=*"))
    assert len(bdirs) > 1  # the vocabulary write no longer funnels


# ------------------------------------------- cold query without Spark


class _Boom:
    def __getattr__(self, name):
        raise AssertionError(f"direct-path query touched a Spark frame (.{name})")


def test_cold_query_runs_no_spark_frame_access(spark, docs, ixdir, contentdir, monkeypatch):
    """File-backed engine + direct IO: a COLD query (nothing cached)
    serves entirely from the driver-direct pyarrow reads — poison every
    Spark frame the old path touched and search must still work,
    returning exactly what a Spark-path engine returns."""
    # force the big-vocab path so the dictionary probe itself is cold
    monkeypatch.setattr(spec, "DRIVER_DICT_MAX_TERMS", 0)
    ref = SearchEngine.from_index_dir(
        spark, ixdir, content_dir=contentdir
    )
    ref._direct = None  # Spark path end-to-end
    ref._store._direct = None
    eng = SearchEngine.from_index_dir(spark, ixdir, content_dir=contentdir)
    assert eng._direct is not None and eng._store._direct is not None
    n = ref.ix.meta.n_docs
    vocab = [
        r["term"]
        for r in ref.ix.term_stats.filter(
            (F.col("df") >= 3) & (F.col("df") <= n // 2)
            & ~F.col("term").isin(sorted(spec.STOP_TOKENS))
        )
        .orderBy(F.desc("ctf"), "term")
        .limit(8)
        .collect()
    ]
    queries = [f"{vocab[0]} {vocab[3]}", vocab[1], f"{vocab[2]} {vocab[5]} {vocab[7]}"]
    real = (eng.ix.blocks, eng.ix.doc_stats, eng.ix.term_stats, eng._store._df)
    eng.ix.blocks = eng.ix.doc_stats = eng.ix.term_stats = _Boom()
    eng._store._df = _Boom()
    try:
        for q in queries:
            got = eng.search(q, limit=10)
            want = ref.search(q, limit=10)
            assert [tuple(h) for h in got.hits] == [tuple(h) for h in want.hits], q
    finally:
        eng.ix.blocks, eng.ix.doc_stats, eng.ix.term_stats, eng._store._df = real
        eng.close()
        ref.close()


def test_direct_io_off_still_works(spark, ixdir, contentdir):
    eng = SearchEngine.from_index_dir(
        spark, ixdir, content_dir=contentdir, direct_io=False
    )
    try:
        assert eng._direct is None
        assert [tuple(h) for h in eng.search("varint merge", limit=5).hits]
    finally:
        eng.close()


# ------------------------------------------------------- keep-ties cap


def _dup_pdf() -> pd.DataFrame:
    """60 docs sharing ONE content body (one shard) + 5 fillers keeping
    'alpha' under the theta DF filter: every match ties exactly — the
    advisor's duplicate-heavy corpus."""
    body = "alpha beta gamma delta " * 8
    n, extra = 60, 5
    return pd.DataFrame(
        {
            "repo": ["r0"] * (n + extra),
            "path": [f"src/d{i:03d}.txt" for i in range(n + extra)],
            "commit": ["c0"] * (n + extra),
            "lang": ["text"] * (n + extra),
            "content": [body] * n + ["omega psi chi " * 8] * extra,
        }
    )


@pytest.fixture(scope="module")
def dup_ix(spark):
    return I.build_index(spark.createDataFrame(_dup_pdf()), n_shards=1, cache=False)


def test_tie_cap_bounds_survivors(spark, dup_ix, monkeypatch):
    monkeypatch.setattr(spec, "WAND_TIE_CAP_FACTOR", 3)
    ix = dup_ix
    blocks = pd.DataFrame([r.asDict() for r in ix.blocks.collect()])
    info = ix.term_info(["alpha"])
    diag: dict = {}
    out = W.shard_topk(
        blocks[blocks["term"] == "alpha"],
        None,
        ["alpha"],
        {"alpha": info["alpha"][0]},
        ix.meta.avgdl,
        k=5,
        diag=diag,
    )
    # 60 exact ties, capped at WAND_TIE_CAP_FACTOR * k = 15
    assert len(out) == 15
    assert diag.get("tie_overflow", 0) == 1
    # deterministic truncation: ordinals ascend within the tied score
    assert list(out["ord"]) == sorted(out["ord"])


def test_tie_cap_search_still_exact_above_boundary(spark, dup_ix, monkeypatch):
    """With the cap forced tiny, a search still returns `limit` hits
    and each returned doc carries the (identical) tied score."""
    monkeypatch.setattr(spec, "WAND_TIE_CAP_FACTOR", 1)
    eng = SearchEngine(
        spark, dup_ix, spark.createDataFrame(_dup_pdf()),
        optimize_for_queries=False,
    )
    try:
        resp = eng.search("alpha", limit=5)
        assert len(resp.hits) == 5
        # hits are RESULT_SCHEMA tuples; score is the last column
        scores = [h[-1] for h in resp.hits]
        assert scores == [pytest.approx(scores[0])] * 5  # all tied
    finally:
        eng.close()


# -------------------------------------- loud distributed resolution


def test_wand_topk_rows_matches_wand_topk(spark, docs):
    ix = I.build_index(docs, n_shards=4, cache=False)
    info = ix.term_info(["varint", "merge"])
    idfs = {t: v[0] for t, v in info.items()}
    dfs = {t: v[1] for t, v in info.items()}
    want = [
        (int(r["doc_id"]), r["score"])
        for r in W.wand_topk(ix, idfs, dfs, k=10).collect()
    ]
    got = [(int(r["doc_id"]), r["score"]) for r in W.wand_topk_rows(ix, idfs, dfs, k=10)]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-12)


def test_distributed_resolution_fails_loud_on_stale_registry(spark, docs):
    """Drop ONE scored ordinal from doc_stats: the distributed path
    must raise (it used to silently truncate the top-k) — round-4
    advisor item."""
    ix = I.build_index(docs, n_shards=4, cache=False)
    info = ix.term_info(["varint", "merge"])
    idfs = {t: v[0] for t, v in info.items()}
    dfs = {t: v[1] for t, v in info.items()}
    top = W.wand_topk(ix, idfs, dfs, k=10).collect()
    assert top
    # find the (shard, ord) of the best hit and remove it from the registry
    best = int(top[0]["doc_id"])
    row = ix.doc_stats.filter(F.col("doc_id") == best).select("shard", "ord").first()
    stale = I.Index(
        blocks=ix.blocks,
        doc_stats=ix.doc_stats.filter(
            ~((F.col("shard") == row["shard"]) & (F.col("ord") == row["ord"]))
        ),
        term_stats=ix.term_stats,
        meta=ix.meta,
    )
    with pytest.raises(Exception, match="corrupt or stale"):
        W.wand_topk(stale, idfs, dfs, k=10).collect()
    with pytest.raises(Exception, match="corrupt or stale"):
        W.wand_topk_rows(stale, idfs, dfs, k=10)


def test_resolve_switches_to_join_past_isin_threshold(spark, docs, monkeypatch):
    """Past RESOLVE_ISIN_MAX_KEYS the resolver uses a broadcast join
    instead of a giant IN literal — same answer either way."""
    ix = I.build_index(docs, n_shards=4, cache=False)
    keys = [
        (int(r["shard"]), int(r["ord"]))
        for r in ix.doc_stats.select("shard", "ord").limit(40).collect()
    ]
    via_isin = W._resolve_ords_spark(ix, keys)
    monkeypatch.setattr(spec, "RESOLVE_ISIN_MAX_KEYS", 10)
    via_join = W._resolve_ords_spark(ix, keys)
    assert via_isin == via_join and set(via_join) == set(keys)


def test_tie_overflow_propagates_to_driver_diag(spark, dup_ix, monkeypatch):
    """wand_topk_driver must surface the per-shard tie_overflow counter
    in its merged diag (round-5 review finding): monitoring reads ONLY
    the merged diag, and a silent truncation of boundary ties is
    exactly the event it exists to observe."""
    monkeypatch.setattr(spec, "WAND_TIE_CAP_FACTOR", 3)
    info = dup_ix.term_info(["alpha"])
    diag: dict = {}
    W.wand_topk_driver(
        dup_ix,
        {"alpha": info["alpha"][0]},
        {"alpha": info["alpha"][1]},
        k=5,
        diag=diag,
    )
    assert diag.get("tie_overflow", 0) >= 1


def test_repos_for_ids_matches_fetch_on_both_paths(spark, contentdir):
    """The slim (doc_id, repo) point read agrees with fetch()'s repo
    column on the pyarrow-direct path AND the Spark fallback, including
    absent ids (simply not returned, like fetch)."""
    direct = ContentStore(spark, contentdir)
    via_spark = ContentStore(spark, contentdir, direct=False)
    ids = [r["doc_id"] for r in direct._df.select("doc_id").limit(7).collect()]
    probe = ids + [999_999_999_001]  # absent id
    want = {i: r["repo"] for i, r in direct.fetch(ids).items()}
    assert direct.repos_for_ids(probe) == want
    assert via_spark.repos_for_ids(probe) == want
    assert direct.repos_for_ids([]) == {}
