"""M4: checkpoint/resume, lineage+counters, incremental reindex, GC
(FIXTURES.md F5 resume/skew fixtures; SURVEY.md §5 rebuild plan #3/#4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from posik_engine_spark import corpus
from posik_engine_spark.operators import lifecycle
from posik_engine_spark.operators.lifecycle import (
    BuildAborted,
    IndexBuilder,
    read_lineage,
)

N_DOCS = 250


def _blocks_fingerprint(ix):
    rows = ix.blocks.select(
        "term", "shard", "block_id", "n_docs", "ord_min", "ord_max",
        "max_tfp", "max_tfc", "min_lenp", "min_lenc",
        F.hex(F.col("docs")).alias("d"),
        F.hex(F.col("tfp")).alias("p"),
        F.hex(F.col("tfc")).alias("c"),
    ).collect()
    return sorted(map(tuple, rows))


def _stats_fingerprint(ix):
    return (
        sorted(map(tuple, ix.term_stats.collect())),
        sorted(map(tuple, ix.doc_stats.collect())),
        ix.meta,
    )


@pytest.fixture(scope="module")
def docs_df(spark):
    return corpus.synthetic_docs(spark, N_DOCS, seed=13).cache()


def test_resume_after_crash_is_identical(spark, docs_df, tmp_path_factory):
    single = IndexBuilder(spark, str(tmp_path_factory.mktemp("single")), n_shards=8)
    ix_single = single.build(docs_df)

    batched_dir = str(tmp_path_factory.mktemp("batched"))
    batched = IndexBuilder(spark, batched_dir, n_shards=8, shard_batches=4)
    with pytest.raises(BuildAborted):
        batched.build(docs_df, fail_after_batch=1)  # dies after 2 of 4 batches
    lineage = read_lineage(batched_dir)
    assert sum(r["stage"].startswith("blocks_batch") for r in lineage) == 2

    ix_resumed = batched.build(docs_df)  # resume run
    lineage = read_lineage(batched_dir)
    # prepare/stats not redone: exactly one DONE record each
    assert sum(r["stage"] == "prepare" for r in lineage) == 1
    assert sum(r["stage"] == "stats" for r in lineage) == 1
    assert _blocks_fingerprint(ix_resumed) == _blocks_fingerprint(ix_single)
    assert _stats_fingerprint(ix_resumed) == _stats_fingerprint(ix_single)


def test_counters_and_lineage(spark, docs_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("counters"))
    b = IndexBuilder(spark, d, n_shards=4, shard_batches=2)
    ix = b.build(docs_df)
    c = b.counters()
    assert c["docs_tokenized"] == ix.meta.n_docs
    assert c["postings_emitted"] == ix.blocks.agg(F.sum("n_docs")).collect()[0][0]
    assert c["blocks_merged"] == ix.blocks.count()
    for rec in read_lineage(d):
        assert rec["state"] == "DONE"
        assert rec["finished_at"] >= rec["started_at"]


def test_incremental_equals_full_rebuild(spark, docs_df, tmp_path_factory):
    base = IndexBuilder(spark, str(tmp_path_factory.mktemp("base")), n_shards=8)
    base.build(docs_df)

    # snapshot v2: drop ~10% of docs, change ~10%, add new ones
    changed = (
        docs_df.filter(F.pmod(F.xxhash64("path"), F.lit(10)) == 0)
        .withColumn("content", F.concat(F.col("content"), F.lit("\nhotfix patch 99")))
        .withColumn("commit", F.lit("deadbeef"))
    )
    kept = docs_df.filter(F.pmod(F.xxhash64("path"), F.lit(10)) >= 2)
    added = corpus.synthetic_docs(spark, 30, seed=99).withColumn(
        "path", F.concat(F.lit("newdir/"), F.col("path"))
    )
    snapshot = kept.unionByName(changed).unionByName(added).cache()

    ix_inc = base.incremental_update(snapshot)
    full = IndexBuilder(spark, str(tmp_path_factory.mktemp("full")), n_shards=8)
    ix_full = full.build(snapshot)

    assert _blocks_fingerprint(ix_inc) == _blocks_fingerprint(ix_full)
    assert _stats_fingerprint(ix_inc) == _stats_fingerprint(ix_full)
    inc_rec = [r for r in read_lineage(base.out_dir) if r["stage"].startswith("incremental")]
    assert inc_rec and inc_rec[-1]["counters"]["docs_deleted"] > 0
    # incremental must NOT re-tokenize unchanged docs
    assert inc_rec[-1]["counters"]["docs_tokenized"] < ix_full.meta.n_docs / 2


def test_noop_incremental(spark, docs_df, tmp_path_factory):
    b = IndexBuilder(spark, str(tmp_path_factory.mktemp("noop")), n_shards=4)
    ix1 = b.build(docs_df)
    fp1 = _blocks_fingerprint(ix1)
    ix2 = b.incremental_update(docs_df)  # same snapshot -> no work
    assert _blocks_fingerprint(ix2) == fp1


def test_hot_term_spreads_over_shards(spark, docs_df, tmp_path_factory):
    """Skew fixture: 'def' sits in ~90% of docs; the doc-sharded layout
    must spread its postings across every shard (no single reducer gets
    the whole hot posting list — SURVEY.md §2 B9)."""
    b = IndexBuilder(spark, str(tmp_path_factory.mktemp("skew")), n_shards=8)
    ix = b.build(docs_df)
    per_shard = {
        r["shard"]: r["n"]
        for r in ix.blocks.filter("term = 'def'")
        .groupBy("shard")
        .agg(F.sum("n_docs").alias("n"))
        .collect()
    }
    assert len(per_shard) == 8
    total = sum(per_shard.values())
    assert max(per_shard.values()) < 0.5 * total


def test_partial_incremental_preserves_other_docs(spark, tmp_path):
    """--filter'ed snapshot (partial=True): docs outside the snapshot
    must survive (reference single-page reindex skips deleted-page GC,
    IndexingMonitor.java:53-57)."""
    docs = corpus.synthetic_docs(spark, 60, seed=11).cache()
    out = str(tmp_path / "ix")
    b = IndexBuilder(spark, out, n_shards=4)
    b.build(docs)
    n0 = b.load().meta.n_docs

    one = docs.limit(1).select("repo", "path", "lang", "content").withColumn(
        "commit", F.lit("fffffff0")
    ).select("repo", "path", "commit", "lang", "content")
    ix = b.incremental_update(one, partial=True)
    # one NEW commit of an existing path added; nothing deleted except
    # nothing (old commit of same path differs by commit -> stays too,
    # since partial stale matching is by (repo,path) + differing DOC_KEY
    # ... the old commit row has different commit so it IS stale)
    assert ix.meta.n_docs == n0  # old version replaced by new, rest kept


def test_incremental_commit_crash_replay(spark, tmp_path, monkeypatch):
    """Kill the commit between table moves -> recover_incremental
    replays to a state identical to an uninterrupted update."""
    import json as _json
    import os as _os
    import shutil as _shutil

    import pytest as _pytest

    docs_v1 = corpus.synthetic_docs(spark, 50, seed=21).cache()
    snap_v2 = docs_v1.withColumn(
        "content",
        F.when(F.col("path").contains("mod_3"), F.concat(F.col("content"), F.lit("\nchanged token")))
        .otherwise(F.col("content")),
    ).cache()

    out_a = str(tmp_path / "a")
    ba = lifecycle.IndexBuilder(spark, out_a, n_shards=4)
    ba.build(docs_v1)

    orig = lifecycle.IndexBuilder._finish_incremental_commit
    state = {"crashed": False}

    def crashing(self):
        if not state["crashed"]:
            state["crashed"] = True
            with open(self._intent_path) as f:
                intent = _json.load(f)
            staging = self._staging("tf")
            staged = set(intent["staged"]["tf"])
            for s in intent["affected"]:
                src = _os.path.join(staging, f"shard={s}")
                dst = _os.path.join(self.tf_path, f"shard={s}")
                if s in staged and _os.path.isdir(src):
                    _shutil.rmtree(dst, ignore_errors=True)
                    _shutil.move(src, dst)
            raise RuntimeError("injected crash mid-commit")
        return orig(self)

    monkeypatch.setattr(lifecycle.IndexBuilder, "_finish_incremental_commit", crashing)
    with _pytest.raises(RuntimeError, match="injected crash"):
        ba.incremental_update(snap_v2)
    monkeypatch.setattr(lifecycle.IndexBuilder, "_finish_incremental_commit", orig)
    assert ba.recover_incremental()
    ix_a = ba.load()

    # ground truth: clean full rebuild of v2
    out_b = str(tmp_path / "b")
    bb = lifecycle.IndexBuilder(spark, out_b, n_shards=4)
    ix_b = bb.build(snap_v2)

    rows_a = sorted(map(tuple, ix_a.blocks.collect()))
    rows_b = sorted(map(tuple, ix_b.blocks.collect()))
    assert rows_a == rows_b
    assert ix_a.meta.n_docs == ix_b.meta.n_docs


def test_doc_stats_files_are_repo_sorted(spark, docs_df, tmp_path_factory):
    """Physical-layout contract behind the incremental repo pruning:
    every doc_stats parquet file is sorted by (repo, path), so a pushed
    ``repo IN (...)`` predicate prunes row groups instead of scanning
    the whole registry (full build AND incrementally staged shards)."""
    import glob
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("layout"))
    b = IndexBuilder(spark, d, n_shards=4)
    b.build(docs_df)
    b.incremental_update(
        docs_df.limit(5)
        .withColumn("commit", F.lit("feedc0de"))
        .select("repo", "path", "commit", "lang", "content"),
        partial=True,
    )

    files = glob.glob(os.path.join(d, "doc_stats", "shard=*", "*.parquet"))
    assert files
    for f in files:
        t = pq.read_table(f, columns=["repo", "path"])
        keys = list(zip(t["repo"].to_pylist(), t["path"].to_pylist()))
        assert keys == sorted(keys), f

    # the dictionary is hash-bucketed (tbucket hive partition) and
    # term-sorted WITHIN each bucket for the big-vocab probe path
    ts_files = glob.glob(os.path.join(d, "term_stats", "tbucket=*", "*.parquet"))
    assert ts_files
    for f in ts_files:
        terms = pq.read_table(f, columns=["term"])["term"].to_pylist()
        assert terms == sorted(terms), f

    # and the predicate the pruned joins push actually reaches parquet
    ds = spark.read.parquet(os.path.join(d, "doc_stats"))
    plan = (
        ds.filter(F.col("repo").isin(["repo-00", "repo-01"]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "In(repo" in plan.split("PushedFilters:")[1], plan


def test_repo_prune_fallback_equals_full(spark, docs_df, tmp_path_factory, monkeypatch):
    """Batches touching more distinct repos than INCR_REPO_PRUNE_MAX
    take the unpruned path — result-identical to the pruned one (and to
    a clean full rebuild)."""
    from posik_engine_spark import spec as _spec

    snapshot = docs_df.withColumn(
        "content",
        F.when(
            F.pmod(F.xxhash64("path"), F.lit(7)) == 0,
            F.concat(F.col("content"), F.lit("\npatched fallback")),
        ).otherwise(F.col("content")),
    ).cache()

    monkeypatch.setattr(_spec, "INCR_REPO_PRUNE_MAX", 0)  # force fallback
    base = IndexBuilder(spark, str(tmp_path_factory.mktemp("fb_base")), n_shards=4)
    base.build(docs_df)
    ix_inc = base.incremental_update(snapshot)

    full = IndexBuilder(spark, str(tmp_path_factory.mktemp("fb_full")), n_shards=4)
    ix_full = full.build(snapshot)
    assert _blocks_fingerprint(ix_inc) == _blocks_fingerprint(ix_full)
    assert _stats_fingerprint(ix_inc) == _stats_fingerprint(ix_full)
