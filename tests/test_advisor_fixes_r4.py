"""Round-4 advisor findings (ADVICE.md r3): statistics snapshot memo,
build_status RUNNING supersedes FAILED, rename-aside replace_table,
invalid-limit rejection (the last one lives in test_review_fixes_r3c).
"""

from __future__ import annotations

import json
import os
import time

import pytest

from posik_engine_spark import corpus
from posik_engine_spark.operators import lifecycle
from posik_engine_spark.operators.search import SearchEngine


class _Boom:
    """Poison object: ANY attribute access fails the test."""

    def __getattr__(self, name):
        raise AssertionError(f"memoized statistics() touched .{name}")


@pytest.fixture(scope="module")
def docs(spark):
    return corpus.synthetic_docs(spark, 60, seed=31).cache()


def test_statistics_memoized_second_call_runs_no_jobs(spark, docs):
    """An in-memory engine serves one immutable snapshot: the second
    statistics() call must not touch any Spark frame (poisoned index
    tables + content source)."""
    with SearchEngine.from_docs(spark, docs, n_shards=2) as eng:
        first = eng.statistics()
        real = (eng.ix.doc_stats, eng.ix.term_stats, eng._content)
        eng.ix.doc_stats = _Boom()
        eng.ix.term_stats = _Boom()
        eng._content = _Boom()
        try:
            again = eng.statistics()
        finally:
            eng.ix.doc_stats, eng.ix.term_stats, eng._content = real
        assert again == first


def test_statistics_memo_invalidated_by_incremental(spark, docs, tmp_path):
    """Builder-dir engines key the memo on the latest lineage attempt:
    an incremental commit on the dir writes a new record, so the next
    statistics() recomputes instead of serving the stale snapshot."""
    out = str(tmp_path / "ix")
    b = lifecycle.IndexBuilder(spark, out, n_shards=2)
    b.build(docs.limit(40))
    eng = SearchEngine.from_index_dir(spark, out)
    try:
        first = eng.statistics()
        tok1 = eng._snapshot_token()
        assert eng._stats_memo is not None and eng._stats_memo[0] == tok1
        b.incremental_update(docs, partial=False)  # adds the other 20 docs
        tok2 = eng._snapshot_token()
        assert tok2 != tok1  # new lineage attempt -> memo invalid
        second = eng.statistics()
        assert eng._stats_memo[0] == tok2
        # pages reflect the engine's served snapshot; the STATUS triple
        # is live — both calls must at least have recomputed (fresh
        # memo), and the live status stays INDEXED after the commit
        assert second["total"]["isIndexing"] is False
        assert first["total"]["pages"] == 40
    finally:
        eng.close()


def test_build_status_running_supersedes_failed(tmp_path):
    """A retry actively in flight after a failed attempt must report
    INDEXING (RUNNING pointer written at stage start), not the stale
    FAILED — and an IDLE dir whose last attempt failed still reports
    FAILED (partial markers alone are not live work)."""
    out = str(tmp_path / "b")
    os.makedirs(out)
    t0 = time.time() - 5  # strictly in the past: later writes supersede
    lifecycle._lineage_write(out, {
        "stage": "prepare", "partition_ids": None, "state": "FAILED",
        "started_at": t0, "finished_at": t0 + 1, "attempt_ts": t0,
        "error": "boom", "counters": {},
    })
    # idle after failure -> FAILED, even if markers are partial
    os.makedirs(os.path.join(out, "_markers"), exist_ok=True)
    with open(os.path.join(out, "_build_plan.json"), "w") as f:
        json.dump({"n_shards": 2, "shard_batches": 1, "n_batches": 1,
                   "stemmer": None}, f)
    st = lifecycle.build_status(out)
    assert st["status"] == "FAILED" and st["error"] == "boom"
    # retry starts a stage -> RUNNING pointer -> INDEXING
    stage = lifecycle._Stage(out, "prepare")
    stage.__enter__()
    assert lifecycle.build_status(out)["status"] == "INDEXING"
    # the retry finishes cleanly -> DONE record supersedes
    stage.__exit__(None, None, None)
    assert lifecycle.build_status(out)["status"] != "FAILED"
    # a failing retry -> FAILED again
    with pytest.raises(RuntimeError):
        with lifecycle._Stage(out, "stats"):
            raise RuntimeError("again")
    assert lifecycle.build_status(out)["status"] == "FAILED"


def test_replace_table_rename_aside(tmp_path):
    """The swap must never leave a no-table window longer than a
    rename, and a crash between the two renames must be replayable."""
    from posik_engine_spark.tables import ParquetBackend

    be = ParquetBackend()
    final = str(tmp_path / "t")
    staging = final + ".staging"
    os.makedirs(final)
    open(os.path.join(final, "a.parquet"), "w").write("old")
    os.makedirs(staging)
    open(os.path.join(staging, "b.parquet"), "w").write("new")
    be.replace_table(final, staging)
    assert os.listdir(final) == ["b.parquet"]
    assert not os.path.isdir(staging) and not os.path.isdir(final + ".old")
    # replay after a crash between rename-aside and move: staging holds
    # the new table, .old holds the renamed-away old one, final is gone
    os.rename(final, final + ".old")
    os.makedirs(staging)
    open(os.path.join(staging, "c.parquet"), "w").write("newer")
    be.replace_table(final, staging)
    assert os.listdir(final) == ["c.parquet"]
    assert not os.path.isdir(final + ".old")
    # idempotent second call (staging gone) is a no-op that also
    # clears any leftover .old
    os.makedirs(final + ".old")
    be.replace_table(final, staging)
    assert os.listdir(final) == ["c.parquet"]
    assert not os.path.isdir(final + ".old")
