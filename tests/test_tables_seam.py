"""Table-sink seam (round-2 VERDICT item 5): the index lifecycle's
writes, staged-partition commits, and reads all flow through
tables.TableBackend — proven by injecting a recording/faulting backend
and driving build + incremental + crash replay through it."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from posik_engine_spark import corpus
from posik_engine_spark.operators.lifecycle import IndexBuilder
from posik_engine_spark.tables import ParquetBackend


class RecordingBackend(ParquetBackend):
    """ParquetBackend that records every seam call and can inject a
    crash into one promote (simulating a mid-commit failure of the
    storage layer)."""

    def __init__(self):
        self.calls: list[tuple[str, str]] = []
        self.fail_promote_of: str | None = None

    def write(self, df, path, **kw):
        self.calls.append(("write", os.path.basename(path)))
        return super().write(df, path, **kw)

    def stage_partitions(self, df, staging_path, partition_col, partition_ids, sort_cols=None):
        self.calls.append(("stage", os.path.basename(staging_path)))
        return super().stage_partitions(
            df, staging_path, partition_col, partition_ids, sort_cols
        )

    def promote_partitions(self, final_path, staging_path, partition_col, partition_ids, staged_ids):
        name = os.path.basename(final_path)
        self.calls.append(("promote", name))
        if self.fail_promote_of == name:
            self.fail_promote_of = None
            raise RuntimeError("injected promote crash")
        return super().promote_partitions(
            final_path, staging_path, partition_col, partition_ids, staged_ids
        )

    def replace_table(self, final_path, staging_path):
        self.calls.append(("replace_table", os.path.basename(final_path)))
        return super().replace_table(final_path, staging_path)


def _with_marker(docs, marker: str):
    return docs.withColumn("content", F.concat(F.col("content"), F.lit(marker)))


def test_lifecycle_staged_commit_flows_through_seam(spark, tmp_path):
    docs = corpus.synthetic_docs(spark, 40, seed=61).cache()
    be = RecordingBackend()
    b = IndexBuilder(spark, str(tmp_path / "ix"), n_shards=4, backend=be)
    b.build(docs)

    kinds = set(be.calls)
    # initial build: full-table writes for tf/doc_stats/term_stats,
    # staged+promoted blocks batches
    assert ("write", "tf") in kinds and ("write", "doc_stats") in kinds
    assert ("write", "term_stats") in kinds
    assert ("stage", "blocks.staging_0000") in kinds
    assert ("promote", "blocks") in kinds

    # incremental: EVERY staging op precedes EVERY commit op (phase 1
    # never touches the live tables), term_stats swaps whole-table,
    # the three sharded tables promote
    be.calls.clear()
    b.incremental_update(_with_marker(docs, " seamword"))
    seq = be.calls
    stage_idx = [
        i for i, (k, n) in enumerate(seq)
        if k == "stage" or (k == "write" and n.endswith(".staging"))
    ]
    commit_idx = [
        i for i, (k, _) in enumerate(seq) if k in ("promote", "replace_table")
    ]
    assert stage_idx and commit_idx
    assert max(stage_idx) < min(commit_idx), seq
    assert ("replace_table", "term_stats") in set(seq)
    assert {n for k, n in seq if k == "promote"} == {"tf", "doc_stats", "blocks"}


def test_seam_crash_mid_promote_replays_to_consistency(spark, tmp_path):
    """A storage-layer crash between promotes leaves the intent pending;
    load() replays the commit THROUGH THE SEAM and the final index
    equals a clean full rebuild (already-promoted partitions are
    skipped idempotently)."""
    docs = corpus.synthetic_docs(spark, 40, seed=67).cache()
    be = RecordingBackend()
    b = IndexBuilder(spark, str(tmp_path / "ix"), n_shards=4, backend=be)
    b.build(docs)

    v2 = _with_marker(docs, " crashmark").cache()
    be.fail_promote_of = "blocks"  # tf+doc_stats promote, then crash
    with pytest.raises(RuntimeError, match="injected promote crash"):
        b.incremental_update(v2)
    assert os.path.exists(b._intent_path)

    be.calls.clear()
    ix = b.load()  # replays the pending commit
    assert not os.path.exists(b._intent_path)
    replay = set(be.calls)
    assert ("promote", "blocks") in replay
    assert ("replace_table", "term_stats") in replay

    full = IndexBuilder(spark, str(tmp_path / "full"), n_shards=4).build(v2)
    got = sorted(map(tuple, ix.blocks.collect()))
    expect = sorted(map(tuple, full.blocks.collect()))
    assert got == expect
    assert sorted(map(tuple, ix.term_stats.collect())) == sorted(
        map(tuple, full.term_stats.collect())
    )
    assert ix.meta == full.meta
