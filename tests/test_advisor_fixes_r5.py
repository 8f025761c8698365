"""Round-5 advisor finding (ADVICE.md r4, lifecycle.py): a hard-killed
indexing process never overwrites its RUNNING `_latest.json` pointer,
so build_status reported INDEXING forever. The fix is a liveness
heartbeat: an in-flight _Stage refreshes `_lineage/_heartbeat` from a
daemon thread, and build_status believes a RUNNING pointer only while
the writer showed life within lifecycle.LIVENESS_WINDOW — a dead
writer's dir falls back to its newest FINISHED lineage record.

The other r4 advisor items are pinned elsewhere: the WAND keep-ties cap
and loud distributed ord-resolution in tests/test_direct_io.py, the
tombstone-log mergeSchema read in tests/test_streaming.py, and the
'+exact' recall trade-off is documented in functions/stemmer.py.
"""

from __future__ import annotations

import json
import os
import time

from posik_engine_spark.operators import lifecycle


def _failed_then_running(out: str) -> None:
    """Dir state: one FAILED attempt on record, then a RUNNING pointer
    (a retry started) — the shape the advisor finding is about."""
    os.makedirs(out, exist_ok=True)
    t0 = time.time() - 5
    lifecycle._lineage_write(out, {
        "stage": "prepare", "partition_ids": None, "state": "FAILED",
        "started_at": t0, "finished_at": t0 + 1, "attempt_ts": t0,
        "error": "boom", "counters": {},
    })
    os.makedirs(os.path.join(out, "_markers"), exist_ok=True)
    with open(os.path.join(out, "_build_plan.json"), "w") as f:
        json.dump({"n_shards": 2, "shard_batches": 1, "n_batches": 1,
                   "stemmer": None}, f)
    lifecycle._pointer_update(out, {
        "stage": "prepare", "partition_ids": None, "state": "RUNNING",
        "started_at": t0 + 2, "finished_at": t0 + 2, "attempt_ts": t0 + 2,
        "error": None, "counters": {},
    })


def _age(path: str, by: float) -> None:
    old = time.time() - by
    os.utime(path, (old, old))


def test_dead_writer_running_pointer_falls_back_to_failed(tmp_path):
    out = str(tmp_path / "ix")
    _failed_then_running(out)
    # fresh pointer mtime = live legacy writer -> INDEXING (unchanged)
    assert lifecycle.build_status(out)["status"] == "INDEXING"
    # writer dies: no heartbeat file, pointer mtime ages past the
    # liveness window -> the newest FINISHED record (FAILED) surfaces
    _age(os.path.join(out, "_lineage", "_latest.json"),
         lifecycle.LIVENESS_WINDOW + 5)
    st = lifecycle.build_status(out)
    assert st["status"] == "FAILED" and st["error"] == "boom"


def test_fresh_heartbeat_keeps_indexing_despite_old_pointer(tmp_path):
    """A long-running stage rewrites the heartbeat, not the pointer:
    an old pointer with a fresh heartbeat is a LIVE writer."""
    out = str(tmp_path / "ix")
    _failed_then_running(out)
    _age(os.path.join(out, "_lineage", "_latest.json"),
         lifecycle.LIVENESS_WINDOW + 5)
    lifecycle._beat(out)  # what the stage's daemon thread does
    assert lifecycle.build_status(out)["status"] == "INDEXING"
    # ...and a stale heartbeat beside the stale pointer is a dead one
    _age(lifecycle._heartbeat_path(out), lifecycle.LIVENESS_WINDOW + 5)
    assert lifecycle.build_status(out)["status"] == "FAILED"


def test_stage_heartbeats_and_hard_kill_detected(tmp_path):
    """An in-flight _Stage proves liveness (heartbeat file written at
    enter); a simulated hard kill (thread stopped, no __exit__, files
    aged) flips the dir to the last finished state instead of
    INDEXING-forever."""
    out = str(tmp_path / "ix")
    _failed_then_running(out)
    stage = lifecycle._Stage(out, "prepare")
    stage.__enter__()
    try:
        assert os.path.exists(lifecycle._heartbeat_path(out))
        assert lifecycle.build_status(out)["status"] == "INDEXING"
    finally:
        # hard kill: beats stop, pointer never overwritten
        stage._hb_stop.set()
        stage._hb_thread.join(timeout=2.0)
    _age(lifecycle._heartbeat_path(out), lifecycle.LIVENESS_WINDOW + 5)
    _age(os.path.join(out, "_lineage", "_latest.json"),
         lifecycle.LIVENESS_WINDOW + 5)
    st = lifecycle.build_status(out)
    assert st["status"] == "FAILED" and st["error"] == "boom"


def test_clean_exit_supersedes_and_status_time_from_fallback(tmp_path):
    """A stage that finishes normally still supersedes everything, and
    the dead-writer fallback reports the finished record's time."""
    out = str(tmp_path / "ix")
    _failed_then_running(out)
    with lifecycle._Stage(out, "prepare"):
        pass
    st = lifecycle.build_status(out)
    assert st["status"] != "FAILED"
    # new RUNNING pointer from a writer that then dies: falls back to
    # the DONE record (newest finished), not the older FAILED one
    lifecycle._pointer_update(out, {
        "stage": "stats", "partition_ids": None, "state": "RUNNING",
        "started_at": time.time(), "finished_at": time.time(),
        "attempt_ts": time.time(), "error": None, "counters": {},
    })
    _age(lifecycle._heartbeat_path(out), lifecycle.LIVENESS_WINDOW + 5)
    _age(os.path.join(out, "_lineage", "_latest.json"),
         lifecycle.LIVENESS_WINDOW + 5)
    st = lifecycle.build_status(out)
    assert st["status"] != "FAILED" and st["error"] is None
