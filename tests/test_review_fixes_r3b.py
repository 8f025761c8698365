"""Regression tests for the round-3 self-review findings:

1. a page truncated mid-`<body` tag (no '>') falls back to
   whole-document text instead of silently yielding an empty body,
2. `cosine_py` mirrors Spark's non-ANSI x/0 -> NULL on zero-norm
   vectors (None, never ZeroDivisionError) and `_probe_cids` sorts
   NULL cosines last (desc-nulls-last) instead of crashing,
3. the no-op early return of `incremental_update` (streaming replay of
   an already-indexed batch) releases every DataFrame it cached,
4. `_lineage/_latest.json` keeps `build_status` O(1) as lineage grows,
   `read_lineage` never surfaces the pointer as a record, and legacy
   dirs without the pointer still resolve the chronologically-latest
   record via the scan fallback.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from posik_engine_spark import corpus
from posik_engine_spark.functions.html import html_fields
from posik_engine_spark.operators import lifecycle, similarity


# ---------------------------------------------------------- html body


def test_truncated_body_tag_falls_back_to_document(spark):
    """'<body' cut off mid-tag by the crawler has no extractable body —
    the page must still index its full text (whole-document tier),
    never an empty body field."""
    truncated = "<html><head><title>Crash Handler</title></head><body"
    df = spark.createDataFrame([(truncated,)], "html string")
    row = html_fields(df).select("body").collect()[0]
    assert "Crash Handler" in row["body"]
    assert row["body"].strip() != ""


def test_truncated_body_with_attrs_falls_back(spark):
    truncated = '<html><p>hello world</p><body class="main'
    row = (
        html_fields(spark.createDataFrame([(truncated,)], "html string"))
        .select("body")
        .collect()[0]
    )
    assert "hello world" in row["body"]


def test_complete_open_tag_still_takes_unclosed_tier(spark):
    """A real unclosed <body> (tag complete, close missing) must keep
    the r3 behavior: head/title text stays OUT of the body field."""
    page = "<html><head><title>HeadOnly</title></head><body>real text"
    row = (
        html_fields(spark.createDataFrame([(page,)], "html string"))
        .select("body")
        .collect()[0]
    )
    assert "real text" in row["body"]
    assert "HeadOnly" not in row["body"]


# ------------------------------------------------- zero-norm cosines


def test_cosine_py_zero_norm_returns_none():
    assert similarity.cosine_py([0.0, 0.0], [1.0, 2.0]) is None
    assert similarity.cosine_py([1.0, 2.0], [0.0, 0.0]) is None
    assert similarity.cosine_py([0.0], [0.0]) is None
    assert similarity.cosine_py([1.0, 0.0], [1.0, 0.0]) == 1.0


def test_cosine_py_matches_spark_null_semantics(spark):
    """cosine_expr (try_divide under Spark 4 ANSI mode) yields NULL for
    the zero-norm case — the driver mirror must agree (None), pinned
    through the same expression the probe path mirrors."""
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0]), ([3.0, 4.0], [1.0, 2.0])],
        "a array<double>, b array<double>",
    )
    rows = (
        df.select(similarity.cosine_expr(F.col("a"), F.col("b")).alias("c"))
        .collect()
    )
    spark_vals = [r["c"] for r in rows]
    py_vals = [
        similarity.cosine_py([0.0, 0.0], [1.0, 2.0]),
        similarity.cosine_py([3.0, 4.0], [1.0, 2.0]),
    ]
    assert spark_vals[0] is None and py_vals[0] is None
    assert spark_vals[1] == py_vals[1]


def test_probe_cids_zero_norm_centroid_sorts_last():
    cents = [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])]
    # query along x: cid1 cosine 1.0, cid2 cosine 0.0, cid0 NULL-last
    assert similarity._probe_cids(cents, [1.0, 0.0], nprobe=2) == [1, 2]
    assert similarity._probe_cids(cents, [1.0, 0.0], nprobe=3) == [1, 2, 0]


def test_probe_cids_zero_query_vector_does_not_crash():
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    got = similarity._probe_cids(cents, [0.0, 0.0], nprobe=1)
    # every cosine NULL -> tie broken by lowest cid, and no exception
    assert got == [0]


# ------------------------------------- no-op incremental persist leak


def test_incremental_noop_releases_caches(spark, tmp_path):
    docs = corpus.synthetic_docs(spark, 40, seed=31)
    builder = lifecycle.IndexBuilder(spark, str(tmp_path / "ix"), n_shards=4)
    builder.build(docs)
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    # replaying an already-indexed batch is the documented no-op path
    builder.incremental_update(docs.limit(10), partial=True)
    after = len(spark.sparkContext._jsc.getPersistentRDDs())
    assert after == before


# ------------------------------------------------- lineage O(1) status


def test_lineage_latest_pointer_written_and_skipped(spark, tmp_path):
    out = str(tmp_path / "ix")
    docs = corpus.synthetic_docs(spark, 30, seed=37)
    lifecycle.IndexBuilder(spark, out, n_shards=2).build(docs)
    d = os.path.join(out, "_lineage")
    assert os.path.exists(os.path.join(d, "_latest.json"))
    recs = lifecycle.read_lineage(out)
    record_files = [f for f in os.listdir(d) if not f.startswith("_")]
    assert len(recs) == len(record_files)
    assert all("stage" in r for r in recs)
    # the pointer IS the chronologically-latest record
    latest = lifecycle._latest_lineage(out)
    assert latest["finished_at"] == max(r["finished_at"] for r in recs)


def test_build_status_legacy_dir_without_pointer(spark, tmp_path):
    out = str(tmp_path / "ix")
    docs = corpus.synthetic_docs(spark, 30, seed=41)
    lifecycle.IndexBuilder(spark, out, n_shards=2).build(docs)
    with_pointer = lifecycle.build_status(out)
    os.remove(os.path.join(out, "_lineage", "_latest.json"))
    legacy = lifecycle.build_status(out)
    assert legacy == with_pointer
    assert legacy["status"] == "INDEXED"


def test_latest_pointer_tracks_failures(tmp_path):
    """A FAILED record written later must win the pointer (build_status
    surfaces it), and an out-of-order older record must NOT regress
    the pointer."""
    out = str(tmp_path / "ix")
    os.makedirs(out)
    lifecycle._lineage_write(
        out,
        {
            "stage": "prepare", "partition_ids": None, "state": "DONE",
            "started_at": 1.0, "finished_at": 2.0, "attempt_ts": 1.0,
            "error": None, "counters": {},
        },
    )
    lifecycle._lineage_write(
        out,
        {
            "stage": "stats", "partition_ids": None, "state": "FAILED",
            "started_at": 3.0, "finished_at": 4.0, "attempt_ts": 3.0,
            "error": "boom", "counters": {},
        },
    )
    assert lifecycle._latest_lineage(out)["state"] == "FAILED"
    # replaying an OLDER record (recovery rewrite) keeps the newer one
    lifecycle._lineage_write(
        out,
        {
            "stage": "prepare", "partition_ids": None, "state": "DONE",
            "started_at": 0.5, "finished_at": 1.5, "attempt_ts": 0.5,
            "error": None, "counters": {},
        },
    )
    assert lifecycle._latest_lineage(out)["state"] == "FAILED"
    st = lifecycle.build_status(out)
    assert st["status"] == "FAILED" and st["error"] == "boom"


# --------------------------------------------------- CLI falsy-zero


def test_ann_cli_rejects_zero_nprobe(spark, tmp_path):
    from posik_engine_spark.jobs import ann_index

    emb = str(tmp_path / "emb")
    spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id long, embedding array<double>",
    ).write.parquet(emb)
    out = str(tmp_path / "ivf")
    rc = ann_index.main(
        ["build", "--embeddings", emb, "--out", out, "--n-centroids", "2"]
    )
    assert rc == 0
    with pytest.raises(SystemExit):
        ann_index.main(
            ["query", "--index", out, "--vector", "[1.0, 0.0]", "--nprobe", "0"]
        )
    with pytest.raises(SystemExit):
        ann_index.main(
            ["build", "--embeddings", emb, "--out", str(tmp_path / "x"),
             "--n-centroids", "0"]
        )
