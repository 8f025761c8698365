"""Attribute cold first-pass query latency to its per-phase Spark jobs.

Round-4 verdict item 1: first-pass p50 regressed 0.207 -> 0.478 s after
the ordinal layout added a third Spark job (ord -> doc_id resolution)
to every cold query. This script reproduces the bench protocol (sf0.1
build via IndexBuilder, SearchEngine over the in-memory docs) and times
each driver-path phase of a COLD query separately:

  - term probe      (free here: complete driver dictionary)
  - block fetch     (pruned blocks scan          -> Spark job 1)
  - wand kernel     (driver-local numpy           -> no job)
  - ord resolution  (pruned doc_stats point scan  -> Spark job 2)
  - content fetch   (persisted corpus isin filter -> Spark job 3)

Usage: python scripts/attr_cold_query.py [--sf-dir DIR] [--cpus N]
Prints one JSON line with per-phase seconds per query + medians.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES, _mk_spark, run_build  # noqa: E402


def timed(obj, name: str, sink: dict):
    orig = getattr(obj, name)

    def wrap(*a, **kw):
        t0 = time.time()
        out = orig(*a, **kw)
        sink[name] = sink.get(name, 0.0) + (time.time() - t0)
        return out

    setattr(obj, name, wrap)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    args = ap.parse_args()

    from posik_engine_spark.operators.search import SearchEngine

    spark = _mk_spark(args.cpus)
    out = tempfile.mkdtemp(prefix="posik-attr-ix-")
    try:
        n_docs_src = spark.read.parquet(
            os.path.join(args.sf_dir, "documents.parquet")
        ).count()
        n_shards = max(4, min(args.cpus, n_docs_src // 500))
        ix, docs, build_sec = run_build(spark, args.sf_dir, out, n_shards=n_shards)
        engine = SearchEngine(spark, ix, docs)
        engine.search("spark")  # warm python workers (bench does the same)
        engine.search("merge row")

        per_query: dict[str, dict] = {}
        for name, q in BENCH_QUERIES.items():
            sink: dict[str, float] = {}
            for ph in ("_blocks_for_terms", "_docids_for_keys", "_content_for_ids"):
                timed(engine, ph, sink)
            t0 = time.time()
            resp = engine.search(q)
            _ = resp.hits
            sink["total"] = time.time() - t0
            # restore unwrapped methods for the next query
            for ph in ("_blocks_for_terms", "_docids_for_keys", "_content_for_ids"):
                delattr(engine, ph)
            sink["other"] = sink["total"] - sum(
                v for k, v in sink.items() if k.startswith("_")
            )
            per_query[name] = {k: round(v, 4) for k, v in sink.items()}

        phases = ["_blocks_for_terms", "_docids_for_keys", "_content_for_ids",
                  "other", "total"]
        medians = {
            ph: round(
                statistics.median(pq.get(ph, 0.0) for pq in per_query.values()), 4
            )
            for ph in phases
        }
        print(json.dumps({
            "build_sec": round(build_sec, 2),
            "per_query": per_query,
            "medians": medians,
        }))
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
