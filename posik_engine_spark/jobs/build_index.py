"""spark-submit index-build job (SURVEY.md §3.2 rebuild trace).

Launch (north-rule packaging):

    python -m posik_engine_spark.jobs.package dist/engine.zip
    spark-submit --master local[32] --py-files dist/engine.zip \
        posik_engine_spark/jobs/build_index.py \
        --source /root/testdata/sf0.1/documents.parquet \
        --out /tmp/ix --n-shards 32 --shard-batches 4

Flags:
    --source        docs parquet: either input_hint shape
                    (repo,path,commit,lang,content) or the testdata
                    ``documents`` shape (auto-adapted)
    --incremental   treat --source as a new snapshot and delta-reindex
                    into --out (B8 + S6 GC)
    --filter        SQL predicate on the source (the single-doc reindex
                    entry point, SURVEY.md §3.3: e.g.
                    "repo='r' AND path='p'" with --incremental)
    --admit         apply the build-side admission filter (SURVEY.md §2
                    B4; reference CrawlerService.java:72,80-83 drops
                    non-text / non-2xx pages): rejects empty, oversized,
                    and not-really-text docs before tokenization.
                    Thresholds: --min-chars --max-chars
                    --max-punct-ratio --max-digit-ratio
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession

from posik_engine_spark.operators.lifecycle import IndexBuilder, read_lineage


def adapt_source(spark: SparkSession, path: str):
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    cols = set(df.columns)
    if {"repo", "path", "commit", "lang", "content"} <= cols:
        return df.select("repo", "path", "commit", "lang", "content")
    if {"doc_id", "text", "source"} <= cols:  # driver testdata documents shape
        return df.select(
            F.col("source").alias("repo"),
            F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("path"),
            F.lit("00000000").alias("commit"),
            F.col("lang"),
            F.col("text").alias("content"),
        )
    raise SystemExit(f"unrecognized source schema: {sorted(cols)}")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--source", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--n-shards", type=int, default=16)
    p.add_argument("--shard-batches", type=int, default=1)
    p.add_argument("--block-size", type=int, default=None)
    p.add_argument("--incremental", action="store_true")
    p.add_argument("--filter", default=None)
    p.add_argument("--admit", action="store_true")
    p.add_argument(
        "--content-store", default=None,
        help="also write a doc_id-bucketed+sorted content store here "
        "(serving-side pruned snippet lookups; full overwrite per run)",
    )
    p.add_argument("--content-buckets", type=int, default=64)
    p.add_argument("--min-chars", type=int, default=None)
    p.add_argument("--max-chars", type=int, default=None)
    p.add_argument("--max-punct-ratio", type=float, default=None)
    p.add_argument("--max-digit-ratio", type=float, default=None)
    p.add_argument(
        "--stemmer", default=None, choices=["porter"],
        help="optional token normalization (natural-language corpora); "
        "recorded in the index meta and applied to queries by the engine",
    )
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("posik-build-index").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from posik_engine_spark.sources import read_docs

    docs = read_docs(spark, args.source)
    if args.filter:
        docs = docs.filter(args.filter)
    if args.admit:
        from posik_engine_spark.operators import textops

        thresholds = {
            k: v
            for k, v in {
                "min_chars": args.min_chars,
                "max_chars": args.max_chars,
                "max_punct_ratio": args.max_punct_ratio,
                "max_digit_ratio": args.max_digit_ratio,
            }.items()
            if v is not None
        }
        docs = textops.admit_docs(docs, text_col="content", **thresholds)

    kw = {}
    if args.block_size:
        kw["block_size"] = args.block_size
    builder = IndexBuilder(
        spark, args.out, n_shards=args.n_shards, shard_batches=args.shard_batches,
        stemmer=args.stemmer, **kw
    )
    t0 = time.time()
    if args.incremental:
        # a --filter'ed snapshot is a SUBSET of the corpus: docs outside
        # the predicate must not be GC'd (single-doc reindex semantics,
        # SURVEY.md §3.3 / reference IndexingMonitor.java:53-57)
        ix = builder.incremental_update(docs, partial=args.filter is not None)
    else:
        ix = builder.build(docs)
    elapsed = time.time() - t0
    if args.content_store:
        if args.filter:
            raise SystemExit(
                "--content-store with --filter would write a store covering "
                "only the filtered subset; run it on a full snapshot"
            )
        from posik_engine_spark.operators.content_store import save_content_store

        save_content_store(docs, args.content_store, n_buckets=args.content_buckets)
    report = {
        "elapsed_sec": elapsed,
        "n_docs": ix.meta.n_docs,
        "files_per_sec": ix.meta.n_docs / elapsed if elapsed > 0 else None,
        "counters": builder.counters(),
        "stages": [
            {"stage": r["stage"], "state": r["state"]} for r in read_lineage(args.out)
        ],
    }
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
