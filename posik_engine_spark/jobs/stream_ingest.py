"""spark-submit continuous-ingestion job: tail a directory of arriving
doc parquet files into an on-disk index via the foreachBatch
incremental sink (streaming/ingest.py).

    spark-submit --py-files dist/engine.zip \
        posik_engine_spark/jobs/stream_ingest.py \
        --source /data/arrivals --out /data/ix --checkpoint /data/ckpt \
        --n-shards 32 [--available-now] [--compact-every 10]

--available-now processes everything currently in --source and exits
(the batch-catch-up mode); without it the query runs until killed and
picks up new files per micro-batch. Restart-safe either way: the Spark
checkpoint replays unfinished batches and the sink's staged commits are
idempotent (lifecycle.py).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--source", required=True, help="directory watched for doc parquet files")
    p.add_argument("--out", required=True, help="index dir (IndexBuilder layout)")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--n-shards", type=int, default=16)
    p.add_argument("--compact-every", type=int, default=10)
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    p.add_argument("--available-now", action="store_true")
    p.add_argument(
        "--stemmer", default=None, choices=["porter"],
        help="must match the index dir's recorded stemmer (the builder "
        "refuses a mismatch)",
    )
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("posik-stream-ingest").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from posik_engine_spark.operators.lifecycle import IndexBuilder
    from posik_engine_spark.streaming import ingest

    builder = IndexBuilder(
        spark, args.out, n_shards=args.n_shards, stemmer=args.stemmer
    )
    stream = ingest.stream_docs(
        spark, args.source, max_files_per_trigger=args.max_files_per_trigger
    )
    writer = ingest.incremental_index_sink(
        stream, builder, checkpoint_dir=args.checkpoint,
        compact_every=args.compact_every,
    )
    if args.available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        ix = builder.load()
        print(json.dumps({"n_docs": ix.meta.n_docs, "counters": builder.counters()}))
    else:
        q = writer.start()
        q.awaitTermination()
    return 0


if __name__ == "__main__":
    sys.exit(main())
