"""spark-submit query tool: serve ad-hoc searches from an on-disk index
— the CLI analog of the reference's GET /api/search + /api/statistics
(/root/reference/.../api/ApiController.java:81-94).

    spark-submit --py-files dist/engine.zip \
        posik_engine_spark/jobs/search_cli.py \
        --index /data/ix --content-store /data/ix_content \
        --query "parseHttpRequest" [--repo r1] [--offset 0] [--limit 20]

Pass --statistics instead of --query for the corpus stats document
(needs no content source). Content comes from --content-store (bucketed
store, pruned point lookups) or --docs (corpus parquet; snippet scans
the persisted docs); one of the two is required for --query.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--content-store", default=None)
    p.add_argument("--docs", default=None, help="docs parquet (alternative to --content-store)")
    p.add_argument("--query", default=None)
    p.add_argument("--repo", default=None)
    p.add_argument("--offset", type=int, default=0)
    p.add_argument("--limit", type=int, default=20)
    p.add_argument("--statistics", action="store_true")
    args = p.parse_args(argv)
    if not args.statistics and args.query is None:
        p.error("pass --query or --statistics")

    spark = SparkSession.builder.appName("posik-search").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from posik_engine_spark.operators.search import SearchEngine
    from posik_engine_spark.oracle import SearchError
    from posik_engine_spark.sources import read_docs

    docs = read_docs(spark, args.docs) if args.docs else None
    with SearchEngine.from_index_dir(
        spark, args.index, docs=docs, content_dir=args.content_store
    ) as engine:
        if args.statistics:
            print(json.dumps(engine.statistics()))
            return 0
        try:
            resp = engine.search(
                args.query, repo=args.repo, offset=args.offset, limit=args.limit
            )
        except SearchError as e:
            print(json.dumps({"result": False, "error": str(e)}))
            return 1
        print(
            json.dumps(
                {
                    "result": resp.result,
                    "message": resp.message,
                    "count": resp.count,
                    "elapsed_sec": round(resp.elapsed_sec, 4),
                    "hits": [
                        {
                            "doc_id": h[0], "site": h[1], "uri": h[2],
                            "title": h[3], "snippet": h[4],
                            "relevance": h[5], "score": h[6],
                        }
                        for h in resp.hits
                    ],
                }
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
