"""spark-submit ANN index tool: build the persisted IVF index over an
embeddings table and serve top-k probes from it — the vector-search
sibling of jobs/build_index.py + jobs/search_cli.py.

    # build: Lloyd-refined centroids + cid-partitioned assignment
    spark-submit --py-files dist/engine.zip \
        posik_engine_spark/jobs/ann_index.py build \
        --embeddings /data/embeddings.parquet --out /data/ivf \
        [--n-centroids 256] [--iters 3] [--vec-col embedding]
    # --n-centroids defaults to ~sqrt(n_vectors) (similarity.auto_n_centroids)

    # query: probe nprobe partitions for the query vector
    spark-submit --py-files dist/engine.zip \
        posik_engine_spark/jobs/ann_index.py query \
        --index /data/ivf --vec-id 42 --embeddings /data/embeddings.parquet \
        [--k 10] [--nprobe 8]
    # (or --vector '[0.1, -0.2, ...]' for a literal query vector)

Output is one JSON line per command (build: counts; query: hits).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("command", choices=["build", "query"])
    p.add_argument("--embeddings", default=None, help="embeddings parquet (vec_id + vector column)")
    p.add_argument("--out", default=None, help="build: output index dir")
    p.add_argument("--index", default=None, help="query: save_ivf dir")
    p.add_argument("--n-centroids", type=int, default=None)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--vec-id", type=int, default=None, help="query by a corpus vector's id")
    p.add_argument("--vector", default=None, help="query by a literal JSON array")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--nprobe", type=int, default=None)
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("posik-ann").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from posik_engine_spark.operators import similarity

    if args.command == "build":
        if not (args.embeddings and args.out):
            p.error("build needs --embeddings and --out")
        emb = spark.read.parquet(args.embeddings)
        n_cent = (
            args.n_centroids
            if args.n_centroids is not None
            # auto-size ~sqrt(n): never ship fixture-scale centroid
            # counts over a production corpus by omission
            else similarity.auto_n_centroids(emb.count())
        )
        if n_cent < 1:
            p.error("--n-centroids must be >= 1")
        similarity.save_ivf(
            emb, args.out, n_centroids=n_cent, iters=args.iters,
            vec_col=args.vec_col,
        )
        store = similarity.IVFStore(spark, args.out)
        sizes = {
            int(r["cid"]): int(r["count"])
            for r in store._df.groupBy("cid").count().collect()
        }
        print(json.dumps({
            "out": args.out,
            "n_centroids": n_cent,
            "iters": args.iters,
            "n_vectors": sum(sizes.values()),
            "partition_sizes": sizes,
        }))
        return 0

    # query
    if not args.index:
        p.error("query needs --index")
    store = similarity.IVFStore(spark, args.index)
    if args.vector is not None:
        qv = [float(x) for x in json.loads(args.vector)]
    elif args.vec_id is not None and args.embeddings:
        from pyspark.sql import functions as F

        row = (
            spark.read.parquet(args.embeddings)
            .filter(F.col("vec_id") == args.vec_id)
            .select(args.vec_col)
            .collect()
        )
        if not row:
            print(json.dumps({"error": f"vec_id {args.vec_id} not found"}))
            return 1
        qv = [float(x) for x in row[0][0]]
    else:
        p.error("query needs --vector or (--vec-id and --embeddings)")
    nprobe = args.nprobe if args.nprobe is not None else similarity.DEFAULT_NPROBE
    if nprobe < 1:
        p.error("--nprobe must be >= 1")
    hits = [
        {"vec_id": int(r["vec_id"]), "cosine": float(r["cosine"])}
        for r in store.topk(qv, k=args.k, nprobe=nprobe).collect()
    ]
    print(json.dumps({
        "k": args.k, "nprobe": nprobe,
        "probed_cids": store.probe_cids(qv, nprobe),
        "hits": hits,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
