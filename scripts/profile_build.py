"""Dev profiling: per-stage build timings + query breakdown at sf0.1.

Not part of the driver contract; used to direct optimization work.
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from posik_engine_spark.session import get_spark
from posik_engine_spark.jobs.build_index import adapt_source
from posik_engine_spark.operators.lifecycle import IndexBuilder
from posik_engine_spark.operators.search import SearchEngine

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    spark = get_spark(app_name="profile", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    t0 = time.time()
    docs = adapt_source(spark, os.path.join(SF, "documents.parquet"))
    print(f"[{time.time()-t0:7.2f}] session+source ready")

    out = tempfile.mkdtemp(prefix="profile-ix-")
    b = IndexBuilder(spark, out, n_shards=CPUS)
    t = time.time(); b._stage_prepare(docs)
    print(f"[{time.time()-t:7.2f}] stage prepare")
    t = time.time(); b._stage_stats()
    print(f"[{time.time()-t:7.2f}] stage stats")
    t = time.time(); b._stage_blocks()
    print(f"[{time.time()-t:7.2f}] stage blocks")
    t = time.time(); ix = b.load()
    print(f"[{time.time()-t:7.2f}] load")

    t = time.time(); engine = SearchEngine(spark, ix, docs)
    print(f"[{time.time()-t:7.2f}] engine init (prepare_for_queries)")
    for q in ["spark", "merge row"]:
        t = time.time(); engine.search(q)
        print(f"[{time.time()-t:7.2f}] warm search {q!r}")
    import cProfile, pstats
    for q in ["spark window", "hash join filter", "scan"]:
        t = time.time(); r = engine.search(q)
        print(f"[{time.time()-t:7.2f}] search {q!r} count={r.count}")
    # breakdown of one search
    q = "spark window"
    terms = engine.filter_query_terms(__import__("posik_engine_spark.functions.tokenizer", fromlist=["tokenize_py"]).tokenize_py(q))
    t = time.time(); rows = engine._topk(terms, 20, None)
    print(f"[{time.time()-t:7.2f}]   _topk only")
    t = time.time(); engine._assemble(rows, terms)
    print(f"[{time.time()-t:7.2f}]   _assemble only")
    shutil.rmtree(out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
