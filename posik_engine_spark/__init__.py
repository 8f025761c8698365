"""posik_engine_spark — PySpark-native inverted-index + BM25 engine.

A from-scratch Spark-first rebuild of the query/data-processing
capabilities of DmitriiMS/posik-engine (see SURVEY.md): index build
(tokenize -> postings -> delta/varint blocks, doc-sharded), BM25 top-k
search with block-max WAND, plus large-scale training-data pipeline
operators (dedup, similarity search, text analysis, multimodal
plumbing).

Quick start (the reference's whole user surface, three lines):

    from posik_engine_spark import SearchEngine, get_spark
    engine = SearchEngine.from_docs(get_spark(), docs)     # index
    engine.search("parseHttpRequest", limit=20)            # query
    engine.statistics()                                    # stats

Top-level re-exports are lazy (PEP 562): importing the package costs
nothing until a symbol is touched, so `import posik_engine_spark.spec`
in UDF workers stays light.
"""

__version__ = "0.2.0"

_LAZY = {
    "SearchEngine": ("posik_engine_spark.operators.search", "SearchEngine"),
    "SearchResponse": ("posik_engine_spark.operators.search", "SearchResponse"),
    "IndexBuilder": ("posik_engine_spark.operators.lifecycle", "IndexBuilder"),
    "build_index": ("posik_engine_spark.operators.index", "build_index"),
    "save_index": ("posik_engine_spark.operators.index", "save_index"),
    "load_index": ("posik_engine_spark.operators.index", "load_index"),
    "save_content_store": (
        "posik_engine_spark.operators.content_store", "save_content_store"
    ),
    "ContentStore": ("posik_engine_spark.operators.content_store", "ContentStore"),
    "IVFStore": ("posik_engine_spark.operators.similarity", "IVFStore"),
    "save_ivf": ("posik_engine_spark.operators.similarity", "save_ivf"),
    "rrf_fuse": ("posik_engine_spark.operators.hybrid", "rrf_fuse"),
    "rrf_fuse_rows": ("posik_engine_spark.operators.hybrid", "rrf_fuse_rows"),
    "get_spark": ("posik_engine_spark.session", "get_spark"),
    "read_docs": ("posik_engine_spark.sources", "read_docs"),
    "SearchError": ("posik_engine_spark.oracle", "SearchError"),
}

__all__ = ["__version__", *_LAZY]


def __getattr__(name: str):
    target = _LAZY.get(name)
    if target is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(target[0]), target[1])
