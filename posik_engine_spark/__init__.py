"""posik_engine_spark — PySpark-native inverted-index + BM25 engine.

A from-scratch Spark-first rebuild of the query/data-processing
capabilities of DmitriiMS/posik-engine (see SURVEY.md): index build
(tokenize -> postings -> delta/varint blocks, doc-sharded), BM25 top-k
search with block-max WAND, plus large-scale training-data pipeline
operators (dedup, similarity search, text analysis, multimodal
plumbing).
"""

__version__ = "0.1.0"
