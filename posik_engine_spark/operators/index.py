"""Block-encoded inverted index: build, save, load (SURVEY.md §7 M2).

Layout (document-partitioned, the classic distributed-IR design):
- ``blocks``: one row per (shard, term, block_id) — up to BLOCK_SIZE
  postings per block, doc_ids delta+varint, tfs varint, per-block
  max_kernel for block-max pruning (north rule). Docs are sharded by
  pmod(doc_id, n_shards), so every shard is a complete mini-index over
  its own documents and top-k runs shard-locally with a driver merge.
- ``doc_stats``: narrow per-doc metadata (lens for BM25, repo for
  scoping, content_sha for the per-row invariant) — the analog of the
  reference's page table minus content
  (/root/reference/.../model/Page.java:16-45).
- ``term_stats``: term -> df/ctf (the lemma dictionary analog,
  /root/reference/.../model/Lemma.java:18-43).
- ``meta``: exact int corpus totals (CorpusMeta).

Scale notes: the grouped-map encode shuffles once on (term, shard) —
the shard key IS the hot-term salt (a term in every doc still splits
into n_shards groups, SURVEY.md §2 B9); blocks parquet is written
partitioned by shard and sorted by term within files so query scans
prune shards=*/row-groups via min/max stats on ``term``.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from posik_engine_spark import spec
from posik_engine_spark.functions import codec
from posik_engine_spark.operators import build as B

BLOCKS_SCHEMA = (
    "term string, shard int, block_id int, n_docs int, "
    "doc_id_min long, doc_id_max long, max_kernel double, "
    "docs binary, tfp binary, tfc binary"
)


def kernel_np(
    tfp: np.ndarray, tfc: np.ndarray, lenp: np.ndarray, lenc: np.ndarray, avgdl: float
) -> np.ndarray:
    """BM25 kernel, numpy form — element-wise IEEE ops identical to
    spec.bm25_term_score / build.kernel_expr (op order pinned)."""
    wtf = tfp * spec.FIELD_WEIGHT_PATH + tfc * spec.FIELD_WEIGHT_CONTENT
    dl = lenp * spec.FIELD_WEIGHT_PATH + lenc * spec.FIELD_WEIGHT_CONTENT
    return (wtf * (spec.K1 + 1.0)) / (
        wtf + spec.K1 * ((1.0 - spec.B) + (spec.B * dl) / avgdl)
    )


def build_blocks(
    tf: DataFrame, avgdl: float, block_size: int = spec.BLOCK_SIZE
) -> DataFrame:
    """term_freqs -> compressed posting blocks via grouped-map UDF."""

    def encode_group(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        term, shard = key[0], int(key[1])
        pdf = pdf.sort_values("doc_id", kind="mergesort")
        ids = pdf["doc_id"].to_numpy(np.int64)
        tfp = pdf["tf_path"].to_numpy(np.int64)
        tfc = pdf["tf_content"].to_numpy(np.int64)
        kern = kernel_np(
            tfp,
            tfc,
            pdf["len_path"].to_numpy(np.int64),
            pdf["len_content"].to_numpy(np.int64),
            avgdl,
        )
        rows = []
        for b0 in range(0, len(ids), block_size):
            sl = slice(b0, b0 + block_size)
            bi, bp, bc = ids[sl], tfp[sl], tfc[sl]
            rows.append(
                {
                    "term": term,
                    "shard": shard,
                    "block_id": b0 // block_size,
                    "n_docs": len(bi),
                    "doc_id_min": int(bi[0]),
                    "doc_id_max": int(bi[-1]),
                    "max_kernel": float(kern[sl].max()),
                    "docs": codec.encode_doc_ids(bi),
                    "tfp": codec.encode_counts(bp),
                    "tfc": codec.encode_counts(bc),
                }
            )
        return pd.DataFrame(rows)

    return tf.groupBy("term", "shard").applyInPandas(encode_group, BLOCKS_SCHEMA)


@dataclass
class Index:
    """Handle over the three index tables + corpus meta."""

    blocks: DataFrame
    doc_stats: DataFrame
    term_stats: DataFrame
    meta: B.CorpusMeta

    def term_info(self, terms: list[str]) -> dict[str, tuple[float, int, int]]:
        """term -> (idf, df, ctf) for terms present in the dictionary;
        idf computed driver-side (build.idf_map rationale)."""
        rows = (
            self.term_stats.filter(F.col("term").isin(list(terms)))
            .select("term", "df", "ctf")
            .collect()
        )
        return {
            r["term"]: (self.meta.idf(int(r["df"])), int(r["df"]), int(r["ctf"]))
            for r in rows
        }


def build_index(
    docs: DataFrame,
    n_shards: int = spec.DEFAULT_N_SHARDS,
    cache: bool = True,
) -> Index:
    """One-shot in-memory build (the checkpointed/resumable job wrapper
    lives in jobs/build_index.py)."""
    prepared = B.prepare_docs(docs, n_shards=n_shards)
    tf = B.term_freqs(prepared)
    if cache:
        tf = tf.cache()
    meta = B.corpus_meta(prepared)
    stats = B.term_stats(tf)
    blocks = build_blocks(tf, meta.avgdl)
    ds = B.doc_stats(prepared)
    if cache:
        blocks = blocks.cache()
        ds = ds.cache()
        stats = stats.cache()
        blocks.count(), ds.count(), stats.count()
    return Index(blocks=blocks, doc_stats=ds, term_stats=stats, meta=meta)


def save_index(ix: Index, path: str) -> None:
    (
        ix.blocks.repartition("shard")
        .sortWithinPartitions("term", "block_id")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(os.path.join(path, "blocks"))
    )
    (
        ix.doc_stats.repartition("shard")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(os.path.join(path, "doc_stats"))
    )
    ix.term_stats.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "term_stats")
    )
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(
            {
                "n_docs": ix.meta.n_docs,
                "sum_len_path": ix.meta.sum_len_path,
                "sum_len_content": ix.meta.sum_len_content,
                "spec": {"k1": spec.K1, "b": spec.B, "block_size": spec.BLOCK_SIZE},
            },
            f,
        )


def load_index(spark: SparkSession, path: str) -> Index:
    with open(os.path.join(path, "meta.json")) as f:
        m = json.load(f)
    return Index(
        blocks=spark.read.parquet(os.path.join(path, "blocks")),
        doc_stats=spark.read.parquet(os.path.join(path, "doc_stats")),
        term_stats=spark.read.parquet(os.path.join(path, "term_stats")),
        meta=B.CorpusMeta(m["n_docs"], m["sum_len_path"], m["sum_len_content"]),
    )
