"""Block-encoded inverted index: build, save, load (SURVEY.md §7 M2).

Layout (document-partitioned, the classic distributed-IR design):
- ``blocks``: one row per (shard, term, block_id) — up to BLOCK_SIZE
  postings per block, doc_ids delta+varint, tfs varint, per-block
  integer score bounds for block-max pruning (north rule). Docs are sharded by
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
    "doc_id_min long, doc_id_max long, "
    "max_tfp int, max_tfc int, min_lenp int, min_lenc int, "
    "docs binary, tfp binary, tfc binary, lenp binary, lenc binary"
)
# bump when BLOCKS_SCHEMA, the codec layout, OR tokenizer semantics
# change incompatibly; on-disk indexes record it and loads/resumes
# refuse a mismatch instead of failing obscurely later. Tokenizer
# changes count: an incremental update mixing token regimes across
# shards silently violates rank identity (df/idf stats and postings
# disagree on what a token is). v2 = inline lenp/lenc norms; v3 = 1->N
# whole-identifier expansion (functions/tokenizer.py).
INDEX_FORMAT_VERSION = 3


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


def build_blocks(tf: DataFrame, block_size: int = spec.BLOCK_SIZE) -> DataFrame:
    """term_freqs -> compressed posting blocks via grouped-map UDF.

    Blocks are a PURE function of the (shard, term) posting rows — no
    corpus-global float (avgdl/idf) is baked in. The block-max bound is
    stored as integers (max field tfs, min field lens); the query side
    derives ub_kernel = kernel(max_tfp, max_tfc, min_lenp, min_lenc,
    current_avgdl), which dominates every doc's kernel in the block
    (kernel is monotone up in wtf, down in dl). This keeps incremental
    rebuilds shard-local: corpus stats may drift without invalidating
    untouched shards' blocks (SURVEY.md §2 B8).
    """

    def encode_shard(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        # ONE grouped-map task per shard (not per term): at huge-vocab
        # scale, per-(term,shard) Arrow groups cost more in group
        # machinery than in encoding; term segmentation is a vectorized
        # sort + boundary scan instead
        shard = int(key[0])
        pdf = pdf.sort_values(["term", "doc_id"], kind="mergesort")
        terms = pdf["term"].to_numpy()
        ids = pdf["doc_id"].to_numpy(np.int64)
        tfp = pdf["tf_path"].to_numpy(np.int64)
        tfc = pdf["tf_content"].to_numpy(np.int64)
        lenp = pdf["len_path"].to_numpy(np.int64)
        lenc = pdf["len_content"].to_numpy(np.int64)
        # term run boundaries
        change = np.flatnonzero(terms[1:] != terms[:-1]) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(terms)]))
        rows = []
        for s, e in zip(starts, ends):
            term = terms[s]
            for b0 in range(s, e, block_size):
                b1 = min(b0 + block_size, e)
                bi = ids[b0:b1]
                rows.append(
                    (
                        term,
                        shard,
                        (b0 - s) // block_size,
                        b1 - b0,
                        int(bi[0]),
                        int(bi[-1]),
                        int(tfp[b0:b1].max()),
                        int(tfc[b0:b1].max()),
                        int(lenp[b0:b1].min()),
                        int(lenc[b0:b1].min()),
                        codec.encode_doc_ids(bi),
                        codec.encode_counts(tfp[b0:b1]),
                        codec.encode_counts(tfc[b0:b1]),
                        # per-doc field lengths inline (Lucene-norms
                        # style): unscoped queries never touch
                        # doc_stats — single-input grouped map, no
                        # cogroup
                        codec.encode_counts(lenp[b0:b1]),
                        codec.encode_counts(lenc[b0:b1]),
                    )
                )
        return pd.DataFrame(
            rows,
            columns=[
                "term", "shard", "block_id", "n_docs", "doc_id_min", "doc_id_max",
                "max_tfp", "max_tfc", "min_lenp", "min_lenc",
                "docs", "tfp", "tfc", "lenp", "lenc",
            ],
        )

    return tf.groupBy("shard").applyInPandas(encode_shard, BLOCKS_SCHEMA)


@dataclass
class Index:
    """Handle over the three index tables + corpus meta."""

    blocks: DataFrame
    doc_stats: DataFrame
    term_stats: DataFrame
    meta: B.CorpusMeta
    # token normalization the index was built with (None or "porter");
    # the engine must stem query tokens and snippet word-forms with the
    # SAME function or stemmed terms would never match (the reference
    # shares one MorphologyService across indexing and search)
    stemmer: str | None = None

    def prepare_for_queries(self, query_partitions: int | None = None) -> "Index":
        """Return a query-optimized handle: blocks and doc_stats
        hash-partitioned by shard and persisted, so per-query grouped
        WAND UDFs reuse the partitioning instead of reshuffling the
        whole index on every search (exchange elided because the cached
        plan's outputPartitioning already satisfies the grouping).

        ``query_partitions`` controls per-query task count: several
        shards fold into one task (grouping keys stay per-shard). For
        latency-bound serving fewer-but-bigger tasks amortize the
        per-task Python round trip; default = defaultParallelism / 4,
        measured best on local[32]. On a throughput-bound cluster pass
        the shard count.
        """
        sc = self.blocks.sparkSession.sparkContext
        nq = query_partitions or max(1, sc.defaultParallelism // 4)
        blocks = self.blocks.repartition(nq, "shard").persist()
        ds = self.doc_stats.repartition(nq, "shard").persist()
        stats = self.term_stats.persist()
        blocks.count(), ds.count(), stats.count()
        return Index(
            blocks=blocks, doc_stats=ds, term_stats=stats, meta=self.meta,
            stemmer=self.stemmer,
        )

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
    stemmer: str | None = None,
) -> Index:
    """One-shot in-memory build (the checkpointed/resumable job wrapper
    lives in jobs/build_index.py)."""
    with B.adaptive_arrow_batch(docs):
        prepared = B.prepare_docs(docs, n_shards=n_shards, stemmer=stemmer)
        tf = B.term_freqs(prepared)
        if cache:
            tf = tf.cache()
        meta = B.corpus_meta(prepared)
        stats = B.term_stats(tf)
        blocks = build_blocks(tf)
        ds = B.doc_stats(prepared)
        if cache:
            blocks = blocks.cache()
            ds = ds.cache()
            stats = stats.cache()
            blocks.count(), ds.count(), stats.count()
    return Index(
        blocks=blocks, doc_stats=ds, term_stats=stats, meta=meta, stemmer=stemmer
    )


def save_index(ix: Index, path: str) -> None:
    (
        ix.blocks.repartition("shard")
        .sortWithinPartitions("term", "block_id")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(os.path.join(path, "blocks"))
    )
    (
        # repo-sorted files: repo-scoped probes and incremental stale
        # lookups push ``repo IN (...)`` down to row-group pruning
        ix.doc_stats.repartition("shard")
        .sortWithinPartitions("repo", "path")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(os.path.join(path, "doc_stats"))
    )
    # term-sorted dictionary: big-vocab per-query term probes prune
    # (the reference's secondary b-tree on lemma, model/Lemma.java:17)
    ix.term_stats.repartition(1).sortWithinPartitions("term").write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "term_stats"))
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(
            {
                "format_version": INDEX_FORMAT_VERSION,
                "n_docs": ix.meta.n_docs,
                "sum_len_path": ix.meta.sum_len_path,
                "sum_len_content": ix.meta.sum_len_content,
                "stemmer": ix.stemmer,
                "spec": {"k1": spec.K1, "b": spec.B, "block_size": spec.BLOCK_SIZE},
            },
            f,
        )


def check_format_version(meta: dict, where: str) -> None:
    v = meta.get("format_version")
    if v != INDEX_FORMAT_VERSION:
        raise ValueError(
            f"{where}: index format_version={v} does not match this build "
            f"({INDEX_FORMAT_VERSION}); rebuild the index (the blocks "
            f"schema/codec changed incompatibly)"
        )


def load_index(spark: SparkSession, path: str) -> Index:
    # refuse to serve a dir whose incremental commit crashed half-way
    # (some shard dirs moved, derived tables stale): the pending intent
    # means the on-disk state is inconsistent until replayed.
    if os.path.exists(os.path.join(path, "_incremental_intent.json")):
        raise ValueError(
            f"load_index({path}): a pending incremental commit exists "
            f"(_incremental_intent.json) — the index is mid-commit and "
            f"inconsistent. Recover first: IndexBuilder(spark, path, "
            f"...).recover_incremental(), then load."
        )
    with open(os.path.join(path, "meta.json")) as f:
        m = json.load(f)
    check_format_version(m, f"load_index({path})")
    return Index(
        blocks=spark.read.parquet(os.path.join(path, "blocks")),
        doc_stats=spark.read.parquet(os.path.join(path, "doc_stats")),
        term_stats=spark.read.parquet(os.path.join(path, "term_stats")),
        meta=B.CorpusMeta(m["n_docs"], m["sum_len_path"], m["sum_len_content"]),
        stemmer=m.get("stemmer"),
    )
