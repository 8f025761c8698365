"""Deterministic sampling & batch-packing operators for training-data
pipelines.

Both are pure-Catalyst (no Python workers) and hash-deterministic, so
re-running on a different cluster / partitioning / day yields the SAME
sample and the SAME batch assignment — a hard requirement for
reproducible training runs (and for the DuckDB oracle comparison in
__spark_entry__.py).

- stratified_sample: keep ~fraction of docs per stratum via an md5
  threshold on the doc id. md5 (not xxhash64) so any SQL engine can
  reproduce the exact membership decision.
- pack_token_batches: assign docs to fixed-token-budget training
  batches by cumulative token count within a stratum, ordered by
  doc_id: batch = floor(start_offset / budget). This is sequential
  offset packing — simple, deterministic, SQL-expressible; a greedy
  first-fit packer would need per-partition state for ~zero practical
  gain at corpus scale.

At 100 TB: both are one narrow projection plus (for packing) a single
window over (stratum, doc_id) — the shuffle is by stratum; heavily
skewed strata would want the window replaced by a two-phase
cumsum (per-partition partials + prefix offsets), noted inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SAMPLE_BUCKETS = 2**32


def sample_hash_expr(id_col: str):
    """Deterministic uniform hash in [0, 2^32): first 8 hex chars of
    md5(id as string), big-endian. Portable: DuckDB spells it
    ('0x' || substr(md5(id::text), 1, 8))::UINTEGER."""
    return F.conv(F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 8), 16, 10).cast("long")


def stratified_sample(
    docs: DataFrame, fraction: float, id_col: str = "doc_id"
) -> DataFrame:
    """Keep rows whose id-hash falls under fraction * 2^32 — a
    deterministic ~fraction sample, uniform within every stratum by
    construction (the hash ignores the stratum), no shuffle at all."""
    threshold = int(fraction * SAMPLE_BUCKETS)
    return docs.filter(sample_hash_expr(id_col) < threshold)


def pack_token_batches(
    docs: DataFrame,
    token_budget: int,
    strata_col: str = "source",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, stratum, n_tokens) -> + batch_id.

    batch_id = floor(start_offset / budget) where start_offset is the
    cumulative token count of all PRIOR docs in the stratum (ordered by
    doc_id). Docs larger than the budget get their own batch(es) by
    construction. One window = one shuffle on the stratum key; at
    extreme stratum skew replace with two-phase cumsum (partial sums
    per partition + broadcast prefix offsets).
    """
    w = (
        Window.partitionBy(strata_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return docs.select(
        id_col,
        strata_col,
        tokens_col,
        F.floor(start / F.lit(token_budget)).cast("long").alias("batch_id"),
    )
