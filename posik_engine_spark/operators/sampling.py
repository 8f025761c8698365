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

At 100 TB: the sample is a narrow projection (no shuffle). Packing is a
single window over (stratum, doc_id) by default; for heavily skewed
strata ``skew_buckets`` switches to the two-phase cumsum (doc_id-range
sub-buckets -> per-bucket partials -> tiny prefix window -> parallel
intra-bucket windows), which is result-identical and spreads one giant
stratum over strata x buckets tasks.
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
    skew_buckets: int | None = None,
) -> DataFrame:
    """(doc_id, stratum, n_tokens) -> + batch_id.

    batch_id = floor(start_offset / budget) where start_offset is the
    cumulative token count of all PRIOR docs in the stratum (ordered by
    doc_id). Docs larger than the budget get their own batch(es) by
    construction.

    ``skew_buckets=None``: one window = one shuffle on the stratum key;
    a giant stratum serializes into ONE window task. For skewed strata
    pass a power-of-two ``skew_buckets``: the TWO-PHASE cumsum splits
    each stratum into doc_id-RANGE sub-buckets (top bits of the id —
    arithmetic shift preserves numeric order, and doc_ids are xxhash64
    outputs, i.e. uniform over int64, so ranges are near-equal), sums
    tokens per (stratum, bucket), prefix-sums that TINY table with a
    window, and computes the intra-bucket cumsum in parallel across
    strata x buckets tasks. Result is IDENTICAL to the single-window
    form (pytest-pinned) — only the parallelism changes.
    """
    if skew_buckets is None:
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

    if skew_buckets < 2 or skew_buckets & (skew_buckets - 1):
        raise ValueError("skew_buckets must be a power of two >= 2")
    n_bits = skew_buckets.bit_length() - 1
    # signed arithmetic shift: bucket ordering == doc_id ordering
    bucket = F.shiftright(F.col(id_col).cast("long"), 64 - n_bits)
    d = docs.select(id_col, strata_col, tokens_col, bucket.alias("_b"))
    # phase 1: per-(stratum, bucket) token totals — strata x buckets rows
    partials = d.groupBy(strata_col, "_b").agg(F.sum(tokens_col).alias("_bt"))
    # phase 2: exclusive prefix over the tiny partials table
    wb = (
        Window.partitionBy(strata_col)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = partials.select(
        strata_col, "_b", F.coalesce(F.sum("_bt").over(wb), F.lit(0)).alias("_off")
    )
    # phase 3: intra-bucket cumsum in parallel + bucket offset
    wi = (
        Window.partitionBy(strata_col, "_b")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(tokens_col).over(wi), F.lit(0)) + F.col("_off")
    return (
        d.join(F.broadcast(offsets), [strata_col, "_b"])
        .select(
            id_col,
            strata_col,
            tokens_col,
            F.floor(start / F.lit(token_budget)).cast("long").alias("batch_id"),
        )
    )
