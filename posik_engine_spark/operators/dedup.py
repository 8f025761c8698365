"""Deduplication operators for training-data pipelines at 100 TB scale.

Four families (each with a matching DuckDB-SQL oracle wired in
__spark_entry__.py unless noted):

- exact_dedup:          sha256 hash-groupBy (one shuffle of 32-byte keys)
- ngram_jaccard_pairs:  exact n-gram-shingle Jaccard via inverted
                        shingle join (no O(n^2) cross join; the join
                        fans out only on shared shingles)
- minhash_lsh_pairs:    MinHash signatures (portable md5-string min per
                        permutation) -> banded LSH buckets -> candidate
                        pairs -> exact Jaccard verification. The scale
                        path: candidate generation is linear in docs x
                        bands, never quadratic.
- simhash64 / simhash_pairs: 64-bit SimHash (Arrow-batched UDF),
                        combination blocking (Manku et al., WWW'07):
                        k+d chunks, keys = d-chunk combos, recall
                        GUARANTEED for hamming<=k (pytest vs exhaustive
                        oracle; DuckDB brute-force oracle in
                        __spark_entry__.py).

Portable hashing: every hash that must match the SQL oracle is md5 over
explicit strings — minhash takes the lexicographic MIN of md5 hex
digests, so Spark and DuckDB agree byte-for-byte with no integer-
conversion games.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from posik_engine_spark.functions.tokenizer import tokenize_expr

DEFAULT_SHINGLE_N = 3
# Production LSH defaults: 128 permutations in 16 bands of r=8 rows.
# P(candidate | jaccard j) = 1-(1-j^8)^16 — steep S-curve centered near
# j ~ 0.7: at corpus scale (1B+ docs) candidate volume stays linear.
# The round-1 fixture values (6 perms / 3 bands, r=2) made nearly every
# mildly-similar pair a candidate — fine for a 500-doc oracle fixture
# (which now passes them explicitly in __spark_entry__.py), ruinous at
# scale. Callers tune (n_perms, bands) to move the threshold.
DEFAULT_N_PERMS = 128
DEFAULT_BANDS = 16  # rows per band = n_perms // bands


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact-duplicate groups by content sha256: one row per distinct
    content with the canonical keeper (min doc_id) and group size."""
    return (
        docs.select("doc_id", F.sha2(F.col(text_col).cast("binary"), 256).alias("sha"))
        .groupBy("sha")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper"))
    )


def shingle_expr(text_col: str, n: int = DEFAULT_SHINGLE_N) -> Column:
    """Distinct n-gram token shingles (space-joined) of the engine
    tokenizer's output; docs with < n tokens yield no shingles."""
    toks = tokenize_expr(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return F.array_distinct(F.when(F.size(toks) >= n, grams).otherwise(F.array()))


def doc_shingles(docs: DataFrame, text_col: str = "text", n: int = DEFAULT_SHINGLE_N) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(shingle_expr(text_col, n)).alias("shingle")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    tau: float,
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE_N,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard >= tau pairs via inverted shingle join.

    Scale guard: the join fans out quadratically on each shingle's
    document frequency — one boilerplate 3-gram shared by 1M docs
    would create 10^12 intermediate rows. ``max_shingle_df`` drops
    shingles with df > threshold from the shingle UNIVERSE (both the
    intersection counts and the set sizes), i.e. Jaccard is computed
    over the filtered vocabulary — the standard df-cap semantics; it
    only perturbs scores via near-universal shingles, which carry no
    dedup signal. The number of dropped shingles is logged. Without a
    cap this operator is the exact baseline; route corpus-scale runs to
    minhash_lsh_pairs or set the cap.
    """
    sh = doc_shingles(docs, text_col, n)
    if max_shingle_df is not None:
        import logging

        hot_df = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        # count BEFORE deciding where the hot set lives: only a small
        # set (<= 10k, the cap's normal boilerplate case) is collected
        # to the driver for a pushed-down NOT-IN predicate; a
        # pathological cap yielding millions of hot shingles stays
        # plan-side as an anti-join — never materialized in driver
        # memory (no persist either, so nothing leaks across calls;
        # recomputing the df agg once for the small branch is cheaper
        # than a cached frame pinned forever)
        n_hot = hot_df.count()
        if n_hot:
            logging.getLogger(__name__).warning(
                "ngram_jaccard_pairs: dropping %d shingles with df > %d "
                "from the shingle universe", n_hot, max_shingle_df,
            )
            if n_hot <= 10_000:
                hot = [r["shingle"] for r in hot_df.collect()]
                sh = sh.filter(~F.col("shingle").isin(hot))
            else:
                sh = sh.join(hot_df, "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= tau)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    n_perms: int = DEFAULT_N_PERMS,
    n: int = DEFAULT_SHINGLE_N,
) -> DataFrame:
    """doc_id -> sig_0..sig_{P-1}; sig_i = min over shingles of
    md5('<i>:' || shingle) as a hex STRING (portable across engines).
    Docs with no shingles are dropped (nothing to hash)."""
    sh = doc_shingles(docs, text_col, n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")).cast("binary"))).alias(
            f"sig_{i}"
        )
        for i in range(n_perms)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    tau: float,
    text_col: str = "text",
    n_perms: int = DEFAULT_N_PERMS,
    bands: int = DEFAULT_BANDS,
    n: int = DEFAULT_SHINGLE_N,
) -> DataFrame:
    """Banded-LSH candidate pairs verified with exact Jaccard.

    Bands of r = n_perms/bands signature rows hash (md5 of the
    concatenated sigs) into buckets; docs sharing any bucket become
    candidates; exact Jaccard filters to >= tau. At scale the bucket
    join shuffles only (doc, bucket) pairs — linear, never n^2.
    """
    assert n_perms % bands == 0
    r = n_perms // bands
    sigs = minhash_signatures(docs, text_col, n_perms, n)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"sig_{b * r + j}") for j in range(r)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *parts).cast("binary")).alias("bucket"),
            )
        )
    buckets = sigs.select("doc_id", F.explode(F.array(*band_cols)).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # exact verification on candidates only
    sh = doc_shingles(docs, text_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    sha = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    shb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        cand.join(sha, "doc_a")
        .join(shb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    out = (
        common.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b")), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= tau)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


# ------------------------------------------------------------- simhash
_SIMHASH_BITS = 64


def _simhash_py(tokens: list[str]) -> int:
    """Pure-Python simhash (also the pytest oracle): md5(token) low 64
    bits; each bit votes +tf/-tf; sign -> bit."""
    import hashlib

    acc = np.zeros(_SIMHASH_BITS, dtype=np.int64)
    from collections import Counter

    for tok, tf in Counter(tokens).items():
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        for j in range(_SIMHASH_BITS):
            acc[j] += tf if (h >> j) & 1 else -tf
    bits = 0
    for j in range(_SIMHASH_BITS):
        if acc[j] >= 0:
            bits |= 1 << j
    return bits


@F.pandas_udf(T.LongType())
def _simhash_udf(tokens: pd.Series) -> pd.Series:  # pragma: no cover (executors)
    """Batch-vectorized simhash, bit-identical to _simhash_py (the
    pytest oracle): md5 computed once per DISTINCT token across the
    Arrow batch (memoized — corpora repeat tokens heavily), bit voting
    as one numpy broadcast per doc instead of a 64-iteration Python
    loop per token (acc[j] = Σ tf·(2·bit_j − 1); sign -> bit)."""
    import hashlib
    from collections import Counter

    md5_cache: dict[str, int] = {}
    shifts = np.arange(_SIMHASH_BITS, dtype=np.uint64)
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, toks in enumerate(tokens):
        cnt = Counter(toks if toks is not None else [])
        if not cnt:
            # empty token list: all votes are 0, acc >= 0 everywhere
            out[i] = np.uint64(2**64 - 1)
            continue
        hs = np.empty(len(cnt), dtype=np.uint64)
        tfs = np.empty(len(cnt), dtype=np.int64)
        for j, (t, c) in enumerate(cnt.items()):
            h = md5_cache.get(t)
            if h is None:
                h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
                md5_cache[t] = h
            hs[j] = h
            tfs[j] = c
        bits = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
        acc = ((2 * bits - 1) * tfs[:, None]).sum(axis=0)
        out[i] = ((acc >= 0).astype(np.uint64) << shifts).sum(dtype=np.uint64)
    return pd.Series(out.view(np.int64))


def simhash64(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select(
        "doc_id", _simhash_udf(tokenize_expr(text_col)).alias("simhash")
    )


def simhash_pairs(docs: DataFrame, max_hamming: int = 3, text_col: str = "text") -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming; recall is
    GUARANTEED (== brute force) under the default blocking — see
    simhash_pairs_from_hashes."""
    return simhash_pairs_from_hashes(simhash64(docs, text_col), max_hamming)


def _chunk_layout(n_chunks: int) -> list[tuple[int, int]]:
    """(offset, width) per chunk, distributing 64 bits as evenly as
    possible (first 64 % n_chunks chunks get the extra bit)."""
    base, extra = divmod(_SIMHASH_BITS, n_chunks)
    out, off = [], 0
    for c in range(n_chunks):
        w = base + (1 if c < extra else 0)
        out.append((off, w))
        off += w
    return out


def simhash_pairs_from_hashes(
    sh: DataFrame,
    max_hamming: int = 3,
    n_chunks: int | None = None,
    combo_size: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Combination blocking + exact verification over a
    (doc_id, simhash) frame (Manku et al., WWW'07 — the Google simhash
    near-dup table design).

    The 64-bit fingerprint is split into ``n_chunks`` near-equal chunks
    (default ``max_hamming + combo_size``); each doc emits one blocking
    key per ``combo_size``-subset of chunks (the packed chunk values).
    k bit errors corrupt at most k chunks, so whenever
    ``n_chunks - combo_size >= max_hamming`` some combo is error-free in
    both docs and every true pair shares a bucket: recall == brute force
    (pytest-verified vs an exhaustive oracle). Defaults (k=3: 6 chunks,
    C(6,3)=20 tables, ~32-bit keys) keep buckets tiny at corpus scale —
    unlike single 16-bit chunks, whose 65k distinct values put ~n/65k
    docs in EVERY bucket (quadratic candidates at 1B docs).

    If the caller forces ``n_chunks - combo_size < max_hamming`` the
    blocking is best-effort (recall may be < 1) and a warning is logged.
    ``max_bucket_size`` optionally drops over-full buckets (degenerate
    fingerprints — e.g. empty docs hashing to -1 — or adversarial
    skew), logging how many buckets were dropped; dropped buckets can
    only lose candidates, never add false positives, since every
    surviving pair is hamming-verified exactly.
    """
    import itertools
    import logging

    if n_chunks is None:
        n_chunks = max_hamming + combo_size
    if not (1 <= combo_size <= n_chunks <= _SIMHASH_BITS):
        raise ValueError(f"bad blocking: n_chunks={n_chunks}, combo_size={combo_size}")
    if n_chunks - combo_size < max_hamming:
        logging.getLogger(__name__).warning(
            "simhash blocking is best-effort: n_chunks-combo_size=%d < "
            "max_hamming=%d; recall may be below 1.0",
            n_chunks - combo_size, max_hamming,
        )
    layout = _chunk_layout(n_chunks)

    def chunk_val(c: int):
        off, w = layout[c]
        return F.shiftright("simhash", off).bitwiseAND(F.lit((1 << w) - 1))

    key_structs = []
    for ti, combo in enumerate(itertools.combinations(range(n_chunks), combo_size)):
        # pack the combo's chunk values into one long (sum of widths
        # <= 64 - max_hamming bits, always fits)
        key = F.lit(0).cast("long")
        for c in combo:
            key = F.shiftleft(key, layout[c][1]).bitwiseOR(chunk_val(c))
        key_structs.append(
            F.struct(F.lit(ti).alias("tbl"), key.alias("k"))
        )
    keys = sh.select(
        "doc_id", "simhash", F.explode(F.array(*key_structs)).alias("tk")
    ).select(
        "doc_id", "simhash",
        F.col("tk.tbl").alias("tbl"), F.col("tk.k").alias("k"),
    )
    if max_bucket_size is not None:
        counts = keys.groupBy("tbl", "k").agg(F.count(F.lit(1)).alias("bn"))
        n_dropped = counts.filter(F.col("bn") > max_bucket_size).count()
        if n_dropped:
            logging.getLogger(__name__).warning(
                "simhash blocking: dropping %d buckets larger than %d docs",
                n_dropped, max_bucket_size,
            )
        keys = (
            keys.join(counts, ["tbl", "k"])
            .filter(F.col("bn") <= max_bucket_size)
            .drop("bn")
        )
    a = keys.alias("a")
    b = keys.alias("b")
    cand = (
        a.join(b, ["tbl", "k"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()  # 32-byte rows — cheap, unlike embedding payloads
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming
    ).select("doc_a", "doc_b", "hamming")


# ------------------------------------------------- duplicate clusters
def dup_clusters(pairs: DataFrame, max_iters: int = 50) -> DataFrame:
    """Resolve near-dup pairs into connected components:
    (doc_id, cluster_id = min doc_id of the component).

    Iterative min-label propagation — each round every node adopts the
    smallest label among itself and its neighbors; converges to the
    unique fixpoint (per-component min id), so the result is
    deterministic regardless of partitioning or iteration batching.
    Rounds are driver-controlled Spark jobs over (node, label) pairs;
    the edge list is reused across rounds. Label propagation doubles
    the reached radius only 1 hop/round — fine for dedup components,
    which are small and dense; diameter-heavy graphs would want
    alternating star contraction instead.

    Only docs appearing in >= 1 pair are emitted (singletons are not
    duplicates of anything).
    """
    edges = (
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .unionByName(pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
        .distinct()
        .cache()
    )
    labels = (
        edges.select(F.col("a").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .cache()
    )
    converged = False
    for it in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges["b"] == labels["doc_id"])
            .groupBy(F.col("a").alias("doc_id"))
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias("label"),
            )
            .cache()
        )
        if (it + 1) % 5 == 0:
            # iterative joins grow the logical plan each round; truncate
            # the lineage periodically or planning time (and recovery
            # cost) explodes at real iteration counts. localCheckpoint
            # materializes, so the interim cache can be dropped at once.
            checkpointed = new_labels.localCheckpoint(eager=True)
            new_labels.unpersist()
            new_labels = checkpointed
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        # silent non-convergence would emit labels != component min —
        # wrong dedup keepers with no sign of trouble
        raise RuntimeError(
            f"dup_clusters: min-label propagation did not converge in "
            f"{max_iters} rounds (component diameter exceeds max_iters); "
            f"raise max_iters"
        )
    return labels.select("doc_id", F.col("label").alias("cluster_id"))
