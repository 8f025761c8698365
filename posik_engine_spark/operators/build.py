"""Index-build dataflow (SURVEY.md §2.3 B1-B10, §7 M1/M2/M4).

Stages (all DataFrame; one pandas UDF for tokenization per the
input_hint mandate, everything else pure Catalyst):

  docs(repo, path, commit, lang, content)
    -> prepare_docs:  dedup + doc_id=xxhash64 + content_sha + tokenize
                      (B1 field extraction, B3 fingerprint, B5 dedup)
    -> term_freqs:    explode fields -> (doc_id, term, tf_path,
                      tf_content) via one shuffle (B2 weighted merge)
    -> corpus_meta:   exact int totals -> avgdl computed driver-side in
                      Python so oracle floats match bit-exactly
    -> term_stats:    df / ctf / idf per term, salted two-phase agg
                      (B6 dictionary upsert + B9 hot-term skew salting)

At 100 TB: prepare_docs is a single map stage (no shuffle); term_freqs
is one hash shuffle on (doc_id, term) with map-side combine; term_stats
is a two-phase agg whose first phase is keyed (term, salt) so a hot
term ('def' in ~90% of files) spreads over n_salts reducers before the
tiny final agg. Shards make every downstream stage doc-partitioned.
"""

from __future__ import annotations

from contextlib import contextmanager
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from posik_engine_spark import spec
from posik_engine_spark.functions.tokenizer import tokenize_expr, tokenize_udf

# Target bytes of document content per Arrow batch entering the
# tokenize UDF. Batches are sized in ROWS by Spark
# (spark.sql.execution.arrow.maxRecordsPerBatch), but the resource that
# actually saturates is BYTES: ~20 MB batches (1024 rows x ~20 KB
# source files) triple worker wall time via allocator/page-fault churn
# once several workers run per host (measured on this sandbox: 8-core
# tokenize stage 316 s -> 152 s after resizing), while ~40 KB batches
# (tiny docs) drown in per-batch overhead. adaptive_arrow_batch samples
# the corpus and pins rows ~= TARGET / avg_doc_bytes for the duration
# of a build stage.
TARGET_ARROW_BATCH_BYTES = 2 << 20
_ARROW_BATCH_KEY = "spark.sql.execution.arrow.maxRecordsPerBatch"


@contextmanager
def adaptive_arrow_batch(docs: DataFrame, sample_rows: int = 2048):
    """Scope the session's Arrow batch row count to the corpus's doc
    size (content-length average over a bounded sample; one cheap
    partial scan). Restores the previous setting on exit. The actions
    that EXECUTE the tokenize UDF must run inside the scope — the conf
    is read at execution, not at plan-build, time."""
    spark = docs.sparkSession
    prev = spark.conf.get(_ARROW_BATCH_KEY)
    try:
        avg = (
            docs.select(F.length("content").alias("l"))
            .limit(sample_rows)
            .agg(F.avg("l"))
            .collect()[0][0]
        ) or 1.0
        rows = int(max(64, min(4096, TARGET_ARROW_BATCH_BYTES / max(avg, 1.0))))
        spark.conf.set(_ARROW_BATCH_KEY, str(rows))
        yield rows
    finally:
        spark.conf.set(_ARROW_BATCH_KEY, prev)


# the build-state projection of prepare_docs output: everything the tf
# and doc_stats writes need, and nothing payload-sized (content/token
# arrays are deliberately absent — caching them is GC churn). Both the
# full build and the incremental path persist exactly this.
PREPARED_SLIM_COLS = [
    "doc_id", "repo", "path", "commit", "lang", "content_sha",
    "shard", "counts", "len_path", "len_content",
]


@dataclass(frozen=True)
class CorpusMeta:
    """Exact-integer corpus totals; avgdl derived in Python (spec.py)."""

    n_docs: int
    sum_len_path: int
    sum_len_content: int

    @property
    def avgdl(self) -> float:
        return (
            spec.FIELD_WEIGHT_PATH * self.sum_len_path
            + spec.FIELD_WEIGHT_CONTENT * self.sum_len_content
        ) / self.n_docs

    def idf(self, df: int) -> float:
        return spec.idf(self.n_docs, df)


def prepare_docs(
    docs: DataFrame,
    n_shards: int = spec.DEFAULT_N_SHARDS,
    use_pandas_udf: bool = True,
    with_token_arrays: bool = False,
    admission: dict | None = None,
    stemmer: str | None = None,
) -> DataFrame:
    """Dedup + identity + tokenize-and-count.

    doc_id = xxhash64(repo, path, commit) (deterministic, no
    monotonically_increasing_id — ids must be stable across
    partitionings); content_sha = sha256(content) is the per-row
    invariant vs the source table (BASELINE.json input_hint).
    shard = pmod(doc_id, n_shards): the document-partitioned index —
    every shard holds a complete mini-index over its docs so WAND runs
    shard-locally (analog of the reference's per-site parallelism,
    /root/reference/.../service/IndexingService.java:204).

    The default path FUSES tokenization and per-doc term counting into
    ONE Arrow round trip (``counts`` column): the full token stream
    (≈ corpus size) never crosses the Python boundary — only compact
    (term, tfp, tfc) maps and the two lengths come back. Set
    ``with_token_arrays=True`` to additionally materialize the raw
    token arrays (tests / the explode+groupBy cross-check need them).

    Dataflow order is tokenize-NARROW-first, dedup-after: all per-doc
    derivation (hash, sha, tokenize+count) runs map-side on the source
    partitioning, and the only wide exchange carries the compact
    derived rows — the raw ``content`` column NEVER shuffles (column-
    pruned through the dedup aggregate unless a consumer selects it).
    A duplicate (repo, path, commit) row costs one redundant map-side
    tokenize instead of shipping the whole corpus through an exchange —
    at 100 TB that trade is ~0.1% wasted CPU vs a corpus-sized shuffle.

    ``admission`` (dict of textops.admission_predicate thresholds, {}
    for defaults) gates docs BEFORE tokenization — the build-side page
    admission filter (SURVEY.md §2 B4; reference
    CrawlerService.java:72,80-83 refuses non-text / non-2xx pages):
    rejected docs never pay the tokenize UDF. None = admit everything.

    ``stemmer`` ("porter" | None) maps every token through the named
    stemmer inside the SAME fused Arrow round trip (memoized per
    distinct word per executor — the vocabulary is tiny next to the
    token stream). The engine records the choice in the index meta and
    applies the identical function to query tokens and snippet forms
    (functions/stemmer.py). Pandas path only: the all-JVM variant has
    no stemming expression.
    """
    if stemmer is not None:
        from posik_engine_spark.functions.stemmer import resolve

        resolve(stemmer)  # fail fast on a typo, driver-side
        if not use_pandas_udf:
            raise ValueError(
                "stemmer requires the pandas-UDF path (use_pandas_udf=True); "
                "the all-JVM tokenizer variant cannot stem"
            )
    if admission is not None:
        from posik_engine_spark.operators.textops import admit_docs

        docs = admit_docs(docs, text_col="content", **admission)
    out = (
        docs.withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
        .withColumn("content_sha", F.sha2(F.coalesce(F.col("content"), F.lit("")), 256))
        .withColumn("shard", F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int"))
    )
    if use_pandas_udf:
        tc_udf = (
            _tokenize_count_udf if stemmer is None
            else _tokenize_count_stem_udf(stemmer)
        )
        out = (
            out.withColumn("_tc", tc_udf("path", "content"))
            .withColumn("counts", F.col("_tc.counts"))
            .withColumn("len_path", F.col("_tc.len_path"))
            .withColumn("len_content", F.col("_tc.len_content"))
            .drop("_tc")
        )
        if with_token_arrays:
            tok_udf = (
                tokenize_udf if stemmer is None else _tokenize_stem_udf(stemmer)
            )
            out = out.withColumn("path_tokens", tok_udf("path")).withColumn(
                "content_tokens", tok_udf("content")
            )
    else:
        # all-JVM variant: token arrays via codegen'd regexp exprs;
        # counting falls back to the count-only UDF in term_freqs
        out = (
            out.withColumn("path_tokens", tokenize_expr("path"))
            .withColumn("content_tokens", tokenize_expr("content"))
            .withColumn("len_path", F.size("path_tokens"))
            .withColumn("len_content", F.size("content_tokens"))
        )
    if docs.isStreaming:
        # dropDuplicates on a stream is a STATEFUL operator whose
        # per-key state never expires without a watermark policy —
        # exactly the unbounded-state trap a "narrow, append-safe"
        # streaming tokenize stage must not hide. Streaming consumers
        # dedup at the sink (incremental_index_sink dedups its batch
        # log; the batch engine dedups on every (re)build).
        return out
    return out.dropDuplicates(["repo", "path", "commit"])


def doc_stats(prepared: DataFrame) -> DataFrame:
    """Narrow per-doc metadata table (no content — content stays in the
    source table and is joined back only for top-k snippets)."""
    return prepared.select(
        "doc_id", "repo", "path", "commit", "lang", "content_sha",
        "shard", "len_path", "len_content",
    )


def term_freqs(prepared: DataFrame) -> DataFrame:
    """(doc_id, term) -> field tfs, SHUFFLE-FREE.

    A doc's tokens already sit in one row, so per-(doc, term) counting
    is a narrow map (Arrow-batched Counter per doc) + explode — no
    groupBy exchange at all. At 100 TB this removes the widest shuffle
    of the build (every token row); the only remaining build shuffle is
    the compact (term,int,int,int) rows repartitioned by shard for the
    write. Equivalent to the explode+groupBy formulation
    (term_freqs_shuffle, kept for the equality test).

    Field weighting (reference LemmaUtils.java:18-48) is deferred:
    exact integer tf_path / tf_content are stored; the weighted tf is
    derived at scoring time so the codec stores only ints and floats
    are recomputed identically everywhere.
    """
    if "counts" in prepared.columns:  # fused prepare path: plain explode
        counts = F.col("counts")
    else:  # token-array path (all-JVM tokenizer variant)
        counts = _count_tokens_udf(F.col("path_tokens"), F.col("content_tokens"))
    return (
        prepared.select(
            "doc_id", "shard", "len_path", "len_content",
            F.explode(counts).alias("pc"),
        )
        .select(
            "doc_id",
            F.col("pc.term").alias("term"),
            "shard", "len_path", "len_content",
            F.col("pc.tfp").alias("tf_path"),
            F.col("pc.tfc").alias("tf_content"),
        )
    )


# built as DataType objects: DDL-string parsing would need a live
# session at import time
_COUNTS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType()),
            T.StructField("tfp", T.IntegerType()),
            T.StructField("tfc", T.IntegerType()),
        ]
    )
)


@F.pandas_udf(_COUNTS_TYPE)
def _count_tokens_udf(path_tokens, content_tokens):  # pragma: no cover (executors)
    import pandas as pd
    from collections import Counter

    out = []
    for pt, ct in zip(path_tokens, content_tokens):
        cp = Counter(pt if pt is not None else [])
        cc = Counter(ct if ct is not None else [])
        out.append(
            [
                {"term": t, "tfp": cp.get(t, 0), "tfc": cc.get(t, 0)}
                for t in (cp.keys() | cc.keys())
            ]
        )
    return pd.Series(out)


_PREP_TYPE = T.StructType(
    [
        T.StructField("counts", _COUNTS_TYPE),
        T.StructField("len_path", T.IntegerType()),
        T.StructField("len_content", T.IntegerType()),
    ]
)


def _count_frame(path_counts, content_counts):  # pragma: no cover (executors)
    """Two _count_series results -> the _PREP_TYPE counts DataFrame."""
    import pandas as pd

    (cp, lp), (cc, lc) = path_counts, content_counts
    counts = [
        [
            {"term": t, "tfp": p.get(t, 0), "tfc": c.get(t, 0)}
            for t in (p.keys() | c.keys())
        ]
        for p, c in zip(cp, cc)
    ]
    return pd.DataFrame({"counts": counts, "len_path": lp, "len_content": lc})


@F.pandas_udf(_PREP_TYPE)
def _tokenize_count_udf(path, content):  # pragma: no cover (executors)
    """Fused tokenize + count: strings in, compact (term, tfp, tfc)
    maps + field lengths out — one Arrow round trip per doc batch,
    counts built straight off the regex scan (no token-list second
    pass, stop removal via dict pops)."""
    from posik_engine_spark.functions.tokenizer import _count_series

    return _count_frame(_count_series(path), _count_series(content))


def _tokenize_count_stem_udf(stemmer: str):
    """Stemmed variant of the fused UDF: same single Arrow round trip,
    1->N normal-form expansion applied once per unique surface token
    (reference service/LemmaUtils.java:67 counts every normal form).
    The stemmer NAME (a string) is what the closure captures —
    executors re-resolve it locally, and per-word memoization makes
    each expansion ~one dict hit."""

    @F.pandas_udf(_PREP_TYPE)
    def _udf(path, content):  # pragma: no cover (executors)
        from posik_engine_spark.functions.stemmer import resolve
        from posik_engine_spark.functions.tokenizer import _count_series

        norm = resolve(stemmer)
        return _count_frame(
            _count_series(path, norm.token_re, forms=norm),
            _count_series(content, norm.token_re, forms=norm),
        )

    return _udf


def _tokenize_stem_udf(stemmer: str):
    """Stemmed token-array UDF (the with_token_arrays cross-check path)."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _udf(s):  # pragma: no cover (executors)
        from posik_engine_spark.functions.stemmer import resolve
        from posik_engine_spark.functions.tokenizer import _tokenize_series

        norm = resolve(stemmer)
        return _tokenize_series(s, norm.token_re).map(norm.flat)

    return _udf


def term_freqs_shuffle(prepared: DataFrame) -> DataFrame:
    """Reference formulation (explode + groupBy); used to cross-check
    the shuffle-free term_freqs in tests."""
    base = prepared.select("doc_id", "shard", "len_path", "len_content",
                           "path_tokens", "content_tokens")
    p = base.select(
        "doc_id", "shard", "len_path", "len_content",
        F.explode("path_tokens").alias("term"), F.lit(1).alias("in_path"),
    )
    c = base.select(
        "doc_id", "shard", "len_path", "len_content",
        F.explode("content_tokens").alias("term"), F.lit(0).alias("in_path"),
    )
    return (
        p.unionByName(c)
        .groupBy("doc_id", "term", "shard", "len_path", "len_content")
        .agg(
            F.sum("in_path").cast("int").alias("tf_path"),
            F.sum(1 - F.col("in_path")).cast("int").alias("tf_content"),
        )
    )


def corpus_meta(prepared: DataFrame) -> CorpusMeta:
    row = prepared.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("len_path").alias("slp"),
        F.sum("len_content").alias("slc"),
    ).collect()[0]
    return CorpusMeta(int(row["n"]), int(row["slp"] or 0), int(row["slc"] or 0))


def term_stats(tf: DataFrame, n_salts: int = spec.DEFAULT_N_SALTS) -> DataFrame:
    """term -> (df, ctf) via explicit salted two-phase aggregation (B9).

    Phase 1 keys on (term, salt=pmod(doc_id, n_salts)) so a term
    occurring in ~all docs fans out over n_salts reducers; phase 2
    combines n_salts tiny partials per term. Equivalent to the
    single-phase groupBy (tests assert equality) but skew-proof at
    10^12-file scale where one reducer would otherwise receive an
    entire hot posting list.
    """
    partial = (
        tf.withColumn("salt", F.pmod(F.col("doc_id"), F.lit(n_salts)).cast("int"))
        .groupBy("term", "salt")
        .agg(
            F.count(F.lit(1)).alias("p_df"),
            F.sum(F.col("tf_path") + F.col("tf_content")).alias("p_ctf"),
        )
    )
    return partial.groupBy("term").agg(
        F.sum("p_df").alias("df"), F.sum("p_ctf").alias("ctf")
    )


def weighted_len_expr():
    """dl = len_path * W_path + len_content * W_content (exact op order
    mirrored in oracle.py and spec.bm25_term_score docs)."""
    return (
        F.col("len_path") * F.lit(spec.FIELD_WEIGHT_PATH)
        + F.col("len_content") * F.lit(spec.FIELD_WEIGHT_CONTENT)
    )


def weighted_tf_expr():
    return (
        F.col("tf_path") * F.lit(spec.FIELD_WEIGHT_PATH)
        + F.col("tf_content") * F.lit(spec.FIELD_WEIGHT_CONTENT)
    )


def idf_map(stats: DataFrame, meta: CorpusMeta, terms: list[str]) -> dict[str, float]:
    """Collect df for the given terms and compute idf driver-side in
    Python (math.log) so the oracle and every engine path share the
    exact same float."""
    rows = stats.filter(F.col("term").isin(terms)).select("term", "df").collect()
    return {r["term"]: meta.idf(int(r["df"])) for r in rows}


def kernel_expr(avgdl: float):
    """BM25 score kernel (score = idf * kernel); all-float Catalyst
    expression mirroring spec.bm25_term_score's operation order."""
    wtf = weighted_tf_expr()
    dl = weighted_len_expr()
    return (wtf * F.lit(spec.K1 + 1.0)) / (
        wtf + F.lit(spec.K1) * (F.lit(1.0 - spec.B) + F.lit(spec.B) * dl / F.lit(avgdl))
    )


