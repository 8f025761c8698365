"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship: build the inverted index over sf0.001
               documents and run a BM25 search end-to-end.
queries()    — one entry per implemented operator family from
               SURVEY.md §2 + the training-data pipeline operators;
               each callable (spark, sf_dir) -> DataFrame.
oracle_sql() — exactly-matching DuckDB SQL for EVERY queries() entry
               (set equality is pytest-enforced), including the
               bit-level simhash fingerprints (brute-force paired —
               valid because the Spark blocking is guaranteed-recall),
               recursive-CTE connected components, and the
               deterministic fake media decode.

Float discipline: every float column is round(x, 6) on BOTH sides;
deterministic orderings use rounded keys + id tie-breaks so top-k sets
are engine-independent (see spec.py for the rank-identity rationale).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from posik_engine_spark import spec
from posik_engine_spark.functions.tokenizer import tokenize_expr, tokenize_sql_duckdb
from posik_engine_spark.operators import build as B
from posik_engine_spark.operators import dedup, hybrid, sampling, similarity, textops
from posik_engine_spark.operators.index import build_index
from posik_engine_spark.operators.score import score_terms
from posik_engine_spark.operators.wand import wand_topk

# ------------------------------------------------------------ fixtures
# fixed query-term sets (over the testdata vocabulary)
QTERMS_MAIN = ["spark", "window"]
QTERMS_ALT = ["merge", "sort"]
QTHETA_PROBE = ["spark", "window", "merge", "dup", "the", "scan"]
JACCARD_TAU = 0.5
COSINE_TAU = 0.25
SHINGLE_N = 3
# fixture-scale LSH banding for the 500-doc oracle corpus; the library
# defaults are production-scale (dedup.DEFAULT_N_PERMS/BANDS = 128/16)
FIXTURE_N_PERMS = 6
FIXTURE_BANDS = 3
# fixture-scale hyperplane-LSH banding (library defaults are 64 planes
# / 4 bands + a bucket-size cap — corpus-scale occupancy; at 500
# vectors with tau=0.25 they would generate almost no candidates)
FIXTURE_LSH_PLANES = 8
FIXTURE_LSH_BANDS = 2

# digit -> stop-word path segments: unique per doc_id but tokenizes to
# NOTHING (all stop words), so the engine's path field contributes zero
# postings and the SQL oracle only has to model the content field.
_STOPDIGIT = {
    "0": "a", "1": "an", "2": "and", "3": "are", "4": "as",
    "5": "at", "6": "be", "7": "but", "8": "by", "9": "of",
}


def _docs_contentonly(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = F.col("doc_id").cast("string")
    for digit, word in _STOPDIGIT.items():
        path = F.regexp_replace(path, digit, word + "/")
    return d.select(
        F.col("doc_id").alias("orig_id"),
        F.col("source").alias("repo"),
        path.alias("path"),
        F.lit("00000000").alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


_ENGINE_CACHE: dict[str, tuple] = {}


def _engine_state(spark: SparkSession, sf_dir: str):
    """Memoized per sf_dir: (index, tf, meta, engine_id->orig_id map)."""
    if sf_dir not in _ENGINE_CACHE:
        docs = _docs_contentonly(spark, sf_dir)
        src = docs.select("repo", "path", "commit", "lang", "content")
        ix = build_index(src, n_shards=8)
        prepared = B.prepare_docs(src, n_shards=8)
        tf = B.term_freqs(prepared).cache()
        tf.count()
        idmap = docs.select(
            F.xxhash64("repo", "path", "commit").alias("doc_id"),
            F.col("orig_id"),
        ).cache()
        _ENGINE_CACHE[sf_dir] = (ix, tf, ix.meta, idmap)
    return _ENGINE_CACHE[sf_dir]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _toks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id", F.explode(tokenize_expr("text")).alias("term")
    )


# ---------------------------------------------------------------- entry
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: sf0.001 -> full index build -> BM25 search (WAND path)
    -> hits with snippets as a DataFrame."""
    from posik_engine_spark.corpus import docs_from_documents
    from posik_engine_spark.operators.search import SearchEngine

    docs = docs_from_documents(spark, "/root/testdata/sf0.001")
    engine = SearchEngine.from_docs(spark, docs, n_shards=8)
    resp = engine.search("spark window", limit=20)
    return resp.data


# -------------------------------------------------------------- queries
def q_a1_totals(spark, sf_dir):
    d = _docs(spark, sf_dir)
    t = _toks(spark, sf_dir)
    return d.agg(
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    ).crossJoin(t.agg(F.countDistinct("term").cast("long").alias("n_terms")))


def q_a2_per_source(spark, sf_dir):
    return (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def q_a2_per_source_lemmas(spark, sf_dir):
    """Per-source distinct-term counts — the reference's per-site lemma
    statistic (LemmaRepository.java:13, Detailed.java:19) that
    SearchEngine.statistics() surfaces per repo."""
    return (
        _docs(spark, sf_dir)
        .select("source", F.explode(tokenize_expr("text")).alias("term"))
        .groupBy("source")
        .agg(F.countDistinct("term").cast("long").alias("n_lemmas"))
    )


def q_doc_sha256(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id", F.sha2(F.col("text").cast("binary"), 256).alias("sha")
    )


def q_term_stats(spark, sf_dir):
    return (
        _toks(spark, sf_dir)
        .groupBy("term")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("df"),
            F.count(F.lit(1)).cast("long").alias("ctf"),
        )
    )


def q_theta_filter(spark, sf_dir):
    """Q3: DF-threshold stop filter over a fixed probe term list."""
    stats = q_term_stats(spark, sf_dir)
    n_docs = _docs(spark, sf_dir).count()
    return stats.filter(
        F.col("term").isin(QTHETA_PROBE) & (F.col("df") < spec.THETA * n_docs)
    )


def q_and_candidates(spark, sf_dir):
    """Q4: doc ids containing ALL of QTERMS_MAIN (semi-join chain)."""
    t = _toks(spark, sf_dir).filter(F.col("term").isin(QTERMS_MAIN))
    return (
        t.groupBy("doc_id")
        .agg(F.countDistinct("term").alias("nt"))
        .filter(F.col("nt") == len(QTERMS_MAIN))
        .select("doc_id")
    )


def _bm25_all_matches(spark, sf_dir, terms):
    ix, tf, meta, idmap = _engine_state(spark, sf_dir)
    idfs = B.idf_map(ix.term_stats, meta, terms)
    if set(idfs) != set(terms):
        return spark.createDataFrame([], "doc_id long, score double")
    scored = score_terms(tf, idfs, meta.avgdl)
    return (
        scored.join(idmap, "doc_id")
        .select(F.col("orig_id").alias("doc_id"), F.round("score", 6).alias("score"))
    )


def q_bm25_scores_df(spark, sf_dir):
    """Q5 DataFrame path: BM25 scores of ALL docs matching QTERMS_MAIN."""
    return _bm25_all_matches(spark, sf_dir, QTERMS_MAIN)


def q_bm25_wand(spark, sf_dir):
    """Q4+Q5 fused engine path: block index + block-max WAND with k
    covering every match (set-exact vs the SQL oracle)."""
    ix, _tf, meta, idmap = _engine_state(spark, sf_dir)
    info = ix.term_info(QTERMS_ALT)
    if set(info) != set(QTERMS_ALT):
        return spark.createDataFrame([], "doc_id long, score double")
    idfs = {t: v[0] for t, v in info.items()}
    dfs = {t: v[1] for t, v in info.items()}
    res = wand_topk(ix, idfs, dfs, k=10_000_000)
    return res.join(idmap, "doc_id").select(
        F.col("orig_id").alias("doc_id"), F.round("score", 6).alias("score")
    )


def q_token_count(spark, sf_dir):
    out = textops.token_count(_docs(spark, sf_dir))
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_ws_tokens").cast("long").alias("n_ws_tokens"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )


def q_doc_fingerprint(spark, sf_dir):
    return textops.doc_fingerprint(_docs(spark, sf_dir))


def q_text_quality(spark, sf_dir):
    out = textops.text_quality(_docs(spark, sf_dir))
    return out.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_words").cast("long").alias("n_words"),
        "stop_ratio", "punct_ratio", "digit_ratio",
    )


def q_lang_id(spark, sf_dir):
    return textops.lang_id(_docs(spark, sf_dir))


def q_admitted_docs(spark, sf_dir):
    """Build-side admission filter (SURVEY.md §2 B4, reference
    CrawlerService.java:72,80-83): docs surviving the frozen default
    thresholds (min/max chars, punct/digit ratio). The same predicate
    gates prepare_docs(admission=...) and the job CLI --admit."""
    out = textops.admit_docs(_docs(spark, sf_dir))
    return out.select(
        "doc_id",
        F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long").alias("n_chars"),
    )


def q_dedup_exact(spark, sf_dir):
    out = dedup.exact_dedup(_docs(spark, sf_dir))
    return out.select("sha", F.col("n_docs").cast("long").alias("n_docs"), "keeper")


def q_dedup_ngram_jaccard(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), tau=JACCARD_TAU, n=SHINGLE_N)


def q_dedup_minhash_lsh(spark, sf_dir):
    """Fixture-scale LSH params (6 perms / 3 bands) passed EXPLICITLY:
    the library defaults are production-scale (128/16, steep S-curve),
    which at a 500-doc fixture with tau=0.4 would generate almost no
    candidates to exercise; the oracle mirrors the same 6/3."""
    return dedup.minhash_lsh_pairs(
        _docs(spark, sf_dir), tau=JACCARD_TAU, n=SHINGLE_N,
        n_perms=FIXTURE_N_PERMS, bands=FIXTURE_BANDS,
    )


def q_dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs: 64-bit md5-vote fingerprints, Manku
    combination blocking (6 chunks, 3-chunk combo keys — recall
    GUARANTEED for hamming <= 3), exact hamming verify. Oracle: the
    same fingerprint machinery in DuckDB SQL with brute-force pairing —
    blocking-independent, valid precisely because recall is exact."""
    return dedup.simhash_pairs(_docs(spark, sf_dir), max_hamming=3)


def q_dup_clusters(spark, sf_dir):
    """Near-dup pairs -> connected components (iterative min-label
    propagation); cluster_id = min doc_id of the component."""
    pairs = dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), tau=JACCARD_TAU, n=SHINGLE_N)
    return dedup.dup_clusters(pairs)


def q_stratified_sample(spark, sf_dir):
    """Deterministic ~10% sample by md5-threshold on doc_id."""
    return sampling.stratified_sample(_docs(spark, sf_dir), fraction=0.1).select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("n_chars")
    )


def q_token_batches(spark, sf_dir):
    """Fixed-token-budget training batches per source stratum."""
    toks = textops.token_count(_docs(spark, sf_dir)).select(
        "doc_id", F.col("n_tokens").cast("long").alias("n_tokens")
    )
    d = _docs(spark, sf_dir).select("doc_id", "source").join(toks, "doc_id")
    return sampling.pack_token_batches(d, token_budget=2000)


def q_ann_cosine_all(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q0 = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return (
        emb.select(
            "vec_id",
            F.round(
                similarity.cosine_expr(
                    F.col("embedding"), F.array(*[F.lit(float(x)) for x in q0])
                ),
                6,
            ).alias("cosine"),
        )
    )


def q_ann_cosine_topk(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q0 = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return similarity.cosine_topk(emb, list(q0), k=10)


_IVF_STORE_CACHE: dict[str, similarity.IVFStore] = {}


def _ivf_store(spark, sf_dir) -> similarity.IVFStore:
    """Memoized per sf_dir: save_ivf once (the materialized,
    cid-partitioned assignment), probe it for every query."""
    if sf_dir not in _IVF_STORE_CACHE:
        import tempfile

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        path = os.path.join(tempfile.mkdtemp(prefix="ivf_store_"), "ivf")
        similarity.save_ivf(emb, path, n_centroids=8, iters=0)
        _IVF_STORE_CACHE[sf_dir] = similarity.IVFStore(spark, path)
    return _IVF_STORE_CACHE[sf_dir]


def q_ann_ivf_topk(spark, sf_dir):
    """IVF top-k via the PERSISTED index (similarity.save_ivf +
    IVFStore): md5-seeded deterministic centroids, nearest-centroid
    assignment (rounded-cosine argmax, ties -> lowest cid) materialized
    partitioned by cid, probe the 2 nearest partitions (partition
    pruning — no reassignment scan), exact cosine within. iters=0 keeps
    the whole dataflow SQL-expressible; Lloyd refinement (iters>0) is
    pytest-verified against the exact baseline instead."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q0 = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return _ivf_store(spark, sf_dir).topk(list(q0), k=10, nprobe=2)


def q_ann_lsh_pairs(spark, sf_dir):
    """Fixture-scale banding (8 planes / 2 bands, no bucket cap) passed
    EXPLICITLY — the q_dedup_minhash_lsh pattern; the oracle mirrors the
    same 8/2 and a cap would make the result blocking-dependent."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.hyperplane_lsh_pairs(
        emb, tau=COSINE_TAU, dim=64,
        n_planes=FIXTURE_LSH_PLANES, bands=FIXTURE_LSH_BANDS,
        max_bucket_size=None,
    )


def q_hybrid_rrf_topk(spark, sf_dir):
    """Hybrid lexical+semantic retrieval: reciprocal-rank fusion
    (k0=60, depth=50) of the BM25 ranked list for QTERMS_MAIN over
    ``documents`` and the cosine ranked list for vector 0 over
    ``embeddings`` — doc_id and vec_id share the same id space in the
    synthetic corpus. Both input scores are round-6, so ranks (and
    hence the fusion) are engine-independent."""
    lex = _bm25_all_matches(spark, sf_dir, QTERMS_MAIN)
    sem = q_ann_cosine_all(spark, sf_dir)
    return hybrid.rrf_fuse(lex, sem)


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization (batch oracle form of the stateful
    streaming operator streaming/sessionize.py): 30-min gap sessions
    per user over the events table."""
    from posik_engine_spark.streaming.sessionize import sessionize_batch

    e = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id", "ts", "value")
    out = sessionize_batch(e, gap_minutes=30)
    return out.select(
        "user_id", "session_start", "session_end",
        F.col("n_events").cast("long").alias("n_events"),
        F.round("sum_value", 6).alias("sum_value"),
    )


def q_events_hourly(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def q_lineitem_summary(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
        F.countDistinct("l_orderkey").cast("long").alias("n_orders"),
    )


def q_multimodal_meta(spark, sf_dir):
    """Binary-column plumbing: text bytes as an opaque payload. The
    deterministic fake decode (sha256-derived features) is oracle-
    checked in SQL; a REAL decode stays stubbed
    (operators/multimodal.py)."""
    from posik_engine_spark.operators.multimodal import attach_media_meta, decode_features

    d = _docs(spark, sf_dir).select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    meta = attach_media_meta(d).select("doc_id", "n_bytes", "sniffed_mime")
    feats = decode_features(d, fake=True)
    return meta.join(feats, "doc_id").select(
        "doc_id", F.col("n_bytes").cast("long").alias("n_bytes"),
        "sniffed_mime", F.element_at("features", 1).alias("f0"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "a1_totals": q_a1_totals,
        "a2_per_source": q_a2_per_source,
        "a2_per_source_lemmas": q_a2_per_source_lemmas,
        "doc_sha256": q_doc_sha256,
        "term_stats": q_term_stats,
        "theta_filter": q_theta_filter,
        "and_candidates": q_and_candidates,
        "bm25_scores_df": q_bm25_scores_df,
        "bm25_wand": q_bm25_wand,
        "token_count": q_token_count,
        "doc_fingerprint": q_doc_fingerprint,
        "text_quality": q_text_quality,
        "lang_id": q_lang_id,
        "admitted_docs": q_admitted_docs,
        "dedup_exact": q_dedup_exact,
        "dup_clusters": q_dup_clusters,
        "stratified_sample": q_stratified_sample,
        "token_batches": q_token_batches,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "ann_cosine_all": q_ann_cosine_all,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_lsh_pairs": q_ann_lsh_pairs,
        "hybrid_rrf_topk": q_hybrid_rrf_topk,
        "events_hourly": q_events_hourly,
        "sessionize": q_sessionize,
        "lineitem_summary": q_lineitem_summary,
        "multimodal_meta": q_multimodal_meta,
    }


# ------------------------------------------------------------- oracles
def _sql_toks() -> str:
    return (
        f"SELECT doc_id, unnest({tokenize_sql_duckdb('text')}) AS term FROM documents"
    )


def _sql_in(terms: list[str]) -> str:
    return ", ".join(f"'{t}'" for t in terms)


def _sql_bm25(terms: list[str]) -> str:
    k1, b_, wc = spec.K1, spec.B, spec.FIELD_WEIGHT_CONTENT
    return f"""
WITH toks AS ({_sql_toks()}),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY 1),
nn AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
avg_dl AS (
  SELECT ({wc} * (SELECT coalesce(sum(len), 0) FROM dl)) / (SELECT n_docs FROM nn) AS avgdl
),
stats AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + ((SELECT n_docs FROM nn) - s.df + 0.5) / (s.df + 0.5))
         * (({wc} * tf.tf) * {k1 + 1.0})
         / (({wc} * tf.tf) + {k1} * ({1.0 - b_} + ({b_} * ({wc} * dl.len)) / (SELECT avgdl FROM avg_dl)))
         AS s
  FROM tf JOIN stats s USING (term) JOIN dl USING (doc_id)
  WHERE tf.term IN ({_sql_in(terms)})
)
SELECT doc_id, round(sum(s), 6) AS score
FROM scored GROUP BY doc_id HAVING count(*) = {len(terms)}
"""


def _sql_quality() -> str:
    stop = _sql_in(spec.STOP_TOKENS_SORTED)
    raw = f"regexp_extract_all(lower(text), '{textops.RAW_WORD_RE}')"
    return f"""
SELECT doc_id,
  length(text)::BIGINT AS n_chars,
  len({raw})::BIGINT AS n_words,
  round(CASE WHEN len({raw}) > 0
        THEN len(list_filter({raw}, t -> t IN ({stop})))::DOUBLE / len({raw})
        ELSE 0.0 END, 6) AS stop_ratio,
  round(CASE WHEN length(text) > 0
        THEN length(regexp_replace(lower(text), '{textops.PUNCT_STRIP_RE}', '', 'g'))::DOUBLE / length(text)
        ELSE 0.0 END, 6) AS punct_ratio,
  round(CASE WHEN length(text) > 0
        THEN length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE / length(text)
        ELSE 0.0 END, 6) AS digit_ratio
FROM documents
"""


def _sql_admitted_docs() -> str:
    """Mirror of textops.admission_predicate with the frozen defaults;
    ratios rounded to 6 before comparison, exactly like the Spark side."""
    t = "coalesce(text, '')"
    punct = (
        f"round(CASE WHEN length({t}) > 0 THEN "
        f"length(regexp_replace({t}, '{textops.ADMIT_TEXT_CHAR_RE}', '', 'g'))::DOUBLE"
        f" / length({t}) ELSE 0.0 END, 6)"
    )
    digit = (
        f"round(CASE WHEN length({t}) > 0 THEN "
        f"length(regexp_replace({t}, '[^0-9]', '', 'g'))::DOUBLE"
        f" / length({t}) ELSE 0.0 END, 6)"
    )
    return f"""
SELECT doc_id, length({t})::BIGINT AS n_chars
FROM documents
WHERE length({t}) >= {textops.DEFAULT_MIN_CHARS}
  AND length({t}) <= {textops.DEFAULT_MAX_CHARS}
  AND {punct} <= {textops.DEFAULT_MAX_PUNCT_RATIO}
  AND {digit} <= {textops.DEFAULT_MAX_DIGIT_RATIO}
"""


def _sql_lang_id() -> str:
    raw = f"regexp_extract_all(lower(text), '{textops.RAW_WORD_RE}')"
    langs = sorted(textops.LANG_WORDLISTS)
    hits = ",\n  ".join(
        f"len(list_filter({raw}, t -> t IN ({_sql_in(list(textops.LANG_WORDLISTS[lg]))}))) AS h_{lg}"
        for lg in langs
    )
    best = "greatest(" + ", ".join(f"h_{lg}" for lg in langs) + ")"
    n_at_max = " + ".join(f"(h_{lg} = best)::INT" for lg in langs)
    first_at_max = "CASE " + " ".join(
        f"WHEN h_{lg} = best THEN '{lg}'" for lg in langs
    ) + " END"
    return f"""
WITH h AS (SELECT doc_id, {hits} FROM documents),
m AS (SELECT *, {best} AS best FROM h)
SELECT doc_id,
  CASE WHEN best > 0 AND ({n_at_max}) = 1 THEN {first_at_max} ELSE 'und' END AS lang_pred
FROM m
"""


def _sql_shingles() -> str:
    toks = tokenize_sql_duckdb("text")
    return f"""
SELECT DISTINCT doc_id, shingle FROM (
  SELECT doc_id,
    unnest(CASE WHEN len(t) >= {SHINGLE_N}
      THEN list_transform(range(0, len(t) - {SHINGLE_N - 1}),
                          i -> array_to_string(t[i + 1 : i + {SHINGLE_N}], ' '))
      ELSE [] END) AS shingle
  FROM (SELECT doc_id, {toks} AS t FROM documents)
)
"""


def _sql_jaccard_pairs() -> str:
    return f"""
WITH sh AS ({_sql_shingles()}),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(common::DOUBLE / (sa.sz + sb.sz - common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(common::DOUBLE / (sa.sz + sb.sz - common), 6) >= {JACCARD_TAU}
"""


def _sql_minhash_lsh() -> str:
    P, BANDS = FIXTURE_N_PERMS, FIXTURE_BANDS
    r = P // BANDS
    sig_cols = ",\n  ".join(
        f"min(md5('{i}:' || shingle)) AS sig_{i}" for i in range(P)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM sigs".format(
            b=b, parts=" || '|' || ".join(f"sig_{b * r + j}" for j in range(r))
        )
        for b in range(BANDS)
    )
    return f"""
WITH sh AS ({_sql_shingles()}),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
sigs AS (SELECT doc_id, {sig_cols} FROM sh GROUP BY doc_id),
buckets AS ({band_selects}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id
),
common AS (
  SELECT c.doc_a, c.doc_b, count(*) AS common
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(common::DOUBLE / (sa.sz + sb.sz - common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(common::DOUBLE / (sa.sz + sb.sz - common), 6) >= {JACCARD_TAU}
"""


def _sql_cosine(expr_a: str, expr_b: str) -> str:
    """Explicit f64 cosine; unordered sums are safe under round(.,6)."""
    return f"""(
  (SELECT sum(x.a * x.b) FROM (
     SELECT unnest(list_transform({expr_a}, v -> v::DOUBLE)) AS a,
            unnest(list_transform({expr_b}, v -> v::DOUBLE)) AS b) x)
  / (sqrt((SELECT sum(y.a * y.a) FROM (SELECT unnest(list_transform({expr_a}, v -> v::DOUBLE)) AS a) y))
   * sqrt((SELECT sum(z.b * z.b) FROM (SELECT unnest(list_transform({expr_b}, v -> v::DOUBLE)) AS b) z)))
)"""


def _sql_ann_all() -> str:
    cos = _sql_cosine("e.embedding", "q.qv")
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, round({cos}, 6) AS cosine
FROM embeddings e, q
"""


def _sql_ann_topk() -> str:
    return _sql_ann_all() + " ORDER BY cosine DESC, vec_id ASC LIMIT 10"


def _sql_ann_ivf(k: int = 8, nprobe: int = 2, topk: int = 10) -> str:
    """Mirror of similarity.ivf_topk(iters=0): same md5-seeded centroid
    pick, same rounded-argmax assignment with lowest-cid ties, same
    probe selection, same final ordering."""
    cos_ac = _sql_cosine("e.embedding", "c.cvec")
    cos_cq = _sql_cosine("c.cvec", "q.qv")
    cos_aq = _sql_cosine("a.embedding", "q.qv")
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
cents AS (
  SELECT (row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id)) - 1 AS cid,
         embedding AS cvec
  FROM embeddings ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT {k}
),
scored AS (
  SELECT e.vec_id, e.embedding, c.cid, round({cos_ac}, 6) AS s
  FROM embeddings e CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
    FROM scored) WHERE rn = 1
),
probes AS (
  SELECT cid FROM (SELECT c.cid, round({cos_cq}, 6) AS s FROM cents c, q)
  ORDER BY s DESC, cid ASC LIMIT {nprobe}
)
SELECT a.vec_id, round({cos_aq}, 6) AS cosine
FROM assign a, q
WHERE a.cid IN (SELECT cid FROM probes)
ORDER BY cosine DESC, a.vec_id ASC LIMIT {topk}
"""


def _sql_ann_lsh() -> str:
    n_planes, bands = FIXTURE_LSH_PLANES, FIXTURE_LSH_BANDS
    r = n_planes // bands
    ws = similarity.plane_weights(n_planes, 64)
    # per-plane dot product as an explicit weighted sum over dims
    bit_exprs = []
    for p in range(n_planes):
        terms = " + ".join(
            f"({w} * embedding[{d + 1}]::DOUBLE)" for d, w in enumerate(ws[p]) if w > 0
        )
        negs = " + ".join(
            f"({-w} * embedding[{d + 1}]::DOUBLE)" for d, w in enumerate(ws[p]) if w < 0
        )
        bit_exprs.append(
            f"CASE WHEN (({terms}) - ({negs})) >= 0 THEN '1' ELSE '0' END"
        )
    sig = " || ".join(bit_exprs)
    band_selects = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, substr(sig, {b * r + 1}, {r}) AS bucket FROM sig"
        for b in range(bands)
    )
    cos = _sql_cosine("ea.embedding", "eb.embedding")
    return f"""
WITH sig AS (SELECT vec_id, embedding, {sig} AS sig FROM embeddings),
buckets AS ({band_selects}),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM buckets a JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b, round({cos}, 6) AS cosine
FROM cand c
JOIN embeddings ea ON ea.vec_id = c.vec_a
JOIN embeddings eb ON eb.vec_id = c.vec_b
WHERE round({cos}, 6) >= {COSINE_TAU}
"""


def _sql_hybrid_rrf(
    depth: int = hybrid.DEFAULT_DEPTH, k0: int = hybrid.RRF_K0, topk: int = 10
) -> str:
    """RRF fusion mirror of hybrid.rrf_fuse: rank each round-6 scored
    list by (score desc, id asc), cut to depth, full-outer join, sum
    1/(k0+rank) with integer ranks (bit-identical doubles in any
    engine), round-6 the two-term sum."""
    return f"""
WITH lex AS ({_sql_bm25(QTERMS_MAIN)}),
lexr AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS lex_rank
  FROM lex ORDER BY score DESC, doc_id ASC LIMIT {depth}
),
sem AS ({_sql_ann_all()}),
semr AS (
  SELECT vec_id AS doc_id, row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS sem_rank
  FROM sem ORDER BY cosine DESC, vec_id ASC LIMIT {depth}
)
SELECT coalesce(lexr.doc_id, semr.doc_id) AS doc_id,
       lexr.lex_rank, semr.sem_rank,
       round(coalesce(1.0::DOUBLE / ({k0} + lexr.lex_rank), 0.0)
           + coalesce(1.0::DOUBLE / ({k0} + semr.sem_rank), 0.0), 6) AS rrf
FROM lexr FULL OUTER JOIN semr ON lexr.doc_id = semr.doc_id
ORDER BY rrf DESC, doc_id ASC LIMIT {topk}
"""


def _sql_simhash_pairs(max_hamming: int = 3) -> str:
    """SimHash pairs, bit-for-bit: md5 low-64 per term (big-endian hex
    prefix), +-tf votes per bit, sign -> bit, signed-int64 wrap, then
    BRUTE-FORCE pairing with bit_count(xor) hamming. Deliberately
    blocking-independent: the Spark side's combination blocking has
    guaranteed recall for hamming <= max_hamming, so its result set
    equals the exhaustive one and the oracle need not (and should not)
    mirror the blocking machinery."""
    return f"""
WITH toks AS ({_sql_toks()}),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
h AS (SELECT doc_id, tf, ('0x' || substr(md5(term), 1, 16))::UBIGINT AS h FROM tf),
votes AS (
  SELECT doc_id, j, SUM(CASE WHEN (h >> j) & 1 = 1 THEN tf ELSE -tf END) AS v
  FROM h, (SELECT unnest(range(64)) AS j) bits GROUP BY 1, 2
),
sim0 AS (
  SELECT doc_id, SUM(CASE WHEN v >= 0 THEN (1::HUGEINT << j) ELSE 0::HUGEINT END) AS s
  FROM votes GROUP BY 1
),
sim AS (
  SELECT d.doc_id,
    coalesce(CASE WHEN s >= 9223372036854775808::HUGEINT
                  THEN (s - 18446744073709551616::HUGEINT)::BIGINT
                  ELSE s::BIGINT END, -1) AS simhash
  FROM documents d LEFT JOIN sim0 USING (doc_id)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash))::INT AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


def _sql_dup_clusters() -> str:
    """Connected components over the jaccard pairs via a recursive
    reachability CTE; cluster = min reachable doc_id."""
    return f"""
WITH RECURSIVE pairs AS ({_sql_jaccard_pairs()}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach AS (
  SELECT a, a AS b FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON e.a = r.b
)
SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
"""


def _sql_stratified_sample(fraction: float = 0.1) -> str:
    threshold = int(fraction * sampling.SAMPLE_BUCKETS)
    return f"""
SELECT doc_id, source, n_chars::BIGINT AS n_chars FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UINTEGER < {threshold}
"""


def _sql_token_batches(budget: int = 2000) -> str:
    return f"""
WITH t AS (
  SELECT doc_id, source, len({tokenize_sql_duckdb('text')})::BIGINT AS n_tokens
  FROM documents
)
SELECT doc_id, source, n_tokens,
  (floor(coalesce(SUM(n_tokens) OVER (
     PARTITION BY source ORDER BY doc_id
     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
   / {budget}))::BIGINT AS batch_id
FROM t
"""


def _sql_multimodal_meta() -> str:
    """payload = utf-8 bytes of text; n_bytes + magic sniff + first fake
    feature (big-endian first sha256 word / 2^32, float32)."""
    return """
SELECT doc_id, octet_length(text::BLOB)::BIGINT AS n_bytes,
  CASE WHEN substr(hex(text::BLOB), 1, 8) = '52494646' THEN 'audio/wav'
       WHEN substr(hex(text::BLOB), 1, 6) = 'FFD8FF' THEN 'image/jpeg'
       WHEN substr(hex(text::BLOB), 1, 8) = '89504E47' THEN 'image/png'
       ELSE 'application/octet-stream' END AS sniffed_mime,
  (('0x' || substr(sha256(text), 1, 8))::UINTEGER::DOUBLE / 4294967296.0)::FLOAT AS f0
FROM documents
"""


def oracle_sql() -> dict[str, str]:
    toks = _sql_toks()
    stop = _sql_in(spec.STOP_TOKENS_SORTED)  # noqa: F841 (kept for debugging)
    return {
        "a1_totals": f"""
            SELECT (SELECT count(DISTINCT source) FROM documents)::BIGINT AS n_sources,
                   (SELECT count(*) FROM documents)::BIGINT AS n_docs,
                   (SELECT count(DISTINCT term) FROM ({toks}))::BIGINT AS n_terms
        """,
        "a2_per_source": "SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY source",
        "a2_per_source_lemmas": f"""
            SELECT source, count(DISTINCT term)::BIGINT AS n_lemmas
            FROM (SELECT source, unnest({tokenize_sql_duckdb('text')}) AS term
                  FROM documents)
            GROUP BY source
        """,
        "doc_sha256": "SELECT doc_id, sha256(text) AS sha FROM documents",
        "term_stats": f"""
            SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS ctf
            FROM ({toks}) GROUP BY term
        """,
        "theta_filter": f"""
            WITH ts AS (
              SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS ctf
              FROM ({toks}) GROUP BY term)
            SELECT * FROM ts
            WHERE term IN ({_sql_in(QTHETA_PROBE)})
              AND df < {spec.THETA} * (SELECT count(*) FROM documents)
        """,
        "and_candidates": f"""
            SELECT doc_id FROM ({toks})
            WHERE term IN ({_sql_in(QTERMS_MAIN)})
            GROUP BY doc_id HAVING count(DISTINCT term) = {len(QTERMS_MAIN)}
        """,
        "bm25_scores_df": _sql_bm25(QTERMS_MAIN),
        "bm25_wand": _sql_bm25(QTERMS_ALT),
        "token_count": f"""
            SELECT doc_id,
                   len({tokenize_sql_duckdb('text')})::BIGINT AS n_tokens,
                   len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS n_ws_tokens,
                   length(text)::BIGINT AS n_chars
            FROM documents
        """,
        "doc_fingerprint": f"""
            SELECT doc_id,
                   md5(array_to_string({tokenize_sql_duckdb('text')}, ' ')) AS fingerprint
            FROM documents
        """,
        "text_quality": _sql_quality(),
        "admitted_docs": _sql_admitted_docs(),
        "lang_id": _sql_lang_id(),
        "dedup_exact": """
            SELECT sha256(text) AS sha, count(*)::BIGINT AS n_docs, min(doc_id) AS keeper
            FROM documents GROUP BY sha256(text)
        """,
        "dedup_ngram_jaccard": _sql_jaccard_pairs(),
        "dedup_minhash_lsh": _sql_minhash_lsh(),
        "dedup_simhash": _sql_simhash_pairs(),
        "dup_clusters": _sql_dup_clusters(),
        "stratified_sample": _sql_stratified_sample(),
        "token_batches": _sql_token_batches(),
        "ann_cosine_all": _sql_ann_all(),
        "ann_cosine_topk": _sql_ann_topk(),
        "ann_ivf_topk": _sql_ann_ivf(),
        "ann_lsh_pairs": _sql_ann_lsh(),
        "hybrid_rrf_topk": _sql_hybrid_rrf(),
        "events_hourly": """
            SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
                   count(*)::BIGINT AS n, round(sum(value), 6) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "sessionize": """
            WITH flagged AS (
              SELECT user_id, ts, value,
                CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
                     THEN 1 ELSE 0 END AS new_sess
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            sess AS (
              SELECT *, SUM(new_sess) OVER (
                PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
              FROM flagged
            )
            SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
                   count(*)::BIGINT AS n_events, round(sum(value), 6) AS sum_value
            FROM sess GROUP BY user_id, sess_id
        """,
        "lineitem_summary": """
            SELECT l_returnflag, l_linestatus, count(*)::BIGINT AS n_rows,
                   round(sum(l_quantity), 6) AS sum_qty,
                   count(DISTINCT l_orderkey)::BIGINT AS n_orders
            FROM lineitem GROUP BY 1, 2
        """,
        "multimodal_meta": _sql_multimodal_meta(),
    }
