"""Hybrid lexical+semantic retrieval: reciprocal-rank fusion (RRF).

The operator an LLM-data / retrieval pipeline actually runs once it has
both indexes: a BM25 (lexical) ranked list and an ANN (semantic) ranked
list over the same document ids, fused by

    rrf(d) = Σ_lists 1 / (k0 + rank_list(d))      (Cormack et al., 2009)

with k0 = 60 (the paper's constant). RRF needs only ranks — it is
immune to the two scorers' incomparable score scales — and with integer
ranks the per-list contribution ``1.0 / (k0 + rank)`` is the same IEEE
double in any engine, which makes the fusion deterministically
oracle-checkable (DuckDB mirrors it bit-for-bit; two-term float adds
are order-insensitive).

Scale shape: each input list is cut to its top-n via ``orderBy().limit``
(TakeOrderedAndProject — per-partition heaps, driver merge of n rows,
never a global sort), ranks are assigned over those ≤ n rows, and the
fusion is a full-outer join of two ≤ n-row sides. The expensive work —
producing the two scored lists — stays in the underlying indexes (WAND
block pruning, IVF partition pruning); fusion itself touches O(n) rows
regardless of corpus size.

Reference parity note: the reference engine has no ANN index, so this
operator is an extension beyond /root/reference (flagged as such in
SURVEY.md §2 — part of the LLM-pipeline family, like dedup/ANN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_K0: int = 60  # the constant from the RRF paper; callers may override
DEFAULT_DEPTH: int = 50  # per-list cut before fusion


def ranked_topn(
    df: DataFrame, id_col: str, score_col: str, n: int
) -> DataFrame:
    """(id, score) -> (id, rank) for the top-n rows by
    (score desc, id asc). The limit compiles to TakeOrderedAndProject
    (distributed per-partition heaps); the rank window then runs over
    ≤ n rows, so its single-partition exchange is O(n), not O(corpus).
    Deterministic: callers pass scores already rounded to a fixed
    precision so cross-engine rank comparisons agree."""
    cut = df.select(
        F.col(id_col).alias("doc_id"), F.col(score_col).alias("_s")
    ).orderBy(F.desc("_s"), F.asc("doc_id")).limit(n)
    w = Window.orderBy(F.desc("_s"), F.asc("doc_id"))
    # long to match SQL engines' BIGINT row_number in oracle checks
    return cut.select("doc_id", F.row_number().over(w).cast("long").alias("rank"))


def rrf_fuse(
    lexical: DataFrame,
    semantic: DataFrame,
    *,
    id_cols: tuple[str, str] = ("doc_id", "vec_id"),
    score_cols: tuple[str, str] = ("score", "cosine"),
    depth: int = DEFAULT_DEPTH,
    k0: int = RRF_K0,
    topk: int = 10,
) -> DataFrame:
    """Fuse a lexical and a semantic scored list into the RRF top-k.

    Returns (doc_id, lex_rank, sem_rank, rrf) — ranks are 1-based or
    NULL when the doc appears in only one list; rrf is rounded to 6 for
    stable cross-engine comparison (ranks are exact ints, so rounding
    only canonicalizes the final double)."""
    lex = ranked_topn(lexical, id_cols[0], score_cols[0], depth)
    sem = ranked_topn(semantic, id_cols[1], score_cols[1], depth).withColumnRenamed(
        "rank", "sem_rank"
    )
    lex = lex.withColumnRenamed("rank", "lex_rank")
    contrib = lambda c: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(k0) + F.col(c).cast("double")), F.lit(0.0)
    )
    return (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            "lex_rank",
            "sem_rank",
            F.round(contrib("lex_rank") + contrib("sem_rank"), 6).alias("rrf"),
        )
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(topk)
    )


def rrf_fuse_rows(
    ranked_lists: list[list[int]], *, k0: int = RRF_K0, topk: int = 10
) -> list[tuple[int, float]]:
    """Driver-side RRF over already-materialized ranked id lists (the
    serving path: SearchEngine.search hits + IVFStore.topk rows are both
    ≤ k driver rows — fusing them through Spark would cost two jobs for
    nothing). Same math as rrf_fuse INCLUDING the round-6 score
    canonicalization — without it two docs whose exact doubles differ
    by <1e-6 would tie (then order by doc_id) in the DataFrame path but
    order by raw score here, breaking cross-path determinism. List
    order = rank order."""
    from posik_engine_spark.operators.similarity import round6_half_up

    acc: dict[int, float] = {}
    for ids in ranked_lists:
        for r, d in enumerate(ids, start=1):
            acc[d] = acc.get(d, 0.0) + 1.0 / (k0 + r)
    return sorted(
        ((d, round6_half_up(v)) for d, v in acc.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )[:topk]
