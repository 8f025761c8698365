"""DataFrame BM25 scoring path (SURVEY.md §2 Q4/Q5, §7 M1).

The Catalyst-only scoring pipeline: semi-join-style AND intersection +
per-doc deterministic score fold + TakeOrderedAndProject top-k. This is
the reference path the WAND path (operators/wand.py) must equal
bit-for-bit; it is also the SQL-expressible form the DuckDB oracle
mirrors.

Reference semantics: AND intersection rarest-first
(/root/reference/.../service/DatabaseService.java:212-225), scoring agg
+ top-k (/root/reference/.../repositories/PageRepository.java:22-44)
with the window-by-path quirk consciously fixed to group by doc_id
(SURVEY.md §8.5); ranking replaced by BM25 per the north rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from posik_engine_spark import spec
from posik_engine_spark.operators.build import kernel_expr


def score_terms(
    tf: DataFrame,
    term_idfs: dict[str, float],
    avgdl: float,
    doc_filter: DataFrame | None = None,
    require_all: bool = True,
) -> DataFrame:
    """Score docs for the given terms -> (doc_id, n_terms, score).

    ``term_idfs``: idf per query term, computed driver-side in Python
    (build.idf_map) so floats are shared with the oracle. The idf
    lookup is a broadcast join against a literal map — no shuffle on
    the tiny side.

    AND semantics (require_all): doc must match every term (reference
    DatabaseService.java:215-223). The per-doc score is a left fold
    over (term, score) structs sorted ascending by term, making float
    addition order independent of partitioning — rank identity across
    local[N] levels and vs the oracle.
    """
    terms = sorted(term_idfs)
    if not terms:
        raise ValueError("score_terms: empty term list")
    idf_col = F.create_map(
        *[x for t in terms for x in (F.lit(t), F.lit(float(term_idfs[t])))]
    )
    q = tf.filter(F.col("term").isin(terms))
    if doc_filter is not None:
        # repo scoping (reference Q1): semi-join against the doc ids of
        # the allowed repos; broadcast-eligible when the scope is small
        q = q.join(doc_filter.select("doc_id"), "doc_id", "left_semi")
    q = q.withColumn("s", idf_col[F.col("term")] * kernel_expr(avgdl))
    per_doc = q.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("term", "s"))),
            F.lit(0.0),
            lambda acc, x: acc + x["s"],
        ).alias("score"),
    )
    if require_all:
        per_doc = per_doc.filter(F.col("n_terms") == len(terms))
    return per_doc.select("doc_id", "n_terms", "score")


def topk(scored: DataFrame, offset: int = 0, limit: int = spec.DEFAULT_LIMIT) -> DataFrame:
    """Deterministic top-k: score desc, doc_id asc tie-break (SURVEY.md
    §2 Q5). orderBy().limit() compiles to TakeOrderedAndProject — no
    full sort at scale. OFFSET is applied by slicing the collected
    (offset+limit) head driver-side by callers that paginate."""
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(offset + limit)
