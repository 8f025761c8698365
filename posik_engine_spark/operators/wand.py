"""Block-max WAND top-k over the sharded block index (SURVEY.md §7 M2).

AND-semantics top-k (a doc must contain all query terms — reference
/root/reference/.../service/DatabaseService.java:215-223) with the
three pruning levers of the north rule:

1. rarest-first posting intersection (reference orders lemmas by
   frequency ascending, repositories/LemmaRepository.java:27): the
   shortest list seeds the candidate set; subsequent lists only decode
   blocks whose [doc_id_min, doc_id_max] overlaps surviving candidates;
2. block-max upper bounds: per-candidate ub = Σ_t idf_t *
   kernel(max_tfp, max_tfc, min_lenp, min_lenc, avgdl) of the block
   containing the doc — a valid upper bound because the kernel is
   monotone increasing in wtf and decreasing in dl;
3. WAND-style early termination: candidates scored in descending-ub
   chunks; once the running kth score strictly exceeds the next chunk's
   ub, the remainder cannot enter the top-k (ties lose by the strict
   inequality), so scoring stops.

Execution model: each shard is a complete mini-index over its docs, and
blocks carry per-doc field lengths inline (Lucene-norms style), so an
unscoped query is ONE single-input grouped-map UDF over the blocks of
the query terms — doc_stats is only cogrouped in when a repo scope
filter needs doc→repo. Per-shard top-k heaps merge on the driver via
TakeOrderedAndProject — no cross-shard shuffle of postings, ever.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from posik_engine_spark import spec
from posik_engine_spark.operators.index import Index, kernel_np

_OUT_SCHEMA = "doc_id long, score double"
# Scoring-chunk schedule: geometric growth from ~heap size up to the
# vectorization sweet spot. A FIXED large chunk makes the kth-score cut
# unreachable whenever a shard has fewer candidates than the chunk
# (everything lands in chunk 0, kth is only known after scoring it) —
# interactive k is ~10-50, so start near k and double.
_CHUNK = 1024  # max chunk size (numpy batch sweet spot)
_CHUNK0 = 64  # first chunk ~ top-k heap size; the cut can fire after it


def _decode_blocks(bpdf: pd.DataFrame, avgdl: float, lo: np.ndarray | None = None):
    """Decode the blocks of one term, optionally pruned to blocks whose
    doc-id range intersects candidate ids ``lo`` (sorted). Returns
    (ids, tfp, tfc, ub_kernel, lenp, lenc) where ub_kernel is the
    per-doc block bound kernel(max_tfp, max_tfc, min_lenp, min_lenc,
    avgdl) and lenp/lenc are the inline per-doc field lengths."""
    from posik_engine_spark.functions import codec

    if lo is not None and len(bpdf):
        bmin = bpdf["doc_id_min"].to_numpy(np.int64)
        bmax = bpdf["doc_id_max"].to_numpy(np.int64)
        # block overlaps candidates iff some candidate in [bmin, bmax]
        left = np.searchsorted(lo, bmin, side="left")
        keep = (left < len(lo)) & (lo[np.minimum(left, len(lo) - 1)] <= bmax)
        bpdf = bpdf[keep]
    if not len(bpdf):
        z = np.empty(0, dtype=np.int64)
        return z, z, z, np.empty(0, dtype=np.float64), z, z
    # one column extraction + ONE vectorized bound-kernel call for all
    # blocks: itertuples + per-block 1-element kernel calls dominated
    # the warm serving profile (pandas row machinery, not the actual
    # varint decode). Elementwise kernel_np over the block-metadata
    # vectors is float-identical to the per-block scalar calls.
    # doc ids decode per block (each block restarts its delta chain);
    # the four count streams have NO cross-value state, and every block
    # buffer ends on a complete varint, so the CONCATENATED streams
    # decode to exactly the concatenated arrays — one decode call each
    # instead of one per block
    ids_parts = [codec.decode_doc_ids(b) for b in bpdf["docs"].tolist()]
    tfp = codec.decode_counts(b"".join(bpdf["tfp"].tolist()))
    tfc = codec.decode_counts(b"".join(bpdf["tfc"].tolist()))
    lenp = codec.decode_counts(b"".join(bpdf["lenp"].tolist()))
    lenc = codec.decode_counts(b"".join(bpdf["lenc"].tolist()))
    lens = np.array([len(x) for x in ids_parts], dtype=np.int64)
    n_post = int(lens.sum())
    if not (len(tfp) == len(tfc) == len(lenp) == len(lenc) == n_post):
        # per-block decode caught a truncated buffer via its final
        # continuation bit; in a concatenated stream a mid-stream
        # truncation merges into the next block's varints instead —
        # the total count is the restored detector
        raise ValueError(
            "posting block count streams misaligned with doc ids "
            "(corrupt posting block)"
        )
    ubk = kernel_np(
        bpdf["max_tfp"].to_numpy(np.int64),
        bpdf["max_tfc"].to_numpy(np.int64),
        bpdf["min_lenp"].to_numpy(np.int64),
        bpdf["min_lenc"].to_numpy(np.int64),
        avgdl,
    )
    return (
        np.concatenate(ids_parts),
        tfp,
        tfc,
        np.repeat(ubk, lens),
        lenp,
        lenc,
    )


def shard_topk(
    blocks_pdf: pd.DataFrame,
    stats_pdf: pd.DataFrame | None,
    terms_rarest_first: list[str],
    idfs: dict[str, float],
    avgdl: float,
    k: int,
    repos: list[str] | None = None,
    diag: dict | None = None,
) -> pd.DataFrame:
    """Pure-pandas/numpy shard-local block-max WAND (unit-testable
    without Spark; the grouped-map UDF delegates here).

    ``stats_pdf`` is only required when ``repos`` scoping is requested;
    field lengths come from the blocks themselves. Pass ``diag={}`` to
    collect pruning counters (postings_decoded, candidates,
    candidates_scored) — the effectiveness tests use them; the UDF path
    passes nothing.
    """
    empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "score": pd.Series(dtype="float64")})
    if k <= 0:
        # the scoring loop's kth-score selection assumes k >= 1
        # (np.partition at len-k); an empty window wants no rows anyway
        return empty
    if repos is not None and (stats_pdf is None or not len(stats_pdf)):
        # the registry side arrives pre-filtered to the scoped repos: a
        # shard can hold the query terms' blocks while the scope owns
        # none of its docs — nothing can match, skip the decode outright
        return empty
    by_term = dict(tuple(blocks_pdf.groupby("term", sort=False)))
    if any(t not in by_term for t in terms_rarest_first):
        return empty  # AND: some term absent from this shard entirely

    # --- rarest-first intersection with block-range pruning
    t0 = terms_rarest_first[0]
    cand, tfp0, tfc0, maxk0, lenp, lenc = _decode_blocks(
        by_term[t0].sort_values("block_id", kind="mergesort"), avgdl
    )
    aligned: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {
        t0: (tfp0, tfc0, maxk0)
    }
    if diag is not None:
        diag["postings_decoded"] = len(cand)
    for t in terms_rarest_first[1:]:
        ids_t, tfp_t, tfc_t, maxk_t, _, _ = _decode_blocks(
            by_term[t].sort_values("block_id", kind="mergesort"), avgdl, lo=cand
        )
        if diag is not None:
            diag["postings_decoded"] = diag["postings_decoded"] + len(ids_t)
        common, ia, ib = np.intersect1d(
            cand, ids_t, assume_unique=True, return_indices=True
        )
        if len(common) == 0:
            return empty
        for prev, (a, b, c) in aligned.items():
            aligned[prev] = (a[ia], b[ia], c[ia])
        lenp, lenc = lenp[ia], lenc[ia]
        aligned[t] = (tfp_t[ib], tfc_t[ib], maxk_t[ib])
        cand = common

    # --- optional repo scoping via doc_stats lookup
    if repos is not None:
        sids = stats_pdf["doc_id"].to_numpy(np.int64)
        order = np.argsort(sids, kind="mergesort")
        sids = sids[order]
        pos = np.searchsorted(sids, cand)
        found = (pos < len(sids)) & (sids[np.minimum(pos, len(sids) - 1)] == cand)
        repo_arr = stats_pdf["repo"].to_numpy()[order]
        found &= np.isin(repo_arr[np.minimum(pos, len(sids) - 1)], repos)
        if not found.all():
            cand = cand[found]
            lenp, lenc = lenp[found], lenc[found]
            aligned = {
                t: (a[found], b[found], c[found]) for t, (a, b, c) in aligned.items()
            }
        if len(cand) == 0:
            return empty

    # --- block-max upper bounds + chunked early-terminated scoring
    ub = np.zeros(len(cand), dtype=np.float64)
    for t in terms_rarest_first:
        ub += idfs[t] * aligned[t][2]
    by_ub = np.argsort(-ub, kind="mergesort")

    terms_asc = sorted(terms_rarest_first)  # score fold order (spec.py)
    scored_idx: list[np.ndarray] = []
    scored_val: list[np.ndarray] = []
    n_scored = 0
    kth = -np.inf
    c0 = 0
    size = max(k, _CHUNK0)
    while c0 < len(by_ub):
        chunk = by_ub[c0 : c0 + size]
        c0 += len(chunk)
        size = min(size * 2, _CHUNK)
        if n_scored >= k and ub[chunk[0]] < kth:
            break  # WAND cut: no remaining candidate can reach the top-k
        acc = np.zeros(len(chunk), dtype=np.float64)
        for t in terms_asc:
            tfp_t, tfc_t, _ = aligned[t]
            acc = acc + idfs[t] * kernel_np(
                tfp_t[chunk], tfc_t[chunk], lenp[chunk], lenc[chunk], avgdl
            )
        scored_idx.append(chunk)
        scored_val.append(acc)
        n_scored += len(chunk)
        if n_scored >= k:
            allv = np.concatenate(scored_val)
            kth = np.partition(allv, len(allv) - k)[len(allv) - k]

    idx = np.concatenate(scored_idx)
    val = np.concatenate(scored_val)
    if diag is not None:
        diag["candidates"] = len(cand)
        diag["candidates_scored"] = int(len(idx))
    sel = np.lexsort((cand[idx], -val))[:k]
    return pd.DataFrame({"doc_id": cand[idx][sel], "score": val[sel]})


def wand_topk_driver(
    ix: Index,
    term_idfs: dict[str, float],
    term_dfs: dict[str, int],
    k: int,
    repos: list[str] | None = None,
    diag: dict | None = None,
    rows: list | None = None,
) -> list:
    """Driver-local top-k over the query terms' collected blocks —
    result-identical to wand_topk (same shard_topk kernel per shard,
    same merge order), minus the grouped-map round trip.

    The Lucene-style serving hybrid: an interactive query touches only
    its terms' posting blocks (sum(df) postings, delta+varint — a few
    MB even for millions of postings), so the engine COLLECTS those
    blocks with one pruned scan and scores them locally; the
    distributed path exists for queries whose posting volume exceeds
    spec.DRIVER_WAND_MAX_POSTINGS. On a multi-executor cluster 'driver'
    is the serving coordinator — the same place the per-shard top-k
    heaps merge in the distributed path anyway.

    Repo-scoped queries collect doc_stats pre-filtered to the scoped
    repos: shard_topk's membership test (candidate present AND repo in
    scope) collapses to presence in the filtered frame, so the result
    is unchanged. CAVEAT: that collect is proportional to the scoped
    repos' DOC COUNT, which the posting-volume gate does not bound —
    SearchEngine therefore routes scoped queries to the distributed
    path and uses this function only unscoped; the scoped support here
    exists for small-corpus callers and the identity tests.
    """
    terms = sorted(term_idfs, key=lambda t: (term_dfs.get(t, 0), t))
    if not terms:
        raise ValueError("wand_topk_driver: empty term list")
    avgdl = ix.meta.avgdl
    idfs = dict(term_idfs)
    if rows is None:
        rows = ix.blocks.filter(F.col("term").isin(terms)).collect()
    # else: caller pre-fetched the terms' block rows (SearchEngine's
    # bounded per-term cache — a hit serves with zero index-scan jobs)
    if not rows:
        return []
    bpdf = pd.DataFrame([r.asDict() for r in rows])
    if diag is not None:
        # postings_total = what a no-pruning engine would decode+score
        # (every posting of every query term); per-shard kernels add
        # postings_decoded / candidates / candidates_scored below —
        # the across-rounds WAND-effectiveness counters (bench.py)
        diag["postings_total"] = diag.get("postings_total", 0) + int(
            bpdf["n_docs"].sum()
        )
    stats_by_shard: dict[int, pd.DataFrame] = {}
    if repos is not None:
        srows = (
            ix.doc_stats.filter(F.col("repo").isin(list(repos)))
            .select("shard", "doc_id", "repo")
            .collect()
        )
        sdf = pd.DataFrame(
            [r.asDict() for r in srows], columns=["shard", "doc_id", "repo"]
        )
        stats_by_shard = {s: g for s, g in sdf.groupby("shard")} if len(sdf) else {}
    parts = []
    for shard, pdf in bpdf.groupby("shard", sort=False):
        if repos is not None:
            spdf = stats_by_shard.get(shard)
            if spdf is None:
                continue  # scoped repos have no docs in this shard
        else:
            spdf = None
        sdiag: dict | None = {} if diag is not None else None
        parts.append(
            shard_topk(pdf, spdf, terms, idfs, avgdl, k, repos=repos, diag=sdiag)
        )
        if diag is not None:
            for key in ("postings_decoded", "candidates", "candidates_scored"):
                diag[key] = diag.get(key, 0) + int(sdiag.get(key, 0))
    if not parts:
        return []
    merged = pd.concat(parts, ignore_index=True)
    if merged.empty:
        return []
    merged = merged.sort_values(
        ["score", "doc_id"], ascending=[False, True], kind="mergesort"
    ).head(k)
    from pyspark.sql import Row

    return [
        Row(doc_id=int(d), score=float(s))
        for d, s in zip(merged["doc_id"], merged["score"])
    ]


def wand_topk(
    ix: Index,
    term_idfs: dict[str, float],
    term_dfs: dict[str, int],
    k: int,
    repos: list[str] | None = None,
) -> DataFrame:
    """Distributed top-k: per-shard WAND UDF + driver merge.

    Unscoped: single-input grouped map over the query terms' blocks
    (lengths are inline). Repo-scoped: cogroup with doc_stats for the
    doc→repo lookup.
    """
    terms = sorted(term_idfs, key=lambda t: (term_dfs.get(t, 0), t))
    if not terms:
        raise ValueError("wand_topk: empty term list")
    avgdl = ix.meta.avgdl
    idfs = dict(term_idfs)

    qb = ix.blocks.filter(F.col("term").isin(terms))
    if repos is None:

        def per_shard_solo(_key, blocks_pdf: pd.DataFrame) -> pd.DataFrame:
            return shard_topk(blocks_pdf, None, terms, idfs, avgdl, k)

        res = qb.groupBy("shard").applyInPandas(per_shard_solo, _OUT_SCHEMA)
    else:

        def per_shard(_key, blocks_pdf: pd.DataFrame, stats_pdf: pd.DataFrame) -> pd.DataFrame:
            return shard_topk(blocks_pdf, stats_pdf, terms, idfs, avgdl, k, repos=repos)

        # pre-filter the cogroup's registry side to the scoped repos —
        # shard_topk's membership test (candidate in stats AND repo in
        # scope) is unchanged by dropping rows that fail it anyway, and
        # the per-query exchange now carries O(scoped docs), not
        # O(corpus) (file-backed doc_stats is repo-sorted, so the
        # predicate also prunes row groups; the driver hybrid does the
        # identical pre-filter)
        ds = ix.doc_stats.filter(F.col("repo").isin(list(repos))).select(
            "shard", "doc_id", "repo"
        )
        res = (
            qb.groupBy("shard")
            .cogroup(ds.groupBy("shard"))
            .applyInPandas(per_shard, _OUT_SCHEMA)
        )
    return res.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
