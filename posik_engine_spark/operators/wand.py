"""Block-max WAND top-k over the sharded block index (SURVEY.md §7 M2).

AND-semantics top-k (a doc must contain all query terms — reference
/root/reference/.../service/DatabaseService.java:215-223) with the
three pruning levers of the north rule:

1. rarest-first posting intersection (reference orders lemmas by
   frequency ascending, repositories/LemmaRepository.java:27): the
   shortest list seeds the candidate set; subsequent lists only decode
   blocks whose [ord_min, ord_max] overlaps surviving candidates;
2. block-max upper bounds: per-candidate ub = Σ_t idf_t *
   kernel(max_tfp, max_tfc, min_lenp, min_lenc, avgdl) of the block
   containing the doc — a valid upper bound because the kernel is
   monotone increasing in wtf and decreasing in dl;
3. WAND-style early termination: candidates scored in descending-ub
   chunks; once the running kth score strictly exceeds the next chunk's
   ub, the remainder cannot enter the top-k (ties lose by the strict
   inequality), so scoring stops.

Postings are DENSE PER-SHARD ORDINALS ordered by (repo, path) —
operators/index.py module docstring — so block ranges have locality
and lever 1 actually fires on real corpora. Scores never depend on
ids; the global tie-break needs the EXTERNAL doc_id, so every
per-shard kernel keeps ALL candidates tied at its kth score (any doc
it drops has >= k strictly-better docs in its own shard and can never
enter the global top-k), and the ord -> doc_id resolution happens
once, on those <= ~k survivors, before the final (score desc, doc_id
asc) cut.

Execution model: each shard is a complete mini-index over its docs, and
blocks carry per-doc field lengths inline (Lucene-norms style), so an
unscoped query is ONE single-input grouped-map UDF over the blocks of
the query terms — doc_stats is only cogrouped in when a repo scope
filter needs ord→repo; the ord → doc_id resolution of the <= ~k
survivors is a broadcast join (distributed path) or a cached driver
point lookup (serving path). Per-shard top-k heaps merge on the driver
via TakeOrderedAndProject — no cross-shard shuffle of postings, ever.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from posik_engine_spark import spec
from posik_engine_spark.operators.index import Index, kernel_np

log = logging.getLogger(__name__)

# n_out = rows this shard emitted (constant within the shard): the
# distributed resolution join compares it against the per-shard count
# of RESOLVED rows, so a registry missing scored ordinals fails loudly
# (like _finalize_topk) instead of silently truncating the top-k —
# round-4 advisor finding.
_OUT_SCHEMA = "shard int, ord long, score double, n_out int"
# Scoring-chunk schedule: geometric growth from ~heap size up to the
# vectorization sweet spot. A FIXED large chunk makes the kth-score cut
# unreachable whenever a shard has fewer candidates than the chunk
# (everything lands in chunk 0, kth is only known after scoring it) —
# interactive k is ~10-50, so start near k and double.
_CHUNK = 1024  # max chunk size (numpy batch sweet spot)
_CHUNK0 = 64  # first chunk ~ top-k heap size; the cut can fire after it


def _decode_blocks(bpdf: pd.DataFrame, avgdl: float, lo: np.ndarray | None = None):
    """Decode the blocks of one term, optionally pruned to blocks whose
    ordinal range intersects candidate ords ``lo`` (sorted). Returns
    (ords, tfp, tfc, ub_kernel, lenp, lenc) where ub_kernel is the
    per-doc block bound kernel(max_tfp, max_tfc, min_lenp, min_lenc,
    avgdl) and lenp/lenc are the inline per-doc field lengths."""
    from posik_engine_spark.functions import codec

    if lo is not None and len(bpdf):
        bmin = bpdf["ord_min"].to_numpy(np.int64)
        bmax = bpdf["ord_max"].to_numpy(np.int64)
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
    # ordinals decode per block (each block restarts its delta chain);
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
    without Spark; the grouped-map UDF delegates here). Operates
    entirely in ORDINAL space; returns (ord, score) rows.

    Returns the top-k KEEPING score ties at the boundary (possibly
    more than k rows): the global tie-break is on the external doc_id,
    which this kernel never sees — the caller resolves survivors'
    ordinals and applies the exact (score desc, doc_id asc) cut. Any
    row dropped here has >= k strictly-higher-scored docs in this
    shard alone, so it can never enter the global top-k.

    ``stats_pdf`` is only required when ``repos`` scoping is requested;
    field lengths come from the blocks themselves. Pass ``diag={}`` to
    collect pruning counters (postings_decoded, candidates,
    candidates_scored) — the effectiveness tests use them; the UDF path
    passes nothing.
    """
    empty = pd.DataFrame({"ord": pd.Series(dtype="int64"),
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

    # --- optional repo scoping via the pre-filtered registry's ords
    # (ordinals are (repo, path)-ordered, so a scope is a contiguous
    # ordinal range per shard — the membership test below is a sorted
    # searchsorted over it)
    if repos is not None:
        sids = np.sort(stats_pdf["ord"].to_numpy(np.int64), kind="mergesort")
        pos = np.searchsorted(sids, cand)
        found = (pos < len(sids)) & (sids[np.minimum(pos, len(sids) - 1)] == cand)
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
    if len(val) > k:
        # keep-ties cut: everything with score >= the kth score
        # survives to the caller's doc_id-resolved global tie-break
        kth = np.partition(val, len(val) - k)[len(val) - k]
        keep = val >= kth
        idx, val = idx[keep], val[keep]
    order = np.lexsort((cand[idx], -val))
    cap = spec.WAND_TIE_CAP_FACTOR * k
    if len(order) > cap:
        # bounded keep-ties (round-4 advisor): a corpus with thousands
        # of duplicate-content docs can tie EXACTLY at the kth score,
        # making the survivor set (and the downstream merge/resolution)
        # scale with the tie-group size instead of k. Beyond the cap,
        # boundary ties break deterministically by shard-local ordinal
        # (== (repo, path) order) instead of global doc_id; every doc
        # strictly above the boundary score is still exact.
        log.warning(
            "wand shard_topk: kth-score tie group overflows the keep-"
            "ties cap (%d survivors > %d = WAND_TIE_CAP_FACTOR*k); "
            "boundary ties break by (repo, path) order, not doc_id",
            len(order), cap,
        )
        if diag is not None:
            diag["tie_overflow"] = diag.get("tie_overflow", 0) + 1
        order = order[:cap]
    return pd.DataFrame({"ord": cand[idx][order], "score": val[order]})


def _resolve_ords_spark(ix: Index, keys: list[tuple[int, int]]) -> dict:
    """(shard, ord) -> doc_id via ONE pruned doc_stats lookup: shard is
    the parquet partition key and files are ord-sorted, so the OR of
    per-shard `ord IN (...)` predicates prunes partitions + row groups
    — the same point-lookup shape as the content store. Key sets past
    spec.RESOLVE_ISIN_MAX_KEYS switch to a broadcast join of a keys
    DataFrame instead (a giant IN literal bloats planning faster than
    the join costs — round-4 advisor note; the keep-ties cap keeps real
    queries far below the threshold)."""
    if not keys:
        return {}
    if len(keys) > spec.RESOLVE_ISIN_MAX_KEYS:
        kdf = ix.doc_stats.sparkSession.createDataFrame(
            [(int(s), int(o)) for s, o in keys], "shard int, ord long"
        )
        rows = (
            ix.doc_stats.join(F.broadcast(kdf), ["shard", "ord"])
            .select("shard", "ord", "doc_id")
            .collect()
        )
        return {(int(r["shard"]), int(r["ord"])): int(r["doc_id"]) for r in rows}
    by_shard: dict[int, list[int]] = {}
    for s, o in keys:
        by_shard.setdefault(int(s), []).append(int(o))
    cond = None
    for s, ords in by_shard.items():
        c = (F.col("shard") == s) & F.col("ord").isin(ords)
        cond = c if cond is None else (cond | c)
    rows = (
        ix.doc_stats.filter(cond)
        .select("shard", "ord", "doc_id")
        .collect()
    )
    return {(int(r["shard"]), int(r["ord"])): int(r["doc_id"]) for r in rows}


def _finalize_topk(parts: list[pd.DataFrame], k: int, resolver) -> list:
    """Merge per-shard ties-kept frames (each with a ``shard`` col),
    apply a global keep-ties pre-cut, resolve ord -> doc_id through
    ``resolver(keys) -> {(shard, ord): doc_id}``, and take the exact
    global top-k by (score desc, doc_id asc). Returns Row(doc_id,
    score) list."""
    from pyspark.sql import Row

    if not parts:
        return []
    merged = pd.concat(parts, ignore_index=True)
    if merged.empty:
        return []
    val = merged["score"].to_numpy(np.float64)
    if len(val) > k:
        # shrink the resolution set before the lookup: only rows that
        # can still reach the top-k (score >= global kth) need doc_ids
        kth = np.partition(val, len(val) - k)[len(val) - k]
        merged = merged[val >= kth]
    cap = spec.WAND_TIE_CAP_FACTOR * k
    if len(merged) > cap:
        # global twin of the shard-local keep-ties cap: bound the
        # resolution/lookup set when the global kth-score tie group
        # overflows (deterministic (score desc, shard, ord) truncation;
        # see shard_topk for the semantics trade-off)
        log.warning(
            "wand merge: global kth-score tie group overflows the "
            "keep-ties cap (%d survivors > %d); boundary ties break by "
            "(shard, ord), not doc_id", len(merged), cap,
        )
        merged = merged.sort_values(
            ["score", "shard", "ord"], ascending=[False, True, True],
            kind="mergesort",
        ).head(cap)
    keys = list(zip(merged["shard"].astype(int), merged["ord"].astype(int)))
    idmap = resolver(keys)
    missing = [key for key in keys if key not in idmap]
    if missing:
        raise ValueError(
            f"wand top-k: {len(missing)} scored ordinals missing from "
            f"doc_stats (index corrupt or stale), e.g. {missing[:3]}"
        )
    out = sorted(
        (
            (-float(s), idmap[(int(sh), int(o))])
            for sh, o, s in zip(merged["shard"], merged["ord"], merged["score"])
        )
    )[:k]
    return [Row(doc_id=d, score=-negs) for negs, d in out]


def wand_topk_driver(
    ix: Index,
    term_idfs: dict[str, float],
    term_dfs: dict[str, int],
    k: int,
    repos: list[str] | None = None,
    diag: dict | None = None,
    rows: list | None = None,
    resolver=None,
) -> list:
    """Driver-local top-k over the query terms' collected blocks —
    result-identical to wand_topk (same shard_topk kernel per shard,
    same merge + tie-break), minus the grouped-map round trip.

    The Lucene-style serving hybrid: an interactive query touches only
    its terms' posting blocks (sum(df) postings, delta+varint over
    dense ordinals — ~1-2 bytes/posting), so the engine COLLECTS those
    blocks with one pruned scan and scores them locally; the
    distributed path exists for queries whose posting volume exceeds
    spec.DRIVER_WAND_MAX_POSTINGS. On a multi-executor cluster 'driver'
    is the serving coordinator — the same place the per-shard top-k
    heaps merge in the distributed path anyway.

    ``resolver(keys) -> {(shard, ord): doc_id}`` maps the <= ~k
    surviving ordinals to external doc_ids for the global tie-break;
    default is one pruned doc_stats point lookup (SearchEngine passes
    its bounded LRU-backed lookup so warm queries resolve with zero
    Spark jobs).

    Repo-scoped queries collect doc_stats pre-filtered to the scoped
    repos: shard_topk's membership test (candidate ord present in the
    filtered frame) is exact. CAVEAT: that collect is proportional to
    the scoped repos' DOC COUNT, which the posting-volume gate does not
    bound — SearchEngine therefore routes scoped queries to the
    distributed path and uses this function only unscoped; the scoped
    support here exists for small-corpus callers and the identity
    tests.
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
    # rows come as pyspark Rows (Spark collect) or plain dicts (the
    # engine's direct pyarrow reads) — same columns either way
    bpdf = pd.DataFrame(
        [r.asDict() if hasattr(r, "asDict") else r for r in rows]
    )
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
            .select("shard", "ord", "repo")
            .collect()
        )
        sdf = pd.DataFrame(
            [r.asDict() for r in srows], columns=["shard", "ord", "repo"]
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
        part = shard_topk(pdf, spdf, terms, idfs, avgdl, k, repos=repos, diag=sdiag)
        if len(part):
            parts.append(part.assign(shard=int(shard)))
        if diag is not None:
            for key in (
                "postings_decoded",
                "candidates",
                "candidates_scored",
                "tie_overflow",
            ):
                diag[key] = diag.get(key, 0) + int(sdiag.get(key, 0))
    if resolver is None:
        resolver = lambda keys: _resolve_ords_spark(ix, keys)  # noqa: E731
    return _finalize_topk(parts, k, resolver)


def wand_topk(
    ix: Index,
    term_idfs: dict[str, float],
    term_dfs: dict[str, int],
    k: int,
    repos: list[str] | None = None,
) -> DataFrame:
    """Distributed top-k: per-shard WAND UDF + doc_id resolution +
    driver merge.

    Unscoped: single-input grouped map over the query terms' blocks
    (lengths are inline). Repo-scoped: cogroup with doc_stats for the
    ord→scope lookup. Either way the grouped map emits <= ~k ties-kept
    (shard, ord, score) rows per shard; those join doc_stats
    BROADCAST (the tiny side is the result, never the registry) to
    recover external doc_ids, and orderBy().limit() compiles to
    TakeOrderedAndProject for the exact global (score desc, doc_id
    asc) cut — no extra shuffle.
    """
    terms = sorted(term_idfs, key=lambda t: (term_dfs.get(t, 0), t))
    if not terms:
        raise ValueError("wand_topk: empty term list")
    avgdl = ix.meta.avgdl
    idfs = dict(term_idfs)

    res = _wand_shard_results(ix, terms, idfs, avgdl, k, repos)
    # ord -> doc_id through an inner broadcast join (the tiny side is
    # the RESULT, never the registry). An inner join would silently
    # drop scored ordinals missing from a corrupt/stale registry where
    # the driver path raises (round-4 advisor) — the per-shard window
    # count vs the carried n_out turns any partial drop into a loud
    # error baked into the score expression itself (kept un-prunable
    # because it IS the consumed score column). A shard whose rows ALL
    # vanish is not row-detectable here; load_index's format/intent
    # gates and the driver path cover that corruption class.
    from pyspark.sql import Window

    resolved = (
        ix.doc_stats.select("shard", "ord", "doc_id")
        .join(F.broadcast(res), ["shard", "ord"])
        .withColumn("_cnt", F.count(F.lit(1)).over(Window.partitionBy("shard")))
    )
    score = F.when(F.col("_cnt") == F.col("n_out"), F.col("score")).otherwise(
        F.raise_error(
            F.concat(
                F.lit("wand top-k: shard "),
                F.col("shard").cast("string"),
                F.lit(" resolved "),
                F.col("_cnt").cast("string"),
                F.lit(" of "),
                F.col("n_out").cast("string"),
                F.lit(" scored ordinals (index corrupt or stale)"),
            )
        )
    )
    return (
        resolved.select("doc_id", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def _wand_shard_results(
    ix: Index,
    terms: list[str],
    idfs: dict[str, float],
    avgdl: float,
    k: int,
    repos: list[str] | None,
) -> DataFrame:
    """The distributed per-shard WAND kernel: grouped map over the
    query terms' blocks emitting <= ~cap ties-kept (shard, ord, score,
    n_out) rows per shard (n_out = the shard's emitted row count, for
    the resolution-loss guard)."""
    qb = ix.blocks.filter(F.col("term").isin(terms))
    if repos is None:

        def per_shard_solo(key, blocks_pdf: pd.DataFrame) -> pd.DataFrame:
            out = shard_topk(blocks_pdf, None, terms, idfs, avgdl, k)
            return out.assign(shard=int(key[0]), n_out=len(out))[
                ["shard", "ord", "score", "n_out"]
            ]

        return qb.groupBy("shard").applyInPandas(per_shard_solo, _OUT_SCHEMA)

    def per_shard(key, blocks_pdf: pd.DataFrame, stats_pdf: pd.DataFrame) -> pd.DataFrame:
        out = shard_topk(
            blocks_pdf, stats_pdf, terms, idfs, avgdl, k, repos=repos
        )
        return out.assign(shard=int(key[0]), n_out=len(out))[
            ["shard", "ord", "score", "n_out"]
        ]

    # pre-filter the cogroup's registry side to the scoped repos —
    # shard_topk's membership test (candidate ord in the scoped
    # frame) is unchanged by dropping rows that fail it anyway, and
    # the per-query exchange now carries O(scoped docs), not
    # O(corpus) (file-backed doc_stats is ord≡repo-sorted, so the
    # predicate also prunes row groups; the driver hybrid does the
    # identical pre-filter)
    ds = ix.doc_stats.filter(F.col("repo").isin(list(repos))).select(
        "shard", "ord", "repo"
    )
    return (
        qb.groupBy("shard")
        .cogroup(ds.groupBy("shard"))
        .applyInPandas(per_shard, _OUT_SCHEMA)
    )


def wand_topk_rows(
    ix: Index,
    term_idfs: dict[str, float],
    term_dfs: dict[str, int],
    k: int,
    repos: list[str] | None = None,
    resolver=None,
) -> list:
    """Distributed WAND kernel + the driver path's finalization: the
    per-shard grouped map runs on the cluster, its <= ~cap-per-shard
    ties-kept survivors collect to the coordinator, and the SAME
    _finalize_topk as wand_topk_driver resolves ord -> doc_id (through
    the caller's cached resolver, e.g. SearchEngine's bounded docmeta
    LRU) and applies the exact global (score desc, doc_id asc) cut.

    This is SearchEngine's serving path for scoped and fat queries:
    identical failure semantics to the driver path (missing ordinals
    raise), no per-query broadcast join, and the resolver benefits from
    the engine's caches. wand_topk keeps the all-lazy DataFrame shape
    for analytical callers that want the full plan (the contract oracle
    runs it at k ~ corpus size, where collecting survivors here would
    pull the whole match set through the coordinator twice)."""
    terms = sorted(term_idfs, key=lambda t: (term_dfs.get(t, 0), t))
    if not terms:
        raise ValueError("wand_topk_rows: empty term list")
    res = _wand_shard_results(
        ix, terms, dict(term_idfs), ix.meta.avgdl, k, repos
    )
    pdf = res.toPandas()
    parts = [pdf[["shard", "ord", "score"]]] if len(pdf) else []
    if resolver is None:
        resolver = lambda keys: _resolve_ords_spark(ix, keys)  # noqa: E731
    return _finalize_topk(parts, k, resolver)
