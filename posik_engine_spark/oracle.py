"""Pure-Python brute-force BM25 oracle (SURVEY.md §5 rebuild plan #2).

Rank-identity ground truth: the engine's DataFrame path, block/WAND
path and this oracle must produce identical top-k (doc_id, score) —
exact float equality, enabled by the shared float discipline
documented in spec.py and operators/build.py.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

from posik_engine_spark import spec
from posik_engine_spark.functions.tokenizer import tokenize_py


class SearchError(ValueError):
    """Query is empty / all stop words (reference
    /root/reference/.../service/search/SearchService.java:50-52)."""


@dataclass
class OracleIndex:
    n_docs: int = 0
    sum_len_path: int = 0
    sum_len_content: int = 0
    # term -> {doc_id: (tf_path, tf_content)}
    postings: dict[str, dict[int, tuple[int, int]]] = field(default_factory=dict)
    # doc_id -> (len_path, len_content)
    doc_len: dict[int, tuple[int, int]] = field(default_factory=dict)
    # doc_id -> repo
    doc_repo: dict[int, str] = field(default_factory=dict)
    # term -> collection term frequency
    ctf: dict[str, int] = field(default_factory=dict)

    @property
    def avgdl(self) -> float:
        return (
            spec.FIELD_WEIGHT_PATH * self.sum_len_path
            + spec.FIELD_WEIGHT_CONTENT * self.sum_len_content
        ) / self.n_docs


def build_oracle_index(rows, normalizer=None) -> OracleIndex:
    """rows: iterable of dicts with doc_id, repo, path, content.
    ``normalizer``: an optional stemmer.Normalizer — tokens then run
    through its alphabet + 1->N flat expansion, EXACTLY like the build
    (count every normal form, LemmaUtils.java:67)."""
    ix = OracleIndex()
    for r in rows:
        doc_id = int(r["doc_id"])
        if normalizer is not None:
            pt = normalizer.flat(tokenize_py(r.get("path"), normalizer.token_re))
            ct = normalizer.flat(
                tokenize_py(r.get("content"), normalizer.token_re)
            )
        else:
            pt = tokenize_py(r.get("path"))
            ct = tokenize_py(r.get("content"))
        ix.n_docs += 1
        ix.sum_len_path += len(pt)
        ix.sum_len_content += len(ct)
        ix.doc_len[doc_id] = (len(pt), len(ct))
        ix.doc_repo[doc_id] = r.get("repo", "")
        cp, cc = Counter(pt), Counter(ct)
        for term in set(cp) | set(cc):
            ix.postings.setdefault(term, {})[doc_id] = (cp[term], cc[term])
            ix.ctf[term] = ix.ctf.get(term, 0) + cp[term] + cc[term]
    return ix


def oracle_scores(
    ix: OracleIndex, terms: list[str], repos: list[str] | None = None
) -> dict[int, float]:
    """AND-semantics per-doc BM25; sum folds ascending by term."""
    terms = sorted(set(terms))
    if not terms:
        raise ValueError("oracle_scores: empty term list")
    cand: set[int] | None = None
    for t in terms:
        docs = set(ix.postings.get(t, {}))
        cand = docs if cand is None else (cand & docs)
        if not cand:
            return {}
    if repos is not None:
        cand = {d for d in cand if ix.doc_repo.get(d) in repos}
    avgdl = ix.avgdl
    idfs = {t: spec.idf(ix.n_docs, len(ix.postings[t])) for t in terms}
    out: dict[int, float] = {}
    for d in cand:
        lp, lc = ix.doc_len[d]
        dl = lp * spec.FIELD_WEIGHT_PATH + lc * spec.FIELD_WEIGHT_CONTENT
        acc = 0.0
        for t in terms:  # ascending term order — same fold as the engine
            tp, tc = ix.postings[t][d]
            wtf = tp * spec.FIELD_WEIGHT_PATH + tc * spec.FIELD_WEIGHT_CONTENT
            acc += spec.bm25_term_score(wtf, dl, avgdl, idfs[t])
        out[d] = acc
    return out


def oracle_topk(
    ix: OracleIndex,
    terms: list[str],
    offset: int = 0,
    limit: int = spec.DEFAULT_LIMIT,
    repos: list[str] | None = None,
) -> list[tuple[int, float]]:
    scores = oracle_scores(ix, terms, repos=repos)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[offset : offset + limit]


def filter_query_terms(ix: OracleIndex, raw_terms: list[str]) -> list[str]:
    """Q3 DF-threshold stop filter + rarest-first order.

    Keep terms with df < theta * n_docs; order by collection frequency
    ascending (reference orders by CTF, not DF — SURVEY.md §8.3), tie
    by term asc for determinism. Unknown terms are kept at the FRONT
    (df=0 is the rarest); they produce an empty AND result which the
    relaxation loop then strips (reference behavior: unknown lemma ->
    no pages -> relax)."""
    seen: list[str] = []
    for t in raw_terms:
        if t not in seen:
            seen.append(t)
    keep = []
    for t in seen:
        df = len(ix.postings.get(t, {}))
        if df < spec.THETA * ix.n_docs:
            keep.append(t)
    return sorted(keep, key=lambda t: (ix.ctf.get(t, 0), t))


def oracle_search(
    ix: OracleIndex,
    query: str,
    repo: str | None = None,
    offset: int = 0,
    limit: int = spec.DEFAULT_LIMIT,
) -> tuple[list[tuple[int, float]], list[str]]:
    """Full search semantics: tokenize -> Q3 filter -> AND -> Q6
    relaxation (drop rarest surviving term while empty). Returns
    (topk, surviving_terms)."""
    if not query or not query.strip():
        raise SearchError("empty query")
    if limit <= 0:
        # parity with SearchEngine.search: invalid pagination is user
        # error rejected before tokenization, not a nothing-found result
        raise SearchError(f"invalid limit {limit}: must be >= 1")
    raw = tokenize_py(query)
    if not raw:
        raise SearchError("query contains only stop words or garbage")
    terms = filter_query_terms(ix, raw)
    repos = [repo] if repo is not None else None
    while terms:
        hits = oracle_topk(ix, terms, offset=offset, limit=limit, repos=repos)
        if hits:
            return hits, terms
        terms = terms[1:]  # drop the rarest (reference SearchService.java:110)
    # reference: nothing found after relaxation -> error
    # (SearchService.java:62-64)
    raise SearchError(f"nothing found for query {query!r}")
