"""Snippet + highlight builder (SURVEY.md §2 Q10/Q11).

Mirrors the reference algorithm
(/root/reference/.../service/search/SnippetBuilder.java:12-69): scan
the document's words; a word matches a query term when any of its
normal forms (here: tokenizer output of the word) equals the term;
each query term is consumed at most once (:25); each match opens a
window of SNIPPET_BEFORE words before and SNIPPET_AFTER after
(:40-41); overlapping windows merge (:60-63); matched words wrap in
<b></b>; fragments join with ' ... '.

Title (Q10): for code docs the path basename stands in for the HTML
<title> (/root/reference/.../service/search/PageDtoAdapter.java:14-21).

Runs driver-side over the top-k rows only (k <= limit, reference
bounds it the same way — SURVEY.md §2 Q9).
"""

from __future__ import annotations

from posik_engine_spark import spec
from posik_engine_spark.functions.tokenizer import tokenize_py


def title_for_path(path: str | None) -> str:
    if not path:
        return ""
    return path.rstrip("/").rsplit("/", 1)[-1]


def build_snippet(
    content: str | None, terms: list[str], normalize=None
) -> str:
    """``normalize`` (optional stemmer.Normalizer, the index's
    recorded one) maps each word-form to its normal form(s) before
    matching — so a stemmed index highlights 'runs' for the query
    'running', exactly like the reference matching on shared normal
    forms; its token alphabet also drives the word split, so Cyrillic
    word-forms highlight under a russian/bilingual index."""
    if not content:
        return ""
    words = content.split()
    remaining = set(terms)
    matches: list[int] = []
    token_re = normalize.token_re if normalize is not None else None
    for i, w in enumerate(words):
        if not remaining:
            break
        forms = set(tokenize_py(w, token_re))
        if normalize is not None:
            forms = {f for raw in forms for f in normalize(raw)}
        hit = forms & remaining
        if hit:
            # consume each query term once (reference SnippetBuilder.java:25)
            remaining -= hit
            matches.append(i)
    if not matches:
        return ""
    match_set = set(matches)
    # windows around matches, merged when overlapping
    windows: list[list[int]] = []
    for i in matches:
        lo = max(0, i - spec.SNIPPET_BEFORE)
        hi = min(len(words), i + spec.SNIPPET_AFTER + 1)
        if windows and lo <= windows[-1][1]:
            windows[-1][1] = max(windows[-1][1], hi)
        else:
            windows.append([lo, hi])
    frags = []
    for lo, hi in windows:
        frag = " ".join(
            f"<b>{w}</b>" if j in match_set else w
            for j, w in enumerate(words[lo:hi], start=lo)
        )
        frags.append(frag)
    return " ... ".join(frags)
