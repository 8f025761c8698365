"""Round-3c review fixes: stemmed-index consistency of the statistics
endpoint and the streaming term-freq stage.

A stemmed index's dictionary holds stemmed forms, so every component
that counts or emits terms must normalize through the SAME stemmer —
otherwise statistics report impossible numbers (per-repo lemmas above
the corpus total) and streams feed a dictionary they can never match.
"""

from __future__ import annotations

import pytest

from posik_engine_spark.functions.stemmer import stem_tokens
from posik_engine_spark.functions.tokenizer import tokenize_py
from posik_engine_spark.operators.search import SearchEngine
from posik_engine_spark.streaming.ingest import streaming_term_freqs

DOCS = [
    ("r1", "doc/running.md", "c1", "md",
     "the process keeps running along while other processes wait"),
    ("r1", "doc/runs.md", "c1", "md",
     "this test runs quickly and the runner reports results"),
    ("r2", "doc/walk.md", "c1", "md",
     "walking is slower than jogging but faster than crawling"),
]

SCHEMA = "repo string, path string, commit string, lang string, content string"


@pytest.fixture(scope="module")
def english(spark):
    return spark.createDataFrame(DOCS, SCHEMA)


def _oracle_per_repo_lemmas() -> dict[str, int]:
    per_repo: dict[str, set] = {}
    for repo, path, _commit, _lang, content in DOCS:
        toks = stem_tokens(tokenize_py(path)) + stem_tokens(tokenize_py(content))
        per_repo.setdefault(repo, set()).update(toks)
    return {r: len(s) for r, s in per_repo.items()}


def test_stemmed_statistics_count_stemmed_lemmas(spark, english):
    """statistics() per-repo lemma counts on a stemmed engine must count
    STEMMED distinct forms (the dictionary's vocabulary), not surface
    tokens — 'running'+'runs' in one repo is ONE lemma, and no repo may
    report more lemmas than the corpus-wide total."""
    want = _oracle_per_repo_lemmas()
    with SearchEngine.from_docs(spark, english, n_shards=2,
                                stemmer="porter") as eng:
        st = eng.statistics()
        got = {d["url"]: d["lemmas"] for d in st["detailed"]}
        assert got == want
        assert all(n <= st["total"]["lemmas"] for n in got.values())


def test_unstemmed_statistics_unchanged(spark, english):
    """Control: the unstemmed engine still counts raw tokenizer output."""
    per_repo: dict[str, set] = {}
    for repo, path, _commit, _lang, content in DOCS:
        per_repo.setdefault(repo, set()).update(
            tokenize_py(path) + tokenize_py(content)
        )
    with SearchEngine.from_docs(spark, english, n_shards=2) as eng:
        got = {d["url"]: d["lemmas"] for d in eng.statistics()["detailed"]}
        assert got == {r: len(s) for r, s in per_repo.items()}


def test_search_limit_zero_raises_invalid_argument(spark, english):
    """limit<=0 is an invalid pagination argument: rejected up front
    with a distinct message, BEFORE tokenization or any dictionary
    probe — user error must not masquerade as the relaxation
    cascade's nothing-found result (round-3 advisor)."""
    from posik_engine_spark.oracle import SearchError

    with SearchEngine.from_docs(spark, english, n_shards=2) as eng:
        for bad in (0, -3):
            with pytest.raises(SearchError, match="invalid limit"):
                eng.search("running", limit=bad)


def test_streaming_term_freqs_threads_stemmer(spark, english):
    """streaming_term_freqs must emit the same (stemmed) vocabulary as
    the batch build it feeds — prepare_docs handles batch and streaming
    frames identically, so the batch frame exercises the same plan."""
    terms = {
        r["term"]
        for r in streaming_term_freqs(english, n_shards=2, stemmer="porter")
        .select("term").distinct().collect()
    }
    assert "run" in terms and "running" not in terms and "runs" not in terms
    # default stays unstemmed
    raw = {
        r["term"]
        for r in streaming_term_freqs(english, n_shards=2)
        .select("term").distinct().collect()
    }
    assert "running" in raw and "runs" in raw
