"""M3: full search semantics vs the oracle across the reference query
set (FIXTURES.md F2) + snippet goldens + error paths."""

from __future__ import annotations

import pytest

from posik_engine_spark import corpus
from posik_engine_spark.functions.snippet import build_snippet, title_for_path
from posik_engine_spark.operators import build
from posik_engine_spark.operators.search import SearchEngine
from posik_engine_spark.oracle import SearchError, build_oracle_index, oracle_search


@pytest.fixture(scope="module")
def engine_state(spark):
    docs = corpus.synthetic_docs(spark, 350, seed=42).cache()
    engine = SearchEngine.from_docs(spark, docs, n_shards=8)
    prepared = build.prepare_docs(docs, n_shards=8)
    rows = prepared.select("doc_id", "repo", "path", "content").collect()
    oracle_ix = build_oracle_index([r.asDict() for r in rows])
    return engine, oracle_ix


@pytest.mark.parametrize(
    "q", [q for q in corpus.REFERENCE_QUERIES if q["query_id"] != 10],
    ids=[f"q{q['query_id']}" for q in corpus.REFERENCE_QUERIES if q["query_id"] != 10],
)
def test_reference_query_set_rank_identity(engine_state, q):
    engine, oracle_ix = engine_state
    resp = engine.search(
        q["query"], repo=q["repo_filter"], offset=q["offset"], limit=q["limit"]
    )
    expect_hits, expect_terms = oracle_search(
        oracle_ix, q["query"], repo=q["repo_filter"], offset=q["offset"], limit=q["limit"]
    )
    got = [(r["doc_id"], r["score"]) for r in resp.data.collect()]
    assert resp.surviving_terms == expect_terms
    assert got == expect_hits


def test_stop_word_only_query_errors(engine_state):
    engine, _ = engine_state
    with pytest.raises(SearchError):
        engine.search("the and of")
    with pytest.raises(SearchError):
        engine.search("   ")
    with pytest.raises(SearchError):
        engine.search("!!! ...")


def test_relaxation_drops_rarest_and_reports(engine_state):
    engine, _ = engine_state
    resp = engine.search("varint zzznonexistent")
    assert resp.count > 0
    assert resp.surviving_terms == ["varint"]
    assert "corrected query" in resp.message and "varint" in resp.message


def test_normalization_window_quirk(engine_state):
    """Top row of ANY page shows relevance 1.0 (SURVEY.md §8.6)."""
    engine, _ = engine_state
    r0 = engine.search("buffer handler", offset=0, limit=5).data.collect()
    r1 = engine.search("buffer handler", offset=5, limit=5).data.collect()
    assert r0 and r1
    assert r0[0]["relevance"] == 1.0
    assert r1[0]["relevance"] == 1.0
    assert r0[0]["score"] > r1[0]["score"]


def test_snippet_goldens():
    # match window + highlight (reference PageProcessorTest.java:40-73 in spirit)
    text = " ".join(f"w{i}" for i in range(40)) + " varint " + " ".join(
        f"v{i}" for i in range(40)
    )
    snip = build_snippet(text, ["varint"])
    assert "<b>varint</b>" in snip
    words = snip.split()
    assert len(words) == 12 + 1 + 6  # SNIPPET_BEFORE + match + SNIPPET_AFTER
    # each query term consumed once; overlapping windows merge -> no '...'
    snip2 = build_snippet("alpha beta gamma delta", ["alpha", "gamma"])
    assert snip2 == "<b>alpha</b> beta <b>gamma</b> delta"
    # non-overlapping windows join with ' ... '
    far = " ".join(f"x{i}" for i in range(30)) + " alpha " + " ".join(
        f"y{i}" for i in range(30)
    ) + " gamma " + " ".join(f"z{i}" for i in range(30))
    snip3 = build_snippet(far, ["alpha", "gamma"])
    assert " ... " in snip3 and "<b>alpha</b>" in snip3 and "<b>gamma</b>" in snip3
    # camelCase word matches its split form
    assert "<b>parseHttpRequest</b>" in build_snippet("x parseHttpRequest y", ["http"])
    assert build_snippet("", ["a"]) == ""
    assert build_snippet("nothing here", ["varint"]) == ""


def test_title():
    assert title_for_path("src/pkg1/mod_3.py") == "mod_3.py"
    assert title_for_path("") == ""


def test_statistics(engine_state):
    engine, oracle_ix = engine_state
    st = engine.statistics()
    assert st["total"]["pages"] == oracle_ix.n_docs
    assert st["total"]["lemmas"] == len(oracle_ix.postings)
    assert st["total"]["sites"] == len(set(oracle_ix.doc_repo.values()))
    names = [d["url"] for d in st["detailed"]]
    assert names == sorted(names)


def test_search_with_content_store_matches_docs_path(spark, tmp_path):
    """Serving snippets from the bucketed+sorted content store must be
    result-identical to the persisted-docs scan path."""
    from posik_engine_spark.operators import content_store as cs
    from posik_engine_spark.operators.index import build_index, save_index

    docs = corpus.synthetic_docs(spark, 120, seed=77).cache()
    ix_dir = str(tmp_path / "ix")
    save_index(build_index(docs, n_shards=4, cache=False), ix_dir)
    c_dir = str(tmp_path / "content")
    cs.save_content_store(docs, c_dir, n_buckets=8)

    with SearchEngine.from_index_dir(spark, ix_dir, docs=docs) as e_docs, \
         SearchEngine.from_index_dir(spark, ix_dir, content_dir=c_dir) as e_store:
        for q in ("varint merge", "spark window", "varint"):
            a = e_docs.search(q)
            b = e_store.search(q)
            assert a.hits == b.hits
            assert a.surviving_terms == b.surviving_terms
