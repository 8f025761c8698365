"""Porter stemmer (optional natural-language morphology, SURVEY.md §2
T3 residual): algorithm goldens from the canonical vocabulary + the
paper's worked derivations, and the end-to-end contract — one stemmer
shared by build, query parsing and snippet highlighting (the
reference's single MorphologyService, MorphologyService.java:28-38).
"""

from __future__ import annotations

import json
import os

import pytest

from posik_engine_spark import corpus
from posik_engine_spark.functions.stemmer import porter_stem, resolve, stem_tokens
from posik_engine_spark.functions.tokenizer import tokenize_py
from posik_engine_spark.operators import build as B
from posik_engine_spark.operators import lifecycle
from posik_engine_spark.operators.index import build_index, load_index, save_index
from posik_engine_spark.operators.search import SearchEngine

# canonical pairs from the Porter distribution vocabulary (voc.txt ->
# output.txt) covering every rule of every step
GOLDEN = {
    # step 1a
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat",
    # step 1b + cleanup
    "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file",
    # step 1c
    "happy": "happi", "sky": "sky",
    # step 2
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic",
    "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl",
    # step 3
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "communism": "commun",
    "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    # famous non-removals
    "argument": "argument", "arguments": "argument",
    "running": "run", "runs": "run",
}


def test_golden_vocabulary():
    bad = {w: (porter_stem(w), want) for w, want in GOLDEN.items()
           if porter_stem(w) != want}
    assert not bad, bad


def test_paper_worked_derivations():
    """The two full derivations in the 1980 paper."""
    assert porter_stem("generalizations") == "gener"
    assert porter_stem("oscillators") == "oscil"


def test_non_word_tokens_pass_through():
    # digits, hyphenated forms, non-Latin, short words: unchanged,
    # mirroring the reference's digits pass-through
    for t in ["42", "x86", "utf-8", "тесто", "io", "a", "go"]:
        assert porter_stem(t) == t


def test_resolve_contract():
    assert resolve(None) is None
    norm = resolve("porter")
    # Normalizer contract: 1->N tuple of forms, porter is 1->1
    assert norm("running") == ("run",)
    assert norm.token_re is None  # porter keeps the ASCII alphabet
    assert norm.flat(["running", "runs"]) == ["run", "run"]
    with pytest.raises(ValueError, match="unknown stemmer"):
        resolve("snowball")
    with pytest.raises(ValueError, match="modifier"):
        resolve("porter+fuzzy")


def test_stem_tokens_keeps_order_and_multiplicity():
    assert stem_tokens(["running", "runs", "42", "running"]) == [
        "run", "run", "42", "run"
    ]


# ----------------------------------------------------------- pipeline


ENGLISH_DOCS = [
    ("r1", "doc/running.md", "c1", "md",
     "the process keeps running along while other processes wait"),
    ("r1", "doc/runs.md", "c1", "md",
     "this test runs quickly and the runner reports results"),
    ("r2", "doc/walk.md", "c1", "md",
     "walking is slower than jogging but faster than crawling"),
    ("r2", "doc/misc.md", "c1", "md",
     "completely unrelated content about databases and storage"),
    ("r2", "doc/more.md", "c1", "md",
     "even more filler text so common terms stay under the df cap"),
]


@pytest.fixture(scope="module")
def english(spark):
    return spark.createDataFrame(
        ENGLISH_DOCS, "repo string, path string, commit string, lang string, content string"
    )


def test_prepare_docs_stemmed_matches_python_oracle(spark, english):
    """term_stats of a stemmed build == tokenize_py + porter_stem
    aggregated in plain Python — the stemmed analog of the 4-way
    tokenizer agreement."""
    from collections import Counter

    prepared = B.prepare_docs(english, n_shards=2, stemmer="porter")
    tf = B.term_freqs(prepared)
    got = {
        (r["term"], int(r["df"]), int(r["ctf"]))
        for r in B.term_stats(tf).collect()
    }
    df_c: Counter = Counter()
    ctf_c: Counter = Counter()
    for repo, path, commit, lang, content in ENGLISH_DOCS:
        toks = stem_tokens(tokenize_py(path)) + stem_tokens(tokenize_py(content))
        ctf_c.update(toks)
        df_c.update(set(toks))
    want = {(t, df_c[t], ctf_c[t]) for t in ctf_c}
    assert got == want


def test_prepare_docs_stemmer_requires_pandas_path(spark, english):
    with pytest.raises(ValueError, match="pandas-UDF path"):
        B.prepare_docs(english, use_pandas_udf=False, stemmer="porter")
    with pytest.raises(ValueError, match="unknown stemmer"):
        B.prepare_docs(english, stemmer="nope")


def test_search_matches_across_inflections(spark, english):
    """search('running') on a stemmed index finds the doc containing
    'runs' (shared normal form 'run'), and its snippet highlights the
    inflected surface word."""
    with SearchEngine.from_docs(spark, english, n_shards=2,
                                stemmer="porter") as eng:
        resp = eng.search("running", limit=10)
        paths = {h[2] for h in resp.hits}
        assert "doc/runs.md" in paths and "doc/running.md" in paths
        runs_hit = next(h for h in resp.hits if h[2] == "doc/runs.md")
        assert "<b>runs</b>" in runs_hit[4]
    # control: the unstemmed engine must NOT match the inflection
    with SearchEngine.from_docs(spark, english, n_shards=2) as eng:
        resp = eng.search("running", limit=10)
        assert {h[2] for h in resp.hits} == {"doc/running.md"}


def test_builder_records_and_serves_stemmer(spark, english, tmp_path):
    out = str(tmp_path / "ix")
    builder = lifecycle.IndexBuilder(spark, out, n_shards=2, stemmer="porter")
    builder.build(english)
    with open(os.path.join(out, "meta.json")) as f:
        assert json.load(f)["stemmer"] == "porter"
    # from_index_dir picks the stemmer up from meta — no caller flag
    with SearchEngine.from_index_dir(spark, out, docs=english) as eng:
        assert eng.ix.stemmer == "porter"
        paths = {h[2] for h in eng.search("running", limit=10).hits}
        assert "doc/runs.md" in paths
    # a later builder with a DIFFERENT normalization is refused — mixed
    # stemmed/unstemmed terms in one dictionary would rank silently wrong
    with pytest.raises(ValueError, match="stemmer"):
        lifecycle.IndexBuilder(spark, out, n_shards=2)


def test_incremental_update_stays_stemmed(spark, english, tmp_path):
    out = str(tmp_path / "ix")
    builder = lifecycle.IndexBuilder(spark, out, n_shards=2, stemmer="porter")
    builder.build(english)
    new = spark.createDataFrame(
        [("r3", "doc/jumping.md", "c1", "md",
          "jumping and swimming are fine sports")],
        "repo string, path string, commit string, lang string, content string",
    )
    builder.incremental_update(new, partial=True)
    with SearchEngine.from_index_dir(spark, out,
                                     docs=english.unionByName(new)) as eng:
        paths = {h[2] for h in eng.search("jumps", limit=10).hits}
        assert paths == {"doc/jumping.md"}


def test_save_load_index_roundtrip_stemmer(spark, english, tmp_path):
    ix = build_index(english, n_shards=2, cache=False, stemmer="porter")
    assert ix.stemmer == "porter"
    path = str(tmp_path / "saved")
    save_index(ix, path)
    loaded = load_index(spark, path)
    assert loaded.stemmer == "porter"
    # unstemmed indexes stay None end-to-end (legacy metas too)
    ix2 = build_index(english, n_shards=2, cache=False)
    path2 = str(tmp_path / "saved2")
    save_index(ix2, path2)
    assert load_index(spark, path2).stemmer is None


def test_exact_variant_query_semantics(spark, english):
    """'+exact' query-side contract (round-4 advisor, kept as reference
    parity — every normal form of a query word joins the AND list,
    LemmaUtils.java:67 / SearchService.java:48):

    - exact-form precision: 'running' on a porter+exact index requires
      the surface form too, so the 'runs'-only doc is EXCLUDED (on the
      plain porter index it matches — tested above);
    - relaxation recovery: an inflection whose surface form appears
      NOWHERE ('walks'; the corpus has only 'walking') still matches
      via the stem once the unknown surface term drops out of the AND.
    """
    with SearchEngine.from_docs(spark, english, n_shards=2,
                                stemmer="porter+exact") as eng:
        resp = eng.search("running", limit=10)
        assert {h[2] for h in resp.hits} == {"doc/running.md"}
        resp = eng.search("walks", limit=10)
        assert {h[2] for h in resp.hits} == {"doc/walk.md"}
