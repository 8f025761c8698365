"""Snowball Russian stemmer + bilingual normalizer + 1->N expansion
(functions/stemmer_ru.py, stemmer.resolve registry) — mirrors
test_stemmer.py for the second registered normalizer (VERDICT r3
next-round item 4).

Reference behavior being covered: the reference lemmatizes RU+EN with
one shared MorphologyService and counts EVERY normal form of a word
(service/MorphologyService.java:28-38, service/LemmaUtils.java:67,
golden MorphologyServiceTest.java:156-164).
"""

from __future__ import annotations

import json
import os

import pytest

from posik_engine_spark.functions.stemmer import TOKEN_RE_CYRILLIC, resolve
from posik_engine_spark.functions.stemmer_ru import russian_stem
from posik_engine_spark.functions.tokenizer import tokenize_py
from posik_engine_spark.operators import build as B
from posik_engine_spark.operators import lifecycle
from posik_engine_spark.operators.search import SearchEngine

# ------------------------------------------------------------- goldens
# Hand-derived step by step from the published algorithm
# (snowballstem.org/algorithms/russian/stemmer.html). The first entry
# is the spec page's own worked example. Derivation notes:
#   противоестественном: ADJ 'ом' -> ...твенн; tidy нн -> н
#   книгами:   NOUN 'ами'
#   бегающий:  ADJ 'ий', PARTICIPLE g1 'ющ' (preceded by 'а')
#   тестирование: ADJ 'ие' (adjectival precedes noun in the or-chain)
#   остановиться: REFLEXIVE 'ся' then VERB g2 'ить'
#   пересказывают: VERB g1 'ют' (preceded by 'а')
#   белейший:  ADJ 'ий', tidy SUPERLATIVE 'ейш'
#   сильнее:   ADJ 'ее'; tidy 'н' needs a second 'н' -> no-op
#   скорость:  NOUN 'ь'; DERIVATIONAL 'ост' NOT in R2 -> kept
#   вагонов:   NOUN 'ов'
#   делав:     PERFECTIVE GERUND g1 'в' (preceded by 'а', kept)
#   подумавши: PERFECTIVE GERUND g1 'вши'
#   читать/читала/читают: VERB endings -> one shared stem
#   зелёного:  ё->е, ADJ 'ого'
#   ночь/ночи: NOUN 'ь' / step-2 trailing 'и'
GOLDEN = {
    "противоестественном": "противоестествен",
    "книгами": "книг",
    "бегающий": "бега",
    "тестирование": "тестирован",
    "остановиться": "останов",
    "пересказывают": "пересказыва",
    "белейший": "бел",
    "сильнее": "сильн",
    "скорость": "скорост",
    "вагон": "вагон",
    "вагоне": "вагон",
    "вагонов": "вагон",
    "делав": "дела",
    "подумавши": "подума",
    "читать": "чита",
    "читала": "чита",
    "читают": "чита",
    "зелёного": "зелен",
    "письмо": "письм",
    "письма": "письм",
    "ночь": "ноч",
    "ночи": "ноч",
}


def test_golden_derivations():
    bad = {w: (russian_stem(w), want) for w, want in GOLDEN.items()
           if russian_stem(w) != want}
    assert not bad, bad


def test_inflection_families_share_a_stem():
    assert len({russian_stem(w) for w in ["вагон", "вагоне", "вагонов"]}) == 1
    assert len({russian_stem(w) for w in ["читать", "читала", "читают"]}) == 1


def test_non_cyrillic_passthrough():
    for t in ["running", "42", "utf-8", "x86", "test", ""]:
        assert russian_stem(t) == t


def test_yo_normalizes_to_ye():
    assert russian_stem("ёжик") == "ежик"


# ------------------------------------------------------- registry
def test_resolve_russian_and_bilingual():
    ru = resolve("russian")
    assert ru("книгами") == ("книг",)
    assert ru("running") == ("running",)  # Latin passes through
    assert ru.token_re is not None  # Cyrillic token alphabet
    bi = resolve("bilingual")
    assert bi("книгами") == ("книг",)
    assert bi("running") == ("run",)
    assert bi.token_re is not None


def test_exact_variant_is_1_to_n():
    pe = resolve("porter+exact")
    assert pe("running") == ("run", "running")
    assert pe("run") == ("run",)  # no duplicate when forms coincide
    assert pe.token_re is None
    be = resolve("bilingual+exact")
    assert be("книгами") == ("книг", "книгами")
    assert be.token_re is not None


def test_cyrillic_tokenization_rides_on_the_normalizer():
    # default ASCII tokenizer drops Cyrillic entirely
    assert tokenize_py("Тестовое слово") == []
    ru = resolve("russian")
    assert tokenize_py("Тестовое слово", ru.token_re) == ["тестовое", "слово"]
    # mixed text keeps both scripts + identifier expansion
    toks = tokenize_py("читаем fooBar код", ru.token_re)
    assert toks == ["читаем", "foo", "bar", "код", "foobar"]


# ------------------------------------------------------- pipeline
RU_DOCS = [
    ("r1", "doc/vagon.md", "c1", "md",
     "старый вагон стоит на станции возле депо"),
    ("r1", "doc/vagony.md", "c1", "md",
     "новые вагоны прибывают из депо каждое утро"),
    ("r2", "doc/kniga.md", "c1", "md",
     "я читала книгами обложенную полку"),
    ("r2", "doc/misc.md", "c1", "md",
     "совсем другое содержание про базы данных и хранение"),
    ("r2", "doc/mixed.md", "c1", "md",
     "the process keeps running пока вагонов нет"),
]


@pytest.fixture(scope="module")
def ru_docs(spark):
    return spark.createDataFrame(
        RU_DOCS,
        "repo string, path string, commit string, lang string, content string",
    )


def test_russian_build_matches_python_oracle(spark, ru_docs):
    """term_stats of a russian-stemmed build == tokenize_py(cyrillic) +
    russian_stem aggregated in plain Python."""
    from collections import Counter

    norm = resolve("russian")
    prepared = B.prepare_docs(ru_docs, n_shards=2, stemmer="russian")
    got = {
        (r["term"], int(r["df"]), int(r["ctf"]))
        for r in B.term_stats(B.term_freqs(prepared)).collect()
    }
    df_c: Counter = Counter()
    ctf_c: Counter = Counter()
    for repo, path, commit, lang, content in RU_DOCS:
        toks = norm.flat(tokenize_py(path, norm.token_re)) + norm.flat(
            tokenize_py(content, norm.token_re)
        )
        ctf_c.update(toks)
        df_c.update(set(toks))
    want = {(t, df_c[t], ctf_c[t]) for t in ctf_c}
    assert got == want


def test_search_matches_across_russian_inflections(spark, ru_docs):
    """search('вагоне') on a russian index finds docs containing
    'вагон'/'вагоны'/'вагонов' (shared stem), and snippets highlight
    the inflected Cyrillic surface words."""
    with SearchEngine.from_docs(spark, ru_docs, n_shards=2,
                                stemmer="russian") as eng:
        resp = eng.search("вагоне", limit=10)
        paths = {h[2] for h in resp.hits}
        assert {"doc/vagon.md", "doc/vagony.md", "doc/mixed.md"} <= paths
        v_hit = next(h for h in resp.hits if h[2] == "doc/vagony.md")
        assert "<b>вагоны</b>" in v_hit[4]


def test_bilingual_covers_both_scripts(spark, ru_docs):
    """One bilingual index serves both an English and a Russian
    inflection query — the reference's RU+EN MorphologyService shape."""
    with SearchEngine.from_docs(spark, ru_docs, n_shards=2,
                                stemmer="bilingual") as eng:
        ru_paths = {h[2] for h in eng.search("вагоны", limit=10).hits}
        assert "doc/vagon.md" in ru_paths
        en_paths = {h[2] for h in eng.search("runs", limit=10).hits}
        assert en_paths == {"doc/mixed.md"}


def test_exact_variant_counts_both_forms(spark, ru_docs):
    """+exact (1->N): the index counts the surface form AND the stem as
    separate terms, so the dictionary holds both and exact-form queries
    match without stemming loss."""
    prepared = B.prepare_docs(ru_docs, n_shards=2, stemmer="russian+exact")
    terms = {r["term"]
             for r in B.term_stats(B.term_freqs(prepared)).collect()}
    assert "вагон" in terms       # the shared stem
    assert "вагонов" in terms     # a surface form, counted too
    assert "вагоны" in terms


def test_builder_records_russian_and_incremental_stays_stemmed(
    spark, ru_docs, tmp_path
):
    out = str(tmp_path / "ix")
    builder = lifecycle.IndexBuilder(spark, out, n_shards=2, stemmer="russian")
    builder.build(ru_docs)
    with open(os.path.join(out, "meta.json")) as f:
        assert json.load(f)["stemmer"] == "russian"
    new = spark.createDataFrame(
        [("r3", "doc/kolesa.md", "c1", "md",
          "запасные колёса вагонам нужны редко")],
        "repo string, path string, commit string, lang string, content string",
    )
    builder.incremental_update(new, partial=True)
    with SearchEngine.from_index_dir(
        spark, out, docs=ru_docs.unionByName(new)
    ) as eng:
        assert eng.ix.stemmer == "russian"
        paths = {h[2] for h in eng.search("вагонах", limit=10).hits}
        assert "doc/kolesa.md" in paths  # 'вагонам' shares stem 'вагон'


# --------------------------- russian_dict (round-5 verdict item 6) ---
# Dictionary lemmatization with genuinely distinct 1->N normal forms
# (functions/lemma_ru.py) — the reference's lucene-morphology behavior
# the stemmers could only approximate as {stem, surface}.


def test_dict_golden_reference_parity():
    """The reference goldens, verbatim (MorphologyServiceTest.java:
    156-164: тест -> [тест, тесто]; ...WithYo: ёлка -> [елка])."""
    rd = resolve("russian_dict")
    assert rd("тест") == ("тест", "тесто")
    assert rd("ёлка") == ("елка",)


def test_dict_disambiguation_and_fallback():
    rd = resolve("russian_dict")
    # unambiguous inflections collapse to ONE dictionary lemma
    assert rd("тесты") == ("тест",)
    assert rd("тестами") == ("тест",)
    # genuinely ambiguous homographs yield DISTINCT lemmas
    assert rd("стали") == ("сталь", "стать")   # steel-gen / became-pl
    assert rd("пила") == ("пила", "пить")      # the saw / drank-fem
    assert rd("банки") == ("банк", "банка")    # banks / jars
    # out-of-dictionary falls back to the bilingual stem chain (a code
    # corpus must index identifiers; divergence documented in lemma_ru)
    assert rd("running") == ("run",)
    assert rd("вагонами") == ("вагон",)  # stemmer happens to agree here
    assert rd("42") == ("42",)           # digits pass through
    assert rd.token_re is not None       # Cyrillic token alphabet
    # '+exact' composes: the surface form joins the dictionary lemmas
    rde = resolve("russian_dict+exact")
    assert rde("тесты") == ("тест", "тесты")
    assert rde("тест") == ("тест", "тесто")  # already a normal form


DICT_DOCS = [
    ("r1", "doc/testo.md", "c1", "md",
     "рецепт теста для пирога требует муки и воды"),      # тест+тесто forms
    ("r1", "doc/testy.md", "c1", "md",
     "новые тесты проверяют поиск по словам быстро"),      # тест only
    ("r2", "doc/stal.md", "c1", "md",
     "из стали делают рельсы и вагоны"),                   # сталь+стать
    ("r2", "doc/misc.md", "c1", "md",
     "совсем другое содержание про хранение running кода"),
]


@pytest.fixture(scope="module")
def dict_docs(spark):
    return spark.createDataFrame(
        DICT_DOCS,
        "repo string, path string, commit string, lang string, content string",
    )


def test_dict_build_counts_every_form(spark, dict_docs):
    """term_stats of a russian_dict build == the 1->N flat expansion
    aggregated in plain Python — EVERY normal form of an ambiguous word
    is counted (LemmaUtils.java:67): 'теста' contributes to BOTH тест
    and тесто."""
    from collections import Counter

    norm = resolve("russian_dict")
    prepared = B.prepare_docs(dict_docs, n_shards=2, stemmer="russian_dict")
    got = {
        (r["term"], int(r["df"]), int(r["ctf"]))
        for r in B.term_stats(B.term_freqs(prepared)).collect()
    }
    df_c: Counter = Counter()
    ctf_c: Counter = Counter()
    for repo, path, commit, lang, content in DICT_DOCS:
        toks = norm.flat(tokenize_py(path, norm.token_re)) + norm.flat(
            tokenize_py(content, norm.token_re)
        )
        ctf_c.update(toks)
        df_c.update(set(toks))
    assert got == {(t, df_c[t], ctf_c[t]) for t in ctf_c}
    # the ambiguity really landed in the dictionary: both lemmas exist
    terms = {t for t, _, _ in got}
    assert {"тест", "тесто", "сталь", "стать"} <= terms


def test_dict_rank_identity_vs_python_oracle(spark, dict_docs):
    """DF BM25 path on a russian_dict build == the pure-Python oracle
    fed the SAME normalizer — exact float equality (the
    test_m1_rank_identity pattern for the 1->N dictionary path)."""
    from posik_engine_spark.operators import build, score
    from posik_engine_spark.oracle import build_oracle_index, oracle_topk

    norm = resolve("russian_dict")
    prepared = build.prepare_docs(
        dict_docs, n_shards=2, stemmer="russian_dict"
    ).cache()
    tf = build.term_freqs(prepared).cache()
    meta = build.corpus_meta(prepared)
    stats = build.term_stats(tf)
    rows = prepared.select("doc_id", "repo", "path", "content").collect()
    oix = build_oracle_index([r.asDict() for r in rows], normalizer=norm)
    for qword in ["тест", "стали", "тестами"]:
        terms = norm.flat([qword])
        idfs = build.idf_map(stats, meta, list(dict.fromkeys(terms)))
        if set(idfs) != set(terms):
            continue  # a form absent from this tiny corpus: AND is empty
        got = score.topk(
            score.score_terms(tf, idfs, meta.avgdl), limit=10
        ).collect()
        expect = oracle_topk(oix, terms, limit=10)
        assert [(r["doc_id"], r["score"]) for r in got] == expect, qword


def test_dict_search_matches_ambiguous_forms(spark, dict_docs):
    """search('тест') ANDs both dictionary lemmas (reference
    SearchService semantics): the doc containing 'теста' (which indexed
    under BOTH тест and тесто) matches directly; the тесты-only doc
    arrives via the relaxation cascade when the AND finds pages."""
    with SearchEngine.from_docs(spark, dict_docs, n_shards=2,
                                stemmer="russian_dict") as eng:
        paths = {h[2] for h in eng.search("тест", limit=10).hits}
        assert "doc/testo.md" in paths      # holds both lemmas
        assert "doc/testy.md" not in paths  # тест only: AND excludes it
        # the ambiguous homograph finds both source docs
        paths = {h[2] for h in eng.search("стали", limit=10).hits}
        assert "doc/stal.md" in paths


def test_dict_builder_records_and_incremental_stays_dict(
    spark, dict_docs, tmp_path
):
    out = str(tmp_path / "ix")
    builder = lifecycle.IndexBuilder(
        spark, out, n_shards=2, stemmer="russian_dict"
    )
    builder.build(dict_docs)
    with open(os.path.join(out, "meta.json")) as f:
        assert json.load(f)["stemmer"] == "russian_dict"
    new = spark.createDataFrame(
        [("r3", "doc/new.md", "c1", "md",
          "свежие тесты системы прибыли вчера")],
        "repo string, path string, commit string, lang string, content string",
    )
    builder.incremental_update(new, partial=True)
    with SearchEngine.from_index_dir(
        spark, out, docs=dict_docs.unionByName(new)
    ) as eng:
        assert eng.ix.stemmer == "russian_dict"
        # 'тестах' -> (тест,): matches the incrementally-added doc
        # whose 'тесты' indexed under тест
        paths = {h[2] for h in eng.search("тестах", limit=10).hits}
        assert "doc/new.md" in paths
