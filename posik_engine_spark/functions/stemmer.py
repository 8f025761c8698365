"""Classic Porter (1980) English stemmer — the OPTIONAL natural-
language morphology mode (SURVEY.md §2 T3 residual).

The reference lemmatizes every word to its normal forms via
LuceneMorphology for Russian+English
(/root/reference/src/main/java/com/github/dmitriims/posikengine/service/MorphologyService.java:28-38)
and uses the SAME normalization for indexing, query parsing and
snippet matching. The code-corpus analog (camel/snake parts + whole
identifier) covers identifiers; this module covers the English
natural-language half for prose corpora: ``IndexBuilder(...,
stemmer="porter")`` / ``SearchEngine.from_docs(..., stemmer="porter")``
stem every token at build time, record ``"stemmer"`` in ``meta.json``,
and the engine then stems query tokens and snippet word-forms with the
identical function — search("running") matches docs containing "runs".

Implementation is the ORIGINAL 1980 algorithm (An algorithm for suffix
stripping, M.F. Porter, Program 14(3):130-137), including the
canonical departure of leaving words of length <= 2 untouched — NOT
Porter2/Snowball and NOT the NLTK extensions. Verified against the
paper's worked derivations (GENERALIZATIONS -> GENER, OSCILLATORS ->
OSCIL) and a golden list from the canonical vocabulary in
tests/test_stemmer.py. Default OFF everywhere: stemming is not
DuckDB-expressible offline, so the driver oracles all run unstemmed;
the stemmed pipeline is pytest-verified instead (rank-identity and
build==incremental equality hold per-index regardless of the token
normalization applied, since all paths share one token stream).

Tokens that are not pure ASCII letters (digits, hyphenated forms,
non-Latin scripts) pass through unchanged — the reference does the
same for non-words (MorphologyService.java:34-35).
"""

from __future__ import annotations

import re

_VOWELS = frozenset("aeiou")
_ALPHA = re.compile(r"^[a-z]+$")

# per-process memo: corpus vocabulary is tiny next to the token stream,
# so each executor stems every distinct word once. Bounded so an
# adversarial unbounded-vocabulary corpus cannot grow driver/executor
# heap without limit; on overflow new words are simply computed each
# time (correctness unaffected).
_MEMO: dict[str, str] = {}
_MEMO_MAX = 1_000_000


def _cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _cons(w, i - 1)
    return True


def _form(stem: str) -> str:
    return "".join("C" if _cons(stem, i) else "V" for i in range(len(stem)))


def _measure(stem: str) -> int:
    """m in [C](VC)^m[V] — count of VC sequences after collapsing runs."""
    f = re.sub(r"V+", "V", re.sub(r"C+", "C", _form(stem)))
    return f.count("VC")


def _has_vowel(stem: str) -> bool:
    return any(not _cons(stem, i) for i in range(len(stem)))


def _double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(w) < 3:
        return False
    return (
        _cons(w, len(w) - 3)
        and not _cons(w, len(w) - 2)
        and _cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


# (suffix, replacement) in the C implementation's block order: within a
# step the FIRST matching suffix is the only rule tried — if its m-
# condition fails nothing happens (no fallthrough), which is why
# 'ational' must precede 'tional' and 'ization' must precede 'ation'.
_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
    ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
    ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def _porter(w: str) -> str:
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]
    # step 1b
    fired = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        fired = True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        fired = True
    if fired:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break
    # step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break
    # step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1 and (suf != "ion" or stem[-1:] in ("s", "t")):
                w = stem
            break
    # step 5a
    if w.endswith("e"):
        a = w[:-1]
        m = _measure(a)
        if m > 1 or (m == 1 and not _cvc(a)):
            w = a
    # step 5b
    if _measure(w) > 1 and _double_cons(w) and w[-1] == "l":
        w = w[:-1]
    return w


def porter_stem(word: str) -> str:
    """Stem one (already-lowercased) token. Non-ASCII-alphabetic tokens
    (digits, hyphenated, snake remnants, non-Latin) pass through
    unchanged; words of length <= 2 are left alone (the canonical
    implementation's departure)."""
    if len(word) <= 2 or not _ALPHA.match(word):
        return word
    hit = _MEMO.get(word)
    if hit is not None:
        return hit
    out = _porter(word)
    if len(_MEMO) < _MEMO_MAX:
        _MEMO[word] = out
    return out


def stem_tokens(tokens: list[str]) -> list[str]:
    """Map a token list through the stemmer (order/multiplicity kept —
    tf semantics are unchanged, terms just share normal forms)."""
    return [porter_stem(t) for t in tokens]


class Normalizer:
    """A registered token normalization: per-token 1->N normal forms
    plus the token alphabet the language needs.

    - ``forms(tok) -> tuple[str, ...]``: the normal form(s) of one
      lowercased token — the reference counts EVERY normal form of a
      word (service/LemmaUtils.java:67, тест -> {тест, тесто}), so the
      contract is 1->N; plain stemmers return a 1-tuple.
    - ``token_re``: regex replacing spec.TOKEN_RE during tokenization
      when the language needs a wider alphabet (Cyrillic); None keeps
      the default ASCII extraction. Owned by the normalizer — exactly
      the reference's MorphologyService owning both word splitting and
      lemmatization — so the same recorded ``stemmer`` name drives
      build, query and snippet identically with no extra plumbing.

    Instances are resolved from the NAME everywhere (executors
    re-resolve locally), so closures never ship across processes.
    """

    __slots__ = ("name", "_forms", "token_re")

    def __init__(self, name: str, forms, token_re: str | None = None):
        self.name = name
        self._forms = forms
        self.token_re = re.compile(token_re) if token_re else None

    def __call__(self, tok: str) -> tuple[str, ...]:
        return self._forms(tok)

    def flat(self, tokens: list[str]) -> list[str]:
        """Flatten a token list through the 1->N expansion (order and
        multiplicity kept; an expanded token contributes every form)."""
        return [f for t in tokens for f in self._forms(t)]


def _porter1(t: str) -> tuple[str, ...]:
    return (porter_stem(t),)


def _russian1(t: str) -> tuple[str, ...]:
    from posik_engine_spark.functions.stemmer_ru import russian_stem

    return (russian_stem(t),)


def _bilingual1(t: str) -> tuple[str, ...]:
    # each stemmer passes the other's script through unchanged, so the
    # composition applies exactly one of them per token
    from posik_engine_spark.functions.stemmer_ru import russian_stem

    return (porter_stem(russian_stem(t)),)


# Cyrillic-widened token alphabet (lowercased input; ё handled by the
# russian stemmer itself). Identifier whole-form expansion (WORD_RE /
# MULTI_WORD_RE) stays ASCII — camel/snake is a Latin-identifier
# phenomenon.
TOKEN_RE_CYRILLIC: str = r"[a-zа-яё0-9]+(?:-[a-zа-яё0-9]+)*"

def _russian_dict_forms(t: str) -> tuple[str, ...]:
    # dictionary lemmas with genuinely distinct 1->N normal forms
    # (тест -> (тест, тесто)); OOV falls back to the bilingual stem —
    # functions/lemma_ru.py documents the reference mapping
    from posik_engine_spark.functions.lemma_ru import dict_forms

    return dict_forms(t)


_BASE_NORMALIZERS = {
    "porter": lambda: Normalizer("porter", _porter1),
    "russian": lambda: Normalizer("russian", _russian1, TOKEN_RE_CYRILLIC),
    "bilingual": lambda: Normalizer("bilingual", _bilingual1, TOKEN_RE_CYRILLIC),
    "russian_dict": lambda: Normalizer(
        "russian_dict", _russian_dict_forms, TOKEN_RE_CYRILLIC
    ),
}

# kept for introspection/tests: the plain per-token stem functions
STEMMERS = {"porter": porter_stem}


def _with_exact(base: Normalizer, name: str) -> Normalizer:
    """1->N variant: index/query BOTH the normal form and the exact
    surface form when they differ — the surface form is itself a
    counted normal form (the reference counts every normal form of a
    word), so exact-form queries keep matching on a stemmed index.

    Query-side trade-off (deliberate, = reference semantics): ALL
    normal forms of a query word land in the AND term list — exactly
    what the reference does with multi-lemma words
    (LemmaUtils.java:67 flattens every normal form into the query
    dictionary; SearchService.java:48,100-110 ANDs them). So on a
    '+exact' index an inflected query like 'running' first requires
    the surface form too and misses docs holding only other
    inflections ('runs') — UNTIL the relaxation cascade (Q6,
    search.py) drops the rarest term (usually the surface form) on an
    empty result and retries with the bare stem, which is also the
    reference's recovery path (findRelevantPages' lemma-dropping
    loop). When the surface form DOES match somewhere the narrower
    result stands un-relaxed — precision over recall, exactly like a
    reference multi-lemma word. Choose the plain base normalizer when
    inflected-query recall matters more than exact-form queries."""

    def forms(t: str, _b=base) -> tuple[str, ...]:
        out = _b(t)
        return out if t in out else out + (t,)

    return Normalizer(name, forms, None)


def resolve(stemmer: str | None) -> Normalizer | None:
    """stemmer name -> Normalizer (None -> None). ``"<name>+exact"``
    adds the surface form as a second normal form (1->N). Raises on an
    unknown name so a typo fails the build, not silently unstemmed."""
    if stemmer is None:
        return None
    base_name, plus, mod = stemmer.partition("+")
    try:
        base = _BASE_NORMALIZERS[base_name]()
    except KeyError:
        raise ValueError(
            f"unknown stemmer {stemmer!r}; available: "
            f"{sorted(_BASE_NORMALIZERS)} (+'+exact' variants)"
        ) from None
    if not plus:
        return base
    if mod != "exact":
        raise ValueError(
            f"unknown stemmer modifier {mod!r} in {stemmer!r}; only '+exact'"
        )
    n = _with_exact(base, stemmer)
    n.token_re = base.token_re
    return n
