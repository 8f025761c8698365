"""Snowball Russian stemmer — the second registered normalizer
(SURVEY.md §2 T3; VERDICT r3 "What's missing" #1).

The reference lemmatizes RUSSIAN and English with one shared
MorphologyService
(/root/reference/src/main/java/com/github/dmitriims/posikengine/service/MorphologyService.java:28-38,
tested at src/test/java/.../MorphologyServiceTest.java:156-164); round 3
covered the English half with Porter (functions/stemmer.py). This
module implements the published Snowball Russian stemming algorithm
(M.F. Porter, "Russian stemming algorithm",
snowballstem.org/algorithms/russian/stemmer.html — public spec) so a
Russian/bilingual prose corpus gets the same treatment:
``stemmer="russian"`` / ``stemmer="bilingual"`` (see stemmer.resolve).

Algorithm notes (mirroring the spec exactly):
- vowels а е и о у ы э ю я; ё is replaced by е up front.
- RV = region after the first vowel; R2 = region after the first
  non-vowel-following-a-vowel inside R1 (R1 defined likewise on the
  whole word). All endings must lie entirely inside RV; the
  DERIVATIONAL endings additionally inside R2.
- step 1: PERFECTIVE GERUND, else (optional REFLEXIVE, then
  ADJECTIVAL (adjective + optional participle) else VERB else NOUN).
- step 2: drop a trailing и; step 3: DERIVATIONAL ост/ость in R2;
  step 4: drop one н of a final нн, else drop SUPERLATIVE ейш/ейше
  (then one н of a final нн), else drop a final ь.
- "Group 1" endings require a preceding а/я (which stays); per the
  Snowball `among` semantics the LONGEST matching ending is selected
  first and a failing а/я condition fails the whole rule — there is NO
  fallthrough to a shorter ending.

Non-Cyrillic tokens pass through unchanged (the reference's
non-word behavior, MorphologyService.java:34-35).
"""

from __future__ import annotations

import re

_RU_VOWELS = frozenset("аеиоуыэюя")
_CYR = re.compile(r"^[а-яё]+$")

# (ending, requires_preceding_aya) — matching picks the LONGEST ending
# (spec `among` semantics), so order here does not matter; sorting by
# length happens once below.
_PERFECTIVE_GERUND = [
    ("в", True), ("вши", True), ("вшись", True),
    ("ив", False), ("ивши", False), ("ившись", False),
    ("ыв", False), ("ывши", False), ("ывшись", False),
]
_REFLEXIVE = [("ся", False), ("сь", False)]
_ADJECTIVE = [
    (s, False)
    for s in (
        "ее ие ые ое ими ыми ей ий ый ой ем им ым ом его ого ему ому "
        "их ых ую юю ая яя ою ею"
    ).split()
]
_PARTICIPLE = [
    ("ем", True), ("нн", True), ("вш", True), ("ющ", True), ("щ", True),
    ("ивш", False), ("ывш", False), ("ующ", False),
]
_VERB = [
    (s, True)
    for s in "ла на ете йте ли й л ем н ло но ет ют ны ть ешь нно".split()
] + [
    (s, False)
    for s in (
        "ила ыла ена ейте уйте ите или ыли ей уй ил ыл им ым ен ило ыло "
        "ено ят ует уют ит ыт ены ить ыть ишь ю ую"
    ).split()
]
_NOUN = [
    (s, False)
    for s in (
        "а ев ов ие ье е иями ями ами еи ии и ией ей ой ий й иям ям ием "
        "ем ам ом о у ах иях ях ы ь ию ью ю ия ья я"
    ).split()
]
_SUPERLATIVE = [("ейш", False), ("ейше", False)]
_DERIVATIONAL = [("ост", False), ("ость", False)]


def _bylen(group: list[tuple[str, bool]]) -> list[tuple[str, bool]]:
    return sorted(group, key=lambda e: -len(e[0]))


_PERFECTIVE_GERUND = _bylen(_PERFECTIVE_GERUND)
_REFLEXIVE = _bylen(_REFLEXIVE)
_ADJECTIVE = _bylen(_ADJECTIVE)
_PARTICIPLE = _bylen(_PARTICIPLE)
_VERB = _bylen(_VERB)
_NOUN = _bylen(_NOUN)
_SUPERLATIVE = _bylen(_SUPERLATIVE)
_DERIVATIONAL = _bylen(_DERIVATIONAL)


def _regions(w: str) -> tuple[int, int]:
    """(rv, r2) start indexes per the spec's region definitions."""
    n = len(w)
    rv = n
    for i, ch in enumerate(w):
        if ch in _RU_VOWELS:
            rv = i + 1
            break
    r1 = n
    for i in range(1, n):
        if w[i] not in _RU_VOWELS and w[i - 1] in _RU_VOWELS:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if w[i] not in _RU_VOWELS and w[i - 1] in _RU_VOWELS:
            r2 = i + 1
            break
    return rv, r2


def _drop(w: str, group: list[tuple[str, bool]], limit: int) -> str | None:
    """Remove the longest group ending lying entirely inside
    w[limit:]; None when the rule does not fire. A matched Group-1
    ending whose preceding char (also required inside the region) is
    not а/я fails the WHOLE rule — no shorter-ending fallthrough."""
    for suf, needs_aya in group:
        start = len(w) - len(suf)
        if start >= limit and w.endswith(suf):
            if needs_aya:
                if start - 1 >= limit and w[start - 1] in "ая":
                    return w[:start]
                return None
            return w[:start]
    return None


def _snowball_ru(w: str) -> str:
    w = w.replace("ё", "е")
    rv, r2 = _regions(w)
    if rv >= len(w):  # no vowel -> nothing can ever match
        return w
    # ---- step 1
    out = _drop(w, _PERFECTIVE_GERUND, rv)
    if out is not None:
        w = out
    else:
        refl = _drop(w, _REFLEXIVE, rv)
        if refl is not None:
            w = refl
        adj = _drop(w, _ADJECTIVE, rv)
        if adj is not None:
            w = adj
            part = _drop(w, _PARTICIPLE, rv)
            if part is not None:
                w = part
        else:
            verb = _drop(w, _VERB, rv)
            if verb is not None:
                w = verb
            else:
                noun = _drop(w, _NOUN, rv)
                if noun is not None:
                    w = noun
    # ---- step 2: trailing и
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]
    # ---- step 3: derivational, inside R2
    out = _drop(w, _DERIVATIONAL, max(rv, r2))
    if out is not None:
        w = out
    # ---- step 4: tidy up (longest of нн | ейш(е) | ь wins, as among)
    if w.endswith("нн") and len(w) - 1 >= rv:
        w = w[:-1]
    else:
        sup = _drop(w, _SUPERLATIVE, rv)
        if sup is not None:
            w = sup
            if w.endswith("нн") and len(w) - 1 >= rv:
                w = w[:-1]
        elif w.endswith("ь") and len(w) - 1 >= rv:
            w = w[:-1]
    return w


# per-process memo, same discipline as stemmer._MEMO
_MEMO: dict[str, str] = {}
_MEMO_MAX = 1_000_000


def russian_stem(word: str) -> str:
    """Stem one (already-lowercased) token. Non-Cyrillic tokens
    (Latin, digits, mixed) pass through unchanged."""
    if len(word) <= 1 or not _CYR.match(word):
        return word
    hit = _MEMO.get(word)
    if hit is not None:
        return hit
    out = _snowball_ru(word)
    if len(_MEMO) < _MEMO_MAX:
        _MEMO[word] = out
    return out
