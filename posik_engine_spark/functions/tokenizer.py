"""Tokenizer (SURVEY.md §2 T1-T5) in four exactly-agreeing forms.

- ``tokenize_udf``  — Arrow-vectorized pandas UDF (the mandated build
  path per BASELINE.json input_hint: "no per-row Python").
- ``tokenize_expr`` — pure-Catalyst Column expression (whole-stage
  codegen; used where an all-JVM plan matters and to cross-check the
  UDF in tests).
- ``tokenize_py``   — pure-Python oracle form (rank-identity tests).
- ``tokenize_sql_duckdb`` — DuckDB SQL fragment for the driver's
  correctness oracle.

Reference behavior being mirrored (files under /root/reference/):
word split + lowercase service/MorphologyService.java:40-46; garbage
POS filter :55-73; digits pass-through :34-35; hyphenated words kept
whole (MorphologyServiceTest.java:71-77); 1->N normal-form expansion
(MorphologyService.java:28-38, golden MorphologyServiceTest.java:156-164
— one word maps to MULTIPLE counted normal forms) re-expressed for the
code corpus as camelCase/snake_case part splitting PLUS the whole
identifier appended as its own token (spec.py pipeline step 5).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from posik_engine_spark import spec

_C2 = re.compile(spec.CAMEL_PASS_2)
_C1 = re.compile(spec.CAMEL_PASS_1)
_TOK = re.compile(spec.TOKEN_RE)
_WORD = re.compile(spec.WORD_RE)
_MULTI = re.compile(spec.MULTI_WORD_RE)


# ------------------------------------------------------------- python
def tokenize_py(s: str | None, token_re: re.Pattern | None = None) -> list[str]:
    """Pure-Python reference tokenizer (the oracle's form).

    ``token_re`` widens the token alphabet (e.g. Cyrillic) when the
    index's normalizer requires it (stemmer.Normalizer.token_re);
    None keeps the default ASCII extraction that every driver oracle
    mirrors."""
    if not s:
        return []
    split = _C2.sub(r"\1 \2", s)
    split = _C1.sub(r"\1 \2", split)
    toks = (token_re or _TOK).findall(split.lower())
    # 1->N expansion: whole form of every multi-part word, appended
    toks += [
        w.replace("_", "").lower() for w in _WORD.findall(s) if _MULTI.search(w)
    ]
    return [t for t in toks if t not in spec.STOP_TOKENS]


# --------------------------------------------------------- pandas UDF
# Coarse gate for the camel/underscore machinery: both camel passes and
# the '_' whole-form rule can only fire on a doc containing an ASCII
# uppercase letter or an underscore (MULTI_WORD_RE's alternatives all
# require one), and a single-char-class scan costs ~1/7th of the two
# sub passes. Lowercase-only docs (most prose) skip the subs entirely;
# mixed-case docs pay one extra cheap scan (<5%).
_COARSE = re.compile(r"[A-Z_]")


def _split_camel(sub: pd.Series) -> tuple[pd.Series, pd.Series]:
    """Camel passes over coarse-flagged docs -> (split text, flag of
    docs that need whole-form expansion).

    The whole-form flag == MULTI_WORD_RE.search(doc) but WITHOUT a
    third regex scan: the camel passes insert one space per camel
    boundary, so a doc's length changed iff a camel alternative of
    MULTI_WORD_RE matched (pass 2 can neither create nor destroy a
    pass-1 adjacency — it only inserts spaces after an uppercase run),
    and the remaining alternative is a literal '_' containment check.
    Exactness is fuzz-pinned by tests/test_tokenizer.py."""
    split = sub.str.replace(spec.CAMEL_PASS_2, r"\1 \2", regex=True)
    split = split.str.replace(spec.CAMEL_PASS_1, r"\1 \2", regex=True)
    flagged = (split.str.len() != sub.str.len()) | sub.str.contains(
        "_", regex=False
    )
    return split, flagged


def _whole_forms(words: list[str]) -> list[str]:
    """Whole-form expansion of one doc's raw words (1->N step): the
    joined lowercase form of every multi-part identifier."""
    search = _MULTI.search
    return [w.replace("_", "").lower() for w in words if search(w)]


def _gated_split(s: pd.Series) -> tuple[pd.Series, pd.Series | None]:
    """Coarse-gated camel splitting shared by the token-list and
    counted forms (one implementation — the two callers' equivalence is
    fuzz-pinned and must not be able to desynchronize): returns (split
    text, whole-form flag or None when no doc passed the gate)."""
    coarse = s.str.contains(_COARSE)
    if not coarse.any():
        return s, None
    split_sub, flagged = _split_camel(s[coarse])
    split = s.copy()
    split[coarse] = split_sub
    return split, flagged


def _tokenize_series(s: pd.Series, token_re: re.Pattern | None = None) -> pd.Series:
    s = s.fillna("")
    split, flagged = _gated_split(s)
    parts = split.str.lower().str.findall(token_re or _TOK)
    if flagged is not None and flagged.any():
        # per-word loop only over flagged docs: MULTI_WORD_RE cannot
        # match ACROSS words (its alternatives are all word
        # characters), so unflagged docs have no multi-part word
        idx = flagged[flagged].index
        wholes = s[idx].str.findall(_WORD).map(_whole_forms)
        parts[idx] = parts[idx] + wholes
    stop = spec.STOP_TOKENS
    return parts.map(lambda toks: [t for t in toks if t not in stop])


def _count_series(
    s: pd.Series,
    token_re: re.Pattern | None = None,
    forms=None,
) -> tuple[pd.Series, list[int]]:
    """Fused tokenize + per-doc term count (the build hot path):
    strings in, (Counter per doc, post-filter token count per doc) out.

    Equivalent to ``Counter(_tokenize_series(s)[i])`` doc by doc —
    pinned by tests — but never materializes the token lists twice:
    counts come straight off the findall result (C-level Counter), stop
    tokens are removed with ~25 dict pops per doc instead of a scan
    over every token, and the optional 1->N normal-form expansion
    (``forms``, a Normalizer) runs once per UNIQUE surface token
    instead of once per occurrence."""
    from collections import Counter

    s = s.fillna("")
    split, flagged = _gated_split(s)
    counters = split.str.lower().str.findall(token_re or _TOK).map(Counter)
    if flagged is not None and flagged.any():
        for i, ws in s[flagged[flagged].index].str.findall(_WORD).items():
            counters[i].update(_whole_forms(ws))
    stop = spec.STOP_TOKENS_SORTED
    lengths: list[int] = []
    if forms is None:
        for c in counters:
            for t in stop:
                c.pop(t, None)
            lengths.append(sum(c.values()))
        return counters, lengths
    # stemmed path: stop filter applies to SURFACE tokens (before
    # expansion), every normal form of a surviving token is counted
    # (reference service/LemmaUtils.java:67)
    expanded = []
    for c in counters:
        for t in stop:
            c.pop(t, None)
        e = Counter()
        for t, n in c.items():
            for f in forms(t):
                e[f] += n
        expanded.append(e)
        lengths.append(sum(e.values()))
    return pd.Series(expanded, index=counters.index), lengths


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(s: pd.Series) -> pd.Series:  # pragma: no cover (runs on executors)
    return _tokenize_series(s)


# ----------------------------------------------------------- catalyst
def tokenize_expr(col: Column | str) -> Column:
    """All-JVM tokenizer: regexp passes + extract-all + stop filter.

    Stays inside whole-stage codegen (no Python worker round-trip).
    """
    c = F.col(col) if isinstance(col, str) else col
    p = F.regexp_replace(c, spec.CAMEL_PASS_2, r"$1 $2")
    p = F.regexp_replace(p, spec.CAMEL_PASS_1, r"$1 $2")
    parts = F.regexp_extract_all(F.lower(p), F.lit(spec.TOKEN_RE), 0)
    wholes = F.transform(
        F.filter(
            F.regexp_extract_all(c, F.lit(spec.WORD_RE), 0),
            lambda w: w.rlike(spec.MULTI_WORD_RE),
        ),
        lambda w: F.lower(F.regexp_replace(w, "_", "")),
    )
    toks = F.concat(parts, wholes)
    stop = F.array(*[F.lit(t) for t in spec.STOP_TOKENS_SORTED])
    return F.filter(toks, lambda t: ~F.array_contains(stop, t))


# -------------------------------------------------------------- duckdb
def tokenize_sql_duckdb(col_sql: str) -> str:
    """DuckDB SQL expression producing the token LIST for ``col_sql``.

    Must agree exactly with the other three forms; exercised by the
    driver's DuckDB oracle and by tests/test_tokenizer.py.
    """
    stop_list = ", ".join(f"'{t}'" for t in spec.STOP_TOKENS_SORTED)
    parts = (
        "regexp_extract_all(lower(regexp_replace(regexp_replace("
        f"coalesce({col_sql}, ''), "
        f"'{spec.CAMEL_PASS_2}', '\\1 \\2', 'g'), "
        f"'{spec.CAMEL_PASS_1}', '\\1 \\2', 'g')), "
        f"'{spec.TOKEN_RE}')"
    )
    wholes = (
        f"list_transform(list_filter("
        f"regexp_extract_all(coalesce({col_sql}, ''), '{spec.WORD_RE}'), "
        f"w -> regexp_matches(w, '{spec.MULTI_WORD_RE}')), "
        f"w -> lower(replace(w, '_', '')))"
    )
    return (
        f"list_filter(list_concat({parts}, {wholes}), "
        f"t -> t NOT IN ({stop_list}))"
    )
