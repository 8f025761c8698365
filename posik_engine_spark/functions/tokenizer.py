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
def _tokenize_series(s: pd.Series, token_re: re.Pattern | None = None) -> pd.Series:
    s = s.fillna("")
    split = s.str.replace(spec.CAMEL_PASS_2, r"\1 \2", regex=True)
    split = split.str.replace(spec.CAMEL_PASS_1, r"\1 \2", regex=True)
    # whole-form expansion prefilter == MULTI_WORD_RE.search(doc), but
    # WITHOUT a third regex scan over the corpus: the two camel passes
    # insert one space per camel boundary, so a doc's length changed iff
    # a camel alternative of MULTI_WORD_RE matched (pass 2 can neither
    # create nor destroy a pass-1 adjacency — it only inserts spaces
    # after an uppercase run), and the remaining alternative is a
    # literal '_' containment check. Exactness is fuzz-pinned by
    # tests/test_tokenizer.py; this replaced a contains(MULTI) scan
    # that cost ~26% of the tokenizer on no-identifier corpora.
    flagged = (split.str.len() != s.str.len()) | s.str.contains("_", regex=False)
    parts = split.str.lower().str.findall(token_re or _TOK)
    if flagged.any():
        # per-word loop only over flagged docs: MULTI_WORD_RE cannot
        # match ACROSS words (its alternatives are all word
        # characters), so unflagged docs have no multi-part word
        search = _MULTI.search
        wholes = s[flagged].str.findall(_WORD).map(
            lambda ws: [w.replace("_", "").lower() for w in ws if search(w)]
        )
        parts[flagged] = parts[flagged] + wholes
    stop = spec.STOP_TOKENS
    return parts.map(lambda toks: [t for t in toks if t not in stop])


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
