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
(MorphologyService.java:28-38) re-expressed as camelCase/snake_case
identifier splitting for the code corpus (spec.py).
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


# ------------------------------------------------------------- python
def tokenize_py(s: str | None) -> list[str]:
    """Pure-Python reference tokenizer (the oracle's form)."""
    if not s:
        return []
    s = _C2.sub(r"\1 \2", s)
    s = _C1.sub(r"\1 \2", s)
    return [t for t in _TOK.findall(s.lower()) if t not in spec.STOP_TOKENS]


# --------------------------------------------------------- pandas UDF
def _tokenize_series(s: pd.Series) -> pd.Series:
    s = s.fillna("")
    s = s.str.replace(spec.CAMEL_PASS_2, r"\1 \2", regex=True)
    s = s.str.replace(spec.CAMEL_PASS_1, r"\1 \2", regex=True)
    s = s.str.lower().str.findall(_TOK)
    stop = spec.STOP_TOKENS
    return s.map(lambda toks: [t for t in toks if t not in stop])


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(s: pd.Series) -> pd.Series:  # pragma: no cover (runs on executors)
    return _tokenize_series(s)


# ----------------------------------------------------------- catalyst
def tokenize_expr(col: Column | str) -> Column:
    """All-JVM tokenizer: regexp passes + extract-all + stop filter.

    Stays inside whole-stage codegen (no Python worker round-trip).
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, spec.CAMEL_PASS_2, r"$1 $2")
    c = F.regexp_replace(c, spec.CAMEL_PASS_1, r"$1 $2")
    toks = F.regexp_extract_all(F.lower(c), F.lit(spec.TOKEN_RE), 0)
    stop = F.array(*[F.lit(t) for t in spec.STOP_TOKENS_SORTED])
    return F.filter(toks, lambda t: ~F.array_contains(stop, t))


# -------------------------------------------------------------- duckdb
def tokenize_sql_duckdb(col_sql: str) -> str:
    """DuckDB SQL expression producing the token LIST for ``col_sql``.

    Must agree exactly with the other three forms; exercised by the
    driver's DuckDB oracle and by tests/test_tokenizer.py.
    """
    stop_list = ", ".join(f"'{t}'" for t in spec.STOP_TOKENS_SORTED)
    inner = (
        "regexp_extract_all(lower(regexp_replace(regexp_replace("
        f"coalesce({col_sql}, ''), "
        f"'{spec.CAMEL_PASS_2}', '\\1 \\2', 'g'), "
        f"'{spec.CAMEL_PASS_1}', '\\1 \\2', 'g')), "
        f"'{spec.TOKEN_RE}')"
    )
    return (
        f"list_filter({inner}, t -> t NOT IN ({stop_list}))"
    )
