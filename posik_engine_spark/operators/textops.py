"""Text-analysis operators for training-data pipelines.

All pure-Catalyst (JVM, whole-stage codegen — no Python workers), each
with an exactly-matching DuckDB SQL form used by the driver's
correctness oracle (__spark_entry__.py).

Operators:
- token_count:     engine-tokenizer token count + raw whitespace count
- doc_fingerprint: md5 over the normalized token stream (order-
                   preserving content fingerprint; the scalable analog
                   of the reference's lemmasHashcode,
                   /root/reference/.../service/LemmaUtils.java:50-56)
- text_quality:    length / stopword-ratio / punctuation-ratio /
                   digit-ratio quality signals
- lang_id:         n-gram-free heuristic language ID: argmax over
                   per-language function-word hit ratios
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from posik_engine_spark import spec
from posik_engine_spark.functions.tokenizer import tokenize_expr

# fixed function-word lists (frozen; the deterministic stand-in for a
# real langid model — prediction quality is not the point, pipeline
# determinism is)
LANG_WORDLISTS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "das", "ist", "von", "mit", "den", "im", "ein"),
    "en": ("the", "and", "of", "to", "in", "is", "it", "you", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "se", "del", "las"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "un", "une", "du"),
}
RAW_WORD_RE = r"[a-z]+"
PUNCT_STRIP_RE = r"[a-z0-9\s]"


def _raw_words(col: Column) -> Column:
    """Lowercase alphabetic words WITHOUT stop filtering (langid needs
    the function words the engine tokenizer throws away)."""
    return F.regexp_extract_all(F.lower(col), F.lit(RAW_WORD_RE), 0)


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    toks = tokenize_expr(text_col)
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("n_ws_tokens"),
        F.length(text_col).alias("n_chars"),
    )


def doc_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    toks = tokenize_expr(text_col)
    return docs.select(
        "doc_id",
        F.md5(F.array_join(toks, " ").cast("binary")).alias("fingerprint"),
    )


def text_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    raw = _raw_words(F.col(text_col))
    stop = F.array(*[F.lit(t) for t in spec.STOP_TOKENS_SORTED])
    n_raw = F.size(raw)
    n_stop = F.size(F.filter(raw, lambda t: F.array_contains(stop, t)))
    n_chars = F.length(text_col)
    n_punct = F.length(F.regexp_replace(F.lower(F.col(text_col)), PUNCT_STRIP_RE, ""))
    n_digit = F.length(F.regexp_replace(F.col(text_col), r"[^0-9]", ""))
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_raw.alias("n_words"),
        F.round(
            F.when(n_raw > 0, n_stop.cast("double") / n_raw).otherwise(F.lit(0.0)), 6
        ).alias("stop_ratio"),
        F.round(
            F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0)), 6
        ).alias("punct_ratio"),
        F.round(
            F.when(n_chars > 0, n_digit.cast("double") / n_chars).otherwise(F.lit(0.0)), 6
        ).alias("digit_ratio"),
    )


# ---------------------------------------------- admission filter (B4)
# Reference behavior: the crawler refuses pages before they reach the
# index — non-2xx/3xx responses and non-text content types
# (/root/reference/.../service/crawler/CrawlerService.java:72,80-83).
# Code-corpus analog: reject empty/oversized docs and docs whose
# punctuation/digit ratios say "not really text" (minified blobs,
# binary-as-text, generated data dumps) before tokenization pays for
# them. Pure Catalyst; thresholds are frozen defaults so the DuckDB
# oracle (__spark_entry__.py admitted_docs) can mirror them exactly.
DEFAULT_MIN_CHARS = 10
DEFAULT_MAX_CHARS = 10_000_000
DEFAULT_MAX_PUNCT_RATIO = 0.5
DEFAULT_MAX_DIGIT_RATIO = 0.9
# Admission's "not text" signal must be UNICODE-aware: PUNCT_STRIP_RE
# ([a-z0-9\s], the ASCII-centric text_quality SIGNAL) would classify
# every Cyrillic/CJK/accented letter as punctuation and silently reject
# whole non-Latin corpora — the reference admits any text/* page
# regardless of language (CrawlerService.java:72). \p{L}\p{N} works
# identically in Java regex (Spark) and RE2 (DuckDB oracle).
ADMIT_TEXT_CHAR_RE = r"[\p{L}\p{N}\s]"


def admission_predicate(
    text_col: str = "text",
    min_chars: int = DEFAULT_MIN_CHARS,
    max_chars: int = DEFAULT_MAX_CHARS,
    max_punct_ratio: float = DEFAULT_MAX_PUNCT_RATIO,
    max_digit_ratio: float = DEFAULT_MAX_DIGIT_RATIO,
) -> Column:
    """Boolean admission column. Null text counts as empty (rejected by
    min_chars, like the reference dropping body-less responses). Ratios
    are rounded to 6 places BEFORE comparison so the boundary decision
    is bit-identical between Spark and the SQL oracle."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(c)
    n_punct = F.length(F.regexp_replace(c, ADMIT_TEXT_CHAR_RE, ""))
    n_digit = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    punct_ratio = F.round(
        F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0)), 6
    )
    digit_ratio = F.round(
        F.when(n_chars > 0, n_digit.cast("double") / n_chars).otherwise(F.lit(0.0)), 6
    )
    return (
        (n_chars >= min_chars)
        & (n_chars <= max_chars)
        & (punct_ratio <= max_punct_ratio)
        & (digit_ratio <= max_digit_ratio)
    )


def admit_docs(docs: DataFrame, text_col: str = "text", **thresholds) -> DataFrame:
    """Filter to admitted docs only (schema unchanged). The predicate
    sits directly over the scan, so Catalyst pushes the length bounds
    into the parquet read where stats allow and prunes rejected docs
    before the tokenizer UDF ever sees them."""
    return docs.filter(admission_predicate(text_col, **thresholds))


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Predict language as argmax of function-word hits; ties and
    zero-hit docs -> 'und'. Tie-break: language code ascending (the
    deterministic rule mirrored in the SQL oracle)."""
    raw = _raw_words(F.col(text_col))
    out = docs.select("doc_id", raw.alias("w"))
    def _hits(wordlist):
        wl = F.array(*[F.lit(t) for t in wordlist])
        # single-arg lambda: F.filter passes (elem, idx) to 2-arg lambdas
        return F.size(F.filter(F.col("w"), lambda t: F.array_contains(wl, t)))

    hit_cols = [
        _hits(LANG_WORDLISTS[lang]).alias(f"h_{lang}") for lang in sorted(LANG_WORDLISTS)
    ]
    out = out.select("doc_id", *hit_cols)
    best = F.greatest(*[F.col(f"h_{lang}") for lang in sorted(LANG_WORDLISTS)])
    pred = F.lit("und")
    # first language (ascending) reaching the max wins; single max -> that lang
    for lang in sorted(LANG_WORDLISTS, reverse=True):
        n_at_max = sum(
            F.when(F.col(f"h_{lg}") == best, 1).otherwise(0)
            for lg in sorted(LANG_WORDLISTS)
        )
        pred = F.when(
            (best > 0) & (F.col(f"h_{lang}") == best) & (n_at_max == 1), F.lit(lang)
        ).otherwise(pred)
    # unique argmax required; ties -> 'und'
    return out.select("doc_id", pred.alias("lang_pred"))
