"""HTML field extraction (SURVEY.md §2 B1 for HTML corpora).

Mirrors the reference's jsoup selector pipeline
(/root/reference/.../service/LemmaUtils.java:18-48 with the field list
from application.yml:51-63: title weight 1.0, h1 weight 0.9, body
weight 0.8) including its defining quirk: after a non-title/non-body
field (h1) is processed, its elements are REMOVED from the DOM
(LemmaUtils.java:43-45), so the body field's text excludes h1 text —
h1 words are counted once at weight 0.9, not again at 0.8.

Implementation is pure Catalyst (regexp passes, whole-stage codegen —
no Python workers and no jsoup dependency): well-formed-enough HTML is
assumed (the extraction handles attributes, script/style blocks,
comments, and the common entities; it is NOT a general HTML5 parser —
documented engineering trade for an all-JVM plan at 100 TB).

For indexing, ``html_to_docs`` folds the three reference fields into
the engine's two-field layout: the high-weight field carries
title + h1 (weights 1.0/0.9 collapse to FIELD_WEIGHT_PATH = 1.0) and
``content`` carries body-without-h1 (0.8 == FIELD_WEIGHT_CONTENT).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tags whose CONTENT must disappear, not just the tags
_DROP_BLOCKS = r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>"
_COMMENTS = r"(?s)<!--.*?-->"
_H1_BLOCK = r"(?is)<h1\b[^>]*>.*?</h1\s*>"
_TAGS = r"(?s)<[^>]+>"

_ENTITIES = [
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"),  # &amp; LAST
]


def _strip_noise(col: Column) -> Column:
    """Remove what jsoup's DOM never exposes as element text: comments
    and script/style blocks (content included). Element extraction must
    run on this form, or a '<h1>' inside a script string would parse as
    a heading. Scripts are stripped BEFORE comments: a '<!--' inside a
    script string is common in legacy pages and would otherwise swallow
    real markup up to the next '-->' anywhere in the document; a
    '<script>' inside a comment (the reverse hazard) is far rarer."""
    c = F.regexp_replace(col, _DROP_BLOCKS, " ")
    return F.regexp_replace(c, _COMMENTS, " ")


def _text(col: Column) -> Column:
    """Tags stripped, entities decoded, whitespace collapsed."""
    c = F.regexp_replace(col, _TAGS, " ")
    for ent, rep in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def html_title(col: Column) -> Column:
    """Text of the first <title> element (selector 'title')."""
    return _text(
        F.regexp_extract(_strip_noise(col), r"(?is)<title\b[^>]*>(.*?)</title\s*>", 1)
    )


def html_h1(col: Column) -> Column:
    """Concatenated text of ALL <h1> elements (selector 'h1' matches
    every element; their texts are counted together)."""
    parts = F.regexp_extract_all(
        _strip_noise(col), F.lit(r"(?is)<h1\b[^>]*>(.*?)</h1\s*>"), 1
    )
    return _text(F.array_join(parts, " "))


def html_body_without_h1(col: Column) -> Column:
    """Text of <body> AFTER h1 elements were removed from the DOM —
    the reference's fieldElements.remove() quirk
    (LemmaUtils.java:43-45). Documents without an explicit <body> tag
    fall back to the whole-document text (jsoup normalizes a missing
    body the same way)."""
    c = _strip_noise(col)
    # three tiers keyed on the OPENING tag (jsoup normalizes a missing
    # close tag — an unclosed <body> must not leak <title>/head text
    # into the body field at body weight):
    #   closed <body>...</body>  -> inner text
    #   unclosed <body>...       -> opening tag to end of document
    #   no <body> tag at all     -> whole-document text
    # An explicitly empty <body></body> yields "" (first tier), never
    # the head fallback (double-counting).
    has_close = c.rlike(r"(?is)<body\b[^>]*>.*</body\s*>")
    # has_open requires the COMPLETE opening tag (with its '>'): a page
    # truncated mid-tag ('...<body' cut off by the crawler) has no body
    # content to extract, and must fall through to the whole-document
    # tier instead of silently yielding an empty body field
    has_open = c.rlike(r"(?is)<body\b[^>]*>")
    body = (
        F.when(
            has_close, F.regexp_extract(c, r"(?is)<body\b[^>]*>(.*)</body\s*>", 1)
        )
        .when(has_open, F.regexp_extract(c, r"(?is)<body\b[^>]*>(.*)$", 1))
        .otherwise(c)
    )
    return _text(F.regexp_replace(body, _H1_BLOCK, " "))


def html_fields(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Adds the three reference fields: title, h1, body (h1-excluded)."""
    c = F.coalesce(F.col(html_col), F.lit(""))
    return df.withColumns(
        {
            "title": html_title(c),
            "h1": html_h1(c),
            "body": html_body_without_h1(c),
        }
    )


def html_to_docs(
    df: DataFrame,
    site_col: str = "site",
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Adapt an HTML corpus (site, url, html) to the engine's
    input-hint shape: high-weight field <- url + title + h1, content <-
    body-without-h1; commit is the content sha prefix (a page has no
    VCS identity — recrawls of changed pages get a new doc identity,
    matching the reference's re-upsert by content hash).

    Deliberate deviation from the reference: URL tokens ride the
    high-weight field alongside title/h1 (the reference does not index
    the URL at all) — URL terms are a strong relevance signal in web
    ranking and the engine's path field is exactly the slot for them;
    title/h1's separate 1.0/0.9 weights collapse into the engine's
    two-field 1.0 (documented approximation)."""
    c = F.coalesce(F.col(html_col), F.lit(""))
    title_h1 = F.trim(
        F.concat_ws(" ", html_title(c), html_h1(c))
    )
    return df.select(
        F.col(site_col).alias("repo"),
        F.concat(F.col(url_col), F.lit(" "), title_h1).alias("path"),
        F.substring(F.sha2(c.cast("binary"), 256), 1, 8).alias("commit"),
        F.lit("html").alias("lang"),
        html_body_without_h1(c).alias("content"),
        # display title for serving (reference PageDtoAdapter.java:14-21
        # shows the page's real <title>): rides the docs frame as an
        # EXTRA column — the build pipeline projects it away, the
        # content store / SearchEngine thread it through to search hits
        html_title(c).alias("title"),
    )
