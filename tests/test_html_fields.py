"""HTML field extraction goldens — jsoup-selector parity incl. the
h1-removed-from-body quirk (reference LemmaUtils.java:18-48)."""

from __future__ import annotations

from pyspark.sql import functions as F

from posik_engine_spark.functions import html as H

DOC = """<!DOCTYPE html>
<html><head>
  <title> My &amp; Your   Page </title>
  <style>body { color: red; }</style>
  <script>var x = "<h1>not a heading</h1>";</script>
</head>
<body class="main">
  <!-- a comment with <h1>ghost</h1> -->
  <h1 id="top">First Heading</h1>
  <p>Body text &lt;one&gt; here.</p>
  <h1>Second Heading</h1>
  <div>More <b>body</b> words</div>
</body></html>"""


def _one(spark, expr):
    df = spark.createDataFrame([(DOC,)], "html string")
    return df.select(expr.alias("v")).collect()[0]["v"]


def test_title(spark):
    assert _one(spark, H.html_title(F.col("html"))) == "My & Your Page"


def test_h1_concatenates_all(spark):
    assert _one(spark, H.html_h1(F.col("html"))) == "First Heading Second Heading"


def test_body_excludes_h1_script_style_comments(spark):
    body = _one(spark, H.html_body_without_h1(F.col("html")))
    assert body == "Body text <one> here. More body words"
    assert "Heading" not in body  # the fieldElements.remove() quirk
    assert "ghost" not in body and "color" not in body and "var x" not in body


def test_no_body_tag_falls_back_to_document(spark):
    df = spark.createDataFrame([("<h1>T</h1> plain fragment",)], "html string")
    got = df.select(H.html_body_without_h1(F.col("html")).alias("v")).collect()[0]["v"]
    assert got == "plain fragment"


def test_html_fields_and_docs_adapter(spark):
    df = spark.createDataFrame(
        [("siteA", "https://a.example/x", DOC)], "site string, url string, html string"
    )
    f = H.html_fields(df, "html").collect()[0]
    assert f["title"] == "My & Your Page"
    assert f["h1"] == "First Heading Second Heading"

    d = H.html_to_docs(df).collect()[0]
    assert d["repo"] == "siteA"
    assert d["path"].startswith("https://a.example/x ")
    assert "First Heading" in d["path"] and "My & Your Page" in d["path"]
    assert d["lang"] == "html"
    assert len(d["commit"]) == 8
    assert "Heading" not in d["content"]


def test_extraction_stays_jvm_side(spark):
    df = spark.createDataFrame([("<p>x</p>",)], "html string")
    plan = (
        H.html_fields(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan


def test_explicit_empty_body_stays_empty(spark):
    """An empty <body></body> must NOT fall back to the whole document
    (title would double-count into the body field)."""
    doc = "<html><head><title>Guide</title></head><body></body></html>"
    df = spark.createDataFrame([(doc,)], "html string")
    got = df.select(H.html_body_without_h1(F.col("html")).alias("v")).collect()[0]["v"]
    assert got == ""


def test_comment_opener_inside_script_does_not_eat_body(spark):
    """'<!--' inside a script string is stripped WITH the script, not
    treated as a comment start that swallows following markup."""
    doc = '<script>var s = "<!--";</script><p>real text</p><!-- note -->'
    df = spark.createDataFrame([(doc,)], "html string")
    got = df.select(H.html_body_without_h1(F.col("html")).alias("v")).collect()[0]["v"]
    assert got == "real text"


def test_html_title_served_end_to_end(spark, tmp_path):
    """Round-2 VERDICT item 8: search hits over an HTML corpus surface
    the page's REAL <title> (reference PageDtoAdapter.java:14-21), not
    the path-derived fallback — through both the in-memory docs route
    and the bucketed content store."""
    from posik_engine_spark.operators.content_store import save_content_store
    from posik_engine_spark.operators.index import build_index, save_index
    from posik_engine_spark.operators.search import SearchEngine

    pages = [
        ("siteA", "https://a.example/zebra",
         "<html><head><title>Zebra Compendium</title></head>"
         "<body><h1>Stripes</h1><p>zebra gallop herd savanna</p></body></html>"),
        ("siteA", "https://a.example/other",
         "<html><head><title>Other Page</title></head>"
         "<body><p>plain filler words here</p></body></html>"),
    ]
    docs = H.html_to_docs(
        spark.createDataFrame(pages, "site string, url string, html string")
    ).cache()
    assert "title" in docs.columns

    # in-memory route
    with SearchEngine.from_docs(spark, docs, n_shards=2) as eng:
        hit = eng.search("zebra gallop").hits[0]
        assert hit[3] == "Zebra Compendium"

    # content-store route
    ix_dir, cs_dir = str(tmp_path / "ix"), str(tmp_path / "cs")
    save_index(build_index(docs, n_shards=2, cache=False), ix_dir)
    save_content_store(docs, cs_dir, n_buckets=4)
    with SearchEngine.from_index_dir(spark, ix_dir, content_dir=cs_dir) as eng2:
        hit = eng2.search("zebra gallop").hits[0]
        assert hit[3] == "Zebra Compendium"

    # corpora WITHOUT a title column keep the path-derived fallback
    plain = docs.drop("title")
    with SearchEngine.from_docs(spark, plain, n_shards=2) as eng3:
        hit = eng3.search("zebra gallop").hits[0]
        assert hit[3] != "" and hit[3] != "Zebra Compendium"
