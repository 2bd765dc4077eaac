"""HTML -> text extraction (functions/html.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from d2d_spark.functions.html import (
    decode_entities,
    html_link_density,
    html_to_text,
    strip_tags,
)

DOC = """<!DOCTYPE html><html><head>
<title>T</title>
<style>body { color: red; }</style>
<script type="text/javascript">var x = "<p>not text</p>";</script>
</head><body>
<!-- a comment with <p>markup</p> inside -->
<h1>Heading</h1>
<p>First paragraph with <b>bold</b> &amp; "entities" like &lt;tags&gt;.</p>
<p>Second   paragraph.</p>
<div><ul><li>item one</li><li>item two</li></ul></div>
</body></html>"""


def _one(spark, expr, value):
    return spark.range(1).select(expr(F.lit(value)).alias("v")).first()["v"]


def test_html_to_text_strips_everything_invisible(spark):
    text = _one(spark, html_to_text, DOC)
    assert "color: red" not in text  # style contents gone
    assert "var x" not in text and "not text" not in text  # script gone
    assert "comment" not in text  # comments gone
    assert "<" not in text.replace("<tags>", "")  # no residual markup
    # visible text survives with block structure as newlines
    lines = text.split("\n")
    assert "Heading" in lines
    assert any(l.startswith("First paragraph with bold") for l in lines)
    assert 'First paragraph with bold & "entities" like <tags>.' in lines
    assert "item one" in lines and "item two" in lines
    # intra-line whitespace collapsed
    assert "Second paragraph." in lines


def test_plain_text_passes_through_unchanged(spark):
    plain = "Just a plain sentence.\nAnd a second line."
    assert _one(spark, html_to_text, plain) == plain
    # idempotence on bracket-free output: extracting already-extracted
    # text is a no-op
    once = _one(spark, html_to_text, DOC.replace("&lt;tags&gt;", "tags"))
    assert _one(spark, html_to_text, once) == once


def test_one_pass_contract_on_entity_encoded_markup(spark):
    """The documented ONE-PASS contract, exercised head-on instead of
    sidestepped: a pass over entity-encoded markup yields literal
    angle-bracket TEXT (strip happens before decode, so &lt;tags&gt;
    is visible content, not markup) — and a second accidental pass
    would strip that text as markup. Both halves pinned."""
    once = _one(spark, html_to_text, DOC)
    assert "<tags>" in once, "entities must decode to visible bracket text"
    twice = _one(spark, html_to_text, once)
    assert twice != once, "second pass strips decoded brackets (why the contract is one-pass)"
    assert "<tags>" not in twice
    # everything outside the decoded brackets survives the second pass
    assert "item one" in twice and "Second paragraph." in twice


def test_entity_decode_order(spark):
    # &amp;lt; is the LITERAL text "&lt;", not a tag bracket
    assert _one(spark, decode_entities, "a &amp;lt; b &lt; c") == "a &lt; b < c"
    assert _one(spark, decode_entities, "x&nbsp;&quot;y&#39;") == 'x "y\''


def test_strip_tags_keeps_contents_of_normal_tags(spark):
    assert _one(spark, strip_tags, "<em>keep</em> this").strip() == "keep  this"


def test_malformed_markup_degrades_not_raises(spark):
    for junk in ("<p>unclosed", "text < not a tag", "<<>><script>x", ""):
        out = _one(spark, html_to_text, junk)
        assert out is not None


def test_link_density_separates_nav_from_article(spark):
    nav = '<div><a href="/">Home</a> <a href="/a">News</a> <a href="/b">More</a></div>'
    article = "<p>" + ("Long article text. " * 20) + '<a href="/src">source</a></p>'
    d_nav = _one(spark, html_link_density, nav)
    d_art = _one(spark, html_link_density, article)
    # "Home News More" = 12 anchor chars of 14 visible (separator
    # spaces count toward the total, as they should)
    assert d_nav > 0.7
    assert d_art < 0.1
    assert _one(spark, html_link_density, "<p></p>") is None  # no visible text
    assert _one(spark, html_link_density, "no links here") == 0.0


def test_extraction_feeds_text_operators(spark, sf_dir):
    """Composition: wrap fixture documents in markup, extract, and the
    result equals running the text ops on the original — the HTML
    stage is transparent to everything downstream."""
    from d2d_spark.session import read_table

    d = read_table(spark, sf_dir, "documents").limit(50).select("doc_id", "text")
    wrapped = d.select(
        "doc_id",
        F.concat(
            F.lit("<html><script>var z=1;</script><body><p>"),
            F.col("text"),
            F.lit("</p></body></html>"),
        ).alias("html"),
    )
    extracted = wrapped.select("doc_id", html_to_text(F.col("html")).alias("text"))
    want = d.select("doc_id", html_to_text(F.col("text")).alias("text"))
    got = {r["doc_id"]: r["text"] for r in extracted.collect()}
    exp = {r["doc_id"]: r["text"] for r in want.collect()}
    assert got == exp
