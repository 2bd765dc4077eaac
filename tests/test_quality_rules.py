"""Gopher quality rules (functions/text.py) and per-key caps
(operators/sampling.py) — rule-by-rule behavior on crafted documents
plus the quota determinism contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from d2d_spark.functions.text import gopher_pass, gopher_quality_flags


GOOD = (
    "the house stood on a small hill beside the river and every morning "
    "light came through the trees while people walked along the path to "
    "the market carrying baskets of fruit and bread for their families "
    "and friends who waited near the old stone bridge by the water mill "
    "under a clear sky full of birds"
)


def _flags(spark, text):
    df = spark.createDataFrame([(text,)], ["text"])
    row = df.withColumns(gopher_quality_flags(F.col("text"))).collect()[0]
    return {k: row[k] for k in row.asDict() if k.startswith("gq_")}


def test_good_document_passes_all(spark):
    flags = _flags(spark, GOOD)
    assert all(flags.values()), flags
    df = spark.createDataFrame([(GOOD,)], ["text"])
    assert df.select(gopher_pass(F.col("text")).alias("p")).collect()[0].p is True


def test_too_short_fails_word_count(spark):
    assert not _flags(spark, "only four words here")["gq_word_count_ok"]


def test_symbol_soup_fails(spark):
    text = " ".join(["##tag"] * 30 + ["word"] * 30)
    assert not _flags(spark, text)["gq_symbol_ratio_ok"]


def test_bullet_list_fails(spark):
    text = "\n".join(f"- item {i} in the list" for i in range(20))
    assert not _flags(spark, text)["gq_bullet_lines_ok"]


def test_numeric_noise_fails_alpha_rule(spark):
    text = " ".join(str(i) for i in range(100))
    assert not _flags(spark, text)["gq_alpha_words_ok"]


def test_no_stopwords_fails(spark):
    text = " ".join(["lorem", "ipsum", "dolor", "sit", "amet"] * 20)
    assert not _flags(spark, text)["gq_stopwords_ok"]


def test_empty_doc_fails_gopher_pass_not_null(spark):
    df = spark.createDataFrame([("",), ("   ",)], ["text"])
    rows = df.select(gopher_pass(F.col("text")).alias("p")).collect()
    assert [r.p for r in rows] == [False, False]


# -- cap_per_key ------------------------------------------------------
def test_cap_per_key_quota_and_determinism(spark, sf_dir):
    from d2d_spark.operators.sampling import cap_per_key
    from d2d_spark.session import read_table

    d = read_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    capped = cap_per_key(d, "source", max_rows=20, order_col="doc_id")
    per = capped.groupBy("source").count().collect()
    assert all(r["count"] <= 20 for r in per)
    # order_col ranking keeps the LOWEST doc_ids per source
    lows = {
        (r.source, r.doc_id)
        for r in d.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "source"
                ).orderBy("doc_id")
            ),
        )
        .filter(F.col("rn") <= 20)
        .select("source", "doc_id")
        .collect()
    }
    got = {(r.source, r.doc_id) for r in capped.select("source", "doc_id").collect()}
    assert got == lows
    # hash fallback: deterministic across partitionings
    a = {r.doc_id for r in cap_per_key(d, "source", 20).select("doc_id").collect()}
    b = {
        r.doc_id
        for r in cap_per_key(d.repartition(9), "source", 20).select("doc_id").collect()
    }
    assert a == b


def test_chunk_documents_coverage_and_overlap(spark):
    from d2d_spark.operators.sampling import chunk_documents

    d = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "xy"), (3, ""), (4, None)], ["doc_id", "text"]
    )
    out = chunk_documents(d, "text", "doc_id", max_chars=4, overlap=1)
    rows = {(r.doc_id, r.chunk_index): r.text for r in out.collect()}
    assert rows[(1, 0)] == "abcd" and rows[(1, 1)] == "defg" and rows[(1, 2)] == "ghij"
    assert (1, 3) not in rows  # trailing overlap-only chunk suppressed
    assert rows[(2, 0)] == "xy" and rows[(3, 0)] == "" and rows[(4, 0)] is None
    # stitched chunks (dropping each chunk's leading overlap) recover
    # the original text exactly
    stitched = rows[(1, 0)] + rows[(1, 1)][1:] + rows[(1, 2)][1:]
    assert stitched == "abcdefghij"


def test_chunk_documents_validates_args(spark):
    from d2d_spark.operators.sampling import chunk_documents

    d = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    for bad in ((0, 0), (4, 4), (4, -1)):
        try:
            chunk_documents(d, "text", "doc_id", max_chars=bad[0], overlap=bad[1])
            assert False, bad
        except ValueError:
            pass


# --- C4 line-level cleaning -----------------------------------------


def _c4(spark, text, **kw):
    from d2d_spark.functions.text import c4_clean_lines

    df = spark.createDataFrame([(text,)], ["text"])
    return df.select(c4_clean_lines(F.col("text"), **kw).alias("t")).first()["t"]


def test_c4_keeps_real_sentences_drops_boilerplate(spark):
    doc = "\n".join(
        [
            "This is a perfectly normal sentence with enough words.",
            "Click here",  # too short, no terminal punctuation
            "Please enable JavaScript to view the comments powered by widgets.",
            "This site uses cookies to improve your experience on our pages.",
            "function f() { return 1; }",  # curly braces
            "Another good sentence follows the bad ones right here!",
            'He said "it ends with a quoted stop."',
            "no terminal punctuation on this line of prose at all",
        ]
    )
    out = _c4(spark, doc)
    lines = out.split("\n")
    assert lines == [
        "This is a perfectly normal sentence with enough words.",
        "Another good sentence follows the bad ones right here!",
        'He said "it ends with a quoted stop."',
    ]


def test_c4_min_words_dial_and_empty_result(spark):
    short = "Tiny line ends well."
    assert _c4(spark, short) == ""  # 4 words < default 5
    assert _c4(spark, short, min_words=4) == short
    assert _c4(spark, "lorem ipsum dolor sit amet consectetur adipiscing elit.") == ""


def test_c4_composes_with_html_extraction(spark):
    from d2d_spark.functions.html import html_to_text
    from d2d_spark.functions.text import c4_clean_lines

    html = (
        "<html><body><p>The quick brown fox jumps over the lazy dog today.</p>"
        "<div><a href='/'>Home</a></div>"
        "<p>Privacy Policy and Terms of Use for this website apply here.</p></body></html>"
    )
    df = spark.createDataFrame([(html,)], ["html"])
    out = df.select(
        c4_clean_lines(html_to_text(F.col("html"))).alias("t")
    ).first()["t"]
    assert out == "The quick brown fox jumps over the lazy dog today."


def test_c4_bare_closing_quote_is_terminal(spark):
    """C4 counts an end quotation mark as terminal punctuation: a line
    ending in a bare closing quote survives; an unterminated line
    still drops."""
    quoted = '"I never said half the things I said," he told us later"'
    assert _c4(spark, quoted) == quoted
    curly = "He finished with the words everyone expected of him”"
    assert _c4(spark, curly) == curly
    unterminated = "this line just trails off with no punctuation at all"
    assert _c4(spark, unterminated) == ""


def test_compression_stats_twin_and_bands(spark):
    """compression_stats ≡ a direct zlib replay (same build,
    in-process), repetitive text compresses far better than
    random-ish text, and NULL/empty behave as documented."""
    import random
    import zlib

    from d2d_spark.functions.text import compression_stats

    rng = random.Random(7)
    noisy = " ".join(
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789") for _ in range(8))
        for _ in range(200)
    )
    docs = [
        (0, GOOD),
        (1, "spam " * 400),
        (2, noisy),
        (3, ""),
        (4, None),
        (5, "héllo wörld ünïcode 你好"),  # multi-byte utf-8
    ]
    df = spark.createDataFrame(docs, ["i", "text"]).repartition(3)
    rows = {
        r["i"]: r
        for r in df.select("i", "text", compression_stats(F.col("text")).alias("c"))
        .select("i", "text", "c.raw_bytes", "c.comp_bytes", "c.ratio")
        .collect()
    }
    for i, t in docs:
        r = rows[i]
        if t is None:
            assert r.raw_bytes is None and r.comp_bytes is None and r.ratio is None
            continue
        b = t.encode("utf-8")
        assert r.raw_bytes == len(b)
        assert r.comp_bytes == len(zlib.compress(b, 6))
        if b:
            assert r.ratio == len(zlib.compress(b, 6)) / len(b)
        else:
            assert r.ratio is None
    # band sanity: boilerplate << prose << noise
    assert rows[1].ratio < rows[0].ratio < rows[2].ratio
    assert rows[2].ratio > 0.6 and rows[1].ratio < 0.1
    # the level dial is honored (level 1 compresses no better than 9)
    l1 = (
        spark.createDataFrame([(GOOD * 20,)], ["text"])
        .select(compression_stats(F.col("text"), level=1).alias("c1"),
                compression_stats(F.col("text"), level=9).alias("c9"))
        .collect()[0]
    )
    assert l1.c1.comp_bytes >= l1.c9.comp_bytes
    import pytest

    with pytest.raises(ValueError, match="level"):
        compression_stats(F.col("text"), level=12)
