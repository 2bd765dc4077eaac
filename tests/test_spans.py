"""Substring-level span dedup (operators/spans.py). The driver query
hash-checks detection + stitching against DuckDB on the fixture; these
tests pin the semantic contracts on adversarial corpora: ownership,
internal repeats, consistency between stats and strip, the
anchor-subsampling containment, and the degenerate inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from d2d_spark.operators.spans import (
    duplicate_span_stats,
    duplicate_windows,
    strip_duplicate_spans,
)

K = 20
SHARED = "the quick brown fox jumps over the lazy dog "  # 44 chars


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_first_occurrence_survives_later_copies_cut(spark):
    d = _df(
        spark,
        [
            (1, SHARED + "ONE unique tail here"),
            (2, SHARED + "TWO different ending"),
        ],
    )
    out = {r.doc_id: r for r in strip_duplicate_spans(d, "text", "doc_id", k=K).collect()}
    assert out[1].text == SHARED + "ONE unique tail here"
    assert out[1].n_dropped_chars == 0
    assert out[2].text == "TWO different ending"
    assert out[2].n_dropped_chars == len(SHARED)


def test_identical_docs_one_empties(spark):
    d = _df(spark, [(5, SHARED * 2), (3, SHARED * 2)])
    out = {r.doc_id: r.text for r in strip_duplicate_spans(d, "text", "doc_id", k=K).collect()}
    # doc 3 is the canonical owner of every window (min doc_id); doc 5
    # is fully covered -> empty. doc 3 also self-repeats internally.
    assert out[5] == ""
    assert len(out[3]) < len(SHARED * 2)


def test_internal_repetition_detected(spark):
    d = _df(spark, [(1, "abab" * 30), (2, "no repeats in this one at all zz")])
    stats = {r.doc_id: r for r in duplicate_span_stats(d, "text", "doc_id", k=K).collect()}
    assert stats[1].dup_chars > 0
    assert stats[2].dup_chars == 0
    assert stats[2].dup_frac == 0.0


def test_stats_agree_with_strip(spark, sf_dir):
    from d2d_spark.session import read_table

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    stats = duplicate_span_stats(d, "text", "doc_id", k=25).select("doc_id", "dup_chars")
    strip = strip_duplicate_spans(d, "text", "doc_id", k=25).select(
        "doc_id", F.col("n_dropped_chars").alias("dup_chars")
    )
    assert stats.exceptAll(strip).count() == 0
    assert strip.exceptAll(stats).count() == 0
    # the fixture's planted near-dups guarantee repeated spans exist
    assert stats.filter(F.col("dup_chars") > 0).count() > 0


def test_anchor_subsampling_is_contained_in_exact(spark, sf_dir):
    from d2d_spark.session import read_table

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    exact = {(r["__id"], r["pos"]) for r in duplicate_windows(d, "text", "doc_id", k=25).collect()}
    sampled = {
        (r["__id"], r["pos"])
        for r in duplicate_windows(d, "text", "doc_id", k=25, anchor_mod=4).collect()
    }
    assert sampled <= exact
    # content-defined anchors: expect roughly 1/4 of the windows,
    # deterministic for a fixed corpus — just pin non-trivial coverage
    assert len(sampled) > 0


def test_short_and_empty_texts_pass_through(spark):
    d = _df(spark, [(1, "tiny"), (2, ""), (3, None), (4, SHARED + "x"), (5, SHARED + "y")])
    out = {r.doc_id: r for r in strip_duplicate_spans(d, "text", "doc_id", k=K).collect()}
    assert out[1].text == "tiny" and out[1].n_dropped_chars == 0
    assert out[2].text == "" and out[2].n_dropped_chars == 0
    assert out[3].text is None
    stats = {r.doc_id: r for r in duplicate_span_stats(d, "text", "doc_id", k=K).collect()}
    assert stats[1].dup_chars == 0 and stats[1].dup_frac == 0.0
    assert stats[2].dup_frac is None  # 0-length denominator stays NULL, never div-zero
