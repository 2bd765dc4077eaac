"""Winnowing fingerprints — pinned bit-for-bit against an independent
pure-Python implementation, plus the paper's detection guarantee."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from d2d_spark.operators.winnow import (
    md5_prefix_hasher,
    winnow_fingerprints,
    winnow_near_pairs,
)


def py_md5_hash(g: str) -> int:
    return int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16)


def py_winnow(text: str, k: int, w: int) -> set[tuple[int, int]]:
    """Independent reference: k-gram md5-prefix hashes, window of w,
    min with rightmost tie-break, distinct selections."""
    if text is None or len(text) < k:
        return set()
    grams = [(i, py_md5_hash(text[i : i + k])) for i in range(len(text) - k + 1)]
    n_win = max(len(grams) - w + 1, 1)
    picked = set()
    for s in range(n_win):
        win = grams[s : s + w]
        m = min(h for _, h in win)
        pos = max(p for p, h in win if h == m)
        picked.add((pos, m))
    return picked


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, "completely different content with zero overlap here!"),
    (4, "the quick brown fox jumps over the lazy dog"),  # exact clone of 1
    (5, "short"),
    (6, ""),
    (7, None),
    (8, "aaaaaaaaaaaaaaaaaaaaaaaa"),  # all k-grams identical (tie storm)
    (9, "abcabcabcabcabcabcabcabc"),  # period-3 repetition
]


@pytest.fixture(scope="module")
def docs(spark):  # noqa: F811
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


@pytest.mark.parametrize("k,w", [(4, 4), (5, 8), (8, 3), (2, 1)])
def test_matches_python_reference(spark, docs, k, w):  # noqa: F811
    got = {
        (r["doc_id"], r["pos"], r["h"])
        for r in winnow_fingerprints(
            docs, "text", "doc_id", k=k, w=w, hasher=md5_prefix_hasher
        ).collect()
    }
    want = {
        (i, p, h) for i, t in CORPUS for p, h in py_winnow(t, k, w)
    }
    assert got == want


def test_detection_guarantee(spark):  # noqa: F811
    """Any shared substring of length >= w + k - 1 must yield at least
    one shared (hash) fingerprint — the winnowing guarantee, checked
    over planted substrings at many alignments."""
    k, w = 5, 4
    shared = "THE-COMMON-PLANTED-SEGMENT-XYZ"  # len 30 >= w + k - 1 = 8
    rows = [(0, "left filler " + shared + " right filler")]
    rows += [
        (i, ("pad%d " % i) * i + shared + " tail%d" % i) for i in range(1, 12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = winnow_fingerprints(df, "text", "doc_id", k=k, w=w, hasher=md5_prefix_hasher)
    hs = {r["doc_id"]: set() for r in df.collect()}
    for r in fp.collect():
        hs[r["doc_id"]].add(r["h"])
    for i in range(1, 12):
        assert hs[0] & hs[i], f"doc {i} shares no fingerprint with doc 0"


def test_density(spark):  # noqa: F811
    """Expected density 2/(w+1): on random-ish text the fingerprint
    count per doc should be within 2x of it (loose, deterministic)."""
    import random

    rng = random.Random(7)
    text = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(4000))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    k, w = 8, 8
    n = winnow_fingerprints(df, "text", "doc_id", k=k, w=w).count()
    n_grams = len(text) - k + 1
    expect = 2 * n_grams / (w + 1)
    assert expect / 2 < n < expect * 2, (n, expect)


def test_near_pairs_planted_clones(spark, docs):  # noqa: F811
    out = winnow_near_pairs(
        docs, "text", "doc_id", k=4, w=4, threshold_pct=100, hasher=md5_prefix_hasher
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    # doc 4 is a byte-identical clone of doc 1 => identical sets
    assert (1, 4) in got
    for r in out:
        assert r["n_shared"] * 100 >= 100 * (r["n_a"] + r["n_b"] - r["n_shared"])
    # near-identical docs 1/2 (one word differs) pass a 50% bar
    got50 = {
        (r["id_a"], r["id_b"])
        for r in winnow_near_pairs(
            docs, "text", "doc_id", k=4, w=4, threshold_pct=50, hasher=md5_prefix_hasher
        ).collect()
    }
    assert (1, 2) in got50 and (2, 4) in got50
    assert not any(3 in p for p in got50)  # unrelated doc stays unpaired


def test_near_pairs_max_df_drops_boilerplate(spark):  # noqa: F811
    """A fingerprint present in > max_df docs is a stop fingerprint:
    docs related ONLY through it produce no pair."""
    chrome = "COPYRIGHT-FOOTER-SAME-EVERYWHERE"
    rows = [(i, f"unique body {i} {i} {i} || " + chrome) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    paired = winnow_near_pairs(
        df, "text", "doc_id", k=5, w=4, threshold_pct=30, max_df=5
    )
    assert paired.count() == 0
    # and with the cap off, the boilerplate DOES pair them up
    unfiltered = winnow_near_pairs(
        df, "text", "doc_id", k=5, w=4, threshold_pct=30, max_df=None
    )
    assert unfiltered.count() > 0


def test_validation(spark, docs):  # noqa: F811
    from d2d_spark.operators.winnow import kgram_hashes, winnow_select

    with pytest.raises(ValueError, match="k must be"):
        kgram_hashes(F.col("text"), 1)
    with pytest.raises(ValueError, match="w must be"):
        winnow_select(F.col("text"), 0)
    with pytest.raises(ValueError, match="threshold_pct"):
        winnow_near_pairs(docs, "text", "doc_id", threshold_pct=0)
    with pytest.raises(ValueError, match="max_df"):
        winnow_near_pairs(docs, "text", "doc_id", max_df=1)


def test_random_unicode_corpus_matches_python(spark):
    """Seeded random corpus over a unicode-heavy alphabet (CJK,
    accents, emoji-free BMP, whitespace): Spark's char split and the
    Python reference's code-point indexing must agree on every
    fingerprint — the parity the literal driver oracles stand on."""
    import random

    alphabet = "abĉdé中文字αβγж .!?\t"
    rng = random.Random(99)
    corpus = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 120))))
        for i in range(100)
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    for k, w in ((3, 5), (6, 2)):
        got = {
            (r["doc_id"], r["pos"], r["h"])
            for r in winnow_fingerprints(
                df, "text", "doc_id", k=k, w=w, hasher=md5_prefix_hasher
            ).collect()
        }
        want = {(i, p, h) for i, t in corpus for p, h in py_winnow(t, k, w)}
        assert got == want, (k, w)
