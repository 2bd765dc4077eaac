"""DSIR importance resampling (operators/dsir.py) vs an independent
pure-Python replication: hashed features, smoothed models, per-doc
log-ratio, and the derandomized Gumbel top-k selection."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from d2d_spark.operators.dsir import (
    dsir_log_ratio,
    dsir_resample,
    dsir_select,
    fit_hashed_ngram_dist,
    hashed_ngram_features,
    md5_prefix_hasher,
)

B = 64  # small bucket count so collisions are exercised


def _md5_bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % B


def _py_grams(text: str) -> list[str]:
    toks = text.strip(" ").split()
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_logp(corpus: list[str], alpha=1.0) -> dict[int, float]:
    counts = [0] * B
    for t in corpus:
        for g in _py_grams(t):
            counts[_md5_bucket(g)] += 1
    total = sum(counts)
    return {
        b: math.log(c + alpha) - math.log(total + alpha * B)
        for b, c in enumerate(counts)
    }


TARGET = [
    "the quick brown fox jumps over the lazy dog",
    "the quick red fox runs over the green field",
    "a quick fox and a lazy dog play in the field",
]
RAW = [
    (0, "the quick brown fox naps near the lazy dog"),
    (1, "buy cheap pills online now discount offer click here"),
    (2, "a fox runs over the field while the dog sleeps"),
    (3, "stock alert winner casino bonus spins free money"),
    (4, "the lazy dog and the quick fox are friends"),
    (5, "limited offer subscribe unsubscribe mailing list winner"),
]


def _frames(spark):
    t = spark.createDataFrame(
        [(100 + i, s) for i, s in enumerate(TARGET)], "doc_id long, text string"
    )
    r = spark.createDataFrame(RAW, "doc_id long, text string")
    return t, r


def test_features_match_python(spark):
    _, r = _frames(spark)
    got = {
        (x.doc_id, x.bucket)
        for x in hashed_ngram_features(r, "text", "doc_id", B, md5_prefix_hasher)
        .groupBy("doc_id", "bucket").count().collect()
    }
    want = set()
    for i, s in RAW:
        for b in {_md5_bucket(g) for g in _py_grams(s)}:
            want.add((i, b))
    assert got == want


def test_log_ratio_matches_python(spark):
    t, r = _frames(spark)
    tm = fit_hashed_ngram_dist(
        hashed_ngram_features(t, "text", "doc_id", B, md5_prefix_hasher), B
    )
    rm = fit_hashed_ngram_dist(
        hashed_ngram_features(r, "text", "doc_id", B, md5_prefix_hasher), B
    )
    got = {
        x.doc_id: x.log_weight
        for x in dsir_log_ratio(r, "text", "doc_id", tm, rm, B, md5_prefix_hasher).collect()
    }
    pt = _py_logp(TARGET)
    pr = _py_logp([s for _, s in RAW])
    for i, s in RAW:
        want = sum(pt[_md5_bucket(g)] - pr[_md5_bucket(g)] for g in _py_grams(s))
        assert got[i] == pytest.approx(want, abs=1e-9)


def test_model_is_a_distribution(spark):
    t, _ = _frames(spark)
    m = fit_hashed_ngram_dist(
        hashed_ngram_features(t, "text", "doc_id", B, md5_prefix_hasher), B
    )
    rows = m.collect()
    assert len(rows) == B  # total support, untouched buckets floored
    assert sum(math.exp(r.logp) for r in rows) == pytest.approx(1.0, abs=1e-9)


def test_target_like_docs_outweigh_spam(spark):
    t, r = _frames(spark)
    lw = {
        x.doc_id: x.log_weight
        for x in dsir_log_ratio(
            r, "text", "doc_id",
            fit_hashed_ngram_dist(hashed_ngram_features(t, "text", "doc_id", B, md5_prefix_hasher), B),
            fit_hashed_ngram_dist(hashed_ngram_features(r, "text", "doc_id", B, md5_prefix_hasher), B),
            B, md5_prefix_hasher,
        ).collect()
    }
    assert min(lw[0], lw[2], lw[4]) > max(lw[1], lw[3], lw[5])


def test_resample_deterministic_and_partitioning_invariant(spark):
    t, r = _frames(spark)
    lw = dsir_log_ratio(
        r, "text", "doc_id",
        fit_hashed_ngram_dist(hashed_ngram_features(t, "text", "doc_id", B, md5_prefix_hasher), B),
        fit_hashed_ngram_dist(hashed_ngram_features(r, "text", "doc_id", B, md5_prefix_hasher), B),
        B, md5_prefix_hasher,
    )
    a = [x.doc_id for x in dsir_resample(lw, "doc_id", 3, seed=7).collect()]
    b = [x.doc_id for x in dsir_resample(lw.repartition(5), "doc_id", 3, seed=7).collect()]
    assert a == b
    c = [x.doc_id for x in dsir_resample(lw, "doc_id", 3, seed=8).collect()]
    assert sorted(a) != sorted(c) or a != c  # a different seed reshuffles keys


def test_resample_matches_python_gumbel(spark):
    t, r = _frames(spark)
    lw_df = dsir_log_ratio(
        r, "text", "doc_id",
        fit_hashed_ngram_dist(hashed_ngram_features(t, "text", "doc_id", B, md5_prefix_hasher), B),
        fit_hashed_ngram_dist(hashed_ngram_features(r, "text", "doc_id", B, md5_prefix_hasher), B),
        B, md5_prefix_hasher,
    )
    lw = {x.doc_id: x.log_weight for x in lw_df.collect()}

    def py_key(i, seed):
        u = (
            int(hashlib.md5(f"{i}#{seed}".encode()).hexdigest()[:8], 16) % (1 << 20)
            + 0.5
        ) / float(1 << 20)
        return lw[i] + (-math.log(-math.log(u)))

    want = sorted(lw, key=lambda i: (-py_key(i, 3), i))[:4]
    got = [x.doc_id for x in dsir_resample(lw_df, "doc_id", 4, seed=3).collect()]
    assert got == want


def test_dsir_select_end_to_end(spark):
    t, r = _frames(spark)
    out = dsir_select(r, t, "text", "doc_id", n=3, n_buckets=B, seed=1)
    rows = out.collect()
    assert len(rows) == 3
    assert {"doc_id", "text", "log_weight", "gumbel_key"} <= set(out.columns)


def test_validation(spark):
    t, r = _frames(spark)
    with pytest.raises(ValueError, match="n_buckets"):
        hashed_ngram_features(r, "text", "doc_id", 1)
    lw = spark.createDataFrame([(1, 0.0)], "doc_id long, log_weight double")
    with pytest.raises(ValueError, match="n must be"):
        dsir_resample(lw, "doc_id", 0)


def test_gumbel_selection_proportional_to_exp_lw():
    """The statistical Gumbel-max property itself: over many seeds the
    n=1 winner frequency is proportional to exp(lw). Pure Python over
    the SAME key formula test_resample_matches_python_gumbel pins
    bit-for-bit against the Spark column, so the check transfers.
    Deterministic (fixed seed range + md5), so it either holds forever
    or fails immediately — no flake."""
    lw = {1: 0.0, 2: math.log(2.0), 3: math.log(4.0)}

    def key(i, seed):
        u = (
            int(hashlib.md5(f"{i}#{seed}".encode()).hexdigest()[:8], 16) % (1 << 20)
            + 0.5
        ) / float(1 << 20)
        return lw[i] + (-math.log(-math.log(u)))

    n_trials = 7000
    wins = {i: 0 for i in lw}
    for seed in range(n_trials):
        wins[max(lw, key=lambda i: key(i, seed))] += 1
    for i, p in ((1, 1 / 7), (2, 2 / 7), (3, 4 / 7)):
        # ~3.4 sd at the worst-case p — generous but still a real
        # proportionality check (uniform selection would be ~0.19 off)
        assert abs(wins[i] / n_trials - p) < 0.02, (i, wins)
