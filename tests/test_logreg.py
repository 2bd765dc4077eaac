"""Hashed-feature logistic regression (operators/logreg.py): the
distributed full-batch GD fit must equal an independent pure-Python
implementation of the same algorithm, be partitioning-invariant, and
score through the same feature map."""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from d2d_spark.operators.dsir import md5_prefix_hasher
from d2d_spark.operators.logreg import fit_logreg_hashed, score_logreg_hashed

B = 32
ROUNDS = 5
LR = 0.5
REG = 0.1

_DOCS = [
    # "good" class: science-y vocabulary
    *[(i, f"the quantum field theory lecture {i} covers gauge symmetry", 1) for i in range(10)],
    # "raw" class: spam-y vocabulary
    *[(i + 10, f"click here buy now offer {i} free prize winner", 0) for i in range(10)],
    (20, "quantum prize crossover document gauge winner", 1),
]


def _py_grams(text: str) -> list[str]:
    toks = re.split(r"\s+", text.strip())
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % B


def _py_features() -> list[tuple[int, list[int], int]]:
    """(doc_id, sorted distinct buckets + intercept, label)."""
    out = []
    for i, text, y in _DOCS:
        buckets = sorted({_py_bucket(g) for g in _py_grams(text)}) + [-1]
        out.append((i, buckets, y))
    return out


def _py_fit() -> dict[int, float]:
    """Independent full-batch GD, plain float64 (Spark's DECIMAL
    quantization differs below 1e-13 — asserted at 1e-9)."""
    feats = _py_features()
    n = len(feats)
    w = {b: 0.0 for b in range(-1, B)}
    for _ in range(ROUNDS):
        grad = {b: 0.0 for b in w}
        for _i, buckets, y in feats:
            z = sum(w[b] for b in buckets)
            r = 1.0 / (1.0 + math.exp(-z)) - y
            for b in buckets:
                grad[b] += r
        w = {b: w[b] * (1.0 - LR * REG) - LR * grad[b] / n for b in w}
    return w


@pytest.fixture(scope="module")
def fitted(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string, y int")
    w = fit_logreg_hashed(
        df, "text", "y", "doc_id",
        n_buckets=B, rounds=ROUNDS, lr=LR, reg=REG, hasher=md5_prefix_hasher,
    )
    return df, w


def test_fit_matches_python_reference(fitted):
    _, w = fitted
    got = {r.bucket: r.w for r in w.collect()}
    want = _py_fit()
    assert set(got) == set(want)
    for b in want:
        assert abs(got[b] - want[b]) < 1e-9, (b, got[b], want[b])


def test_fit_separates_classes(fitted):
    df, w = fitted
    scored = score_logreg_hashed(
        df, "text", "doc_id", w, n_buckets=B, hasher=md5_prefix_hasher
    )
    p = {r.doc_id: r.prob for r in scored.collect()}
    good = [p[i] for i, _, y in _DOCS if y == 1]
    raw = [p[i] for i, _, y in _DOCS if y == 0]
    assert min(good) > max(raw)
    assert all(v > 0.5 for v in good) and all(v < 0.5 for v in raw)


def test_partitioning_invariance(spark, fitted):
    _, w = fitted
    df7 = spark.createDataFrame(_DOCS, "doc_id long, text string, y int").repartition(7)
    w7 = fit_logreg_hashed(
        df7, "text", "y", "doc_id",
        n_buckets=B, rounds=ROUNDS, lr=LR, reg=REG, hasher=md5_prefix_hasher,
    )
    a = {r.bucket: r.w for r in w.collect()}
    b = {r.bucket: r.w for r in w7.collect()}
    assert a == b  # bit-for-bit: DECIMAL accumulation is order-invariant


def test_null_text_scores_on_intercept(spark, fitted):
    _, w = fitted
    nulls = spark.createDataFrame([(99, None)], "doc_id long, text string")
    p = score_logreg_hashed(
        nulls, "text", "doc_id", w, n_buckets=B, hasher=md5_prefix_hasher
    ).collect()[0].prob
    w0 = {r.bucket: r.w for r in w.collect()}[-1]
    assert abs(p - 1.0 / (1.0 + math.exp(-w0))) < 1e-12


def test_validation(spark):
    df = spark.createDataFrame([(1, "a b", 2)], "doc_id long, text string, y int")
    with pytest.raises(ValueError, match="binary 0/1"):
        fit_logreg_hashed(df, "text", "y", "doc_id", n_buckets=B, rounds=1)
    ok = spark.createDataFrame([(1, "a b", 1)], "doc_id long, text string, y int")
    with pytest.raises(ValueError, match="rounds"):
        fit_logreg_hashed(ok, "text", "y", "doc_id", n_buckets=B, rounds=0)
    nully = spark.createDataFrame([(1, "a b", None)], "doc_id long, text string, y int")
    with pytest.raises(ValueError, match="binary 0/1"):
        fit_logreg_hashed(nully, "text", "y", "doc_id", n_buckets=B, rounds=1)
