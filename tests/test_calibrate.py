"""Isotonic calibration (operators/calibrate.py): PAV vs the exact
minimax brute force (Fraction arithmetic — the textbook identity
fit(i) = max_{j<=i} min_{k>=i} mean(j..k)), monotonicity and
mass-preservation invariants, binned vs distinct-score modes, the
apply lookup's clamp semantics, and the driver-pull refusal."""

from __future__ import annotations

import random
from fractions import Fraction

import pytest
from pyspark.sql import functions as F


def _minimax(bins):
    """Exact isotonic fit per bin via the minimax identity, Fractions
    throughout — an independent algorithm from the PAV stack."""
    n = len(bins)
    out = []
    for i in range(n):
        best = None
        for j in range(i + 1):
            worst = None
            for k in range(i, n):
                w = sum(bins[t][1] for t in range(j, k + 1))
                p = sum(bins[t][2] for t in range(j, k + 1))
                r = Fraction(p, w)
                if worst is None or r < worst:
                    worst = r
            if best is None or worst > best:
                best = worst
        out.append(best)
    return out


def test_pav_equals_exact_minimax():
    from d2d_spark.operators.calibrate import _pav

    rng = random.Random(411)
    for trial in range(60):
        n = rng.randint(1, 12)
        bins = [(i, rng.randint(1, 9), 0) for i in range(n)]
        bins = [(b, w, rng.randint(0, w)) for b, w, _ in bins]
        want = _minimax(bins)
        # expand pools back to per-bin fitted values
        got = []
        idx = 0
        for w, p, end in _pav(bins):
            for _ in range(idx, end + 1):
                got.append(Fraction(p, w))
            idx = end + 1
        assert got == want, (trial, bins, got, want)
        # invariants: monotone, mass-preserving
        assert all(a <= b for a, b in zip(got, got[1:]))
        assert sum(g * w for g, (_, w, _p) in zip(got, bins)) == sum(
            p for _, _, p in bins
        )


def test_isotonic_calibrate_distinct_and_binned(spark):
    from d2d_spark.operators.calibrate import isotonic_calibrate

    # scores whose raw positive rate is NON-monotone: 0.2 -> 1.0 ->
    # 0.0 -> 0.75 forces pooling of the middle bins
    rows = (
        [(0.1, False)] * 4 + [(0.1, True)]          # rate 0.2
        + [(0.3, True)] * 2                          # rate 1.0
        + [(0.5, False)] * 3                         # rate 0.0
        + [(0.9, True)] * 3 + [(0.9, False)]         # rate 0.75
        + [(None, True), (0.4, None)]                # dropped
    )
    df = spark.createDataFrame(rows, "s double, y boolean")
    m = isotonic_calibrate(df, "y", "s").orderBy("bin").collect()
    assert [r["bin"] for r in m] == [0, 1, 2, 3]
    assert [(r["n"], r["n_pos"]) for r in m] == [(5, 1), (2, 2), (3, 0), (4, 3)]
    probs = [r["prob"] for r in m]
    # middle pools: (2 pos of 2) + (0 of 3) pool to 2/5; 0.2 <= 0.4
    assert probs == [0.2, 0.4, 0.4, 0.75]
    assert all(a <= b for a, b in zip(probs, probs[1:]))
    assert m[0]["score_lo"] == m[0]["score_hi"] == 0.1
    # binned mode over [0, 1): same data, 10 fixed-width bins — the
    # same four occupied bins, same pooling
    mb = isotonic_calibrate(df, "y", "s", num_bins=10, lo=0.0, hi=1.0).orderBy(
        "bin"
    ).collect()
    assert [r["bin"] for r in mb] == [1, 3, 5, 9]
    assert [r["prob"] for r in mb] == [0.2, 0.4, 0.4, 0.75]
    assert mb[1]["score_lo"] == pytest.approx(0.3)
    assert mb[1]["score_hi"] == pytest.approx(0.4)
    # top bin's hi is the closed upper edge
    assert mb[3]["score_hi"] == 1.0
    # partitioning invariance of the collapse
    m32 = isotonic_calibrate(df.repartition(32), "y", "s").orderBy("bin").collect()
    assert [(r["bin"], r["prob"]) for r in m32] == [(r["bin"], r["prob"]) for r in m]


def test_apply_isotonic_clamps_and_gaps(spark):
    from d2d_spark.operators.calibrate import apply_isotonic, isotonic_calibrate

    fit_rows = (
        [(1.0, False)] * 3 + [(1.0, True)]  # score 1 -> 0.25
        + [(5.0, True)] * 3 + [(5.0, False)]  # score 5 -> 0.75
    )
    fit = spark.createDataFrame(fit_rows, "s double, y boolean")
    model = isotonic_calibrate(fit, "y", "s")
    probe = spark.createDataFrame(
        [(0, -7.0), (1, 1.0), (2, 3.0), (3, 5.0), (4, 99.0), (5, None)],
        "id long, s double",
    )
    got = {
        r["id"]: r["calibrated"]
        for r in apply_isotonic(probe, "s", model).collect()
    }
    assert got[0] == 0.25  # below everything -> first bin
    assert got[1] == 0.25
    assert got[2] == 0.25  # gap -> the bin below (floor lookup)
    assert got[3] == 0.75
    assert got[4] == 0.75  # above everything -> last bin
    assert got[5] is None
    # empty model -> NULL everywhere, no blow-up
    empty = isotonic_calibrate(fit.limit(0), "y", "s")
    assert empty.count() == 0
    out = apply_isotonic(probe, "s", empty).collect()
    assert all(r["calibrated"] is None for r in out)


def test_isotonic_refusals(spark):
    from d2d_spark.operators.calibrate import isotonic_calibrate

    df = spark.createDataFrame(
        [(float(i % 97) / 97.0, i % 3 == 0) for i in range(300)], "s double, y boolean"
    )
    with pytest.raises(ValueError, match="max_points"):
        isotonic_calibrate(df, "y", "s", max_points=10)
    with pytest.raises(ValueError, match="num_bins"):
        isotonic_calibrate(df, "y", "s", num_bins=0)
    with pytest.raises(ValueError, match="hi > lo"):
        isotonic_calibrate(df, "y", "s", num_bins=4, lo=1.0, hi=1.0)
    # binned mode under the same data stays inside max_points
    m = isotonic_calibrate(df, "y", "s", num_bins=8, max_points=10)
    probs = [r["prob"] for r in m.orderBy("bin").collect()]
    assert all(a <= b for a, b in zip(probs, probs[1:]))
