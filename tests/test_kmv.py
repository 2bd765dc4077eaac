"""KMV distinct sketch (operators/kmv.py): exactness below k,
estimate accuracy above it, lossless union, theta-style
intersection/difference, stamp discipline, store round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from d2d_spark.operators.kmv import (
    _SPACE,
    kmv_build,
    kmv_build_grouped,
    kmv_difference_estimate,
    kmv_estimate,
    kmv_intersect_estimate,
    kmv_union,
    load_kmv,
    save_kmv,
)


def _vals(spark, lo, hi, tag=""):
    return spark.range(lo, hi).select(
        F.concat(F.lit(tag), F.col("id").cast("string")).alias("v")
    )


def test_exact_below_k(spark):
    sk = kmv_build(_vals(spark, 0, 37), "v", k=64)
    assert sk.count() == 37
    est = kmv_estimate(sk).collect()[0].n_distinct
    assert est == 37.0


def test_estimate_accuracy_above_k(spark):
    n = 20_000
    sk = kmv_build(_vals(spark, 0, n), "v", k=1024)
    assert sk.count() == 1024
    est = kmv_estimate(sk).collect()[0].n_distinct
    assert abs(est - n) / n < 0.15  # ~1/sqrt(k-2) ≈ 3%, wide margin


def test_build_is_duplicate_and_partitioning_invariant(spark):
    base = _vals(spark, 0, 500)
    dup = base.unionByName(base).repartition(13)
    a = sorted(r.h for r in kmv_build(base, "v", k=64).collect())
    b = sorted(r.h for r in kmv_build(dup, "v", k=64).collect())
    assert a == b


def test_union_is_lossless(spark):
    a = kmv_build(_vals(spark, 0, 3000), "v", k=256)
    b = kmv_build(_vals(spark, 2000, 5000), "v", k=256)
    merged = kmv_union(a, b)
    whole = kmv_build(_vals(spark, 0, 5000), "v", k=256)
    assert sorted(r.h for r in merged.collect()) == sorted(
        r.h for r in whole.collect()
    )


def test_intersect_and_difference_estimates(spark):
    # |A|=6000, |B|=6000, |A∩B|=2000, |A\B|=4000
    a = kmv_build(_vals(spark, 0, 6000), "v", k=1024)
    b = kmv_build(_vals(spark, 4000, 10_000), "v", k=1024)
    inter = kmv_intersect_estimate(a, b).collect()[0].estimate
    diff = kmv_difference_estimate(a, b).collect()[0].estimate
    assert abs(inter - 2000) / 2000 < 0.25
    assert abs(diff - 4000) / 4000 < 0.25


def test_intersect_exact_when_both_below_k(spark):
    a = kmv_build(_vals(spark, 0, 50), "v", k=256)
    b = kmv_build(_vals(spark, 30, 80), "v", k=256)
    assert kmv_intersect_estimate(a, b).collect()[0].estimate == 20.0
    assert kmv_difference_estimate(a, b).collect()[0].estimate == 30.0


def test_disjoint_intersection_is_zero(spark):
    a = kmv_build(_vals(spark, 0, 1000, "a"), "v", k=128)
    b = kmv_build(_vals(spark, 0, 1000, "b"), "v", k=128)
    assert kmv_intersect_estimate(a, b).collect()[0].estimate == 0.0


def test_grouped_build_matches_per_group_build(spark):
    df = spark.range(4000).select(
        (F.col("id") % 3).alias("g"), F.col("id").cast("string").alias("v")
    )
    grouped = kmv_build_grouped(df, "v", "g", k=64)
    for g in (0, 1, 2):
        solo = kmv_build(df.filter(F.col("g") == g), "v", k=64)
        assert sorted(
            r.h for r in grouped.filter(F.col("g") == g).collect()
        ) == sorted(r.h for r in solo.collect())


def test_stamp_discipline_and_store_roundtrip(spark, tmpdir):
    a = kmv_build(_vals(spark, 0, 100), "v", k=64)
    b = kmv_build(_vals(spark, 0, 100), "v", k=128)
    with pytest.raises(ValueError, match="different k"):
        kmv_union(a, b)
    unstamped = a.select(F.col("h").alias("h", metadata={}))
    with pytest.raises(ValueError, match="stamp"):
        kmv_union(unstamped, a)
    with pytest.raises(ValueError, match=">= 8"):
        kmv_build(_vals(spark, 0, 10), "v", k=2)
    path = str(tmpdir.join("kmv_store"))
    exact = kmv_build(_vals(spark, 0, 50), "v", k=64)  # 50 < k: theta = 1
    save_kmv(exact, path)
    back = load_kmv(spark, path)
    assert sorted(r.h for r in back.collect()) == sorted(r.h for r in exact.collect())
    # a reloaded sketch keeps working in set ops (stamp survived)
    assert kmv_intersect_estimate(back, exact).collect()[0].estimate == 50.0


def test_hash_space_bound(spark):
    sk = kmv_build(_vals(spark, 0, 5000), "v", k=512)
    mx = sk.agg(F.max("h")).collect()[0][0]
    mn = sk.agg(F.min("h")).collect()[0][0]
    assert 0 <= mn and mx < _SPACE


def test_grouped_estimates(spark):
    from d2d_spark.operators.kmv import kmv_estimate_grouped

    # group 'a': 40 distinct (< k, exact); group 'b': 3000 (> k, ~3%)
    df = spark.range(3040).select(
        F.when(F.col("id") < 40, F.lit("a")).otherwise(F.lit("b")).alias("g"),
        F.concat(F.lit("v"), "id").alias("v"),
    )
    sk = kmv_build_grouped(df, "v", "g", k=256)
    est = {r.g: r.n_distinct for r in kmv_estimate_grouped(sk, "g").collect()}
    assert est["a"] == 40.0
    assert abs(est["b"] - 3000) / 3000 < 0.2
    # grouped rows estimate identically to a standalone build per group
    solo = kmv_build(df.filter(F.col("g") == "b"), "v", k=256)
    solo_est = kmv_estimate(solo).collect()[0].n_distinct
    assert est["b"] == solo_est


def test_grouped_estimate_requires_stamp(spark):
    from d2d_spark.operators.kmv import kmv_estimate_grouped

    df = spark.range(10).select(F.lit("a").alias("g"), F.col("id").alias("h"))
    with pytest.raises(ValueError, match="stamp"):
        kmv_estimate_grouped(df, "g")
