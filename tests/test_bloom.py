"""Broadcast Bloom-filter dedup (operators/bloom.py): the contracts a
hash can't see — zero false negatives, bounded false positives,
incremental union semantics, serialization, and determinism."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from d2d_spark.operators.bloom import (
    BloomFilter,
    bloom_dedup_incremental,
    build_bloom,
    filter_seen,
)


def _keys(spark, lo, hi, col="k"):
    return spark.range(lo, hi).select(F.concat(F.lit("key_"), "id").alias(col))


def test_no_false_negatives(spark):
    seen = _keys(spark, 0, 5000)
    bf = build_bloom(seen, "k", expected_items=5000, fpp=0.01)
    # probing the exact build set: every key must be flagged seen
    assert filter_seen(seen, bf, "k").count() == 0
    assert filter_seen(seen, bf, "k", keep_seen=True).count() == 5000


def test_false_positive_rate_bounded(spark):
    bf = build_bloom(_keys(spark, 0, 5000), "k", expected_items=5000, fpp=0.01)
    fresh = _keys(spark, 100_000, 110_000)
    wrongly_seen = filter_seen(fresh, bf, "k", keep_seen=True).count()
    assert wrongly_seen / 10_000 < 0.03  # 3x headroom over the 1% target


def test_deterministic_across_partitionings(spark):
    a = build_bloom(_keys(spark, 0, 2000), "k", expected_items=2000)
    b = build_bloom(_keys(spark, 0, 2000).repartition(11), "k", expected_items=2000)
    assert a.num_bits == b.num_bits and a.num_hashes == b.num_hashes
    assert np.array_equal(a.bits, b.bits)


def test_serialization_roundtrip(spark):
    bf = build_bloom(_keys(spark, 0, 1000), "k", expected_items=1000)
    back = BloomFilter.from_bytes(bf.to_bytes())
    assert back.num_bits == bf.num_bits and back.num_hashes == bf.num_hashes
    assert np.array_equal(back.bits, bf.bits)


def test_incremental_rounds(spark):
    r1 = _keys(spark, 0, 3000)
    fresh1, bf1 = bloom_dedup_incremental(r1, "k", None, expected_items=10_000)
    assert fresh1.count() == 3000  # empty prior: everything is new
    # round 2 overlaps round 1 by 1000 keys
    r2 = _keys(spark, 2000, 6000)
    fresh2, bf2 = bloom_dedup_incremental(r2, "k", bf1, expected_items=10_000)
    n2 = fresh2.count()
    # overlap (2000..2999) must be dropped; of the 3000 new keys a few
    # may be false-positive-dropped
    assert n2 <= 3000
    assert n2 >= 3000 * 0.97
    surviving = {r.k for r in fresh2.collect()}
    assert not any(f"key_{i}" in surviving for i in range(2000, 3000))
    # the updated filter knows both rounds
    assert filter_seen(_keys(spark, 0, 6000), bf2, "k").count() <= 3000 * 0.03


def test_union_merges_and_shape_guard(spark):
    a = build_bloom(_keys(spark, 0, 1000), "k", expected_items=4000)
    b = build_bloom(_keys(spark, 1000, 2000), "k", expected_items=4000)
    u = a.union(b)
    both = _keys(spark, 0, 2000)
    assert filter_seen(both, u, "k").count() == 0
    c = build_bloom(_keys(spark, 0, 10), "k", expected_items=100)
    try:
        a.union(c)
        assert False, "shape mismatch must raise"
    except ValueError:
        pass


def test_sizing_guard(spark):
    try:
        build_bloom(_keys(spark, 0, 10), "k", expected_items=10**12, fpp=0.001)
        assert False, "oversized bitmap must refuse"
    except ValueError as e:
        assert "shard" in str(e)


def test_null_keys_hash_consistently(spark):
    df = spark.createDataFrame([(None,), ("a",), (None,)], ["k"])
    bf = build_bloom(df, "k", expected_items=100)
    assert filter_seen(df, bf, "k").count() == 0
