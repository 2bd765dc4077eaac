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


def test_stream_bloom_dedup_sink_end_to_end(spark, tmp_path):
    """Two file drops with overlapping keys: the second batch's
    overlap is dropped against the persisted filter; a simulated
    replay of a batch re-derives its original survivors from the
    pre-state instead of seeing its own keys as seen."""
    import os

    from pyspark.sql import types as T

    from d2d_spark.streaming.filestream import file_stream, stream_bloom_dedup_sink

    src = tmp_path / "src"
    src.mkdir()
    target = str(tmp_path / "out")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType([T.StructField("k", T.StringType())])

    _keys(spark, 0, 300).write.mode("overwrite").parquet(str(src / "drop1"))
    stream = file_stream(spark, str(src) + "/*", schema)
    stream_bloom_dedup_sink(stream, "k", state, target, ckpt, expected_items=10_000)
    got1 = {r.k for r in spark.read.parquet(target).collect()}
    assert got1 == {f"key_{i}" for i in range(300)}

    # second drop overlaps 100..299 — only 300..499 survive
    _keys(spark, 100, 500).write.mode("overwrite").parquet(str(src / "drop2"))
    stream = file_stream(spark, str(src) + "/*", schema)
    stream_bloom_dedup_sink(stream, "k", state, target, ckpt, expected_items=10_000)
    got = {r.k for r in spark.read.parquet(target).collect()}
    missing_new = {f"key_{i}" for i in range(300, 500)} - got
    assert len(missing_new) <= 200 * 0.03  # fp-dropped headroom only
    assert len(got) == len(got1) + (200 - len(missing_new))
    assert len({f for f in os.listdir(state) if f.endswith(".bloom")}) >= 2

    # replay: the latest batch's data partition rewritten from the SAME
    # pre-state must be byte-identical survivors, not an empty set
    batches = sorted(
        int(d.split("=")[1]) for d in os.listdir(target) if d.startswith("batch_id=")
    )
    last = batches[-1]
    before = {
        r.k for r in spark.read.parquet(os.path.join(target, f"batch_id={last}")).collect()
    }
    assert before  # the batch that carried drop2's survivors
    import re as _re

    from d2d_spark.operators.bloom import BloomFilter, filter_seen

    pat = _re.compile(r"state_after_batch_(\d+)\.bloom$")
    prior_ids = [
        int(pat.match(f).group(1))
        for f in os.listdir(state)
        if pat.match(f) and int(pat.match(f).group(1)) < last
    ]
    with open(os.path.join(state, f"state_after_batch_{max(prior_ids)}.bloom"), "rb") as f:
        prior = BloomFilter.from_bytes(f.read())
    replay_input = _keys(spark, 100, 500)
    replayed = {r.k for r in filter_seen(replay_input, prior, "k").collect()}
    assert replayed == before


def test_stream_bloom_sink_in_batch_dedup_and_lifetime_guards(spark, tmp_path):
    import os
    import shutil

    from pyspark.sql import types as T

    from d2d_spark.streaming.filestream import file_stream, stream_bloom_dedup_sink

    src = tmp_path / "src"
    src.mkdir()
    target = str(tmp_path / "out")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType([T.StructField("k", T.StringType())])

    # one drop containing each key TWICE: in-batch dedup must keep one
    dupes = _keys(spark, 0, 100).union(_keys(spark, 0, 100))
    dupes.write.mode("overwrite").parquet(str(src / "drop1"))
    stream = file_stream(spark, str(src) + "/*", schema)
    stream_bloom_dedup_sink(stream, "k", state, target, ckpt, expected_items=10_000)
    rows = [r.k for r in spark.read.parquet(target).collect()]
    assert sorted(rows) == sorted({f"key_{i}" for i in range(100)})

    # resumed checkpoint + wiped state: refused (seen keys would leak)
    for f in os.listdir(state):
        os.remove(os.path.join(state, f))
    stream = file_stream(spark, str(src) + "/*", schema)
    try:
        stream_bloom_dedup_sink(stream, "k", state, target, ckpt, expected_items=10_000)
        assert False, "resumed checkpoint without state must refuse"
    except ValueError as e:
        assert "no filter state" in str(e)

    # fresh checkpoint + surviving state: refused
    state2 = str(tmp_path / "state2")
    os.makedirs(state2)
    with open(os.path.join(state2, "state_after_batch_0.bloom"), "wb") as f:
        f.write(b"D2DBLOOMxxxx")
    shutil.rmtree(ckpt)
    target2 = str(tmp_path / "out2")
    stream = file_stream(spark, str(src) + "/*", schema)
    try:
        stream_bloom_dedup_sink(stream, "k", state2, target2, ckpt, expected_items=10_000)
        assert False, "fresh checkpoint over old state must refuse"
    except ValueError as e:
        assert "previous checkpoint lifetime" in str(e)


# ---------------------------------------------------------------------------
# bloom_prune_join: the runtime-filter join — result must be EXACTLY
# the plain join for every supported how, with the big side pruned
# map-side before the shuffle
# ---------------------------------------------------------------------------


def _join_fixtures(spark):
    # big: 4000 rows over 400 keys; small: 37 selective keys + extras
    big = spark.range(4000).select(
        (F.col("id") % 400).alias("k"), (F.col("id") * 7).alias("payload")
    )
    small = spark.range(37).select(
        (F.col("id") * 11).alias("k"), F.concat(F.lit("dim_"), "id").alias("name")
    )
    return big, small


def _sorted_rows(df):
    return sorted((tuple(r) for r in df.collect()), key=repr)


def test_bloom_prune_join_inner_equals_plain(spark):
    from d2d_spark.operators.bloom import bloom_prune_join

    big, small = _join_fixtures(spark)
    got = bloom_prune_join(big, small, "k", "inner", fpp=1e-6)
    want = big.join(small, "k", "inner")
    assert _sorted_rows(got) == _sorted_rows(want)


def test_bloom_prune_join_semi_and_anti_equal_plain(spark):
    from d2d_spark.operators.bloom import bloom_prune_join

    big, small = _join_fixtures(spark)
    for how in ("left_semi", "left_anti"):
        got = bloom_prune_join(big, small, "k", how, fpp=1e-6)
        want = big.join(small, "k", how)
        assert _sorted_rows(got) == _sorted_rows(want), how
    # anti + semi partition the big side exactly
    n_semi = bloom_prune_join(big, small, "k", "left_semi").count()
    n_anti = bloom_prune_join(big, small, "k", "left_anti").count()
    assert n_semi + n_anti == big.count()


def test_bloom_prune_join_multi_key_and_null_keys(spark):
    from d2d_spark.operators.bloom import bloom_prune_join

    big = spark.createDataFrame(
        [(1, "a", 10), (1, None, 11), (2, "b", 12), (None, "b", 13), (3, "c", 14)],
        "k1 int, k2 string, payload int",
    )
    small = spark.createDataFrame(
        [(1, "a", "x"), (3, "c", "y"), (9, "z", "w")], "k1 int, k2 string, name string"
    )
    for how in ("inner", "left_semi", "left_anti"):
        got = bloom_prune_join(big, small, ["k1", "k2"], how, fpp=1e-6)
        want = big.join(small, ["k1", "k2"], how)
        assert _sorted_rows(got) == _sorted_rows(want), how


def test_bloom_prune_join_actually_prunes(spark):
    from d2d_spark.operators.bloom import bloom_prune_join, build_bloom

    big, small = _join_fixtures(spark)
    # the prefilter itself (what reaches the join) keeps only matching
    # keys at fpp 1e-6 on this fixture — the shuffle-volume claim
    sk = small.select(F.col("k").cast("string").alias("__bk")).distinct()
    bf = build_bloom(sk, "__bk", expected_items=37, fpp=1e-6)
    kept = filter_seen(
        big.withColumn("__bk", F.col("k").cast("string")), bf, "__bk", keep_seen=True
    )
    matching = big.join(small.select("k").distinct(), "k", "left_semi")
    assert kept.count() == matching.count()


def test_bloom_prune_join_validation(spark):
    import pytest as _pytest

    from d2d_spark.operators.bloom import bloom_prune_join

    big, small = _join_fixtures(spark)
    with _pytest.raises(ValueError, match="inner/left_semi/left_anti"):
        bloom_prune_join(big, small, "k", "left")
    with _pytest.raises(ValueError, match="lacks key column"):
        bloom_prune_join(big, small, "nope")
