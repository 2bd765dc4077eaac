"""Count-min sketch + exact heavy hitters (operators/freq.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from d2d_spark.operators.freq import cms_build, cms_lookup, cms_merge, heavy_hitters

DEPTH, WIDTH = 4, 1024


def _zipfish(spark, n_heavy=5, heavy_count=200, n_tail=400):
    """A few very frequent tokens + a long unique tail."""
    rows = []
    for h in range(n_heavy):
        rows += [(f"heavy_{h}",)] * heavy_count
    rows += [(f"tail_{i}",) for i in range(n_tail)]
    return spark.createDataFrame(rows, "tok string").repartition(8)


def _true_counts(df):
    return {r["tok"]: r["cnt"] for r in df.groupBy("tok").agg(F.count("*").alias("cnt")).collect()}


def test_cms_never_undercounts_and_bounds_error(spark):
    df = _zipfish(spark)
    sk = cms_build(df, "tok", DEPTH, WIDTH)
    est = {
        r["tok"]: r["est_count"]
        for r in cms_lookup(sk, df, "tok", DEPTH, WIDTH).collect()
    }
    true = _true_counts(df)
    n_total = sum(true.values())
    assert set(est) == set(true)
    for tok, c in true.items():
        assert est[tok] >= c, f"{tok} undercounted"
        # CM bound: overflow <= 2N/width with prob 1 - 2^-depth per
        # item; assert the generous deterministic envelope instead of
        # the probabilistic one so the test can't flake
        assert est[tok] - c <= 4 * n_total / WIDTH


def test_cms_heavy_items_near_exact(spark):
    df = _zipfish(spark)
    sk = cms_build(df, "tok", DEPTH, WIDTH)
    heavy = spark.createDataFrame([(f"heavy_{h}",) for h in range(5)], "tok string")
    est = {r["tok"]: r["est_count"] for r in cms_lookup(sk, heavy, "tok", DEPTH, WIDTH).collect()}
    for h in range(5):
        assert 200 <= est[f"heavy_{h}"] <= 200 + 10


def test_cms_sketch_bounded_and_deterministic(spark):
    df = _zipfish(spark)
    sk = cms_build(df, "tok", DEPTH, WIDTH)
    assert sk.count() <= DEPTH * WIDTH
    a = sorted(map(tuple, sk.collect()))
    b = sorted(map(tuple, cms_build(df.repartition(3), "tok", DEPTH, WIDTH).collect()))
    assert a == b


def test_cms_merge_equals_combined_build(spark):
    df = _zipfish(spark)
    first = df.filter(F.xxhash64("tok") % 2 == 0)
    second = df.filter(F.xxhash64("tok") % 2 != 0)
    merged = cms_merge(
        cms_build(first, "tok", DEPTH, WIDTH), cms_build(second, "tok", DEPTH, WIDTH)
    )
    combined = cms_build(df, "tok", DEPTH, WIDTH)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, combined.collect()))


def test_cms_unseen_item_small_and_null_dropped(spark):
    df = _zipfish(spark)
    sk = cms_build(df.withColumn("tok", F.when(F.col("tok") == "tail_0", None).otherwise(F.col("tok"))), "tok", DEPTH, WIDTH)
    probe = spark.createDataFrame([("never_seen",), (None,)], "tok string")
    rows = cms_lookup(sk, probe, "tok", DEPTH, WIDTH).collect()
    assert len(rows) == 1  # NULL probe dropped
    n_total = _zipfish(spark).count()
    assert 0 <= rows[0]["est_count"] <= 4 * n_total / WIDTH


def test_cms_shape_validation(spark):
    df = _zipfish(spark, n_heavy=1, heavy_count=1, n_tail=1)
    with pytest.raises(ValueError, match="counters exceeds"):
        cms_build(df, "tok", depth=100, width=10_000_000)
    with pytest.raises(ValueError, match=">= 1"):
        cms_build(df, "tok", depth=0, width=16)


def test_cms_mismatched_shape_refused(spark):
    """A lookup or merge whose (depth, width) differ from the build
    would silently undercount (missing rows coalesce to 0) — the
    shape stamped on the sketch must make it raise instead."""
    df = _zipfish(spark, n_heavy=2, heavy_count=5, n_tail=10)
    sk = cms_build(df, "tok", DEPTH, WIDTH)
    with pytest.raises(ValueError, match="built with"):
        cms_lookup(sk, df, "tok", depth=DEPTH + 4, width=WIDTH)
    with pytest.raises(ValueError, match="built with"):
        cms_lookup(sk, df, "tok", depth=DEPTH, width=WIDTH * 2)
    with pytest.raises(ValueError, match="different shapes"):
        cms_merge(sk, cms_build(df, "tok", DEPTH, WIDTH * 2))
    # merged sketches keep the stamp, so a mismatched lookup after a
    # merge still refuses
    merged = cms_merge(sk, cms_build(df, "tok", DEPTH, WIDTH))
    with pytest.raises(ValueError, match="built with"):
        cms_lookup(merged, df, "tok", depth=DEPTH + 1, width=WIDTH)


def test_heavy_hitters_exact_and_deterministic(spark):
    df = _zipfish(spark)
    top = heavy_hitters(df, "tok", k=6).collect()
    assert [r["tok"] for r in top[:5]] == [f"heavy_{h}" for h in range(5)]
    assert all(r["cnt"] == 200 for r in top[:5])
    # the 6th row is the lexicographically smallest tail token (all
    # tail counts tie at 1)
    assert top[5]["tok"] == "tail_0" and top[5]["cnt"] == 1


def test_cms_depth_one_build_and_lookup(spark):
    """depth=1 is a legal (if weak) sketch: build and lookup must agree
    on it instead of lookup dying on a one-column F.least."""
    df = _zipfish(spark, n_heavy=2, heavy_count=50, n_tail=50)
    sk = cms_build(df, "tok", 1, WIDTH)
    est = {r["tok"]: r["est_count"] for r in cms_lookup(sk, df, "tok", 1, WIDTH).collect()}
    true = _true_counts(df)
    assert set(est) == set(true)
    for tok, c in true.items():
        assert est[tok] >= c


def test_stream_cms_sink_equals_batch_sketch(spark, tmp_path):
    """Stream-maintained counters must EXACTLY equal the batch sketch
    of everything seen (linearity), across incremental restarts; a
    fresh-checkpoint/old-state mismatch is refused."""
    import os

    import pytest as pt
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from d2d_spark.operators.freq import cms_build, cms_lookup
    from d2d_spark.streaming.filestream import (
        file_stream,
        latest_cms_state,
        stream_cms_sink,
    )

    src = tmp_path / "src"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType([T.StructField("tok", T.StringType())])

    def drop(name, toks):
        spark.createDataFrame([(t,) for t in toks], schema).write.mode(
            "overwrite"
        ).parquet(str(src / name))

    drop("d1", ["a", "b", "a", "c"] * 10)
    stream = file_stream(spark, str(src) + "/*", schema)
    stream_cms_sink(stream, "tok", state, ckpt, depth=4, width=256)

    drop("d2", ["b", "d"] * 25)
    stream = file_stream(spark, str(src) + "/*", schema)
    stream_cms_sink(stream, "tok", state, ckpt, depth=4, width=256)

    all_rows = spark.read.parquet(str(src) + "/*")
    want = {
        (r.row, r.bucket, r.c)
        for r in cms_build(all_rows, "tok", depth=4, width=256).collect()
    }
    got_state = latest_cms_state(spark, state)
    got = {(r.row, r.bucket, r.c) for r in got_state.collect()}
    assert got == want
    # and lookups agree with exact counts at this collision-free size
    est = {
        r.tok: r.est_count
        for r in cms_lookup(got_state, all_rows, "tok", depth=4, width=256).collect()
    }
    exact = {
        r.tok: r.n
        for r in all_rows.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert est == exact
    assert len([n for n in os.listdir(state) if n.startswith("state_after_batch_")]) >= 2

    # shape change between runs is refused before any state is written
    drop("d3", ["e"])
    stream = file_stream(spark, str(src) + "/*", schema)
    with pt.raises(Exception, match="depth/width changed"):
        stream_cms_sink(stream, "tok", state, ckpt, depth=4, width=512)

    # fresh checkpoint over surviving state is refused
    stream = file_stream(spark, str(src) + "/*", schema)
    with pt.raises(ValueError, match="fresh"):
        stream_cms_sink(stream, "tok", state, str(tmp_path / "ckpt2"), depth=4, width=256)
