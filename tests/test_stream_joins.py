"""Stream-stream joins, within-watermark dedup, interval-overlap
join, and the mergeable HLL store."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from d2d_spark.operators.hll import (
    hll_build,
    hll_estimate,
    hll_merge,
    incremental_distinct,
    save_hll,
)
from d2d_spark.operators.join import interval_overlap_join
from d2d_spark.session import read_table
from d2d_spark.streaming.filestream import file_stream
from d2d_spark.streaming.joins import (
    drop_duplicates_within_watermark,
    stream_stream_join,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="d2d_sjoin_")
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


def _drain(stream_df, tmpdir, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmpdir / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return stream_df.sparkSession.table(name)


# ---------------------------------------------------------------- stream-stream


def test_stream_stream_join_matches_batch(spark, sf_dir, tmpdir):
    """Library stream_stream_join == the equivalent batch theta-join
    on the same (bounded) input."""
    src = str(tmpdir / "src")
    ev = read_table(spark, sf_dir, "events").limit(2000).cache()
    ev.write.parquet(src)
    schema = spark.read.parquet(src).schema

    def sides(df):
        c = df.filter(F.col("event_type") == "click").select(
            "user_id", F.col("ts").alias("click_ts")
        )
        v = df.filter(F.col("event_type") == "view").select(
            "user_id", F.col("ts").alias("view_ts")
        )
        return c, v

    sc, sv = sides(file_stream(spark, src, schema))
    joined = stream_stream_join(
        sc,
        sv,
        on="user_id",
        left_ts="click_ts",
        right_ts="view_ts",
        watermark="1 day",
        lookback="2 hours",
        lookahead="0 seconds",
    )
    got = _drain(joined, tmpdir, "lib_ss_join").count()

    bc, bv = sides(ev)
    bv = bv.select(F.col("user_id").alias("u2"), "view_ts")
    want = bc.join(
        bv,
        (F.col("user_id") == F.col("u2"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr("INTERVAL 2 HOURS"))
        & (F.col("view_ts") <= F.col("click_ts")),
        "inner",
    ).count()
    assert got == want and want > 0


def test_stream_stream_left_outer_emits_unmatched(spark, tmpdir):
    """Left-outer: clicks with no view in-window come back with NULL
    right side once the watermark passes."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    clicks = [(1, base), (2, base)]  # user 2 has no view
    csrc, vsrc = str(tmpdir / "c"), str(tmpdir / "v")
    out, ckpt = str(tmpdir / "out"), str(tmpdir / "ckpt_louter")
    cdf = spark.createDataFrame(clicks, "user_id int, click_ts timestamp")
    cdf.write.parquet(csrc)
    vschema = "user_id int, view_ts timestamp"
    spark.createDataFrame(
        [(1, base - dt.timedelta(minutes=10))], vschema
    ).write.mode("append").parquet(vsrc)

    j = stream_stream_join(
        file_stream(spark, csrc, cdf.schema),
        file_stream(spark, vsrc, spark.read.parquet(vsrc).schema),
        on="user_id",
        left_ts="click_ts",
        right_ts="view_ts",
        watermark="1 minute",
        lookback="1 hour",
        lookahead="0 seconds",
        how="left_outer",
    )

    def run_once():
        q = (
            j.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # run 1: matched pair emits; unmatched user-2 click is held in
    # state (a future view could still arrive). Later runs feed
    # watermark-advancing rows ON BOTH SIDES (the global watermark is
    # the MIN over all inputs, so a side with no new data pins it);
    # NULL emission needs a batch AFTER the watermark passes
    # click_ts + lookback, hence the extra runs.
    run_once()
    for days in (30, 31):
        late = base + dt.timedelta(days=days)
        spark.createDataFrame([(9, late)], vschema).write.mode("append").parquet(vsrc)
        spark.createDataFrame(
            [(9, late)], "user_id int, click_ts timestamp"
        ).write.mode("append").parquet(csrc)
        run_once()

    got = spark.read.parquet(out)
    rows = {r.user_id: r for r in got.filter("user_id <= 2").collect()}
    assert rows[1].view_ts is not None
    assert rows[2].view_ts is None


def test_stream_stream_join_refuses_unbounded(spark, tmpdir):
    cdf = spark.createDataFrame([(1,)], "user_id int").withColumn(
        "ts", F.current_timestamp()
    )
    src = str(tmpdir / "u")
    cdf.write.parquet(src)
    s = file_stream(spark, src, cdf.schema)
    with pytest.raises(ValueError, match="BOTH time bounds"):
        stream_stream_join(
            s, s, on="user_id", left_ts="ts", right_ts="ts",
            lookahead=None, how="left_outer",
        )
    with pytest.raises(ValueError, match="streaming"):
        stream_stream_join(
            spark.range(1), s, on="id", left_ts="ts", right_ts="ts"
        )


def test_drop_duplicates_within_watermark(spark, tmpdir):
    """Near-in-time duplicates (different event times, same key)
    collapse to one row."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("a", base),
        ("a", base + dt.timedelta(seconds=30)),   # retry, re-stamped
        ("b", base),
        ("z", base + dt.timedelta(days=30)),      # watermark pusher
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    src = str(tmpdir / "dup")
    df.write.parquet(src)
    s = file_stream(spark, src, df.schema)
    out = drop_duplicates_within_watermark(s, "k", "ts", watermark="10 minutes")
    got = _drain(out, tmpdir, "ddww").groupBy("k").count().collect()
    counts = {r.k: r["count"] for r in got}
    assert counts == {"a": 1, "b": 1, "z": 1}


# ---------------------------------------------------------------- interval join


def _interval_fixture(spark, seed=7):
    import random

    rng = random.Random(seed)
    left = [
        (i, rng.choice(["x", "y", "z"]), s := rng.randint(0, 5000), s + rng.randint(0, 400))
        for i in range(300)
    ]
    right = [
        (j, rng.choice(["x", "y", "z"]), s := rng.randint(0, 5000), s + rng.randint(0, 400))
        for j in range(300)
    ]
    l = spark.createDataFrame(left, "lid int, k string, s long, e long")
    r = spark.createDataFrame(right, "rid int, k string, s long, e long")
    return l, r


def test_interval_overlap_binned_equals_theta(spark):
    """Binned scale path == the naive theta-join, for several bin
    widths (smaller, similar, larger than interval lengths)."""
    l, r = _interval_fixture(spark)
    want = (
        l.join(
            r.select(
                F.col("rid"), F.col("k").alias("k2"),
                F.col("s").alias("s2"), F.col("e").alias("e2"),
            ),
            (F.col("k") == F.col("k2"))
            & (F.col("s") <= F.col("e2"))
            & (F.col("s2") <= F.col("e")),
        )
        .select("lid", "rid")
        .collect()
    )
    want_set = {(x.lid, x.rid) for x in want}
    assert len(want_set) == len(want) > 0
    for w in (50, 400, 5000):
        got = interval_overlap_join(
            l, r, "s", "e", "s", "e", on="k", bin_width=w
        ).select("lid", "rid").collect()
        got_set = {(x.lid, x.rid) for x in got}
        # exactly-once: no pair may appear twice
        assert len(got_set) == len(got), f"duplicate pairs at bin_width={w}"
        assert got_set == want_set, f"mismatch at bin_width={w}"


def test_interval_overlap_timestamps_and_nulls(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)

    def ts(mins):
        return t0 + dt.timedelta(minutes=mins)

    l = spark.createDataFrame(
        [(1, ts(0), ts(60)), (2, ts(100), ts(90)), (3, None, ts(10))],
        "lid int, ls timestamp, le timestamp",
    )
    r = spark.createDataFrame(
        [(10, ts(30), ts(45)), (11, ts(59), ts(200)), (12, ts(61), ts(70))],
        "rid int, rs timestamp, re timestamp",
    )
    got = interval_overlap_join(
        l, r, "ls", "le", "rs", "re", bin_width=600.0  # 10-minute bins, seconds
    ).select("lid", "rid").collect()
    got_set = {(x.lid, x.rid) for x in got}
    # lid=1 [0,60] overlaps [30,45] and [59,200]; reversed + NULL rows match nothing
    assert got_set == {(1, 10), (1, 11)}


def test_interval_overlap_timestamp_ntz(spark):
    """TIMESTAMP_NTZ columns (what tz-naive parquet reads as) must
    bin cleanly — Spark 4 refuses a direct NTZ→double cast, the bug
    that broke range_interval_join_suite in round 5."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)

    def ts(mins):
        return t0 + dt.timedelta(minutes=mins)

    l = spark.createDataFrame(
        [(1, ts(0), ts(60)), (2, ts(300), ts(400))],
        "lid int, ls timestamp_ntz, le timestamp_ntz",
    )
    r = spark.createDataFrame(
        [(10, ts(30), ts(45)), (11, ts(59), ts(200)), (12, ts(500), ts(600))],
        "rid int, rs timestamp_ntz, re timestamp_ntz",
    )
    assert dict(l.dtypes)["ls"] == "timestamp_ntz"
    got = interval_overlap_join(
        l, r, "ls", "le", "rs", "re", bin_width=600.0
    ).select("lid", "rid").collect()
    assert {(x.lid, x.rid) for x in got} == {(1, 10), (1, 11)}


def test_interval_overlap_theta_path_needs_keys(spark):
    l, r = _interval_fixture(spark)
    with pytest.raises(ValueError, match="cartesian"):
        interval_overlap_join(l, r, "s", "e", "s", "e")
    # with keys, the declarative path works and agrees on a sample
    got = interval_overlap_join(
        l.limit(50), r.limit(50), "s", "e", "s", "e", on="k"
    ).count()
    want = interval_overlap_join(
        l.limit(50), r.limit(50), "s", "e", "s", "e", on="k", bin_width=100
    ).count()
    assert got == want


# ---------------------------------------------------------------- HLL store


def test_hll_store_roundtrip_and_merge(spark, tmpdir):
    """Per-batch sketches saved to parquet merge to the same estimate
    as one sketch over the whole corpus; small cardinalities are
    exact; the lgk stamp survives the round-trip."""
    df = spark.range(10_000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 500).alias("v"),
    )
    whole = hll_estimate(hll_build(df, "v", by="g"))
    exact = df.groupBy("g").agg(F.countDistinct("v").alias("n"))
    w = {r.g: r.n_distinct for r in whole.collect()}
    e = {r.g: r.n for r in exact.collect()}
    for g in e:
        # lgk=12 -> ~1.6% relative standard error; sparse-mode exact
        # for these cardinalities in practice, allow 5%
        assert abs(w[g] - e[g]) <= max(1, 0.05 * e[g])

    store = str(tmpdir / "hll_store")
    for half in (F.col("id") < 5000, F.col("id") >= 5000):
        save_hll(hll_build(df.where(half), "v", by="g"), store)
    merged = incremental_distinct(spark, store, by="g")
    m = {r.g: r.n_distinct for r in merged.collect()}
    assert m == w  # union of halves == whole-build estimates


def test_hll_merge_refuses_unstamped_and_bad_lgk(spark):
    df = spark.range(100).select(F.col("id").alias("v"))
    with pytest.raises(ValueError, match="lgk"):
        hll_build(df, "v", lgk=3)
    plain = hll_build(df, "v").select(
        F.col("sketch").alias("sketch", metadata={})
    )
    # explicit empty metadata strips the stamp -> merge must refuse
    from d2d_spark.operators.hll import hll_merge as m

    with pytest.raises(ValueError, match="stamp"):
        m(plain)


def test_hll_merge_mixed_lgk_fails_loudly_in_jvm(spark):
    """An append-mode store with different-lgk batches carries ONE
    merged column stamp, so the friendly stamp check can't see the
    mix — the JVM aggregate must fail loudly rather than silently
    unioning at the coarser precision."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    from d2d_spark.operators.hll import hll_merge as m

    a = hll_build(spark.range(100).select(F.col("id").alias("v")), "v", lgk=12)
    b = hll_build(spark.range(100).select(F.col("id").alias("v")), "v", lgk=14)
    # forge the single-stamp store shape: both rows under one stamp
    mixed = a.unionByName(b.select(F.col("sketch").alias("sketch", metadata={"d2d.hll.lgk": 12})))
    with pytest.raises((Py4JJavaError, PySparkException)):
        m(mixed).collect()


def test_hll_global_estimate(spark):
    df = spark.range(50_000).select((F.col("id") % 12_345).alias("v"))
    est = hll_estimate(hll_build(df, "v")).collect()[0].n_distinct
    assert abs(est - 12_345) <= 0.05 * 12_345
