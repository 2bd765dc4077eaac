"""resample + gap_fill (operators/timeseries.py) vs Python grids."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from d2d_spark.operators.timeseries import gap_fill, resample

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)


def _mk(spark):
    rows = [
        ("a", T0 + dt.timedelta(minutes=m), v)
        for m, v in [(1, 1.0), (3, 2.0), (4, 3.0), (31, 10.0)]
    ] + [
        ("b", T0 + dt.timedelta(minutes=m), v) for m, v in [(12, 5.0), (13, 7.0)]
    ] + [("a", None, 99.0)]
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


def test_resample_buckets(spark):
    out = resample(
        _mk(spark), ["k"], "ts", "10 minutes",
        {"n": F.count(F.lit(1)), "s": F.sum("v")},
    )
    got = {(r["k"], str(r["bucket"])): (r["n"], r["s"]) for r in out.collect()}
    assert got == {
        ("a", "2024-03-01 00:00:00"): (3, 6.0),
        ("a", "2024-03-01 00:30:00"): (1, 10.0),
        ("b", "2024-03-01 00:10:00"): (2, 12.0),
    }
    with pytest.raises(ValueError, match="at least one aggregate"):
        resample(_mk(spark), ["k"], "ts", "10 minutes", {})


def test_gap_fill_modes(spark):
    b = resample(_mk(spark), ["k"], "ts", "10 minutes", {"s": F.sum("v")})
    # null fill: per-key grid min..max, gaps explicit
    nul = gap_fill(b, ["k"], "bucket", "10 minutes", ["s"], fill="null")
    rows = {(r["k"], str(r["bucket"])): (r["s"], r["gap"]) for r in nul.collect()}
    assert rows[("a", "2024-03-01 00:10:00")] == (None, True)
    assert rows[("a", "2024-03-01 00:20:00")] == (None, True)
    assert rows[("a", "2024-03-01 00:00:00")] == (6.0, False)
    assert len([1 for (k, _) in rows if k == "a"]) == 4  # 00,10,20,30
    assert len([1 for (k, _) in rows if k == "b"]) == 1  # single bucket
    # locf carries the last value through gaps
    locf = gap_fill(b, ["k"], "bucket", "10 minutes", ["s"], fill="locf")
    lr = {(r["k"], str(r["bucket"])): r["s"] for r in locf.collect()}
    assert lr[("a", "2024-03-01 00:10:00")] == 6.0
    assert lr[("a", "2024-03-01 00:20:00")] == 6.0
    assert lr[("a", "2024-03-01 00:30:00")] == 10.0
    # zero fill
    zer = gap_fill(b, ["k"], "bucket", "10 minutes", ["s"], fill="zero")
    zr = {(r["k"], str(r["bucket"])): r["s"] for r in zer.collect()}
    assert zr[("a", "2024-03-01 00:20:00")] == 0.0


def test_gap_fill_explicit_range_and_leading_gap(spark):
    b = resample(_mk(spark), ["k"], "ts", "10 minutes", {"s": F.sum("v")})
    out = gap_fill(
        b, ["k"], "bucket", "10 minutes", ["s"], fill="locf",
        start="2024-02-29 23:50:00", end="2024-03-01 00:50:00",
    )
    rows = {(r["k"], str(r["bucket"])): (r["s"], r["gap"]) for r in out.collect()}
    # shared 6-bucket grid for both keys
    assert len(rows) == 12
    # leading gap before a key's first value stays NULL under locf
    assert rows[("b", "2024-02-29 23:50:00")] == (None, True)
    assert rows[("b", "2024-03-01 00:40:00")] == (12.0, True)


def test_gap_fill_guards(spark):
    b = resample(_mk(spark), ["k"], "ts", "10 minutes", {"s": F.sum("v")})
    with pytest.raises(ValueError, match="fill must be"):
        gap_fill(b, ["k"], "bucket", "10 minutes", ["s"], fill="bogus")
    with pytest.raises(ValueError, match="DAY-TIME"):
        gap_fill(b, ["k"], "bucket", "1 month", ["s"])
    with pytest.raises(ValueError, match="BOTH start and end"):
        gap_fill(b, ["k"], "bucket", "10 minutes", ["s"], start=T0)
    with pytest.raises(ValueError, match="lacks columns"):
        gap_fill(b, ["k"], "bucket", "10 minutes", ["nope"])
    with pytest.raises(ValueError, match="grid rows"):
        gap_fill(b, ["k"], "bucket", "10 minutes", ["s"], max_buckets_per_key=2)
    dup = b.unionByName(b.limit(1))
    with pytest.raises(ValueError, match="duplicate \\(key, bucket\\)"):
        gap_fill(dup, ["k"], "bucket", "10 minutes", ["s"])


def test_gap_fill_partial_final_bucket(spark):
    """Explicit range whose span is NOT a multiple of the interval:
    the last partial bucket's row must survive (the advisor's 00:00:09
    row in [00:00:00, 00:00:10) at 3s — previously dropped)."""
    b = spark.createDataFrame(
        [
            ("a", dt.datetime(2024, 3, 1, 0, 0, 0), 1.0),
            ("a", dt.datetime(2024, 3, 1, 0, 0, 9), 9.0),
        ],
        "k string, bucket timestamp, s double",
    )
    out = gap_fill(
        b, ["k"], "bucket", "3 seconds", ["s"],
        start="2024-03-01 00:00:00", end="2024-03-01 00:00:10",
    )
    rows = {str(r["bucket"]): (r["s"], r["gap"]) for r in out.collect()}
    # grid = 00,03,06,09 — four starts in [start, end), partial last kept
    assert len(rows) == 4
    assert rows["2024-03-01 00:00:09"] == (9.0, False)
    assert rows["2024-03-01 00:00:00"] == (1.0, False)
    assert rows["2024-03-01 00:00:03"] == (None, True)
    # exact-multiple span still excludes the end bucket (end exclusive)
    out2 = gap_fill(
        b.filter(F.col("s") < 5), ["k"], "bucket", "3 seconds", ["s"],
        start="2024-03-01 00:00:00", end="2024-03-01 00:00:09",
    )
    assert sorted(str(r["bucket"]) for r in out2.collect()) == [
        "2024-03-01 00:00:00", "2024-03-01 00:00:03", "2024-03-01 00:00:06",
    ]


def test_gap_fill_misaligned_and_empty_range_raise(spark):
    b = spark.createDataFrame(
        [
            ("a", dt.datetime(2024, 3, 1, 0, 0, 0), 1.0),
            ("a", dt.datetime(2024, 3, 1, 0, 0, 1), 2.0),  # off a 3s grid
        ],
        "k string, bucket timestamp, s double",
    )
    with pytest.raises(ValueError, match="not on the regular grid"):
        gap_fill(
            b, ["k"], "bucket", "3 seconds", ["s"],
            start="2024-03-01 00:00:00", end="2024-03-01 00:00:10",
        ).collect()
    # per-key-range mode catches misalignment too (min=00, max=01 at 3s)
    with pytest.raises(ValueError, match="not on the regular grid"):
        gap_fill(b, ["k"], "bucket", "3 seconds", ["s"]).collect()
    ok = b.filter(F.col("s") < 2)
    with pytest.raises(ValueError, match="strictly after start"):
        gap_fill(
            ok, ["k"], "bucket", "3 seconds", ["s"],
            start="2024-03-01 00:00:10", end="2024-03-01 00:00:10",
        )
    with pytest.raises(ValueError, match="did not coerce"):
        gap_fill(
            ok, ["k"], "bucket", "3 seconds", ["s"],
            start="not-a-time", end="2024-03-01 00:00:10",
        )


def test_fixture_events_roundtrip(spark, sf_dir):
    """Grid covers every hour between each user's min/max bucket; sum
    of non-gap counts equals the raw event count."""
    from d2d_spark.session import read_table

    ev = read_table(spark, sf_dir, "events").limit(2000)
    b = resample(ev, ["user_id"], "ts", "1 hour", {"n": F.count(F.lit(1))})
    filled = gap_fill(b, ["user_id"], "bucket", "1 hour", ["n"], fill="zero")
    total = filled.agg(F.sum("n")).first()[0]
    assert total == ev.filter(F.col("ts").isNotNull()).count()
    # regularity: per user, bucket count == span/interval + 1
    chk = (
        filled.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("nb"),
            (
                (F.max("bucket").cast("double") - F.min("bucket").cast("double")) / 3600
                + 1
            ).alias("want"),
        )
        .filter(F.col("nb") != F.col("want"))
    )
    assert chk.count() == 0
