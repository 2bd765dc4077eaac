"""Timestamp-flavor sweep: every temporal operator must accept both
TIMESTAMP (LTZ) and TIMESTAMP_NTZ columns — tz-naive parquet (all the
fixture tables) reads as NTZ, and Spark 4 refuses several direct casts
on NTZ (e.g. -> DOUBLE) that silently work on LTZ. Round 5 shipped an
interval join that died on exactly this; this module kills the bug
CLASS by driving each temporal operator with each flavor.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

FLAVORS = ("timestamp", "timestamp_ntz")

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes: int) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.mark.parametrize("flavor", FLAVORS)
def test_asof_join_flavors(spark, flavor):
    from d2d_spark.operators.join import asof_join

    trades = spark.createDataFrame(
        [("A", _ts(10), 1), ("A", _ts(30), 2), ("B", _ts(5), 3)],
        f"sym string, t {flavor}, trade_id int",
    )
    quotes = spark.createDataFrame(
        [("A", _ts(0), 100.0), ("A", _ts(25), 105.0), ("B", _ts(9), 50.0)],
        f"sym string, t {flavor}, px double",
    )
    got = {
        (r.trade_id, r.px)
        for r in asof_join(trades, quotes, "sym", "t", "t").collect()
    }
    assert got == {(1, 100.0), (2, 105.0), (3, None)}
    # tolerance arithmetic (ts - INTERVAL) must also type-check per flavor
    tol = asof_join(trades, quotes, "sym", "t", "t", tolerance="5 minutes")
    assert {(r.trade_id, r.px) for r in tol.collect()} == {
        (1, None), (2, 105.0), (3, None)
    }


@pytest.mark.parametrize("flavor", (*FLAVORS, "date"))
def test_interval_overlap_join_flavors(spark, flavor):
    from d2d_spark.operators.join import interval_overlap_join

    if flavor == "date":
        mk = lambda d: (T0 + dt.timedelta(days=d)).date()  # noqa: E731
        width = 5 * 86400.0
        a, b, c, d_, e, f_ = mk(0), mk(6), mk(3), mk(9), mk(7), mk(12)
    else:
        mk = _ts
        width = 600.0
        a, b, c, d_, e, f_ = mk(0), mk(60), mk(30), mk(90), mk(61), mk(120)
    l = spark.createDataFrame([(1, a, b)], f"lid int, s {flavor}, e {flavor}")
    r = spark.createDataFrame(
        [(10, c, d_), (11, e, f_)], f"rid int, s {flavor}, e {flavor}"
    )
    got = interval_overlap_join(
        l, r, "s", "e", "s", "e", bin_width=width
    ).select("lid", "rid").collect()
    assert {(x.lid, x.rid) for x in got} == {(1, 10)}


@pytest.mark.parametrize("flavor", FLAVORS)
def test_tumbling_agg_flavors(spark, flavor):
    from d2d_spark.streaming.windows import tumbling_agg

    df = spark.createDataFrame(
        [(_ts(1), 1), (_ts(8), 2), (_ts(11), 4)], f"t {flavor}, v int"
    )
    out = tumbling_agg(df, "t", "10 minutes", [F.sum("v").alias("s")])
    assert sorted(r.s for r in out.collect()) == [3, 4]


@pytest.mark.parametrize("flavor", FLAVORS)
def test_scd2_history_flavors(spark, flavor):
    from d2d_spark.operators.scd import scd2_history

    snaps = spark.createDataFrame(
        [(1, "a", _ts(0)), (1, "a", _ts(10)), (1, "b", _ts(20))],
        f"k int, attr string, t {flavor}",
    )
    hist = scd2_history(snaps, ["k"], "t", ["attr"]).collect()
    assert len(hist) == 2
    cur = next(r for r in hist if r.is_current)
    assert cur.attr == "b" and cur.valid_to is None


@pytest.mark.parametrize("flavor", (*FLAVORS, "date"))
def test_write_zordered_flavors(spark, tmpdir, flavor):
    from d2d_spark.operators.maintenance import write_zordered

    if flavor == "date":
        mk = lambda i: (T0 + dt.timedelta(days=i)).date()  # noqa: E731
    else:
        mk = _ts
    df = spark.createDataFrame(
        [(i, mk(i), float(i % 7)) for i in range(200)],
        f"id long, t {flavor}, x double",
    )
    path = str(tmpdir.join(f"z_{flavor}"))
    write_zordered(df, path, ["t", "x"], n_files=4, bits=4)
    back = spark.read.parquet(path)
    assert back.count() == 200
    assert dict(back.dtypes)["t"] == flavor
