"""Salted-join equivalence and bucketed shuffle-free joins."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from d2d_spark.operators.skew import bucketed_join, salted_join, write_bucketed
from d2d_spark.session import read_table


def _as_set(df, cols):
    return {tuple(r) for r in df.select(*cols).collect()}


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Same result set as the unsalted join, including a hot key."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # make a skewed left: replicate one key
    hot = li.limit(1).withColumn("l_partkey", F.lit(42))
    skewed = li.unionByName(hot)  # original + a planted hot-key row
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    plain = skewed.join(part, skewed.l_partkey == part.p_partkey).select(
        "l_orderkey", "p_partkey"
    )
    salted = salted_join(
        skewed.withColumnRenamed("l_partkey", "p_partkey"), part, on="p_partkey"
    ).select("l_orderkey", "p_partkey")
    assert _as_set(salted, ["l_orderkey", "p_partkey"]) == _as_set(
        plain, ["l_orderkey", "p_partkey"]
    )


def test_salted_left_join_keeps_unmatched(spark):
    l = spark.createDataFrame([Row(k=1, a="x"), Row(k=9, a="no-match")])
    r = spark.createDataFrame([Row(k=1, b="y")])
    out = salted_join(l, r, on="k", how="left", n_salts=4)
    got = {(row.k, row.a, row.b) for row in out.collect()}
    assert got == {(1, "x", "y"), (9, "no-match", None)}


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Two tables bucketed on the same key join with zero shuffles
    (the pay-once co-location strategy)."""
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=4)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", n_buckets=4
    )
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
            n = j.count()
            assert n == li.count()
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan.replace("BroadcastExchange", "")
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_resize_payload_plumbing(spark, sf_dir):
    from d2d_spark.operators.multimodal import attach_binary_payload, resize_payload

    d = read_table(spark, sf_dir, "documents").limit(20)
    out = resize_payload(attach_binary_payload(d), target_w=8, target_h=4)
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert r.out_width == 8 and r.out_height == 4
        assert 0 < len(r.resized) <= 32


def test_asof_join_tolerance_and_inner(spark):
    from datetime import datetime

    from d2d_spark.operators.join import asof_join

    def ts(s):
        return datetime.fromisoformat(s)

    l = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), "a"),
         (1, ts("2024-01-01 12:00:00"), "b"),
         (2, ts("2024-01-01 09:00:00"), "c")],
        "k int, t timestamp, tag string",
    )
    r = spark.createDataFrame(
        [(1, ts("2024-01-01 09:30:00"), 10.0),
         (1, ts("2024-01-01 11:59:00"), 20.0)],
        "k int, t timestamp, px double",
    )
    out = {(x.tag): x.px for x in asof_join(l, r, "k", "t", "t").collect()}
    assert out == {"a": 10.0, "b": 20.0, "c": None}

    # tolerance: a match older than 10 minutes is voided
    tol = {(x.tag): x.px for x in asof_join(l, r, "k", "t", "t", tolerance="10 minutes").collect()}
    assert tol == {"a": None, "b": 20.0, "c": None}

    inner = {x.tag for x in asof_join(l, r, "k", "t", "t", how="inner").collect()}
    assert inner == {"a", "b"}


def test_asof_exact_timestamp_matches(spark):
    """A right row at exactly left_ts matches (<= semantics)."""
    from datetime import datetime

    from d2d_spark.operators.join import asof_join

    t0 = datetime.fromisoformat("2024-01-01 10:00:00")
    l = spark.createDataFrame([(1, t0, "x")], "k int, t timestamp, tag string")
    r = spark.createDataFrame([(1, t0, 5.0)], "k int, t timestamp, px double")
    rows = asof_join(l, r, "k", "t", "t").collect()
    assert rows[0].px == 5.0
