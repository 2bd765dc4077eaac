"""rank_global / ranked_values — the distributed global-rank
primitive (operators/ranks.py): equivalence vs Spark's window rank
family on small data, partitioning invariance, tie/NULL semantics,
and the global-mode spearman_corr rewired onto it."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def _rows():
    # duplicates, a whale value, negatives, and NULLs
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0, None, -1.5, None, 0.0]
    return [(i, v) for i, v in enumerate(vals)]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(_rows(), "id long, v double")


@pytest.mark.parametrize("ascending", [True, False])
def test_rank_global_matches_window_family(spark, df, ascending):
    """Every method equals F.rank/dense_rank/percent_rank (and the
    avg-rank formula) over an unpartitioned window on the non-NULL
    rows, for both sort directions."""
    from d2d_spark.operators.ranks import rank_global

    base = df.filter(F.col("v").isNotNull())
    order = F.col("v").asc() if ascending else F.col("v").desc()
    w = Window.orderBy(order)
    ties = Window.partitionBy("v")
    want = {
        r["id"]: (r["rk"], r["dn"], float(r["av"]), r["pc"])
        for r in base.select(
            "id",
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("dn"),
            (
                F.rank().over(w) + (F.count(F.lit(1)).over(ties) - F.lit(1)) / F.lit(2)
            ).alias("av"),
            F.percent_rank().over(w).alias("pc"),
        ).collect()
    }
    out = rank_global(df, "v", "rank", "rk", ascending=ascending)
    out = rank_global(out, "v", "dense", "dn", ascending=ascending)
    out = rank_global(out, "v", "avg", "av", ascending=ascending)
    out = rank_global(out, "v", "percent", "pc", ascending=ascending)
    got = {
        r["id"]: (r["rk"], r["dn"], r["av"], r["pc"])
        for r in out.filter(F.col("v").isNotNull()).collect()
    }
    assert set(got) == set(want)
    for i, (rk, dn, av, pc) in want.items():
        grk, gdn, gav, gpc = got[i]
        assert grk == rk and gdn == dn, (i, got[i], want[i])
        assert float(gav) == av
        assert abs(gpc - pc) < 1e-15
    # NULL values rank NULL and don't count toward n
    nulls = {r["id"] for r in out.filter(F.col("v").isNull()).collect()}
    null_ranks = out.filter(F.col("v").isNull()).select("rk", "dn", "av", "pc").collect()
    assert len(nulls) == 2
    for r in null_ranks:
        assert r["rk"] is None and r["dn"] is None and r["av"] is None and r["pc"] is None


def test_rank_global_partitioning_invariance(spark, df):
    """Identical ranks at 1 / 7 / 32 input partitions AND with the
    internal bucket count forced to 1 / 7 / 32 — the done-condition
    check that no step depends on physical layout."""
    from d2d_spark.operators.ranks import rank_global

    def snap(frame, nparts):
        return sorted(
            (r["id"], r["rk"], str(r["av"]))
            for r in rank_global(
                rank_global(frame, "v", "rank", "rk", num_partitions=nparts),
                "v",
                "avg",
                "av",
                num_partitions=nparts,
            ).collect()
        )

    ref = snap(df.repartition(1), 7)
    for in_parts in (1, 7, 32):
        for nb in (1, 7, 32):
            assert snap(df.repartition(in_parts), nb) == ref, (in_parts, nb)


def test_rank_global_single_row_and_empty(spark):
    from d2d_spark.operators.ranks import rank_global

    one = spark.createDataFrame([(1, 42.0)], "id long, v double")
    r = rank_global(one, "v", "percent", "pc").collect()[0]
    assert r["pc"] == 0.0  # SQL percent_rank convention at n == 1
    r = rank_global(one, "v", "avg", "av").collect()[0]
    assert float(r["av"]) == 1.0
    empty = spark.createDataFrame([], "id long, v double")
    assert rank_global(empty, "v", "rank", "rk").collect() == []
    with pytest.raises(ValueError, match="method"):
        rank_global(one, "v", "median", "m")


def test_spearman_global_mode_distributed(spark):
    """Global-mode spearman_corr (the prefix-sum path): equals the
    pure-Python twin, equals the per-key path's answer on a
    single-key frame, and is partitioning-invariant at 1/7/32."""
    from d2d_spark.operators.stats import spearman_corr

    rows = []
    # deterministic mixed data with tie groups in both columns
    for i in range(240):
        x = float((i * 7) % 40)  # heavy x ties
        y = float(((i * i) % 31) - (i % 5))  # non-monotone, y ties
        rows.append((i, x, y))
    rows.append((9001, None, 5.0))
    rows.append((9002, 3.0, None))
    df = spark.createDataFrame(rows, "id long, x double, y double")

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            r = (i + 1 + j + 1) / 2.0
            for t in range(i, j + 1):
                ranks[order[t]] = r
            i = j + 1
        return ranks

    pairs = [(x, y) for _, x, y in rows if x is not None and y is not None]
    rx = avg_ranks([p[0] for p in pairs])
    ry = avg_ranks([p[1] for p in pairs])
    n = len(pairs)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(r * r for r in rx)
    syy = sum(r * r for r in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    want = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )

    got = spearman_corr(df, None, "x", "y").collect()
    assert len(got) == 1
    assert got[0]["n"] == n
    assert abs(got[0]["rho"] - want) < 1e-12

    # per-key path on a constant key agrees (small data, window path)
    keyed = spearman_corr(df.withColumn("k", F.lit("g")), ["k"], "x", "y").collect()[0]
    assert abs(keyed["rho"] - got[0]["rho"]) < 1e-12

    # partitioning invariance — exact decimal moments both sides
    for p in (1, 7, 32):
        g = spearman_corr(df.repartition(p), None, "x", "y").collect()[0]
        assert g["rho"] == got[0]["rho"] and g["n"] == n

    # no row-scale unpartitioned window: the only Window operators in
    # the physical plan must be bucket-local (partitioned by __pid) or
    # bucket-count-sized (the offsets cumsum reads a groupBy(__pid)
    # aggregate, never the value-scale frame)
    plan = spearman_corr(df, None, "x", "y")._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window " in line and "__pid" not in line:
            raise AssertionError(f"unexpected unpartitioned window over values: {line}")
