"""The Arrow limb-product kernel must produce EXACTLY the integers
the JVM decimal moment aggregate produces — same quantization cast,
same sums, bit-for-bit (r12; operators/moments docstring carries the
overflow audit these cases exercise)."""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def _jvm_reference(df, cols):
    """The pre-r12 JVM decimal aggregate, kept as the test oracle."""
    d = len(cols)
    ok = F.lit(True)
    for c in cols:
        ok = ok & F.col(c).isNotNull()
    base = df.filter(ok).select(
        *[F.col(c).cast(DEC).alias(f"__q{i}") for i, c in enumerate(cols)]
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(d):
        aggs.append(F.sum(f"__q{i}").alias(f"s{i}"))
    for i in range(d):
        for j in range(i, d):
            aggs.append(F.sum(F.col(f"__q{i}") * F.col(f"__q{j}")).alias(f"p{i}_{j}"))
    return base.agg(*aggs).first()


def _kernel(df, cols, grouped_col=None):
    from d2d_spark.operators.moments import exact_moment_sums

    d = len(cols)
    ok = F.lit(True)
    for c in cols:
        ok = ok & F.col(c).isNotNull()
    sel = [
        (F.col(c).cast(DEC) * F.lit(1_000_000)).cast("long").alias(f"__v{i}")
        for i, c in enumerate(cols)
    ]
    if grouped_col is not None:
        sel.append(F.col(grouped_col).alias("__g"))
    return exact_moment_sums(df.filter(ok).select(*sel), d, grouped=grouped_col is not None)


def _assert_equal(ref, tot, d):
    assert int(ref["n"]) == tot["n"]
    for i in range(d):
        assert Decimal(str(ref[f"s{i}"])).compare(Decimal(f"{tot[f's{i}']}E-6")) == 0, f"s{i}"
    for i in range(d):
        for j in range(i, d):
            k = f"p{i}_{j}"
            assert Decimal(str(ref[k])).compare(Decimal(f"{tot[k]}E-12")) == 0, k


def test_kernel_matches_jvm_decimal_sums_adversarial(spark):
    # negatives, near-cap magnitudes (|v| close to the 1e12 decimal
    # cap -> limbs exercise the top bits), tiny fractions, zeros
    rows = [
        (999_999_999_999.4, -999_999_999_999.4),
        (-0.000001, 0.000001),
        (123456789012.654321, -987654321098.123456),
        (0.0, -0.0),
        (1.5, 2.25),
        (-1e-6, 1e12 - 1000.5),
        (3.141592, -2.718281),
    ] * 7  # several batches' worth of sign mixtures
    df = spark.createDataFrame(rows, "a double, b double")
    ref = _jvm_reference(df, ["a", "b"])
    tot = _kernel(df, ["a", "b"])[None]
    _assert_equal(ref, tot, 2)


def test_kernel_matches_on_fixture_lineitem(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ref = _jvm_reference(li, cols)
    tot = _kernel(li, cols)[None]
    _assert_equal(ref, tot, 4)


def test_kernel_grouped_matches_groupby(spark):
    rows = [(i % 3 == 0, float(i) * 1.000001 - 50) for i in range(500)]
    df = spark.createDataFrame(rows, "g boolean, v double")
    base = df.select(F.col("v").cast(DEC).alias("__v"), "g")
    agg = {
        r["g"]: r
        for r in base.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__v").alias("s0"),
            F.sum(F.col("__v") * F.col("__v")).alias("p0_0"),
        )
        .collect()
    }
    tot = _kernel(df, ["v"], grouped_col="g")
    for g in (True, False):
        assert int(agg[g]["n"]) == tot[g]["n"]
        assert Decimal(str(agg[g]["s0"])).compare(Decimal(f"{tot[g]['s0']}E-6")) == 0
        assert Decimal(str(agg[g]["p0_0"])).compare(Decimal(f"{tot[g]['p0_0']}E-12")) == 0


def test_kernel_refuses_nulls_loudly(spark):
    from d2d_spark.operators.moments import exact_moment_sums

    df = spark.createDataFrame([(1,), (None,)], "v long").select(
        F.col("v").alias("__v0")
    )
    with pytest.raises(Exception, match="NULL in a kernel column"):
        exact_moment_sums(df, 1)


def test_kernel_empty_input(spark):
    from d2d_spark.operators.moments import exact_moment_sums

    df = spark.range(0).select(F.col("id").alias("__v0"))
    tot = exact_moment_sums(df, 1)
    assert tot.get(None, {"n": 0})["n"] == 0


def test_corr_and_ttest_results_unchanged(spark, sf_dir):
    """End-to-end: the rewired operators produce the exact pre-r12
    values (the double chains consume identical floats)."""
    import math

    from d2d_spark.operators.stats import corr_matrix, ttest_welch

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    got = {(r["col_a"], r["col_b"]): (r["n"], r["r"]) for r in corr_matrix(li, cols).collect()}
    ref = _jvm_reference(li, cols)
    n = int(ref["n"])
    s = [float(ref[f"s{i}"]) for i in range(4)]
    for i in range(4):
        for j in range(i, 4):
            pij = float(ref[f"p{i}_{j}"])
            num = n * pij - s[i] * s[j]
            di = n * float(ref[f"p{i}_{i}"]) - s[i] * s[i]
            dj = n * float(ref[f"p{j}_{j}"]) - s[j] * s[j]
            want = num / math.sqrt(di * dj) if di > 0.0 and dj > 0.0 else None
            assert got[(cols[i], cols[j])] == (n, want)

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t = ttest_welch(orders, "o_orderstatus", "o_totalprice", "F", "O")
    base = orders.filter(
        F.col("o_orderstatus").isin(["F", "O"]) & F.col("o_totalprice").isNotNull()
    ).select(
        (F.col("o_orderstatus") == "F").alias("__is_a"),
        F.col("o_totalprice").cast(DEC).alias("__v"),
    )
    agg = {
        r["__is_a"]: r
        for r in base.groupBy("__is_a")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__v").alias("s"),
            F.sum(F.col("__v") * F.col("__v")).alias("sq"),
        )
        .collect()
    }

    def moments(r):
        nn = int(r["n"])
        sv, sq = float(r["s"]), float(r["sq"])
        mean = sv / nn
        return nn, mean, (sq - nn * mean * mean) / (nn - 1)

    na, ma, va = moments(agg[True])
    nb, mb, vb = moments(agg[False])
    va, vb = max(va, 0.0), max(vb, 0.0)
    se2 = va / na + vb / nb
    assert t["t"] == (ma - mb) / math.sqrt(se2)
    assert t["n_a"] == na and t["n_b"] == nb
    assert t["mean_a"] == ma and t["var_a"] == va
