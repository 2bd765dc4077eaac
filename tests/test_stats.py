"""Hypothesis-test statistics (operators/stats.py) vs plain-Python
replays: chi-square with zero cells, Cramér's V bounds, Welch's t on
planted group shifts, determinism, guards."""

from __future__ import annotations

import math

import pytest

from d2d_spark.operators.stats import chi2_independence, ttest_welch


def _py_chi2(pairs):
    from collections import Counter

    n = len(pairs)
    j = Counter(pairs)
    ma = Counter(a for a, _ in pairs)
    mb = Counter(b for _, b in pairs)
    chi2 = 0.0
    for a, r in ma.items():
        for b, c in mb.items():
            o = j.get((a, b), 0)
            e = r * c / n
            chi2 += (o - e) ** 2 / e
    kmin = min(len(ma), len(mb))
    v = math.sqrt(chi2 / (n * (kmin - 1))) if kmin > 1 else 0.0
    return chi2, (len(ma) - 1) * (len(mb) - 1), v


def test_chi2_independence_matches_python(spark):
    # dependent: b echoes a 80% of the time; includes an EMPTY cell
    rows = []
    for i in range(200):
        a = f"a{i % 4}"
        b = a.replace("a", "b") if i % 5 else f"b{(i + 1) % 3}"
        rows.append((a, b))
    df = spark.createDataFrame(rows, "a string, b string")
    got = chi2_independence(df, "a", "b")
    chi2, dof, v = _py_chi2(rows)
    assert abs(got["chi2"] - chi2) < 1e-8
    assert got["dof"] == dof and abs(got["cramers_v"] - v) < 1e-9
    assert got["n"] == 200
    # bit-equal across partitionings (DECIMAL-disciplined sum)
    again = chi2_independence(df.repartition(13), "a", "b")
    assert again["chi2"] == got["chi2"]
    # independent layout scores ~0 and V ~0
    ind = [(f"a{i % 3}", f"b{(i // 3) % 4}") for i in range(120)]
    gi = chi2_independence(spark.createDataFrame(ind, "a string, b string"), "a", "b")
    assert abs(gi["chi2"]) < 1e-9 and gi["cramers_v"] < 1e-4
    # perfect association: V == 1 exactly (square table)
    per = [(f"a{i % 3}", f"b{i % 3}") for i in range(90)]
    gp = chi2_independence(spark.createDataFrame(per, "a string, b string"), "a", "b")
    assert abs(gp["cramers_v"] - 1.0) < 1e-12
    with pytest.raises(ValueError, match="max_cells"):
        chi2_independence(df, "a", "b", max_cells=2)
    empty = spark.createDataFrame([], "a string, b string")
    assert chi2_independence(empty, "a", "b")["n"] == 0


def _py_welch(xs, ys):
    na, nb = len(xs), len(ys)
    ma, mb = sum(xs) / na, sum(ys) / nb
    va = sum((x - ma) ** 2 for x in xs) / (na - 1)
    vb = sum((y - mb) ** 2 for y in ys) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    dof = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    return t, dof


def test_ttest_welch_matches_python(spark):
    # planted shift: group A sits ~2 higher with different spread
    xs = [10.0 + (i % 7) * 0.5 for i in range(40)]
    ys = [8.0 + (i % 11) * 0.25 for i in range(60)]
    rows = [("A", x) for x in xs] + [("B", y) for y in ys] + [("C", 0.0), ("A", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = ttest_welch(df, "g", "v", "A", "B")
    t, dof = _py_welch(xs, ys)
    assert abs(got["t"] - t) < 1e-9 and abs(got["dof"] - dof) < 1e-6
    assert got["n_a"] == 40 and got["n_b"] == 60
    assert got["t"] > 10  # the shift is unmistakable
    # Cohen's d (r10): pooled-SD effect size from the same moments
    va = sum((x - sum(xs) / 40) ** 2 for x in xs) / 39
    vb = sum((y - sum(ys) / 60) ** 2 for y in ys) / 59
    pooled = (39 * va + 59 * vb) / 98
    want_d = (sum(xs) / 40 - sum(ys) / 60) / math.sqrt(pooled)
    assert abs(got["cohen_d"] - want_d) < 1e-9
    assert got["cohen_d"] > 0.8  # a 2-point shift at this spread is large
    # equal samples -> t == 0
    same = [("A", float(i % 5)) for i in range(20)] + [("B", float(i % 5)) for i in range(20)]
    z = ttest_welch(spark.createDataFrame(same, "g string, v double"), "g", "v", "A", "B")
    assert z["t"] == 0.0
    # determinism across partitionings (decimal-quantized sums)
    again = ttest_welch(df.repartition(9), "g", "v", "A", "B")
    assert again["t"] == got["t"]
    with pytest.raises(ValueError, match=">= 2"):
        ttest_welch(df, "g", "v", "A", "Z")
    const = [("A", 1.0)] * 5 + [("B", 1.0)] * 5
    with pytest.raises(ValueError, match="zero variance"):
        ttest_welch(spark.createDataFrame(const, "g string, v double"), "g", "v", "A", "B")


def _py_ols(pts):
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    syy = sum(y * y for _, y in pts)
    det = n * sxx - sx * sx
    num = n * sxy - sx * sy
    slope = num / det
    icept = (sy - slope * sx) / n
    dy = n * syy - sy * sy
    r2 = (num * num) / (det * dy) if dy > 0 else None
    return slope, icept, r2


def test_linear_fit_matches_python(spark):
    from d2d_spark.operators.stats import linear_fit

    # key a: exact line y = 3x + 7 (r2 == 1); key b: noisy line;
    # key c: one point (can't fit); key d: vertical (zero x variance)
    rows = (
        [("a", float(i), 3.0 * i + 7.0) for i in range(10)]
        + [("b", float(i), 2.0 * i + (1.0 if i % 2 else -1.0)) for i in range(12)]
        + [("c", 1.0, 5.0)]
        + [("d", 2.0, float(i)) for i in range(4)]
    )
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = {r["k"]: r for r in linear_fit(df, ["k"], "x", "y").collect()}
    sa, ia, ra = _py_ols([(x, y) for k, x, y in rows if k == "a"])
    assert abs(got["a"]["slope"] - sa) < 1e-9 and abs(got["a"]["intercept"] - ia) < 1e-9
    assert abs(got["a"]["r2"] - 1.0) < 1e-9
    sb, ib, rb = _py_ols([(x, y) for k, x, y in rows if k == "b"])
    assert abs(got["b"]["slope"] - sb) < 1e-9 and abs(got["b"]["r2"] - rb) < 1e-9
    assert 0.9 < got["b"]["r2"] < 1.0
    assert got["c"]["slope"] is None and got["d"]["slope"] is None
    # determinism across partitionings (decimal moment sums)
    again = {r["k"]: r for r in linear_fit(df.repartition(11), ["k"], "x", "y").collect()}
    assert again["a"]["slope"] == got["a"]["slope"]
    assert again["b"]["r2"] == got["b"]["r2"]
    # global fit (no keys)
    g = linear_fit(df.filter("k = 'a'"), None, "x", "y").collect()
    assert len(g) == 1 and abs(g[0]["slope"] - 3.0) < 1e-9
    # constant y: slope 0, r2 NULL (zero y variance)
    const = spark.createDataFrame(
        [("e", float(i), 4.0) for i in range(5)], "k string, x double, y double"
    )
    ce = linear_fit(const, ["k"], "x", "y").collect()[0]
    assert ce["slope"] == 0.0 and ce["r2"] is None
    import pytest as pt

    with pt.raises(ValueError, match="min_points"):
        linear_fit(df, ["k"], "x", "y", min_points=1)


def _py_ks(xs, ys):
    vals = sorted(set(xs) | set(ys))
    na, nb = len(xs), len(ys)
    from bisect import bisect_right

    sx, sy = sorted(xs), sorted(ys)
    best, at = -1.0, None
    for v in vals:
        g = abs(bisect_right(sx, v) / na - bisect_right(sy, v) / nb)
        if g > best:
            best, at = g, v
    return best, at


def test_ks_two_sample_matches_python(spark):
    from d2d_spark.operators.stats import ks_two_sample

    xs = [float(i % 13) for i in range(80)]
    ys = [float((i % 13) + 2) for i in range(50)]  # planted shift of 2
    rows = [("A", x) for x in xs] + [("B", y) for y in ys] + [("A", None), ("C", 1.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = ks_two_sample(df, "g", "v", "A", "B")
    d, at = _py_ks(xs, ys)
    assert got["d"] == d and got["at_value"] == at
    assert got["n_a"] == 80 and got["n_b"] == 50
    assert got["d"] > 0.1
    # identical samples: D == 0 exactly
    same = [("A", float(i % 7)) for i in range(30)] + [("B", float(i % 7)) for i in range(30)]
    z = ks_two_sample(spark.createDataFrame(same, "g string, v double"), "g", "v", "A", "B")
    assert z["d"] == 0.0
    # determinism across partitionings and bucket counts
    again = ks_two_sample(df.repartition(9), "g", "v", "A", "B", num_partitions=3)
    assert again["d"] == got["d"] and again["at_value"] == got["at_value"]
    import pytest as pt

    with pt.raises(ValueError, match="at least one"):
        ks_two_sample(df, "g", "v", "A", "Z")


def test_corr_matrix_matches_numpy(spark):
    import numpy as np
    import pytest as pt

    from d2d_spark.operators.stats import corr_matrix

    rows = [
        (float(i), 2.0 * i + 1.0, float((i * 7) % 13), 5.0)
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "x double, y double, z double, c double")
    got = {(r["col_a"], r["col_b"]): r["r"]
           for r in corr_matrix(df, ["x", "y", "z", "c"]).collect()}
    arr = np.array(rows)
    cm = np.corrcoef(arr[:, :3].T)
    names = ["x", "y", "z"]
    for i in range(3):
        assert got[(names[i], names[i])] == 1.0
        for j in range(i + 1, 3):
            assert abs(got[(names[i], names[j])] - cm[i, j]) < 1e-9
    # perfectly linear pair
    assert abs(got[("x", "y")] - 1.0) < 1e-12
    # constant column: NULL r everywhere, including against itself
    assert got[("c", "c")] is None and got[("x", "c")] is None
    # listwise deletion: a NULL row drops from EVERY pair
    df2 = df.unionAll(spark.createDataFrame([(None, 1.0, 1.0, 1.0)], df.schema))
    n_vals = {r["n"] for r in corr_matrix(df2, ["x", "y", "z", "c"]).collect()}
    assert n_vals == {50}
    with pt.raises(ValueError, match=">= 2"):
        corr_matrix(df, ["x"])


def _py_auc(pairs):
    """Tie-aware rank AUC twin: average ranks over the sorted scores,
    Mann-Whitney identity, exact integer arithmetic (Fractions not
    needed: 2*ranksum stays integral)."""
    pairs = sorted(pairs, key=lambda r: r[1])
    n = len(pairs)
    twice_ranksum_pos = 0
    i = 0
    while i < n:
        j = i
        while j < n and pairs[j][1] == pairs[i][1]:
            j += 1
        # ranks i+1..j occupy this tie block; average rank = (i+1+j)/2
        cp = sum(1 for k in range(i, j) if pairs[k][0])
        twice_ranksum_pos += cp * (i + 1 + j)
        i = j
    n_pos = sum(1 for lb, _ in pairs if lb)
    n_neg = n - n_pos
    u2 = twice_ranksum_pos - n_pos * (n_pos + 1)
    return u2 / (2 * n_pos * n_neg)


def test_binary_auc_matches_twin_and_edges(spark):
    import random

    from d2d_spark.operators.stats import binary_auc

    rng = random.Random(11)
    # heavy ties: scores on a coarse grid, labels correlated with score
    pairs = []
    for _ in range(3000):
        s = rng.randint(0, 20) / 4.0
        lb = rng.random() < (0.2 + 0.03 * s * 4)
        pairs.append((lb, s))
    for parts in (1, 7, 32):
        df = spark.createDataFrame(pairs, ["label", "score"]).repartition(parts)
        got = binary_auc(df, "label", "score", num_partitions=8)
        exp = _py_auc(pairs)
        assert got["auc"] == exp, (parts, got["auc"], exp)
        assert got["gini"] == 2.0 * exp - 1.0
        assert got["n_pos"] == sum(1 for lb, _ in pairs if lb)
    # perfect separation = 1.0; reversed = 0.0; all-tied = 0.5
    sep = [(True, 2.0)] * 5 + [(False, 1.0)] * 7
    df = spark.createDataFrame(sep, ["label", "score"])
    assert binary_auc(df, "label", "score")["auc"] == 1.0
    rev = [(True, 1.0)] * 5 + [(False, 2.0)] * 7
    assert binary_auc(spark.createDataFrame(rev, ["label", "score"]),
                      "label", "score")["auc"] == 0.0
    tied = [(True, 3.0)] * 4 + [(False, 3.0)] * 9
    assert binary_auc(spark.createDataFrame(tied, ["label", "score"]),
                      "label", "score")["auc"] == 0.5
    # integer 0/1 labels cast to boolean; NULL rows drop
    mixed = spark.createDataFrame(
        [(1, 2.0), (0, 1.0), (None, 9.0), (1, None)], ["label", "score"]
    )
    assert binary_auc(mixed, "label", "score")["auc"] == 1.0
    # single-class refusal
    import pytest

    one = spark.createDataFrame([(True, 1.0), (True, 2.0)], ["label", "score"])
    with pytest.raises(ValueError, match="both classes"):
        binary_auc(one, "label", "score")


def test_spearman_matches_python_twin_and_properties(spark):
    """Average-rank Spearman per key equals a pure-Python twin (exact
    halves -> bit-equal), is invariant under monotone rescaling of
    either variable, flags ties correctly, and NULLs out degenerate
    keys."""
    import math

    from d2d_spark.operators.stats import spearman_corr

    rows = [
        # key a: monotone-ish with ties in x
        ("a", 1.0, 10.0), ("a", 2.0, 30.0), ("a", 2.0, 20.0),
        ("a", 3.0, 40.0), ("a", 5.0, 35.0),
        # key b: perfectly inverse
        ("b", 1.0, 9.0), ("b", 2.0, 7.0), ("b", 3.0, 5.0), ("b", 4.0, 1.0),
        # key c: all-tied x (zero rank variance -> NULL)
        ("c", 7.0, 1.0), ("c", 7.0, 2.0), ("c", 7.0, 3.0),
        # key d: underpopulated
        ("d", 1.0, 1.0),
        # NULLs drop
        ("a", None, 99.0), ("a", 9.0, None),
    ]
    df = spark.createDataFrame(rows, "k string, x double, y double")

    def py_spearman(pairs):
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
        xs, ys = [p[0] for p in pairs], [p[1] for p in pairs]
        rx, ry = avg_ranks(xs), avg_ranks(ys)
        n = len(pairs)
        sx, sy = sum(rx), sum(ry)
        sxx = sum(r * r for r in rx)
        syy = sum(r * r for r in ry)
        sxy = sum(a * b for a, b in zip(rx, ry))
        dx, dy = n * sxx - sx * sx, n * syy - sy * sy
        if dx <= 0 or dy <= 0:
            return None
        return (n * sxy - sx * sy) / math.sqrt(dx * dy)

    got = {
        r["k"]: (r["n"], r["rho"])
        for r in spearman_corr(df, ["k"], "x", "y").collect()
    }
    data = {
        "a": [(1, 10), (2, 30), (2, 20), (3, 40), (5, 35)],
        "b": [(1, 9), (2, 7), (3, 5), (4, 1)],
        "c": [(7, 1), (7, 2), (7, 3)],
        "d": [(1, 1)],
    }
    for k, pairs in data.items():
        n, rho = got[k]
        assert n == len(pairs)
        want = py_spearman(pairs) if len(pairs) >= 2 else None
        if want is None:
            assert rho is None
        else:
            assert abs(rho - want) < 1e-12, (k, rho, want)
    assert got["b"][1] == -1.0  # perfect inverse is exactly -1
    # monotone rescaling (x -> exp-ish blowup) leaves rho unchanged
    import pyspark.sql.functions as F

    blown = df.withColumn("x", F.pow(F.lit(10.0), F.col("x")))
    got2 = {
        r["k"]: r["rho"] for r in spearman_corr(blown, ["k"], "x", "y").collect()
    }
    assert got2["a"] == got["a"][1] and got2["b"] == -1.0
    # partitioning invariance (exact decimal moments)
    got32 = {
        r["k"]: r["rho"]
        for r in spearman_corr(df.repartition(32), ["k"], "x", "y").collect()
    }
    assert got32 == {k: v for k, (n, v) in got.items()}
    # global mode (no keys)
    one = spearman_corr(df.filter("k = 'b'"), None, "x", "y").collect()[0]
    assert one["rho"] == -1.0
    import pytest as pt

    with pt.raises(ValueError, match="min_points"):
        spearman_corr(df, ["k"], "x", "y", min_points=1)
