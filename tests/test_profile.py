"""Table profiler and schema-drift preflight, cross-checked against
DuckDB on the fixture tables."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from d2d_spark.operators.profile import profile_table, schema_drift
from d2d_spark.session import read_table


def test_profile_matches_duckdb(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    prof = {r["column"]: r for r in profile_table(orders).collect()}
    want = duckdb.sql(
        f"""SELECT count(*) n, count(o_custkey) nn, count(DISTINCT o_custkey) nd,
                   min(o_totalprice), max(o_totalprice), avg(o_totalprice)
            FROM read_parquet('{sf_dir}/orders.parquet')"""
    ).fetchone()
    n, nn, nd, lo, hi, mean = want
    assert prof["o_custkey"]["n_rows"] == n
    assert prof["o_custkey"]["n_nulls"] == n - nn
    assert abs(prof["o_custkey"]["approx_distinct"] - nd) <= 0.1 * nd
    assert float(prof["o_totalprice"]["min"]) == pytest.approx(lo)
    assert float(prof["o_totalprice"]["max"]) == pytest.approx(hi)
    assert prof["o_totalprice"]["mean"] == pytest.approx(mean)
    assert prof["o_orderstatus"]["mean"] is None  # non-numeric
    assert prof["o_orderstatus"]["dtype"] == "string"
    # one pass covers every column
    assert set(prof) == set(orders.columns)


def test_profile_single_aggregation_pass(spark, sf_dir):
    plan = (
        profile_table(read_table(spark, sf_dir, "orders"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one aggregate pair (partial+final), no join, no extra shuffle
    assert plan.count("HashAggregate") + plan.count("SortAggregate") <= 4
    assert "Join" not in plan


def test_profile_nulls_and_unorderable(spark):
    df = spark.createDataFrame(
        [(1, None, [1, 2]), (2, "x", [3])], "id long, s string, arr array<long>"
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["s"]["n_nulls"] == 1 and prof["s"]["null_frac"] == pytest.approx(0.5)
    assert prof["arr"]["min"] is None and prof["arr"]["max"] is None
    assert prof["id"]["min"] == "1" and prof["id"]["max"] == "2"
    with pytest.raises(ValueError, match="no such columns"):
        profile_table(df, columns=["nope"])


def test_profile_empty_table(spark):
    df = spark.createDataFrame([], "id long, s string")
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["id"]["n_rows"] == 0 and prof["id"]["null_frac"] is None


def test_schema_drift(spark):
    a = spark.createDataFrame([], "id long, v string, extra double")
    b = spark.createDataFrame([], "id long, v int, gone string")
    drift = {r["column"]: r for r in schema_drift(a, b).collect()}
    assert drift["extra"]["change"] == "added"
    assert drift["gone"]["change"] == "removed"
    assert drift["v"]["change"] == "type_changed"
    assert drift["v"]["source_type"] == "string" and drift["v"]["target_type"] == "int"
    assert "id" not in drift
    assert schema_drift(a, a).count() == 0


def test_corpus_report_sections_and_totals(spark, sf_dir):
    from d2d_spark.operators.profile import corpus_report
    from d2d_spark.session import read_table
    from pyspark.sql import functions as F

    docs = read_table(spark, sf_dir, "documents")
    rep = corpus_report(docs, "text", lang_col="lang", source_col="source").collect()
    by = {(r.section, r.key): r.value for r in rep}

    n = docs.count()
    assert by[("totals", "n_docs")] == float(n)
    assert by[("totals", "n_chars")] == float(
        docs.agg(F.sum(F.length("text"))).collect()[0][0]
    )
    assert 0.0 <= by[("totals", "approx_dup_frac")] < 1.0
    # quantiles are monotone
    toks = [by[("token_quantiles", f"p{p}")] for p in (10, 25, 50, 75, 90)]
    assert toks == sorted(toks) and toks[0] > 0
    # composition sections sum to the doc count
    langs = {k: v for (s, k), v in by.items() if s == "lang"}
    srcs = {k: v for (s, k), v in by.items() if s == "source"}
    assert sum(langs.values()) == float(n) and sum(srcs.values()) == float(n)
    want_langs = {r.lang: float(r.n) for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert langs == want_langs


def test_corpus_report_without_composition_cols(spark, sf_dir):
    from d2d_spark.operators.profile import corpus_report
    from d2d_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    secs = {r.section for r in corpus_report(docs, "text").collect()}
    assert secs == {"totals", "token_quantiles", "quality_quantiles"}


def test_key_skew_report_matches_python(spark):
    """Every stat equals an exact Python replay: counts, shares,
    entropy (via the same 12-dp rounded-term fold), rank-sum gini."""
    import math
    from collections import Counter
    from decimal import Decimal

    from d2d_spark.operators.profile import key_skew_report

    rows = [(k,) for k in ["a"] * 50 + ["b"] * 25 + ["c"] * 20 + ["d"] * 5]
    df = spark.createDataFrame(rows, "k string")
    got = {(r["stat"], r["key"]): (r["n"], r["value"])
           for r in key_skew_report(df, ["k"], top_k=3).collect()}
    c = Counter(k for k, in rows)
    N, K = sum(c.values()), len(c)
    assert got[("rows", None)] == (N, None)
    assert got[("keys", None)] == (K, None)
    assert got[("max_over_avg", None)] == (50, 50 * float(K) / N)
    # top-3 with exact shares; 'd' excluded by top_k
    assert got[("top", "a")] == (50, 50 / 100.0)
    assert got[("top", "b")] == (25, 25 / 100.0)
    assert got[("top", "c")] == (20, 20 / 100.0)
    assert ("top", "d") not in got
    h = -float(sum(
        Decimal(str(round(n / N * math.log(n / N), 12))) for n in c.values()
    ))
    assert got[("entropy", None)][1] == pytest.approx(h, abs=1e-12)
    assert got[("entropy_norm", None)][1] == pytest.approx(h / math.log(K), abs=1e-12)
    # gini: counts sorted ascending (5, 20, 25, 50), ranks 1..4
    rs = 1 * 5 + 2 * 20 + 3 * 25 + 4 * 50
    gini = 2.0 * rs / (float(K) * N) - (K + 1.0) / K
    assert got[("gini", None)][1] == pytest.approx(gini, abs=1e-12)


def test_key_skew_report_edges(spark):
    from d2d_spark.operators.profile import key_skew_report

    # uniform distribution: entropy_norm = 1, gini = 0
    df = spark.createDataFrame([(k,) for k in "abcd" * 25], "k string")
    got = {r["stat"]: r["value"] for r in key_skew_report(df, ["k"]).collect()}
    assert got["entropy_norm"] == pytest.approx(1.0, abs=1e-9)
    assert got["gini"] == pytest.approx(0.0, abs=1e-12)
    assert got["max_over_avg"] == pytest.approx(1.0, abs=1e-12)
    # single key: entropy 0, norm NULL, gini 0
    one = spark.createDataFrame([("x",)] * 7, "k string")
    g1 = {r["stat"]: (r["n"], r["value"]) for r in key_skew_report(one, ["k"]).collect()}
    assert g1["entropy"][1] == 0.0 and g1["entropy_norm"][1] is None
    assert g1["gini"][1] == 0.0
    # empty input: just the zero counters
    empty = spark.createDataFrame([], "k string")
    ge = {r["stat"]: r["n"] for r in key_skew_report(empty, ["k"]).collect()}
    assert ge == {"rows": 0, "keys": 0}
    # multi-column keys serialize as JSON with NULLs KEPT, so the
    # dirty keys ('x', NULL) and (NULL, 'x') stay DISTINCT
    two = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 2), ("b", 2)], "x string, y int"
    )
    g2 = [r for r in key_skew_report(two, ["x", "y"], top_k=1).collect()
          if r["stat"] == "top"]
    assert len(g2) == 1 and g2[0]["key"] == '{"x":"a","y":1}' and g2[0]["n"] == 2
    dirty = spark.createDataFrame(
        [("x", None), (None, "x")], "a string, b string"
    )
    gd = {r["stat"]: r["n"] for r in key_skew_report(dirty, ["a", "b"]).collect()}
    assert gd["keys"] == 2
    # guards
    with pytest.raises(ValueError, match="top_k"):
        key_skew_report(two, ["x"], top_k=0)
    with pytest.raises(ValueError, match="key column"):
        key_skew_report(two, [])
    with pytest.raises(ValueError, match="max_keys"):
        key_skew_report(df, ["k"], max_keys=2)


def test_histogram_matches_python(spark):
    import math

    from d2d_spark.operators.profile import histogram

    vals = [1.0, 2.5, 2.5, 3.0, 7.9, 8.0, None, 5.5]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {r["bucket"]: (r["lo_edge"], r["hi_edge"], r["n"])
           for r in histogram(df, "x", bins=4).collect()}
    lo, hi = 1.0, 8.0
    w = (hi - lo) / 4
    from collections import Counter
    c = Counter()
    for v in vals:
        if v is None:
            continue
        b = 3 if v == hi else min(int(math.floor((v - lo) / w)), 3)
        c[b] += 1
    assert set(got) == set(range(4))
    for b in range(4):
        assert got[b][2] == c.get(b, 0), b
        assert got[b][0] == lo + b * w and got[b][1] == lo + (b + 1) * w
    assert sum(n for _, _, n in got.values()) == 7  # NULL excluded
    # explicit bounds: out-of-range -> sentinel buckets, x == hi closed
    got2 = {r["bucket"]: r["n"]
            for r in histogram(df, "x", bins=2, lo=2.0, hi=8.0).collect()}
    assert got2[-1] == 1          # 1.0 underflows
    assert got2.get(2, 0) == 0    # nothing above 8.0
    assert got2[0] + got2[1] == 6
    # single-valued column
    one = spark.createDataFrame([(3.0,), (3.0,)], "x double")
    g1 = histogram(one, "x", bins=5).collect()
    assert len(g1) == 1 and g1[0]["bucket"] == 0 and g1[0]["n"] == 2
    # empty
    assert histogram(spark.createDataFrame([], "x double"), "x").count() == 0
    import pytest as pt
    with pt.raises(ValueError, match="bins"):
        histogram(df, "x", bins=0)
    with pt.raises(ValueError, match="BOTH"):
        histogram(df, "x", lo=1.0)
    with pt.raises(ValueError, match="hi"):
        histogram(df, "x", lo=5.0, hi=5.0)


def test_histogram_refuses_nan_auto_bounds(spark):
    import pytest as pt

    from d2d_spark.operators.profile import histogram

    df = spark.createDataFrame([(1.0,), (float("nan"),)], "x double")
    with pt.raises(ValueError, match="NaN"):
        histogram(df, "x", bins=4)
    # explicit bounds still work: Spark orders NaN above every double,
    # so the NaN row lands in the OVERFLOW sentinel instead of
    # silently vanishing
    got = {r["bucket"]: r["n"] for r in histogram(df, "x", bins=2, lo=0.0, hi=2.0).collect()}
    assert got[1] == 1 and got[2] == 1 and got[0] == 0


def test_mutual_information(spark):
    """profile.mutual_information vs a plain-Python replay: a
    deterministic dependent pair, an independent pair (~0), the
    identical-column ceiling (MI == H, NMI == 1), NULL handling, the
    ID-column refusal, and partitioning invariance."""
    import math

    import pytest
    from d2d_spark.operators.profile import mutual_information

    rows = [(i, f"a{i % 3}", f"b{(i // 3) % 4}", f"c{i % 3}") for i in range(120)]
    df = spark.createDataFrame(rows, "i long, a string, b string, c string")

    def py_mi(pairs):
        from collections import Counter
        n = len(pairs)
        j, ma, mb = Counter(pairs), Counter(x for x, _ in pairs), Counter(y for _, y in pairs)
        mi = sum(c / n * math.log((c / n) / ((ma[x] / n) * (mb[y] / n)))
                 for (x, y), c in j.items())
        ha = -sum(c / n * math.log(c / n) for c in ma.values())
        hb = -sum(c / n * math.log(c / n) for c in mb.values())
        return mi, ha, hb

    # a and b constructed independent (i%3 vs (i//3)%4 over 120 = lcm-aligned)
    got = mutual_information(df, "a", "b")
    mi, ha, hb = py_mi([(r[1], r[2]) for r in rows])
    assert abs(got["mi"] - mi) < 1e-9 and abs(got["mi"]) < 1e-9
    assert abs(got["h_a"] - ha) < 1e-9 and abs(got["h_b"] - hb) < 1e-9
    # c is a bijection of a: MI == H(a), NMI == 1
    dep = mutual_information(df, "a", "c")
    assert abs(dep["mi"] - dep["h_a"]) < 1e-9
    assert abs(dep["nmi"] - 1.0) < 1e-9
    # partitioning invariance (DECIMAL-disciplined sums, bit-equal)
    again = mutual_information(df.repartition(13), "a", "c")
    assert again["mi"] == dep["mi"] and again["h_a"] == dep["h_a"]
    # NULLs drop
    nul = spark.createDataFrame(
        [("x", "y"), (None, "y"), ("x", None)], "a string, b string"
    )
    assert mutual_information(nul, "a", "b")["n_rows"] == 1
    # empty after NULL drop
    assert mutual_information(nul.filter("a IS NULL"), "a", "b")["n_rows"] == 0
    # ID-like columns refused
    with pytest.raises(ValueError, match="max_cells"):
        mutual_information(df, "i", "b", max_cells=10)


def test_population_stability_index(spark):
    """PSI: ~0 on an identical distribution, loud on a planted shift,
    Python-twin equality with pinned breakpoints, categorical mode
    with a vanished/new category, guards."""
    import math

    import pytest
    from d2d_spark.operators.profile import population_stability_index as psi

    ref = spark.createDataFrame([(float(i % 100),) for i in range(1000)], "v double")
    same = spark.createDataFrame([(float((i + 7) % 100),) for i in range(500)], "v double")
    stable = psi(ref, same, "v", breakpoints=[10, 20, 30, 40, 50, 60, 70, 80, 90])
    assert stable["psi"] < 0.01
    shifted = spark.createDataFrame([(float(i % 100) + 40.0,) for i in range(500)], "v double")
    drift = psi(ref, shifted, "v", breakpoints=[10, 20, 30, 40, 50, 60, 70, 80, 90])
    assert drift["psi"] > 0.25
    # python twin with the same pinned breakpoints
    bps = [10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0, 90.0]

    def bucket(x):
        return sum(x > b for b in bps)

    from collections import Counter

    rc = Counter(bucket(float(i % 100)) for i in range(1000))
    nc = Counter(bucket(float(i % 100) + 40.0) for i in range(500))
    want = 0.0
    for i in range(len(bps) + 1):
        p = max(rc.get(i, 0) / 1000, 1e-6)
        q = max(nc.get(i, 0) / 500, 1e-6)
        want += (p - q) * math.log(p / q)
    assert abs(drift["psi"] - want) < 1e-12
    # categorical mode: one category vanishes, one appears
    cr = spark.createDataFrame([("a",)] * 50 + [("b",)] * 50, "k string")
    cn = spark.createDataFrame([("a",)] * 60 + [("c",)] * 40, "k string")
    cat = psi(cr, cn, "k", categorical=True)
    assert cat["psi"] > 0.5 and len(cat["bins"]) == 3
    with pytest.raises(ValueError, match="breakpoints only"):
        psi(cr, cn, "k", categorical=True, breakpoints=[1])
    with pytest.raises(ValueError, match="at least one"):
        psi(ref.filter("v < 0"), same, "v", breakpoints=[1.0])
    with pytest.raises(ValueError, match="smoothing"):
        psi(ref, same, "v", smoothing=0.0)


def test_stream_psi_sink_equals_batch(spark, tmp_path):
    """Cumulative streaming PSI equals the batch operator over
    everything seen at EVERY drop prefix (pinned breakpoints + ref
    shares); the per-batch PSI flags the drifted drop alone."""
    from pyspark.sql import types as T

    from d2d_spark.operators.profile import population_stability_index as psi
    from d2d_spark.streaming.filestream import (
        file_stream,
        psi_stream_state,
        stream_psi_sink,
    )

    bps = [25.0, 50.0, 75.0]
    ref = spark.createDataFrame([(float(i % 100),) for i in range(400)], "v double")
    ref_model = psi(ref, ref, "v", breakpoints=bps)
    ref_shares = [p for _, p, _ in ref_model["bins"]]

    src = tmp_path / "src"
    src.mkdir()
    schema = T.StructType([T.StructField("v", T.DoubleType())])
    drops = [
        ("d1", [(float(i % 100),) for i in range(200)]),          # stable
        ("d2", [(float(i % 100) + 50.0,) for i in range(200)]),   # shifted
        ("d3", [(float(i % 100),) for i in range(100)]),          # stable again
    ]
    seen = []
    per_batch = []
    for name, rows in drops:
        spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
            str(src / name)
        )
        seen.extend(rows)
        stream = file_stream(spark, str(src) + "/*", schema)
        stream_psi_sink(
            stream, "v", bps, ref_shares,
            str(tmp_path / "state"), str(tmp_path / "ckpt"),
        )
        bins, ps = psi_stream_state(spark, str(tmp_path / "state"))
        row = ps.first()
        per_batch.append(row["psi_batch"])
        want = psi(ref, spark.createDataFrame(seen, schema), "v", breakpoints=bps)
        assert abs(row["psi_cum"] - want["psi"]) < 1e-12, name
        # cumulative counts conserve rows
        assert sum(r["cum_count"] for r in bins.collect()) == len(seen)
    # the drifted drop flags loudly on its own; stable drops don't
    assert per_batch[0] < 0.01 and per_batch[2] < 0.01
    assert per_batch[1] > 0.25
    import pytest as pt

    with pt.raises(ValueError, match="ref_shares"):
        stream_psi_sink(
            file_stream(spark, str(src) + "/*", schema), "v", bps, [0.5, 0.5],
            str(tmp_path / "s2"), str(tmp_path / "c2"),
        )


def test_benford_deviation(spark):
    """A Benford-conforming synthetic (log-uniform magnitudes) scores
    close conformity; a uniform distribution flags; exact powers of
    ten count as digit 1 (the float-edge fold); guards."""
    import math

    import pytest
    from d2d_spark.operators.profile import benford_deviation

    # log-uniform over 4 decades: leading digits follow Benford
    conform = spark.createDataFrame(
        [(math.exp(math.log(10.0) * (0.0 + 4.0 * ((i * 2654435761) % 10_000) / 10_000)),)
         for i in range(10_000)],
        "v double",
    )
    good = benford_deviation(conform, "v")
    assert good["mad"] < 0.01 and good["n"] == 10_000
    # uniform [1, 10): every digit equally likely -> nonconformity
    uni = spark.createDataFrame(
        [(1.0 + 9.0 * ((i * 40503) % 1000) / 1000.0,) for i in range(5000)], "v double"
    )
    bad = benford_deviation(uni, "v")
    assert bad["mad"] > 0.03 and bad["chi2"] > good["chi2"]
    # exact powers of ten are digit 1; zeros/NULLs/negatives/NaN/inf
    # handled; 0.3 is digit 3 (the 0.3/0.1 == 2.999... float trap)
    edges = spark.createDataFrame(
        [(1.0,), (10.0,), (100.0,), (1000.0,), (-200.0,), (0.0,), (None,),
         (0.3,), (0.29,), (float("nan"),), (float("inf"),)],
        "v double",
    )
    e = benford_deviation(edges, "v")
    assert e["n"] == 7
    shares = dict((d, o) for d, o, _ in e["digits"])
    assert shares[1] == 4 / 7 and shares[2] == 2 / 7 and shares[3] == 1 / 7
    with pytest.raises(ValueError, match="no positive"):
        benford_deviation(edges.filter("v = 0"), "v")


def test_js_divergence_matches_twin_and_bounds(spark):
    """JSD (base 2) equals a pure-Python twin on pinned breakpoints,
    is symmetric and bounded [0, 1], zero on identical frames, 1 on
    disjoint supports, finite on vanished/new buckets WITHOUT
    smoothing (the PSI contrast), and handles categorical mode."""
    import math

    import pytest as pt

    from d2d_spark.operators.profile import js_divergence

    ref = spark.createDataFrame([(float(v),) for v in [1, 2, 2, 3, 8, 9]], "v double")
    new = spark.createDataFrame([(float(v),) for v in [1, 2, 7, 8, 9, 9]], "v double")
    bps = [2.0, 5.0, 8.0]
    got = js_divergence(ref, new, "v", breakpoints=bps)

    def twin(a, b, bps):
        def bucket(v):
            return sum(1 for x in bps if v > x)
        nb = len(bps) + 1
        ca = [0] * nb
        cb = [0] * nb
        for v in a:
            ca[bucket(v)] += 1
        for v in b:
            cb[bucket(v)] += 1
        na, nbt = sum(ca), sum(cb)
        jsd = 0.0
        terms = []
        for i in range(nb):
            p, q = ca[i] / na, cb[i] / nbt
            pt_ = p * math.log2(2.0 * p / (p + q)) if p > 0 else 0.0
            qt = q * math.log2(2.0 * q / (p + q)) if q > 0 else 0.0
            terms.append(0.5 * (pt_ + qt))
            jsd += terms[-1]
        return jsd, terms

    want, terms = twin([1, 2, 2, 3, 8, 9], [1, 2, 7, 8, 9, 9], bps)
    assert got["jsd"] == want
    assert [b[3] for b in got["bins"]] == terms
    assert got["n_ref"] == 6 and got["n_new"] == 6
    # symmetric
    rev = js_divergence(new, ref, "v", breakpoints=bps)
    assert abs(rev["jsd"] - got["jsd"]) < 1e-15
    # identical -> 0; disjoint -> 1 (base-2 bound), finite zero-bins
    same = js_divergence(ref, ref, "v", breakpoints=bps)
    assert same["jsd"] == 0.0
    lo = spark.createDataFrame([(1.0,), (1.5,)], "v double")
    hi = spark.createDataFrame([(9.0,), (9.5,)], "v double")
    dj = js_divergence(lo, hi, "v", breakpoints=bps)
    assert abs(dj["jsd"] - 1.0) < 1e-12
    assert all(math.isfinite(b[3]) for b in dj["bins"])
    # categorical mode incl. a category present on one side only
    cr = spark.createDataFrame([("en",), ("en",), ("fr",)], "lang string")
    cn = spark.createDataFrame([("en",), ("de",), ("de",)], "lang string")
    cat = js_divergence(cr, cn, "lang", categorical=True)
    assert 0.0 < cat["jsd"] <= 1.0
    assert {b[0] for b in cat["bins"]} == {"en", "fr", "de"}
    # guards
    with pt.raises(ValueError, match="breakpoints only apply"):
        js_divergence(cr, cn, "lang", categorical=True, breakpoints=[1.0])
    with pt.raises(ValueError, match="bins must be"):
        js_divergence(ref, new, "v", bins=1)
    with pt.raises(ValueError, match="non-NULL"):
        js_divergence(
            spark.createDataFrame([(None,)], "v double"), new, "v", breakpoints=bps
        )
