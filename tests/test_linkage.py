"""Fellegi-Sunter record linkage (operators/linkage.py): EM fit
pinned bit-for-bit against a Decimal-disciplined Python twin,
partitioning invariance, parameter recovery on a planted generative
model, scoring identities, and the guard surface."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import pytest

from d2d_spark.operators.linkage import linkage_em, linkage_score

_Q = Decimal("1.000000000000")  # 12 dp, matching the operator's round


def _clamp(x, eps=1e-6):
    return min(max(x, eps), 1.0 - eps)


def _py_em(rows, k, iters=10, lam=0.3, m0=0.9, u0=0.1, eps=1e-6):
    """Twin of linkage_em: identical float-op order in the E-step,
    Decimal(repr(p)) HALF_UP quantization (= Spark's
    BigDecimal.valueOf + setScale), exact decimal sums."""
    m, u = [m0] * k, [u0] * k
    for _ in range(iters):
        S, n = Decimal(0), 0
        Sg, G = [Decimal(0)] * k, [0] * k
        for g in rows:
            pm, pu = lam, 1.0 - lam
            for i in range(k):
                pm = pm * (m[i] if g[i] == 1 else 1.0 - m[i])
                pu = pu * (u[i] if g[i] == 1 else 1.0 - u[i])
            p = pm / (pm + pu)
            pr = Decimal(repr(p)).quantize(_Q, ROUND_HALF_UP)
            S += pr
            n += 1
            for i in range(k):
                if g[i] == 1:
                    Sg[i] += pr
                    G[i] += 1
        s = float(S)
        lam = _clamp(s / n, eps)
        m = [_clamp(float(Sg[i]) / s, eps) for i in range(k)]
        u = [_clamp((G[i] - float(Sg[i])) / (float(n) - s), eps) for i in range(k)]
    return {"lambda": lam, "m": m, "u": u}


def _gamma_rows():
    """Deterministic two-population agreement vectors: ~40% mostly-
    agreeing (the latent matches), ~60% mostly-disagreeing."""
    rows = []
    for i in range(500):
        if i % 5 < 2:  # match-ish
            rows.append((1, 0 if i % 7 == 0 else 1, 1 if i % 3 else 0))
        else:  # non-match-ish
            rows.append((1 if i % 11 == 0 else 0, 0, 1 if i % 13 == 0 else 0))
    return rows


def _pairs_df(spark, rows):
    return spark.createDataFrame(rows, "g0 int, g1 int, g2 int")


def test_em_matches_python_twin_bit_for_bit(spark):
    rows = _gamma_rows()
    df = _pairs_df(spark, rows)
    got = linkage_em(df, ["g0", "g1", "g2"], max_iters=6)
    want = _py_em(rows, 3, iters=6)
    assert got["lambda"] == want["lambda"]
    assert got["m"] == want["m"] and got["u"] == want["u"]
    assert got["n_pairs"] == len(rows)


def test_em_partitioning_invariant(spark):
    rows = _gamma_rows()
    fits = [
        linkage_em(_pairs_df(spark, rows).repartition(n), ["g0", "g1", "g2"], max_iters=4)
        for n in (1, 7, 32)
    ]
    assert fits[0] == fits[1] == fits[2]


def test_em_recovers_planted_parameters(spark):
    """Generative sanity: with planted (lambda=0.4, m=.9/.8/.7,
    u=.1/.2/.3) frequencies laid out EXACTLY (deterministic counts,
    no RNG), EM lands near the truth and orients matches as the
    agreeing class."""
    rows = []
    # 400 matches: per-field agreement frequencies laid out on
    # CO-PRIME moduli so the fields aren't mutually determined (a
    # nested prefix layout makes one field a perfect separator and EM
    # rightly collapses onto it)
    for j in range(400):
        rows.append((int(j % 10 < 9), int(j % 7 < 6), int(j % 13 < 9)))
    # 600 non-matches
    for j in range(600):
        rows.append((int(j % 10 < 1), int(j % 7 < 1), int(j % 13 < 4)))
    fit = linkage_em(_pairs_df(spark, rows), ["g0", "g1", "g2"], max_iters=40)
    assert abs(fit["lambda"] - 0.4) < 0.15
    truth_m = (0.9, 6 / 7, 9 / 13)
    truth_u = (0.1, 1 / 7, 4 / 13)
    for mi, ui, tm, tu in zip(fit["m"], fit["u"], truth_m, truth_u):
        assert mi > ui
        assert abs(mi - tm) < 0.15 and abs(ui - tu) < 0.15


def test_score_identities_and_monotonicity(spark):
    model = {
        "lambda": 0.25,
        "m": [0.9, 0.8],
        "u": [0.1, 0.2],
        "gamma_cols": ["g0", "g1"],
    }
    df = spark.createDataFrame(
        [(1, 1), (1, 0), (0, 1), (0, 0)], "g0 int, g1 int"
    )
    got = {
        (r["g0"], r["g1"]): (r["match_weight"], r["match_prob"])
        for r in linkage_score(df, model).collect()
    }
    base = math.log2(0.25 / 0.75)
    w11 = base + math.log2(0.9 / 0.1) + math.log2(0.8 / 0.2)
    assert math.isclose(got[(1, 1)][0], w11, rel_tol=1e-12)
    # full agreement outranks partial outranks none
    assert got[(1, 1)][0] > got[(1, 0)][0] > got[(0, 0)][0]
    assert got[(1, 1)][0] > got[(0, 1)][0] > got[(0, 0)][0]
    # prob is the base-2 sigmoid of the weight
    for w, p in got.values():
        assert math.isclose(p, 2.0**w / (1 + 2.0**w), rel_tol=1e-12)


def test_em_then_score_separates_populations(spark):
    rows = _gamma_rows()
    df = _pairs_df(spark, rows)
    fit = linkage_em(df, ["g0", "g1", "g2"], max_iters=10)
    scored = linkage_score(df, fit)
    from pyspark.sql import functions as F

    # the all-agree pattern scores above the all-disagree pattern
    agg = scored.groupBy("g0", "g1", "g2").agg(F.max("match_weight").alias("w"))
    pats = {(r["g0"], r["g1"], r["g2"]): r["w"] for r in agg.collect()}
    assert pats[(1, 1, 1)] > pats[(0, 0, 0)]


def test_guards(spark):
    df = _pairs_df(spark, _gamma_rows())
    with pytest.raises(ValueError, match="gamma"):
        linkage_em(df, [])
    with pytest.raises(ValueError, match="lacks"):
        linkage_em(df, ["g0", "nope"])
    with pytest.raises(ValueError, match="max_iters"):
        linkage_em(df, ["g0"], max_iters=0)
    with pytest.raises(ValueError, match="init_m"):
        linkage_em(df, ["g0"], init_m=0.1, init_u=0.5)
    with pytest.raises(ValueError, match="0/1"):
        linkage_em(spark.createDataFrame([(2,)], "g0 int"), ["g0"])
    with pytest.raises(ValueError, match="0/1"):
        linkage_em(spark.createDataFrame([(None,)], "g0 int"), ["g0"])
    with pytest.raises(ValueError, match="no candidate"):
        linkage_em(df.limit(0), ["g0"])
    with pytest.raises(ValueError, match="strictly inside"):
        linkage_score(
            df,
            {"lambda": 0.5, "m": [1.0, 0.9, 0.9], "u": [0.1, 0.1, 0.1],
             "gamma_cols": ["g0", "g1", "g2"]},
        )


def test_jaro_winkler_known_values_and_duckdb_parity(spark):
    """functions/scalars.jaro_winkler: the Winkler 1990 textbook
    values, the edge conventions (boost-threshold 0.7, empty -> 0.0,
    NULL -> NULL, integer transposition halving), and bit-for-bit
    parity with DuckDB's native jaro_winkler_similarity on every
    probed pair."""
    import duckdb
    from pyspark.sql import functions as F

    from d2d_spark.functions.scalars import jaro_winkler

    cases = [
        ("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("DWAYNE", "DUANE"),
        ("JELLYFISH", "SMELLYFISH"),
        ("abc", "abc"), ("abc", "xyz"), ("", ""), ("", "x"),
        ("abxxxx", "abyyyyyyyy"),       # jaro <= 0.7: NO prefix boost
        ("red widget", "new widget"),   # odd out-of-order count: t = k // 2
        ("aaaaa", "aaaaa"), ("ab", "ba"), ("a", "a"), ("a", "b"),
    ]
    df = spark.createDataFrame(cases, "a string, b string")
    got = {
        (r["a"], r["b"]): r["jw"]
        for r in df.select("a", "b", jaro_winkler(F.col("a"), F.col("b")).alias("jw")).collect()
    }
    assert math.isclose(got[("MARTHA", "MARHTA")], 0.9611111111111111)
    assert math.isclose(got[("DIXON", "DICKSONX")], 0.8133333333333332)
    assert got[("abc", "abc")] == 1.0 and got[("abc", "xyz")] == 0.0
    assert got[("", "")] == 0.0 and got[("", "x")] == 0.0
    con = duckdb.connect()
    for a, b in cases:
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert got[(a, b)] == want, (a, b, got[(a, b)], want)
    # NULL propagates as NULL (nullable Float64 round-trip)
    nl = spark.createDataFrame([(None, "x")], "a string, b string")
    assert nl.select(jaro_winkler(F.col("a"), F.col("b")).alias("jw")).first()["jw"] is None


def test_entity_resolution_end_to_end(spark):
    """The full ER story composes: phonetic blocking -> Jaro-Winkler +
    field agreements -> EM-fitted Fellegi-Sunter scoring -> threshold
    -> connected-components clustering -> golden-record survivorship.
    Planted entity groups (name typos, one stale field each) resolve
    to one golden row per real-world entity; unrelated records stay
    singletons."""
    from pyspark.sql import functions as F

    from d2d_spark.functions.scalars import jaro_winkler
    from d2d_spark.operators.dedup import connected_components, phonetic_blocked_pairs
    from d2d_spark.operators.join import golden_record

    # three real entities, each 2-3 records with typos/staleness, plus
    # two unrelated singletons; fields: name, city, phone
    rows = [
        (1, "Robert Smith", "Austin", "555-0101", 10),
        (2, "Robert Smyth", "Austin", "555-0101", 20),   # typo, newer
        (3, "Rupert Smith", "Dallas", "555-0999", 5),    # sounds alike, DIFFERENT person
        (4, "Maria Garcia", "Boston", "555-0202", 10),
        (5, "Maria Garcia", "Boston", None, 30),         # missing phone, newest
        (6, "Mario Garcia", "Boston", "555-0202", 20),   # typo
        (7, "Wei Chen", "Seattle", "555-0303", 10),
        (8, "Wei Chen", "Seatle", "555-0303", 15),       # city typo
        (9, "Aisha Khan", "Miami", "555-0404", 10),
    ]
    df = spark.createDataFrame(rows, "rid long, name string, city string, phone string, ver int")
    # 1) blocking: soundex on the full name + edit-distance residual
    cand = phonetic_blocked_pairs(df, "name", "rid", max_dist=3)
    # 2) agreement vectors over the candidate pairs
    a = df.select(F.col("rid").alias("id_a"), *[F.col(c).alias(f"{c}_a") for c in ("name", "city", "phone")])
    b = df.select(F.col("rid").alias("id_b"), *[F.col(c).alias(f"{c}_b") for c in ("name", "city", "phone")])
    pairs = (
        cand.join(a, "id_a").join(b, "id_b")
        .withColumn("g0", (jaro_winkler(F.col("name_a"), F.col("name_b")) > 0.93).cast("int"))
        .withColumn("g1", (F.col("city_a") == F.col("city_b")).cast("int"))
        .withColumn(
            "g2",
            F.coalesce((F.col("phone_a") == F.col("phone_b")).cast("int"), F.lit(0)),
        )
    )
    # 3) EM fit + score; the fixture is tiny so just seed sensible
    #    priors and take few rounds — the DECISION threshold is what
    #    the composition exercises
    from d2d_spark.operators.linkage import linkage_em, linkage_score

    fit = linkage_em(pairs, ["g0", "g1", "g2"], max_iters=8)
    scored = linkage_score(pairs, fit)
    matches = scored.filter(F.col("match_prob") > 0.9).select("id_a", "id_b")
    # 4) cluster
    comps = connected_components(matches)
    clustered = df.join(
        comps.withColumnRenamed("id", "rid"), "rid", "left"
    ).withColumn("entity", F.coalesce("component", "rid"))
    ents = {
        r["rid"]: r["entity"] for r in clustered.select("rid", "entity").collect()
    }
    assert ents[1] == ents[2] and ents[4] == ents[5] == ents[6] and ents[7] == ents[8]
    # Rupert (3) and Aisha (9) stay their own entities
    assert ents[3] not in (ents[1], ents[4], ents[7])
    assert ents[9] not in (ents[1], ents[4], ents[7], ents[3])
    # 5) golden record: latest-by-version survivorship, phone survives
    #    the newest row's NULL (latest NON-NULL rule)
    golden = golden_record(
        clustered.select("entity", "ver", "name", "city", "phone"),
        ["entity"],
        "ver",
        {"name": "latest", "city": "latest", "phone": "latest"},
    )
    g = {r["entity"]: (r["name"], r["city"], r["phone"]) for r in golden.collect()}
    assert len(g) == 5
    maria = g[ents[4]]
    assert maria == ("Maria Garcia", "Boston", "555-0202")  # NULL never overwrites
    rob = g[ents[1]]
    assert rob == ("Robert Smyth", "Austin", "555-0101")
