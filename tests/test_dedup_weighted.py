"""weighted_jaccard_pairs — exact sum-of-min weighted Jaccard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from d2d_spark.operators.dedup import weighted_jaccard_pairs


def _wdf(spark, rows):
    return spark.createDataFrame(rows, "id long, tok string, w long")


def test_weighted_jaccard_matches_naive(spark):
    """Every returned pair and every size/overlap equals a dict replay
    of sum-min / sum-max over the same weighted profiles."""
    profiles = {
        1: {"a": 4, "b": 2, "c": 1},
        2: {"a": 3, "b": 3, "d": 2},
        3: {"a": 1, "x": 9},
        4: {"a": 4, "b": 2, "c": 1},  # exact clone of 1
    }
    rows = [(i, t, w) for i, p in profiles.items() for t, w in p.items()]
    got = {
        (r["id_a"], r["id_b"]): (r["w_shared"], r["w_a"], r["w_b"])
        for r in weighted_jaccard_pairs(
            _wdf(spark, rows), "id", "tok", "w", threshold_pct=30, max_df=None
        ).collect()
    }
    want = {}
    ids = sorted(profiles)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            pa, pb = profiles[ids[x]], profiles[ids[y]]
            mn = sum(min(pa.get(t, 0), pb.get(t, 0)) for t in set(pa) | set(pb))
            mx = sum(max(pa.get(t, 0), pb.get(t, 0)) for t in set(pa) | set(pb))
            if 100 * mn >= 30 * mx:
                want[(ids[x], ids[y])] = (mn, sum(pa.values()), sum(pb.values()))
    assert got == want
    # the planted clone is a 100%-threshold pair; an unrelated doc is not
    full = {
        (r["id_a"], r["id_b"])
        for r in weighted_jaccard_pairs(
            _wdf(spark, rows), "id", "tok", "w", threshold_pct=100, max_df=None
        ).collect()
    }
    assert full == {(1, 4)}


def test_weighted_jaccard_df_cap_consistency(spark):
    """A capped stop-token leaves BOTH the overlap and the sizes (the
    winnow convention) — a pair can still reach 100% on what remains."""
    rows = [
        (1, "stop", 50), (1, "rare", 2),
        (2, "stop", 50), (2, "rare", 2),
        (3, "stop", 50), (3, "other", 7),
    ]
    out = {
        (r["id_a"], r["id_b"]): (r["w_shared"], r["w_a"], r["w_b"])
        for r in weighted_jaccard_pairs(
            _wdf(spark, rows), "id", "tok", "w", threshold_pct=100, max_df=2
        ).collect()
    }
    # 'stop' has df 3 > 2 -> dropped everywhere; (1,2) share all of 'rare'
    assert out == {(1, 2): (2, 2, 2)}


def test_weighted_jaccard_weights_matter(spark):
    """Same token SETS, different weights: the unweighted Jaccard is 1
    but the weighted measure is low — the case the operator exists for."""
    rows = [(1, "a", 10), (1, "b", 1), (2, "a", 1), (2, "b", 10)]
    out = weighted_jaccard_pairs(
        _wdf(spark, rows), "id", "tok", "w", threshold_pct=50, max_df=None
    ).collect()
    assert out == []  # min-sum 2 vs max-sum 20 -> 10%
    low = weighted_jaccard_pairs(
        _wdf(spark, rows), "id", "tok", "w", threshold_pct=10, max_df=None
    ).collect()
    assert [(r["w_shared"], r["w_a"], r["w_b"]) for r in low] == [(2, 11, 11)]


def test_weighted_jaccard_validation(spark):
    ok = _wdf(spark, [(1, "a", 1)])
    with pytest.raises(ValueError, match="threshold_pct"):
        weighted_jaccard_pairs(ok, "id", "tok", "w", threshold_pct=0)
    with pytest.raises(ValueError, match="max_df"):
        weighted_jaccard_pairs(ok, "id", "tok", "w", max_df=1)
    with pytest.raises(ValueError, match="non-positive"):
        weighted_jaccard_pairs(_wdf(spark, [(1, "a", 0)]), "id", "tok", "w")
    with pytest.raises(ValueError, match="duplicate"):
        weighted_jaccard_pairs(
            _wdf(spark, [(1, "a", 1), (1, "a", 2)]), "id", "tok", "w"
        )


def test_weighted_jaccard_all_ones_equals_set_jaccard(spark, sf_dir):
    """With unit weights the measure degrades to plain set Jaccard —
    checked on real fixture tokens against a Python set replay."""
    from d2d_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 200 == 0
    )
    from d2d_spark.functions.text import tokens_ws

    toks = (
        docs.select(
            "doc_id", F.explode(tokens_ws(F.lower(F.col("text")))).alias("tok")
        )
        .filter(F.col("tok") != "")
        .distinct()
        .withColumn("w", F.lit(1))
    )
    got = {
        (r["id_a"], r["id_b"]): (r["w_shared"], r["w_a"], r["w_b"])
        for r in weighted_jaccard_pairs(
            toks, "doc_id", "tok", "w", threshold_pct=20, max_df=None
        ).collect()
    }
    sets = {
        r["doc_id"]: set(r["ts"])
        for r in toks.groupBy("doc_id").agg(F.collect_set("tok").alias("ts")).collect()
    }
    ids = sorted(sets)
    want = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = sets[ids[x]], sets[ids[y]]
            mn, mx = len(a & b), len(a | b)
            if 100 * mn >= 20 * mx:
                want[(ids[x], ids[y])] = (mn, len(a), len(b))
    assert got == want


# ---------------------------------------------------------------------------
# weighted_minhash_lsh_pairs (approximate candidate arm, exact verify)
# ---------------------------------------------------------------------------
def test_weighted_minhash_clones_certain_and_scores_exact(spark):
    """Identical profiles band identically in EVERY band, so clone
    recall is certain — and every reported score equals the exact
    join's (the verify runs on true weights)."""
    from d2d_spark.operators.dedup import weighted_minhash_lsh_pairs

    profiles = {i: {f"t{j}": (i + j) % 5 + 1 for j in range(12)} for i in range(20)}
    profiles.update({100 + i: dict(profiles[i]) for i in range(8)})  # clones
    rows = [(i, t, w) for i, p in profiles.items() for t, w in p.items()]
    df = _wdf(spark, rows)
    got = weighted_minhash_lsh_pairs(
        df, "id", "tok", "w", threshold_pct=100, num_hashes=32, bands=16
    )
    pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    assert {(i, 100 + i) for i in range(8)} <= pairs
    exact = {
        (r["id_a"], r["id_b"]): (r["w_shared"], r["w_a"], r["w_b"])
        for r in weighted_jaccard_pairs(
            df, "id", "tok", "w", threshold_pct=100, max_df=None
        ).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): (r["w_shared"], r["w_a"], r["w_b"])
        for r in got.collect()
    }
    for pr, v in lsh.items():
        assert exact[pr] == v


def test_weighted_minhash_recall_and_precision_vs_exact(spark):
    """On a seeded near-dup fixture the banded candidates recover
    almost all true >=50% pairs (r=2, b=16 -> ~99% per-pair recall at
    J=0.5) and NEVER report a pair the exact join would not."""
    import random

    from d2d_spark.operators.dedup import weighted_minhash_lsh_pairs

    rng = random.Random(7)
    base = {f"w{j}": rng.randrange(1, 6) for j in range(30)}
    profiles = {}
    for i in range(30):
        p = dict(base)
        for _ in range(rng.randrange(0, 8)):  # perturb a few weights
            p[f"w{rng.randrange(30)}"] = rng.randrange(1, 6)
        profiles[i] = p
    for i in range(30, 60):  # unrelated docs
        profiles[i] = {f"u{i}_{j}": rng.randrange(1, 6) for j in range(20)}
    rows = [(i, t, w) for i, p in profiles.items() for t, w in p.items()]
    df = _wdf(spark, rows)
    truth = {
        (r["id_a"], r["id_b"])
        for r in weighted_jaccard_pairs(
            df, "id", "tok", "w", threshold_pct=50, max_df=None
        ).collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in weighted_minhash_lsh_pairs(
            df, "id", "tok", "w", threshold_pct=50, num_hashes=32, bands=16
        ).collect()
    }
    assert got <= truth  # exact verify -> no false positives, ever
    assert truth, "fixture produced no true pairs"
    assert len(got) >= 0.9 * len(truth), (len(got), len(truth))


def test_weighted_minhash_determinism_and_guards(spark):
    from d2d_spark.operators.dedup import weighted_minhash_lsh_pairs

    rows = [(1, "a", 3), (1, "b", 1), (2, "a", 3), (2, "b", 1), (3, "c", 9)]
    df = _wdf(spark, rows)
    one = {tuple(r) for r in weighted_minhash_lsh_pairs(df, "id", "tok", "w").collect()}
    two = {
        tuple(r)
        for r in weighted_minhash_lsh_pairs(df.repartition(7), "id", "tok", "w").collect()
    }
    assert one == two == {(1, 2, 4, 4, 4)}
    import pytest as pt

    with pt.raises(ValueError, match="replicas"):
        weighted_minhash_lsh_pairs(
            _wdf(spark, [(1, "a", 99999)]), "id", "tok", "w", max_replicas_per_token=10
        )
    with pt.raises(ValueError, match="divide"):
        weighted_minhash_lsh_pairs(df, "id", "tok", "w", num_hashes=30, bands=16)
    # negative/zero bands would silently emit zero candidates / divide
    # by zero — both must refuse loudly
    with pt.raises(ValueError, match="bands"):
        weighted_minhash_lsh_pairs(df, "id", "tok", "w", bands=-16)
    with pt.raises(ValueError, match="bands"):
        weighted_minhash_lsh_pairs(df, "id", "tok", "w", bands=0)
    with pt.raises(ValueError, match="resolution"):
        weighted_minhash_lsh_pairs(df, "id", "tok", "w", resolution=0)
    with pt.raises(ValueError, match="NULL id/token"):
        weighted_jaccard_pairs(
            spark.createDataFrame([(1, None, 1)], "id long, tok string, w long"),
            "id", "tok", "w",
        )


# ---------- weighted_cosine_pairs ----------


def test_weighted_cosine_matches_naive(spark):
    """Every returned pair, dot, norm and the selection itself equal a
    dict replay using exact Fraction threshold arithmetic."""
    from fractions import Fraction

    from d2d_spark.operators.dedup import weighted_cosine_pairs

    profiles = {
        1: {"a": 4, "b": 2, "c": 1},
        2: {"a": 3, "b": 3, "d": 2},
        3: {"a": 1, "x": 9},
        4: {"a": 4, "b": 2, "c": 1},   # exact clone of 1
        5: {"a": 8, "b": 4, "c": 2},   # 2x-scaled clone of 1
    }
    rows = [(i, t, w) for i, p in profiles.items() for t, w in p.items()]
    for tp in (36, 60, 90, 100):
        got = {
            (r["id_a"], r["id_b"]): (r["dot"], r["nsq_a"], r["nsq_b"])
            for r in weighted_cosine_pairs(
                _wdf(spark, rows), "id", "tok", "w", threshold_pct=tp, max_df=None
            ).collect()
        }
        want = {}
        ids = sorted(profiles)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                pa, pb = profiles[ids[x]], profiles[ids[y]]
                dot = sum(pa[t] * pb.get(t, 0) for t in pa)
                na = sum(w * w for w in pa.values())
                nb = sum(w * w for w in pb.values())
                # exact rational comparison: cos >= tp/100
                if Fraction(10_000 * dot * dot, na * nb) >= Fraction(tp * tp):
                    want[(ids[x], ids[y])] = (dot, na, nb)
        assert got == want, tp
    # scale invariance: the 2x clone pairs with its source at 100%
    # (weighted Jaccard would score it 21/42 = 0.5)
    full = weighted_cosine_pairs(
        _wdf(spark, rows), "id", "tok", "w", threshold_pct=100, max_df=None
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in full}
    assert {(1, 4), (1, 5), (4, 5)} <= pairs
    for r in full:
        assert r["cos_sim"] == 1.0  # exact: sqrt of a perfect square


def test_weighted_cosine_exact_boundary(spark):
    """A pair sitting EXACTLY at the threshold is kept (>=), decided
    by integer arithmetic, not float luck: cos = 9/25 = 0.36."""
    from d2d_spark.operators.dedup import weighted_cosine_pairs

    rows = [(1, "x", 3), (1, "y", 4), (2, "x", 3), (2, "z", 4)]
    at = weighted_cosine_pairs(
        _wdf(spark, rows), "id", "tok", "w", threshold_pct=36, max_df=None
    ).collect()
    assert [(r["id_a"], r["id_b"], r["dot"]) for r in at] == [(1, 2, 9)]
    assert at[0]["cos_sim"] == 9 / 25
    above = weighted_cosine_pairs(
        _wdf(spark, rows), "id", "tok", "w", threshold_pct=37, max_df=None
    ).collect()
    assert above == []


def test_weighted_cosine_df_cap_and_validation(spark):
    from d2d_spark.operators.dedup import weighted_cosine_pairs

    # 'a' appears in 3 profiles -> max_df=2 removes it from dot AND norms
    rows = [
        (1, "a", 2), (1, "b", 3),
        (2, "a", 2), (2, "b", 3),
        (3, "a", 5), (3, "c", 1),
    ]
    got = weighted_cosine_pairs(
        _wdf(spark, rows), "id", "tok", "w", threshold_pct=50, max_df=2
    ).collect()
    # only b survives for 1,2 -> cos(1,2) = 9/(3*3) = 1.0
    assert [(r["id_a"], r["id_b"], r["dot"], r["nsq_a"], r["nsq_b"]) for r in got] == [
        (1, 2, 9, 9, 9)
    ]
    with pytest.raises(ValueError, match="threshold_pct"):
        weighted_cosine_pairs(_wdf(spark, rows), "id", "tok", "w", threshold_pct=0)
    with pytest.raises(ValueError, match="max_df"):
        weighted_cosine_pairs(_wdf(spark, rows), "id", "tok", "w", max_df=1)
    with pytest.raises(ValueError, match="non-positive"):
        weighted_cosine_pairs(
            _wdf(spark, rows + [(9, "q", 0)]), "id", "tok", "w"
        ).collect()
    with pytest.raises(ValueError, match="duplicate"):
        weighted_cosine_pairs(
            _wdf(spark, rows + [(1, "a", 7)]), "id", "tok", "w"
        ).collect()
    # the exact integer cut rides ANSI overflow semantics: with ANSI
    # off a DECIMAL(38,0) overflow becomes NULL and pairs would drop
    # silently — the operator refuses up front instead
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        with pytest.raises(ValueError, match="ansi"):
            weighted_cosine_pairs(_wdf(spark, rows), "id", "tok", "w")
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)
    # fractional weights never take the decimal arm: no ANSI demand
    frac = spark.createDataFrame(
        [(1, "a", 1.5), (2, "a", 2.5)], "id long, tok string, w double"
    )
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        assert weighted_cosine_pairs(frac, "id", "tok", "w").count() == 1
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)


def test_weighted_cosine_partitioning_invariant(spark):
    from d2d_spark.operators.dedup import weighted_cosine_pairs

    rows = [(i, f"t{j}", (i * 7 + j * 3) % 5 + 1) for i in range(12) for j in range(8)]
    outs = []
    for n_parts in (1, 7):
        df = _wdf(spark, rows).repartition(n_parts)
        outs.append(
            sorted(
                map(
                    tuple,
                    weighted_cosine_pairs(
                        df, "id", "tok", "w", threshold_pct=80, max_df=None
                    ).collect(),
                )
            )
        )
    assert outs[0] == outs[1] and outs[0]


def test_weighted_cosine_fractional_weights_respect_threshold(spark):
    """tf-idf-style fractional weights: the cut must still honor the
    threshold (the exact-integer path would quantize 0.3 -> 0 and
    pass EVERYTHING)."""
    from d2d_spark.operators.dedup import weighted_cosine_pairs

    rows = [
        (1, "a", 0.3), (1, "b", 0.4),
        (2, "a", 0.3), (2, "c", 0.4),   # cos(1,2) = .09/.25 = 0.36
        (3, "b", 0.4), (3, "d", 0.3),   # cos(1,3) = .16/.25 = 0.64
    ]
    df = spark.createDataFrame(rows, "id long, tok string, w double")
    got = {(r["id_a"], r["id_b"]) for r in weighted_cosine_pairs(
        df, "id", "tok", "w", threshold_pct=50, max_df=None
    ).collect()}
    assert got == {(1, 3)}
    low = {(r["id_a"], r["id_b"]) for r in weighted_cosine_pairs(
        df, "id", "tok", "w", threshold_pct=30, max_df=None
    ).collect()}
    assert low == {(1, 2), (1, 3)}
