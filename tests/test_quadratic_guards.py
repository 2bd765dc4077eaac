"""The quadratic ground-truth operators must refuse unbounded inputs
(cartesian blowups at scale) and the banded scale paths must agree
with them on bounded fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from d2d_spark.operators.dedup import (
    embedding_near_pairs,
    fuzzy_pairs_deletion,
    fuzzy_pairs_lsh,
    levenshtein_pairs,
    ngram_jaccard_pairs,
)
from d2d_spark.session import read_table


def test_ngram_jaccard_refuses_unbounded_input(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="crossJoin"):
        ngram_jaccard_pairs(d, "text", "doc_id", cap=10)


def test_embedding_pairs_refuses_unbounded_input(spark, sf_dir):
    e = read_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="banded path"):
        embedding_near_pairs(e, "vec_id", "embedding", threshold=0.45, cap=10)


def test_levenshtein_pairs_refuses_unbounded_input(spark, sf_dir):
    p = read_table(spark, sf_dir, "part")
    with pytest.raises(ValueError, match="allow_quadratic"):
        levenshtein_pairs(p, "p_name", "p_partkey", cap=10)


def test_guard_probe_is_bounded(spark, sf_dir):
    """ADVICE r2: the guard probes limit(cap+1), never a full scan of
    the input it protects — the executed plan carries the limit."""
    from unittest import mock

    from d2d_spark.operators import dedup as dd

    d = read_table(spark, sf_dir, "documents")
    with mock.patch.object(
        d.__class__, "limit", autospec=True, side_effect=d.__class__.limit
    ) as lim:
        with pytest.raises(ValueError):
            dd._guard_quadratic(d, "probe-test", False, 10)
        assert any(c.args[1] == 11 for c in lim.call_args_list)


def test_minhash_token_cache_cap_is_correctness_neutral(spark, sf_dir):
    """ADVICE r2: a thrashing (tiny) token cache must yield identical
    signatures — the cap only bounds memory, never results."""
    from d2d_spark.operators.dedup import _minhash_signature_arrow

    d = read_table(spark, sf_dir, "documents").limit(40).select("doc_id", "text")
    big = _minhash_signature_arrow(d, "text", num_hashes=16, shingle_n=3)
    tiny = _minhash_signature_arrow(d, "text", num_hashes=16, shingle_n=3, token_cache_cap=4)
    g = {r.doc_id: tuple(r.minhash) for r in big.collect()}
    t = {r.doc_id: tuple(r.minhash) for r in tiny.collect()}
    assert g == t


def test_allow_quadratic_opt_in_still_works(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents").limit(30)
    out = ngram_jaccard_pairs(d, "text", "doc_id", allow_quadratic=True, cap=10)
    assert out.columns == ["id_a", "id_b", "jaccard"]
    out.count()  # plan executes


def test_fuzzy_deletion_matches_quadratic_on_slice(spark, sf_dir):
    """The deletion-neighborhood path (FastSS) has guaranteed recall
    for ed <= d and an exact verify, so it must EQUAL the quadratic
    baseline — not just approximate it."""
    p = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 200)
        .select("p_partkey", "p_name")
    )
    exact = {
        (r.id_a, r.id_b, r.dist)
        for r in levenshtein_pairs(p, "p_name", "p_partkey", max_dist=2).collect()
    }
    dele = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs_deletion(p, "p_name", "p_partkey", max_dist=2).collect()
    }
    assert exact, "fixture slice should contain fuzzy-match pairs"
    assert dele == exact


def test_fuzzy_lsh_recall_on_slice(spark, sf_dir):
    """The char-shingle LSH path is probabilistic (tuned for longer
    strings than these 8-12 char fixture names — each edit dirties
    ~3 of only ~8 shingles); verify is exact so precision is 1.0,
    and recall on the hardest-case fixture must stay useful."""
    p = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 200)
        .select("p_partkey", "p_name")
    )
    exact = {
        (r.id_a, r.id_b)
        for r in levenshtein_pairs(p, "p_name", "p_partkey", max_dist=2).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in fuzzy_pairs_lsh(p, "p_name", "p_partkey", max_dist=2).collect()
    }
    assert lsh <= exact  # exact verify => precision 1.0
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.5, f"fuzzy LSH recall {recall:.2f}"


def test_soundex_python_twin_parity(spark, sf_dir):
    """The oracle's Python soundex must equal F.soundex bit-for-bit —
    fixture names plus the published edge cases (H/W pass-through,
    non-alpha, empty, unicode)."""
    from pyspark.sql import functions as F

    from d2d_spark.plans.relational import _soundex_py

    crafted = [
        "Robert", "Rupert", "Ashcraft", "Ashcroft", "Tymczak", "Pfister",
        "Honeyman", "Aa", "123", "O'Brien", "Müller", "WWW", "hw",
        "chartreuse lemon", "x", "HWHW",
        # the separator-reset class: same-code consonants across a
        # word boundary must CODE AGAIN (Spark resets prev on any
        # non-letter; a naive strip-non-alpha twin suppresses them)
        "tan navy", "plum magenta", "dim dim", "rr rr", "an-na",
        "3m company", " leading", "a  b", "mc-mc", "s s s s",
        "tan  navy", "TANNAVY", "tan'navy", "Van Der Berg",
    ]
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select("p_name").limit(500)
    names = [r["p_name"] for r in p.collect()] + crafted
    df = spark.createDataFrame([(n,) for n in names], "s string")
    got = {r["s"]: r["sx"] for r in df.select("s", F.soundex("s").alias("sx")).collect()}
    for n in names:
        assert got[n] == _soundex_py(n), n


def test_phonetic_blocked_pairs_semantics(spark):
    import pytest as pt
    from pyspark.sql import functions as F

    from d2d_spark.operators.dedup import phonetic_blocked_pairs

    rows = [
        (1, "Robert"), (2, "Rupert"),       # same code R163, dist 2
        (3, "Roberto"),                      # R163, dist 1 to Robert
        (4, "Bobert"),                       # first-letter typo: B163 block — missed
        (5, "Smith"), (6, "Smyth"),          # S530, dist 1
        (7, None),                           # NULL name never pairs
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {(r["id_a"], r["id_b"]): (r["dist"], r["code"])
           for r in phonetic_blocked_pairs(df, "name", "id", max_dist=2).collect()}
    assert got == {
        (1, 2): (2, "R163"),
        (1, 3): (1, "R163"),
        (5, 6): (1, "S530"),
    }  # (2,3) Rupert/Roberto dist 3 exceeds; Bobert blocked away; NULL out
    # block-bomb refusal
    many = spark.createDataFrame([(i, "Smith") for i in range(10)], "id long, name string")
    with pt.raises(ValueError, match="max_block"):
        phonetic_blocked_pairs(many, "name", "id", max_block=5)
    with pt.raises(ValueError, match="max_dist"):
        phonetic_blocked_pairs(df, "name", "id", max_dist=-1)
    # exact-match mode: max_dist=0 keeps only identical names
    dup = spark.createDataFrame([(1, "Jon"), (2, "Jon"), (3, "John")], "id long, name string")
    got0 = {(r["id_a"], r["id_b"]) for r in
            phonetic_blocked_pairs(dup, "name", "id", max_dist=0).collect()}
    assert got0 == {(1, 2)}


def test_phonetic_blocked_recall_vs_fastss(spark, sf_dir):
    """On the fixture slice, soundex blocking finds a SUBSET of the
    FastSS ground truth (blocking trades recall), with precision 1.0
    (every pair it emits is a true <=2-dist pair)."""
    from pyspark.sql import functions as F

    from d2d_spark.operators.dedup import fuzzy_pairs_deletion, phonetic_blocked_pairs

    p = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .filter(F.col("p_partkey") <= 200)
        .select("p_partkey", "p_name")
    )
    truth = {(r["id_a"], r["id_b"], r["dist"])
             for r in fuzzy_pairs_deletion(p, "p_name", "p_partkey", max_dist=2).collect()}
    blocked = {(r["id_a"], r["id_b"], r["dist"])
               for r in phonetic_blocked_pairs(p, "p_name", "p_partkey", max_dist=2).collect()}
    assert blocked <= truth


def test_phonetic_verify_spreads_past_input_layout(spark):
    """r11: the within-block Levenshtein verify must NOT inherit a
    compact source's partitioning (one scan partition = one task doing
    all the quadratic work). The probe side is spread by (code, id)
    into defaultParallelism partitions, and the pair set is invariant
    under the input's partitioning."""
    from d2d_spark.operators.dedup import phonetic_blocked_pairs

    rows = [(i, n) for i, n in enumerate(
        ["Robert", "Rupert", "Roberto", "Smith", "Smyth", "Smithe",
         "Jon", "John", "Jhon", "Lara", "Laura", "Larra"] * 4
    )]
    one_part = spark.createDataFrame(rows, "id long, name string").coalesce(1)
    out = phonetic_blocked_pairs(one_part, "name", "id", max_dist=2)
    # the verify's partitioning tracks the cluster, not the one-file scan
    assert out.rdd.getNumPartitions() >= min(
        spark.sparkContext.defaultParallelism, 2
    )
    got1 = {(r["id_a"], r["id_b"], r["dist"]) for r in out.collect()}
    many = spark.createDataFrame(rows, "id long, name string").repartition(7)
    got7 = {(r["id_a"], r["id_b"], r["dist"]) for r in phonetic_blocked_pairs(
        many, "name", "id", max_dist=2
    ).collect()}
    assert got1 == got7 and got1  # same pairs either way, and non-empty


def test_phonetic_broadcast_guard_is_byte_aware(spark, monkeypatch):
    """r12 (ADVICE): the deliberate broadcast must measure the SAME
    frame it ships (NULL-coded rows are filtered before both the probe
    and the build side), and it is gated on estimated BYTES as well as
    rows — past the byte cap the plain equi-join stands (no forced
    spread, Catalyst picks the strategy) with identical pairs."""
    from d2d_spark.operators import dedup as dd

    rows = [(i, n) for i, n in enumerate(
        ["Robert", "Rupert", "Roberto", "Smith", "Smyth", "Jon", "John"] * 3
    )] + [(1000 + i, None) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, name string").coalesce(1)
    hinted = dd.phonetic_blocked_pairs(df, "name", "id", max_dist=2)
    got_hinted = {(r["id_a"], r["id_b"], r["dist"]) for r in hinted.collect()}
    # the forced-broadcast path spreads the probe side past the 1-file
    # scan layout; with the byte cap exceeded the spread must NOT fire
    assert hinted.rdd.getNumPartitions() >= min(
        spark.sparkContext.defaultParallelism, 2
    )
    monkeypatch.setattr(dd, "_FORCED_BROADCAST_MAX_BYTES", 1)
    plain = dd.phonetic_blocked_pairs(df, "name", "id", max_dist=2)
    got_plain = {(r["id_a"], r["id_b"], r["dist"]) for r in plain.collect()}
    assert got_plain == got_hinted and got_plain
    # the build side a NULL-heavy frame would have smuggled into the
    # broadcast is filtered: the optimized plan carries the code
    # NULL-filter on both sides of the join
    opt = hinted._jdf.queryExecution().optimizedPlan().toString()
    assert opt.lower().count("isnotnull(soundex") >= 2 or \
        opt.lower().count("isnotnull(__code") >= 2


def test_phonetic_null_names_are_not_a_block_bomb(spark):
    from d2d_spark.operators.dedup import phonetic_blocked_pairs

    rows = [(i, None) for i in range(20)] + [(100, "Smith"), (101, "Smyth")]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {(r["id_a"], r["id_b"]) for r in phonetic_blocked_pairs(
        df, "name", "id", max_dist=2, max_block=10
    ).collect()}
    assert got == {(100, 101)}  # NULL pile ignored, real pair found
