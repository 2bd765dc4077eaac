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
