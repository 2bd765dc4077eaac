"""Semantic (SemDeDup-style) dedup: planted-clone recall, exact
precision, cell-split behavior, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from d2d_spark.operators.semantic import assign_cells, semantic_dedup, semantic_near_pairs
from d2d_spark.session import read_table

N_CLONES = 20
OFFSET = 100_000


@pytest.fixture(scope="module")
def planted(spark, sf_dir):
    """Embeddings fixture + N_CLONES scaled copies (scaling preserves
    direction, so each clone has cosine 1.0 with its source and the
    pair is a guaranteed semantic duplicate)."""
    e = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    clones = (
        e.orderBy("vec_id")
        .limit(N_CLONES)
        .select(
            (F.col("vec_id") + OFFSET).alias("vec_id"),
            F.transform("embedding", lambda x: x * F.lit(1.01)).alias("embedding"),
        )
    )
    return e.unionByName(clones)


def test_planted_clones_found_and_removed(planted):
    pairs = semantic_near_pairs(
        planted, "vec_id", "embedding", threshold=0.999, n_centroids=16, sample=1000
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # identical-direction vectors share an argmax cell, so every
    # planted pair must be recalled
    planted_ids = [r.vec_id for r in planted.orderBy("vec_id").limit(N_CLONES).collect()]
    expect = {(i, i + OFFSET) for i in planted_ids}
    assert expect <= got, f"missing planted pairs: {expect - got}"

    survivors = semantic_dedup(
        planted, "vec_id", "embedding", threshold=0.999, n_centroids=16, sample=1000
    )
    ids = {r.vec_id for r in survivors.select("vec_id").collect()}
    # every clone (min-id rule keeps the original) must be gone
    assert all(i + OFFSET not in ids for i in planted_ids)
    assert all(i in ids for i in planted_ids)


def test_precision_exact_cosine(planted):
    """Every reported pair really has cosine >= threshold (recomputed
    driver-side)."""
    import numpy as np

    pairs = semantic_near_pairs(
        planted, "vec_id", "embedding", threshold=0.999, n_centroids=16, sample=1000
    ).collect()
    vecs = {r.vec_id: np.array(r.embedding) for r in planted.collect()}
    for p in pairs:
        a, b = vecs[p.id_a], vecs[p.id_b]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos >= 0.999 - 1e-9
        assert abs(cos - p.cos_sim) < 1e-6


def test_cell_split_bounds_and_preserves_clones(planted):
    """A tiny max_cell forces sub-splitting; identical-direction pairs
    still land together (same sign projection), and no unsplit cell id
    collides with a split shard id."""
    cells = assign_cells(
        planted.select(F.col("vec_id").alias("__id"), F.col("embedding").alias("__v")),
        "__id",
        "__v",
        n_centroids=8,
        sample=1000,
        max_cell=10,
        split_bits=3,
    )
    rows = cells.select("__id", "cell").collect()
    by_id = {r["__id"]: r["cell"] for r in rows}
    planted_ids = [r.vec_id for r in planted.orderBy("vec_id").limit(N_CLONES).collect()]
    for i in planted_ids:
        assert by_id[i] == by_id[i + OFFSET], "clone split away from its source"
    from collections import Counter

    sizes = Counter(r.cell for r in rows)
    # every original (pre-split) cell id that survives is < n_centroids;
    # shards are >= n_centroids — disjoint ranges
    assert all(c >= 8 or sizes[c] <= 10 for c in sizes), "unsplit cell above max_cell"

    pairs = semantic_near_pairs(
        planted,
        "vec_id",
        "embedding",
        threshold=0.999,
        n_centroids=8,
        sample=1000,
        max_cell=10,
        split_bits=3,
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert {(i, i + OFFSET) for i in planted_ids} <= got


def test_deterministic(planted):
    a = sorted(
        (r.id_a, r.id_b)
        for r in semantic_near_pairs(
            planted, "vec_id", "embedding", threshold=0.99, n_centroids=16, sample=1000
        ).collect()
    )
    b = sorted(
        (r.id_a, r.id_b)
        for r in semantic_near_pairs(
            planted, "vec_id", "embedding", threshold=0.99, n_centroids=16, sample=1000
        ).collect()
    )
    assert a == b
