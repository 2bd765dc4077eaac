"""Dimensionality reduction: exact distributed PCA + seeded random
projection (operators/reduce.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from d2d_spark.operators.reduce import (
    PcaModel,
    fit_pca,
    project,
    random_project,
    random_projection_matrix,
)


def _planted_lowrank(n=1200, d=32, rank=4, noise=0.05, seed=7):
    """Data with `rank` strong directions + isotropic noise — PCA must
    find (almost) all variance in the top `rank` components."""
    rng = np.random.default_rng(seed)
    W = rng.standard_normal((rank, d))
    W /= np.linalg.norm(W, axis=1, keepdims=True)
    Z = rng.standard_normal((n, rank)) * np.linspace(8.0, 2.0, rank)
    X = Z @ W + noise * rng.standard_normal((n, d)) + rng.standard_normal(d)
    return X


def _df_of(spark, X, npart=8):
    rows = [(i, [float(v) for v in X[i]]) for i in range(len(X))]
    return spark.createDataFrame(rows, "id long, emb array<float>").repartition(npart)


def test_pca_recovers_planted_subspace(spark):
    X = _planted_lowrank()
    model = fit_pca(_df_of(spark, X), "emb", k=4)
    assert model.components.shape == (4, 32)
    # row-orthonormal components
    assert np.allclose(model.components @ model.components.T, np.eye(4), atol=1e-8)
    # the 4 planted directions carry nearly all variance
    assert model.explained_variance_ratio.sum() > 0.95
    # matches numpy's exact PCA on the same data (float32 storage in
    # the DataFrame quantizes the inputs — compare against the same
    # quantization, not the raw float64 matrix)
    Xq = X.astype(np.float32).astype(np.float64)
    cov = np.cov(Xq, rowvar=False)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    want_ratio = evals[:4] / np.trace(cov)
    assert np.allclose(model.explained_variance_ratio, want_ratio, rtol=1e-5)


def test_pca_deterministic_across_partitionings(spark):
    X = _planted_lowrank(n=600)
    m2 = fit_pca(_df_of(spark, X, npart=2), "emb", k=3)
    m16 = fit_pca(_df_of(spark, X, npart=16), "emb", k=3)
    assert np.allclose(m2.mean, m16.mean, atol=1e-9)
    assert np.allclose(m2.components, m16.components, atol=1e-7)


def test_pca_projection_preserves_neighbor_structure(spark):
    X = _planted_lowrank()
    df = _df_of(spark, X)
    model = fit_pca(df, "emb", k=4)
    out = project(df, "emb", model, out_col="red")
    rows = {r["id"]: np.array(r["red"]) for r in out.collect()}
    assert set(out.columns) == {"id", "red"}
    assert len(rows) == len(X)
    Y = np.stack([rows[i] for i in range(len(X))])
    # projection = centered GEMM, exactly
    Xq = X.astype(np.float32).astype(np.float64)
    want = (Xq - model.mean) @ model.components.T
    assert np.allclose(Y, want, atol=1e-8)
    # nearest-neighbor preservation: rank-4 data reduced to 4 dims
    # keeps nearly every nearest neighbor
    q = Xq[:50]
    d_full = ((q[:, None, :] - Xq[None, :, :]) ** 2).sum(-1)
    d_red = ((Y[:50, None, :] - Y[None, :, :]) ** 2).sum(-1)
    nn_full = np.argsort(d_full, axis=1)[:, 1]
    nn_red = np.argsort(d_red, axis=1)[:, 1]
    assert (nn_full == nn_red).mean() >= 0.9


def test_pca_validation(spark):
    X = _planted_lowrank(n=10)
    df = _df_of(spark, X, npart=2)
    with pytest.raises(ValueError, match="k must be"):
        fit_pca(df, "emb", k=33)
    with pytest.raises(ValueError, match="no vectors"):
        fit_pca(df.filter(F.col("id") < 0), "emb", k=2)
    ragged = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, 2.0, 3.0])], "id long, emb array<float>"
    )
    with pytest.raises(Exception, match="ragged"):
        fit_pca(ragged, "emb", k=1)
    # a NULL vector must fail with the named-column message, not a raw
    # numpy shape error deep in the kernel
    with_null = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None)], "id long, emb array<float>"
    ).repartition(1)
    with pytest.raises(Exception, match="NULL, ragged or non-numeric"):
        fit_pca(with_null, "emb", k=1)
    model = PcaModel(
        mean=np.zeros(2), components=np.eye(2), explained_variance_ratio=np.ones(2)
    )
    with pytest.raises(Exception, match="NULL, ragged or non-numeric"):
        project(with_null, "emb", model).collect()


def test_random_projection_jl_distances(spark):
    X = _planted_lowrank(n=400, d=64, rank=8)
    df = _df_of(spark, X)
    out = random_project(df, "emb", dim=64, k=24, seed=11, out_col="red")
    rows = {r["id"]: np.array(r["red"]) for r in out.collect()}
    Y = np.stack([rows[i] for i in range(len(X))])
    # JL estimator: squared distances preserved in expectation; with
    # k=24 the typical relative error is ~ sqrt(2/k) ~ 0.3
    Xq = X.astype(np.float32).astype(np.float64)
    idx = np.random.default_rng(0).integers(0, len(X), size=(300, 2))
    idx = idx[idx[:, 0] != idx[:, 1]]
    d_full = ((Xq[idx[:, 0]] - Xq[idx[:, 1]]) ** 2).sum(-1)
    d_red = ((Y[idx[:, 0]] - Y[idx[:, 1]]) ** 2).sum(-1)
    rel = np.abs(d_red - d_full) / d_full
    assert np.median(rel) < 0.35
    assert rel.mean() < 0.5


def test_random_projection_deterministic(spark):
    X = _planted_lowrank(n=100)
    df = _df_of(spark, X, npart=4)
    a = {r["id"]: np.array(r["red"]) for r in random_project(df, "emb", 32, 8, seed=3, out_col="red").collect()}
    b = {
        r["id"]: np.array(r["red"])
        for r in random_project(df.repartition(13), "emb", 32, 8, seed=3, out_col="red").collect()
    }
    # BLAS blocking varies with batch shape, so summation order (and
    # the last float ulps) can differ across partitionings — agreement
    # is to tolerance, same contract the module docstring states
    assert set(a) == set(b)
    assert all(np.allclose(a[i], b[i], atol=1e-9) for i in a)
    assert random_projection_matrix(32, 8, seed=3).shape == (8, 32)
    assert not np.allclose(random_projection_matrix(32, 8, 3), random_projection_matrix(32, 8, 4))


def test_reduced_vectors_feed_ann(spark):
    """End-to-end: reduce rank-6 64-dim vectors to 8 PCA dims, run the
    GEMM ANN path on the reduced column — top-5 neighbor sets should
    largely agree with full-dimension search. (The parquet fixture
    embeddings are near-isotropic — 16/64 dims hold only ~38% of
    variance — so geometry-preserving reduction is tested on data
    that HAS low-rank geometry, which is when you'd reach for PCA.)"""
    from d2d_spark.operators.similarity import gemm_topk

    X = _planted_lowrank(n=800, d=64, rank=6, noise=0.02)
    emb = _df_of(spark, X).withColumnRenamed("id", "vec_id").withColumnRenamed(
        "emb", "embedding"
    )
    model = fit_pca(emb, "embedding", k=8)
    assert model.explained_variance_ratio.sum() > 0.95
    red = project(emb, "embedding", model, out_col="embedding").cache()
    q_full = emb.filter(F.col("vec_id") < 5)
    q_red = red.filter(F.col("vec_id") < 5)
    full = gemm_topk(emb, q_full, "vec_id", "embedding", "vec_id", "embedding", k=5)
    reduced = gemm_topk(red, q_red, "vec_id", "embedding", "vec_id", "embedding", k=5)
    by_q_full: dict[int, set] = {}
    for r in full.collect():
        by_q_full.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    by_q_red: dict[int, set] = {}
    for r in reduced.collect():
        by_q_red.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    overlaps = [
        len(by_q_full[q] & by_q_red[q]) / 5 for q in by_q_full
    ]
    assert sum(overlaps) / len(overlaps) >= 0.6
    red.unpersist()


def test_pca_moment_collect_pre_reduced_many_partitions(spark):
    """With more partitions than _MAX_MOMENT_ROWS the driver collect
    is pre-reduced distributively — and the fit still matches a
    low-partition fit to float tolerance."""
    import numpy as np

    from d2d_spark.operators import reduce as R

    rng = np.random.default_rng(7)
    X = rng.standard_normal((400, 6))
    rows = [(i, x.tolist()) for i, x in enumerate(X)]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    wide = df.repartition(R._MAX_MOMENT_ROWS + 40)
    collected = R._partial_moment_rows(wide, "vec")
    assert len(collected) <= R._MAX_MOMENT_ROWS
    assert sum(r["n"] for r in collected) == 400
    m_wide = R.fit_pca(wide, "vec", 3)
    m_narrow = R.fit_pca(df.coalesce(2), "vec", 3)
    assert np.allclose(m_wide.mean, m_narrow.mean, atol=1e-9)
    assert np.allclose(np.abs(m_wide.components), np.abs(m_narrow.components), atol=1e-7)


def test_pca_whitening(spark):
    """Whitened projections have identity covariance; values match the
    numpy formula exactly; degenerate whitening refuses."""
    rng = np.random.default_rng(5)
    # anisotropic: stretch two directions very differently
    X = rng.normal(size=(500, 6)) @ np.diag([9.0, 4.0, 2.0, 1.0, 0.5, 0.1])
    df = _df_of(spark, X)
    model = fit_pca(df, "emb", k=3)
    out = {r["id"]: np.array(r["reduced"]) for r in
           project(df, "emb", model, whiten=True).collect()}
    Y = np.stack([out[i] for i in range(len(X))])
    # numpy twin of the folded matrix
    want = (X - model.mean) @ (model.components / np.sqrt(model.explained_variance)[:, None]).T
    assert np.allclose(Y, want, atol=1e-9)
    cov = np.cov(Y, rowvar=False)
    assert np.allclose(cov, np.eye(3), atol=0.05), cov
    # un-whitened output is NOT unit variance on this data
    raw = {r["id"]: np.array(r["reduced"]) for r in
           project(df, "emb", model).collect()}
    R = np.stack([raw[i] for i in range(len(X))])
    assert np.var(R[:, 0]) > 10 * np.var(R[:, 2])
    import pytest as _pt

    bare = PcaModel(mean=model.mean, components=model.components,
                    explained_variance_ratio=model.explained_variance_ratio)
    with _pt.raises(ValueError, match="explained_variance"):
        project(df, "emb", bare, whiten=True)
    # constant data: zero eigenvalues must refuse, not divide
    const = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0]) for i in range(4)], "id long, emb array<double>"
    )
    degen = fit_pca(const, "emb", k=2)
    with _pt.raises(ValueError, match="eigenvalue"):
        project(const, "emb", degen, whiten=True)
