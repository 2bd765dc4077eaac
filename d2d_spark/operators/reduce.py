"""Embedding dimensionality reduction — PCA and Gaussian random
projection over an ``array<float>`` column.

Why it's here: every downstream embedding operator (ANN search,
semantic dedup, embedding near-dup pairs) pays O(d) per comparison
and O(d) per shuffled byte. Cutting d 64→16 before the pair stages
cuts GEMM flops and shuffle volume 4x with little recall loss when
the spectrum is concentrated — the standard pre-step large retrieval
systems apply before IVF/LSH indexing. Composes with
``functions.vectors.quantize_int8`` for a further 4x on storage.

Scale posture at 100 TB:

  fit_pca       — ONE map pass: each partition emits a single row of
                  sufficient statistics (n, sum(x), sum(x xT)); the
                  driver reduces #partitions such rows (bounded by
                  cluster parallelism, not data size) and runs a d x d
                  eigendecomposition (d = embedding width, hundreds at
                  most — microseconds). No iteration, no shuffle.
  project       — map-only Arrow GEMM per batch; the (k x d) model
                  rides the task closure. Zero shuffle, zero state.
  random_project — same kernel with a seeded matrix generated
                  identically on driver and in tests; no fit pass at
                  all (the JL guarantee is data-independent).

Determinism: partition partial sums are float64 and the driver
reduces them in partition order, so a fixed input layout reproduces
the fit bit-for-bit; across different partitionings the result agrees
to float tolerance (tests pin both). Component signs are normalized
(largest-|coordinate| entry positive) so eigenvector sign flips can't
leak into stored projections.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class PcaModel:
    """Fitted PCA: ``components`` is (k, d) row-orthonormal, ``mean``
    is (d,), ``explained_variance_ratio`` is (k,) of the TOTAL
    variance each component carries (sums to <= 1);
    ``explained_variance`` is the (k,) raw eigenvalues — what
    whitening divides by (None on hand-built models: whitening then
    refuses)."""

    mean: np.ndarray
    components: np.ndarray
    explained_variance_ratio: np.ndarray
    explained_variance: np.ndarray | None = None


#: moment rows collected to the driver are pre-reduced below this
#: fan-in: a 20k-partition corpus at d=512 would otherwise ship
#: O(partitions * d^2) doubles (~tens of GB) to the driver
_MAX_MOMENT_ROWS = 64


def _partial_moment_rows(df: DataFrame, vec_col: str) -> list:
    """One row of sufficient statistics per non-empty partition:
    (partition_id, n, sum_x flat, sum_xxT flat) — then, when the
    partition count exceeds ``_MAX_MOMENT_ROWS``, a second narrow
    stage (coalesce, no shuffle) sums the partials distributively so
    the driver collects O(d^2) doubles, not O(partitions * d^2).
    Within each coalesced group rows sum in partition order and the
    groups are consecutive pid ranges, so the fixed-layout
    reproducibility contract (sum in partition order) is preserved."""
    out_schema = T.StructType(
        [
            T.StructField("pid", T.IntegerType()),
            T.StructField("n", T.LongType()),
            T.StructField("sx", T.ArrayType(T.DoubleType())),
            T.StructField("sxx", T.ArrayType(T.DoubleType())),
        ]
    )

    def kernel(batches):
        from pyspark import TaskContext

        n = 0
        sx = None
        sxx = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            try:
                X = np.array(list(pdf[vec_col]), dtype=np.float64)
                if X.ndim != 2:  # an all-NULL batch parses as 1-D NaNs
                    raise ValueError("inhomogeneous vector widths")
            except (ValueError, TypeError) as e:
                raise ValueError(
                    f"fit_pca: NULL, ragged or non-numeric vectors in {vec_col!r} "
                    "— all embeddings must share one dimensionality"
                ) from e
            n += X.shape[0]
            bx = X.sum(axis=0)
            # widths must also agree ACROSS batches: += would either
            # raise a raw broadcast error or, for width 1, silently
            # broadcast garbage into the moments
            if sx is not None and bx.shape != sx.shape:
                raise ValueError(
                    f"fit_pca: ragged vectors in {vec_col!r} — batches disagree "
                    f"on dimensionality ({sx.shape[0]} vs {bx.shape[0]})"
                )
            bxx = X.T @ X
            sx = bx if sx is None else sx + bx
            sxx = bxx if sxx is None else sxx + bxx
        if n:
            pid = TaskContext.get().partitionId()
            yield pd.DataFrame(
                {"pid": [pid], "n": [n], "sx": [sx.tolist()], "sxx": [sxx.ravel().tolist()]}
            )

    def combine(batches):
        rows: list = []
        for pdf in batches:
            rows.extend(pdf.to_dict("records"))
        if not rows:
            return
        rows.sort(key=lambda r: r["pid"])
        d0 = len(rows[0]["sx"])
        if any(len(r["sx"]) != d0 for r in rows):
            raise ValueError(
                f"fit_pca: ragged vectors in {vec_col!r} — partitions disagree on "
                "dimensionality; all embeddings must share one width"
            )
        n = sum(int(r["n"]) for r in rows)
        sx = np.zeros(d0)
        sxx = np.zeros(d0 * d0)
        for r in rows:
            sx += np.asarray(r["sx"])
            sxx += np.asarray(r["sxx"])
        yield pd.DataFrame(
            {"pid": [rows[0]["pid"]], "n": [n], "sx": [sx.tolist()], "sxx": [sxx.tolist()]}
        )

    moments = df.select(vec_col).mapInPandas(kernel, out_schema)
    if df.rdd.getNumPartitions() > _MAX_MOMENT_ROWS:
        moments = moments.coalesce(_MAX_MOMENT_ROWS).mapInPandas(combine, out_schema)
    return moments.collect()


def fit_pca(df: DataFrame, vec_col: str, k: int) -> PcaModel:
    """Exact PCA of the full corpus (not a sample): covariance from
    one distributed moment pass, eigendecomposition on the driver.
    Requires every vector to share one dimensionality d and k <= d."""
    rows = sorted(_partial_moment_rows(df, vec_col), key=lambda r: r["pid"])
    if not rows:
        raise ValueError("fit_pca: input has no vectors")
    d = len(rows[0]["sx"])
    # a dimension mismatch ACROSS partitions surfaces here (within a
    # partition the moment kernel raises the same error)
    if any(len(r["sx"]) != d for r in rows):
        raise ValueError(
            f"fit_pca: ragged vectors in {vec_col!r} — partitions disagree on "
            "dimensionality; all embeddings must share one width"
        )
    if not 1 <= k <= d:
        raise ValueError(f"k must be in [1, {d}], got {k}")
    n = sum(r["n"] for r in rows)
    sx = np.zeros(d)
    sxx = np.zeros((d, d))
    for r in rows:
        sx += np.asarray(r["sx"])
        sxx += np.asarray(r["sxx"]).reshape(d, d)
    mean = sx / n
    if n < 2:
        raise ValueError("fit_pca needs at least 2 vectors")
    cov = (sxx - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    # sign convention: the largest-|coordinate| entry of each
    # component is positive — eigh's sign is arbitrary and would make
    # stored projections irreproducible across runs/libraries
    flip = np.sign(comps[np.arange(k), np.argmax(np.abs(comps), axis=1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    total_var = float(np.trace(cov))
    ratio = (evals[order] / total_var) if total_var > 0 else np.zeros(k)
    return PcaModel(
        mean=mean,
        components=comps,
        explained_variance_ratio=ratio,
        explained_variance=evals[order],
    )


def _project_kernel(vec_col: str, out_col: str, mean: np.ndarray, mat: np.ndarray, passthrough):
    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            try:
                X = np.array(list(pdf[vec_col]), dtype=np.float64)
                if X.ndim != 2:
                    raise ValueError("inhomogeneous vector widths")
            except (ValueError, TypeError) as e:
                raise ValueError(
                    f"project: NULL, ragged or non-numeric vectors in {vec_col!r} "
                    "— filter or impute them before projecting"
                ) from e
            Y = (X - mean) @ mat.T
            out = pdf[passthrough].copy()
            out[out_col] = list(Y)
            yield out

    return kernel


def _projected_schema(df: DataFrame, vec_col: str, out_col: str) -> tuple[list, T.StructType]:
    passthrough = [c for c in df.columns if c != vec_col]
    fields = [f for f in df.schema.fields if f.name != vec_col]
    schema = T.StructType(fields + [T.StructField(out_col, T.ArrayType(T.DoubleType()))])
    return passthrough, schema


def project(
    df: DataFrame,
    vec_col: str,
    model: PcaModel,
    out_col: str = "reduced",
    whiten: bool = False,
) -> DataFrame:
    """Replace ``vec_col`` with its k-dim PCA projection ``out_col``
    (all other columns pass through). Map-only; the model rides the
    closure (k*d + d doubles — a few KB).

    ``whiten=True`` additionally scales each component coordinate by
    1/sqrt(eigenvalue), giving the output identity covariance — the
    standard preprocessing before cosine/L2 similarity on anisotropic
    embedding spaces (and before ZCA). Folded into the projection
    matrix on the driver, so the executor-side cost is identical.
    Refuses degenerate components (eigenvalue <= 0 or a hand-built
    model without eigenvalues): whitening would divide by ~0 and
    amplify pure noise."""
    passthrough, schema = _projected_schema(df, vec_col, out_col)
    mat = model.components
    if whiten:
        ev = model.explained_variance
        if ev is None:
            raise ValueError(
                "project(whiten=True) needs a model with explained_variance "
                "(fit_pca provides it)"
            )
        if np.any(ev <= 0):
            raise ValueError(
                "project(whiten=True): some selected components have "
                "eigenvalue <= 0 — whitening would divide by zero; reduce k"
            )
        mat = mat / np.sqrt(ev)[:, None]
    kernel = _project_kernel(vec_col, out_col, model.mean, mat, passthrough)
    return df.mapInPandas(kernel, schema)


def random_projection_matrix(dim: int, k: int, seed: int = 0) -> np.ndarray:
    """Seeded Gaussian (k, d) projection scaled by 1/sqrt(k) so
    squared distances are preserved in expectation (the
    Johnson-Lindenstrauss estimator). Same seed -> same matrix on any
    host: it IS the model, no fit pass needed."""
    if not 1 <= k:
        raise ValueError(f"k must be >= 1, got {k}")
    rng = np.random.default_rng(seed)
    return rng.standard_normal((k, dim)) / np.sqrt(k)


def random_project(
    df: DataFrame, vec_col: str, dim: int, k: int, seed: int = 0, out_col: str = "reduced"
) -> DataFrame:
    """Data-independent dimensionality reduction: project onto a
    seeded Gaussian matrix. ``dim`` is passed explicitly (reading it
    from the data would cost a job; the caller knows its embedding
    width). Distance distortion follows the JL bound — pick
    k ~ O(log n / eps^2) for eps-accurate pairwise distances."""
    mat = random_projection_matrix(dim, k, seed)
    passthrough, schema = _projected_schema(df, vec_col, out_col)
    kernel = _project_kernel(vec_col, out_col, np.zeros(dim), mat, passthrough)
    return df.mapInPandas(kernel, schema)
