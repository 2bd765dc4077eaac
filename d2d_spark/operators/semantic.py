"""SemDeDup-style semantic deduplication over embedding columns.

Near-duplicate *meaning* (paraphrases, template rewrites, boilerplate
variants) survives every lexical dedup pass — minhash/simhash see
different tokens. The published recipe (Abbas et al., "SemDeDup:
Data-efficient learning at web-scale through semantic deduplication",
2023) clusters embeddings with k-means and prunes pairs above a cosine
threshold *within each cluster*, never across the whole corpus.

Spark-first shape, reusing the engine's verified pieces:

  1. coarse clustering — ``similarity.train_ivf_centroids`` (spherical
     k-means on a BOUNDED deterministic sample, driver-side) gives the
     cluster map; assignment is one vectorized GEMM per Arrow batch
     against the broadcast centroid matrix.
  2. oversized-cell split — cells larger than ``max_cell`` are
     sub-split by deterministic sign-projection bits
     (``vectors.sign_projection_bucket``), bounding the within-cell
     pair stage at ``max_cell**2`` regardless of how skewed the
     cluster sizes are (web corpora concentrate: a few dense topics
     hold most documents).
  3. within-cell pairs — a cell equi-join (never a cross join); cosine
     is verified exactly on each candidate, so precision is 1.0 by
     construction and recall is the SemDeDup contract: pairs split
     across cells are missed, fewer/larger cells = higher recall and
     higher cost.
  4. keep-one — ``dedup.connected_components`` over the pair graph,
     representative = min id per component (the same convention every
     other dedup family here uses).

At 100 TB: the corpus is scanned once for assignment (in production
the embedding table is *stored* cell-partitioned, making the pair
join co-located); the only shuffles are the cell join and the
component rounds. Nothing quadratic in corpus size ever materializes.
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas_udf type hints resolve
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from d2d_spark.functions.vectors import as_double, dot, norm, sign_projection_bucket
from d2d_spark.operators.dedup import _spread, connected_components
from d2d_spark.operators.similarity import train_ivf_centroids


def assign_cells(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 64,
    iters: int = 5,
    sample: int = 10_000,
    max_cell: int = 5_000,
    split_bits: int = 4,
) -> DataFrame:
    """Append a ``cell`` column: nearest spherical-k-means centroid,
    with cells above ``max_cell`` members sub-split by ``split_bits``
    sign-projection bits.

    Cell ids are disjoint across the two regimes (unsplit cells keep
    ``cell < n_centroids``; split cells map to
    ``n_centroids + cell * 2**split_bits + bucket``), so downstream
    equi-joins can't conflate a split shard with an unsplit cell.

    The split separates DISTINCT skewed vectors; byte-identical
    vectors share every sign bit and cannot be split apart — collapse
    exact duplicates first (``semantic_dedup`` does) or a clone-heavy
    cell stays clone-heavy.

    The per-cell counts are one tiny aggregate (≤ ``n_centroids``
    rows, broadcast back); the assignment kernel is a single GEMM per
    Arrow batch against the broadcast centroid matrix — no per-row
    Python, no shuffle beyond the count.
    """
    import numpy as np
    from pyspark.sql import types as T

    C = train_ivf_centroids(df, id_col, vec_col, n_centroids, iters, sample)

    def assign_kernel(vec_series: pd.Series) -> pd.Series:
        X = np.array(list(vec_series), dtype=np.float64)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(Xn @ C.T, axis=1).astype(np.int64))

    assign = F.pandas_udf(assign_kernel, T.LongType())

    from pyspark import StorageLevel

    npart = df.sparkSession.sparkContext.defaultParallelism
    # the assignment GEMM is the most expensive kernel here and feeds
    # BOTH the per-cell counts and the output — cache it (eagerly, see
    # dedup.py's concurrent-first-computation note) so it runs once
    from d2d_spark import cache as opcache

    base = opcache.register(
        "semantic",
        _spread(df, npart, full=True)
        .withColumn("cell", assign(F.col(vec_col)))
        .persist(StorageLevel.MEMORY_AND_DISK),
    )
    base.count()
    counts = base.groupBy("cell").agg(F.count(F.lit(1)).alias("__cn"))
    sub = sign_projection_bucket(F.col(vec_col), split_bits)
    return (
        base.join(F.broadcast(counts), on="cell")
        .withColumn(
            "cell",
            F.when(
                F.col("__cn") > max_cell,
                F.lit(n_centroids) + F.col("cell") * (1 << split_bits) + sub,
            ).otherwise(F.col("cell")),
        )
        .drop("__cn")
    )


def semantic_near_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_centroids: int = 64,
    iters: int = 5,
    sample: int = 10_000,
    max_cell: int = 5_000,
    split_bits: int = 4,
) -> DataFrame:
    """(id_a < id_b, cos_sim) pairs with cosine ≥ ``threshold`` that
    share a cluster cell. Precision is exact (cosine is recomputed per
    candidate); recall misses only cross-cell pairs — the SemDeDup
    trade. Cells partition the rows, so no pair is emitted twice and
    no ``distinct`` pass is needed."""
    from pyspark import StorageLevel

    cells = (
        assign_cells(
            df.select(F.col(id_col).alias("__id"), as_double(F.col(vec_col)).alias("__v")),
            "__id",
            "__v",
            n_centroids,
            iters,
            sample,
            max_cell,
            split_bits,
        )
        .withColumn("__n", norm(F.col("__v")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    from d2d_spark import cache as opcache

    opcache.register("semantic", cells)
    cells.count()  # fill the cache before the self-join sides race on it
    a = cells.select(
        "cell", F.col("__id").alias("id_a"), F.col("__v").alias("v_a"), F.col("__n").alias("n_a")
    )
    b = cells.select(
        "cell", F.col("__id").alias("id_b"), F.col("__v").alias("v_b"), F.col("__n").alias("n_b")
    )
    pairs = a.join(b, on="cell").filter(F.col("id_a") < F.col("id_b"))
    sim = dot(F.col("v_a"), F.col("v_b")) / F.nullif(F.col("n_a") * F.col("n_b"), F.lit(0.0))
    return (
        pairs.withColumn("cos_sim", sim)
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    **cluster_kw,
) -> DataFrame:
    """Drop semantic near-duplicates, keeping the min-id representative
    of each connected component of the within-cell pair graph. Returns
    the surviving rows of ``df`` unchanged (all original columns).

    Exact-duplicate vectors collapse FIRST (hash-groupBy on the vector
    bytes, min id survives): identical vectors are duplicates at any
    threshold, and — sharing every sign bit — they would defeat the
    oversized-cell split and re-grow a quadratic cell. After the
    collapse the pair stage sees only distinct vectors, so the
    ``max_cell`` bound holds under clone-heavy skew too."""
    vec_key = F.md5(F.to_json(F.col(vec_col)))
    reps = (
        df.groupBy(vec_key.alias("__vk"))
        .agg(F.min(F.col(id_col)).alias("__rep"))
        .select("__rep")
    )
    uniq = df.join(
        reps, on=[F.col(id_col) == F.col("__rep")], how="left_semi"
    )
    pairs = semantic_near_pairs(uniq, id_col, vec_col, threshold, **cluster_kw)
    comps = connected_components(pairs, "id_a", "id_b")
    losers = comps.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("__loser")
    )
    survivors = uniq.join(
        losers, on=[F.col(id_col) == F.col("__loser")], how="left_anti"
    )
    # exact-dup losers (non-representatives) drop here because only
    # `uniq` rows can survive
    return survivors
