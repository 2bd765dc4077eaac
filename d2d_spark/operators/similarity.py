"""Similarity search over embedding columns (array<float>).

Two paths:
  brute_force_topk — exact cosine top-k per query; each (query x
    corpus-partition) is a local heap via window rank. Baseline and
    ground truth.
  lsh_topk — sign-random-projection buckets prune the corpus first:
    only same-bucket candidates get exact scoring. At 100 TB the
    bucket column becomes the partition key so each query touches a
    handful of partitions instead of the full corpus.
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas_udf type hints resolve
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from d2d_spark.operators.dedup import _spread
from d2d_spark.functions.vectors import as_double, dot, norm, sign_projection_bucket


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    query_vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k neighbors per query vector. The query set is
    broadcast (it is small by construction); the corpus streams.

    Norms are computed once per side BEFORE the pair join — per-pair
    work is a single dot-product fold, not three (norm(q) and norm(c)
    per pair would multiply the interpreted fold cost by ~3 at
    |queries| x |corpus| scale)."""

    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), as_double(F.col(query_vec_col)).alias("__qv")
        ).withColumn("__qn", norm(F.col("__qv")))
    )
    npart = corpus.sparkSession.sparkContext.defaultParallelism
    c = (
        _spread(corpus, npart, full=True)  # compute-bound: want every core on the dot-product stage
        .select(F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("__cv"))
        .withColumn("__cn", norm(F.col("__cv")))
    )
    scored = q.crossJoin(c).withColumn(
        "cos_sim", dot(F.col("__qv"), F.col("__cv"))
        / F.nullif(F.col("__qn") * F.col("__cn"), F.lit(0.0))
    )
    scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def add_lsh_bucket(df: DataFrame, vec_col: str, n_bits: int = 8) -> DataFrame:
    """Attach the sign-projection bucket id — the IVF/LSH partition
    key. Deterministic integer weights, so bucketing reproduces across
    engines and runs."""
    return df.withColumn("bucket", sign_projection_bucket(F.col(vec_col), n_bits))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    query_vec_col: str,
    k: int = 5,
    n_bits: int = 8,
    multi_probe: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket
    (multi-probe: plus every 1-bit-flip neighbor bucket), then exact
    cosine rank within candidates.

    Scale shape: the corpus is scanned once to attach buckets (and in
    production is *stored* bucket-partitioned so this is free); each
    query joins against 1+n_bits buckets instead of the whole corpus —
    a bucket-equi-join, never a cross join. Recall/cost dials:
    n_bits up = cheaper+worse, multi_probe = ~n_bits x cost for much
    better recall."""

    npart = corpus.sparkSession.sparkContext.defaultParallelism
    c = add_lsh_bucket(
        _spread(corpus, npart, full=True).select(
            F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("__cv")
        ),
        "__cv",
        n_bits,
    ).withColumn("__cn", norm(F.col("__cv")))
    q0 = add_lsh_bucket(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            as_double(F.col(query_vec_col)).alias("__qv"),
        ),
        "__qv",
        n_bits,
    ).withColumn("__qn", norm(F.col("__qv")))
    if multi_probe:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << b)) for b in range(n_bits)],
        )
        q0 = q0.withColumn("bucket", F.explode(probes))
    q = F.broadcast(q0)
    scored = (
        q.join(c, on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn(
            "cos_sim", dot(F.col("__qv"), F.col("__cv"))
        / F.nullif(F.col("__qn") * F.col("__cn"), F.lit(0.0))
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def train_ivf_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 64,
    iters: int = 5,
    sample: int = 10_000,
):
    """Spherical k-means centroids from a BOUNDED deterministic sample
    (hash-ordered take — TakeOrderedAndProject, no full sort/shuffle):
    the classic IVF coarse quantizer trained driver-side. ``sample``
    caps driver memory regardless of corpus size; at 100 TB the
    training set is still `sample` rows. Deterministic init (first
    n_centroids of the hash order) + Lloyd iterations on normalized
    vectors => identical centroids across runs and engines. Returns a
    float64 ndarray (n_centroids, dim), rows L2-normalized."""
    import numpy as np

    rows = (
        corpus.select(F.col(vec_col).alias("__v"), F.xxhash64(F.col(id_col)).alias("__h"))
        .orderBy("__h")
        .limit(sample)
        .collect()
    )
    X = np.array([r["__v"] for r in rows], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    k = min(n_centroids, len(X))
    C = X[:k].copy()
    for _ in range(iters):
        S = X @ C.T  # cosine against unit centroids
        assign = np.argmax(S, axis=1)
        for j in range(k):
            members = X[assign == j]
            if len(members):  # empty clusters keep their centroid
                c = members.sum(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-12)
    return C


def kmeans_refine(
    corpus: DataFrame,
    vec_col: str,
    centroids,
    iters: int = 3,
):
    """Distributed spherical-Lloyd refinement of a centroid matrix
    over the FULL corpus — the scale-correct second stage after
    ``train_ivf_centroids``'s bounded-sample fit: the sample bounds
    driver memory but also caps how well centroids track the true
    distribution; refinement restores that fidelity without ever
    collecting a vector.

    Per round: assignment is a map-only Arrow GEMM against the
    broadcast centroid matrix (zero shuffle); the centroid update is
    a dimension posexplode -> groupBy(cell, dim) sum whose map-side
    partials compress each task's contribution to <= k*d rows, so the
    shuffle AND the driver collect are model-sized (k*d sums + k
    counts) — corpus-independent, the same sufficient-statistics
    shape as reduce.py's PCA moment pass. Zero-norm vectors are
    excluded (no cell), empty cells keep their centroid (the
    convention the sample trainer uses). Returns the refined
    (k, d) float64 matrix, rows L2-normalized."""
    import numpy as np
    from pyspark.sql import types as T

    from d2d_spark import cache as opcache

    C = np.array(centroids, dtype=np.float64)
    if C.ndim != 2:
        raise ValueError(f"centroids must be a (k, d) matrix, got shape {C.shape}")
    k, d = C.shape
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    npart = corpus.sparkSession.sparkContext.defaultParallelism
    base = (
        _spread(corpus, npart, full=True)
        .select(as_double(F.col(vec_col)).alias("__v"))
        .withColumn("__n", norm(F.col("__v")))
        .filter(F.col("__n") > 0)
        .withColumn("__u", F.transform("__v", lambda x: x / F.col("__n")))
        .select("__u")
    )
    from pyspark import StorageLevel

    # read `iters` times (assignment + stats per round) — persist once,
    # release per-corpus via cache.release("kmeans_refine")
    base = opcache.register(
        "kmeans_refine", base.persist(StorageLevel.MEMORY_AND_DISK)
    )
    base.count()
    def _assign_udf(Cb):
        # factory: binds THIS round's centroid copy into the closure
        def assign_kernel(vec_series: pd.Series) -> pd.Series:
            X = np.array(list(vec_series), dtype=np.float64)
            return pd.Series(np.argmax(X @ Cb.T, axis=1).astype(np.int64))

        return F.pandas_udf(assign_kernel, T.LongType())

    for _ in range(iters):
        assigned = base.withColumn("cell", _assign_udf(C.copy())(F.col("__u")))
        # ONE job per round: member counts ride the same aggregate as
        # the per-dimension sums (identical per pos — read off pos 0),
        # so the assignment UDF runs once, not once per statistic
        stats = (
            assigned.select("cell", F.posexplode("__u").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        S = np.zeros((k, d), dtype=np.float64)
        counts: dict[int, int] = {}
        for r in stats:
            S[r["cell"], r["pos"]] = r["s"]
            if r["pos"] == 0:
                counts[r["cell"]] = r["cnt"]
        for j in range(k):
            if counts.get(j):  # empty cells keep their centroid
                C[j] = S[j] / max(np.linalg.norm(S[j]), 1e-12)
    return C


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    query_vec_col: str,
    k: int = 5,
    n_centroids: int = 64,
    n_probe: int = 4,
    iters: int = 5,
    sample: int = 10_000,
) -> DataFrame:
    """IVF approximate top-k: a learned coarse quantizer (spherical
    k-means) replaces lsh_topk's random projections — candidates are
    the members of each query's ``n_probe`` nearest centroid cells,
    then exact cosine rank within candidates.

    Scale shape (same as lsh_topk): the corpus is scanned once to
    attach its cell id (one vectorized GEMM per Arrow batch against
    the broadcast centroid matrix; in production the corpus is
    *stored* cell-partitioned so the probe join prunes partitions);
    each query equi-joins against n_probe cells, never the whole
    corpus. Learned cells track the data distribution, so recall per
    probed candidate is typically better than data-blind LSH buckets."""
    import numpy as np
    from pyspark.sql import types as T

    C = train_ivf_centroids(corpus, id_col, vec_col, n_centroids, iters, sample)

    def assign_kernel(vec_series: pd.Series) -> pd.Series:
        X = np.array(list(vec_series), dtype=np.float64)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(Xn @ C.T, axis=1).astype(np.int64))

    assign = F.pandas_udf(assign_kernel, T.LongType())

    def probe_kernel(vec_series: pd.Series) -> pd.Series:
        X = np.array(list(vec_series), dtype=np.float64)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        S = Xn @ C.T
        p = min(n_probe, S.shape[1])
        idx = np.argpartition(-S, p - 1, axis=1)[:, :p].astype(np.int64)
        return pd.Series(list(idx))

    probe = F.pandas_udf(probe_kernel, T.ArrayType(T.LongType()))

    npart = corpus.sparkSession.sparkContext.defaultParallelism
    c = (
        _spread(corpus, npart, full=True)
        .select(F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("__cv"))
        .withColumn("cell", assign(F.col("__cv")))
        .withColumn("__cn", norm(F.col("__cv")))
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), as_double(F.col(query_vec_col)).alias("__qv")
        )
        .withColumn("cell", F.explode(probe(F.col("__qv"))))
        .withColumn("__qn", norm(F.col("__qv")))
    )
    scored = (
        q.join(c, on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim", dot(F.col("__qv"), F.col("__cv"))
            / F.nullif(F.col("__qn") * F.col("__cn"), F.lit(0.0))
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def gemm_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    query_vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k via blocked matrix multiply — the throughput
    path for brute-force search at scale.

    The query matrix (small by contract) broadcasts to every executor
    once via a closure; each Arrow batch of corpus vectors becomes one
    numpy GEMM (C_block @ Q^T), and only each batch's per-query top-k
    candidate rows leave Python — per-batch output is O(|Q| * k), not
    O(|Q| * |block|). A final window rank merges per-batch candidates
    into global top-k. Same results as brute_force_topk (pytest-
    checked); ~BLAS throughput instead of per-pair interpreted folds.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    q_rows = queries.select(query_id_col, query_vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([r[1] for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )
    kk = k + 1  # the query itself may appear in its own block

    def kernel(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            C = np.array(list(pdf[vec_col]), dtype=np.float64)
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            S = Cn @ Qn.T  # (block, |Q|)
            top = min(kk, S.shape[0])
            idx = np.argpartition(-S, top - 1, axis=0)[:top]  # (top, |Q|)
            out_q, out_n, out_s = [], [], []
            for j in range(S.shape[1]):
                for i in idx[:, j]:
                    if ids[i] != q_ids[j]:
                        out_q.append(q_ids[j])
                        out_n.append(ids[i])
                        out_s.append(S[i, j])
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "cos_sim": out_s})

    cand = corpus.select(id_col, vec_col).mapInPandas(kernel, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
