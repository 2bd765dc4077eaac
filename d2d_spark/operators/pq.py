"""Product quantization (Jégou et al. 2011, "Product Quantization for
Nearest Neighbor Search") — the compression arm of the similarity
stack: IVF prunes WHICH vectors a query touches (similarity.py),
int8 quantization shrinks them 4x (functions/vectors.py), PQ shrinks
them a further order of magnitude (d float32 -> m bytes, e.g.
64*4=256 bytes -> 8 bytes at m=8) while still supporting approximate
inner-product scoring DIRECTLY on the codes.

Split of labor mirrors the IVF quantizer:

  train_pq  — per-subspace L2 k-means on a BOUNDED deterministic
              hash-ordered sample (driver-side Lloyd iterations;
              ``sample`` caps driver memory at any corpus size;
              deterministic init = first ksub sample rows, so two
              trainings agree bit-for-bit).
  pq_encode — map-only Arrow kernel: one GEMM per subspace per batch
              (argmin over ||x_sub - c||^2 via the -2x.c + |c|^2
              trick), emitting an m-byte code array. Zero shuffle.
  pq_topk   — asymmetric distance computation (ADC): each query
              precomputes an (m, ksub) lookup table of sub-space dot
              products ONCE; scoring a corpus vector is m table
              gathers + a sum, never a d-wide multiply. Per-batch
              top-k leaves Python (O(|Q| * k) rows per block — the
              gemm_topk discipline), a window rank merges blocks.

Scale posture at 100 TB: training reads ``sample`` rows; encoding is
embarrassingly parallel and cuts downstream shuffle/storage by
~d*4/m; ADC scoring broadcasts |Q| * m * ksub doubles in the closure
(bounded by the query-set contract, same as gemm_topk) and scans the
code column — 8 bytes a row — instead of the embedding column.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from d2d_spark.functions.frames import local_frame


@dataclass(frozen=True)
class PqModel:
    """codebooks: (m, ksub, dsub) float64 — m subspaces, ksub
    centroids each, over dim = m * dsub input vectors."""

    codebooks: np.ndarray

    @property
    def m(self) -> int:
        return self.codebooks.shape[0]

    @property
    def ksub(self) -> int:
        return self.codebooks.shape[1]

    @property
    def dsub(self) -> int:
        return self.codebooks.shape[2]

    @property
    def dim(self) -> int:
        return self.m * self.dsub

    def decode(self, codes: np.ndarray) -> np.ndarray:
        """(n, m) codes -> (n, dim) reconstructed vectors (the
        centroid concatenation). Test/analysis helper — production
        scoring never reconstructs (that is the point of ADC)."""
        codes = np.asarray(codes, dtype=np.int64)
        return np.concatenate(
            [self.codebooks[j][codes[:, j]] for j in range(self.m)], axis=1
        )


def train_pq(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 8,
    ksub: int = 256,
    iters: int = 10,
    sample: int = 10_000,
) -> PqModel:
    """Fit the per-subspace codebooks on a bounded deterministic
    sample (hash-ordered take — TakeOrderedAndProject, no full
    sort/shuffle; the same driver-memory cap and determinism contract
    as similarity.train_ivf_centroids). Requires dim % m == 0."""
    if m < 1 or ksub < 1 or ksub > 65536:
        raise ValueError(f"need m >= 1 and 1 <= ksub <= 65536, got m={m} ksub={ksub}")
    rows = (
        corpus.select(F.col(vec_col).alias("__v"), F.xxhash64(F.col(id_col)).alias("__h"))
        .orderBy("__h")
        .limit(sample)
        .collect()
    )
    if not rows:
        raise ValueError("train_pq: corpus sample is empty")
    X = np.array([r["__v"] for r in rows], dtype=np.float64)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"vector dim {dim} is not divisible by m={m} subspaces")
    dsub = dim // m
    k = min(ksub, len(X))
    books = np.empty((m, k, dsub))
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = S[:k].copy()  # deterministic init: first k sample rows
        for _ in range(iters):
            d2 = (S * S).sum(axis=1, keepdims=True) - 2.0 * (S @ C.T) + (C * C).sum(axis=1)
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                members = S[assign == c]
                if len(members):  # empty clusters keep their centroid
                    C[c] = members.mean(axis=0)
        books[j] = C
    return PqModel(codebooks=books)


def pq_encode(
    df: DataFrame, vec_col: str, model: PqModel, out_col: str = "pq_code"
) -> DataFrame:
    """Replace ``vec_col`` with its m-byte PQ code array (all other
    columns pass through). Map-only: one small GEMM per subspace per
    Arrow batch against the closure-shipped codebooks; NULL/ragged
    vectors yield a NULL code (a row to filter, not a job-killer)."""
    import pandas as pd

    books = model.codebooks
    m, dsub, dim = model.m, model.dsub, model.dim
    passthrough = [c for c in df.columns if c != vec_col]
    fields = [f for f in df.schema.fields if f.name != vec_col]
    schema = T.StructType(fields + [T.StructField(out_col, T.ArrayType(T.IntegerType()))])
    # per-subspace |c|^2 rows precompute once
    cnorm = [(books[j] * books[j]).sum(axis=1) for j in range(m)]

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes: list = []
            vecs = list(pdf[vec_col])
            good = [v is not None and len(v) == dim for v in vecs]
            X = np.array(
                [v if ok else [0.0] * dim for v, ok in zip(vecs, good)], dtype=np.float64
            )
            cols = np.empty((len(vecs), m), dtype=np.int64)
            for j in range(m):
                S = X[:, j * dsub : (j + 1) * dsub]
                d2 = -2.0 * (S @ books[j].T) + cnorm[j]  # |x|^2 constant per row
                cols[:, j] = np.argmin(d2, axis=1)
            codes = [cols[i].tolist() if ok else None for i, ok in enumerate(good)]
            out = pdf[passthrough].copy()
            out[out_col] = pd.Series(codes, index=pdf.index, dtype="object")
            yield out

    return df.mapInPandas(kernel, schema)


def pq_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    id_col: str,
    code_col: str,
    query_id_col: str,
    query_vec_col: str,
    model: PqModel,
    k: int = 5,
) -> DataFrame:
    """Approximate inner-product top-k over PQ codes via ADC: each
    query's (m, ksub) dot-product lookup table computes once
    driver-side and broadcasts in the closure (queries are small by
    contract, as in gemm_topk); each corpus batch is m vectorized
    gathers + a sum, and only per-batch top-k rows leave Python.
    Returns (query_id, neighbor_id, score, rank) — score is the
    quantized inner product (rank-faithful to cosine when inputs are
    L2-normalized upstream)."""
    import pandas as pd

    books = model.codebooks
    m, dsub, dim = model.m, model.dsub, model.dim
    for frame, col, side in ((queries, query_id_col, "query"), (corpus_codes, id_col, "corpus")):
        dt = frame.schema[col].dataType.simpleString()
        if dt not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"pq_topk needs integral {side} ids, got {col}: {dt} — cast "
                "or map string ids to int64 upstream (the kernel packs ids "
                "into int64 numpy arrays)"
            )
    q_rows = queries.select(query_id_col, query_vec_col).collect()
    if not q_rows:
        raise ValueError("pq_topk got an empty queries frame — nothing to search for")
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([r[1] for r in q_rows], dtype=np.float64)
    if Q.shape[1] != dim:
        raise ValueError(f"query dim {Q.shape[1]} != model dim {dim}")
    # LUT[qi, j, c] = q_sub(j) . codebook[j][c]
    lut = np.stack(
        [Q[:, j * dsub : (j + 1) * dsub] @ books[j].T for j in range(m)], axis=1
    )

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    kk = k + 1  # the query itself may appear in its own block

    def kernel(batches):
        for pdf in batches:
            rows = [
                (i, c) for i, c in zip(pdf[id_col], pdf[code_col]) if c is not None
            ]
            if not rows:
                continue
            ids = np.array([i for i, _ in rows], dtype=np.int64)
            codes = np.array([c for _, c in rows], dtype=np.int64)  # (n, m)
            # S[qi, n] = sum_j lut[qi, j, codes[n, j]]
            S = np.zeros((len(q_ids), len(ids)))
            for j in range(m):
                S += lut[:, j, codes[:, j]]
            top = min(kk, S.shape[1])
            out_q, out_n, out_s = [], [], []
            for qi in range(len(q_ids)):
                # deterministic per-batch cut under the SAME total
                # order the global window ranks by (score desc, id
                # asc): an argpartition's arbitrary tie order could
                # drop a tied row at the boundary that the global
                # rank would have kept, making the candidate set
                # partitioning-dependent
                idx = np.lexsort((ids, -S[qi]))[:top]
                for n in idx:
                    if ids[n] != q_ids[qi]:
                        out_q.append(q_ids[qi])
                        out_n.append(ids[n])
                        out_s.append(S[qi, n])
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "score": out_s})

    cand = corpus_codes.select(id_col, code_col).mapInPandas(kernel, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def pq_topk_rerank(
    corpus: DataFrame,
    corpus_codes: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    code_col: str,
    query_id_col: str,
    query_vec_col: str,
    model: PqModel,
    k: int = 5,
    oversample: int = 10,
) -> DataFrame:
    """The standard two-stage PQ search: ADC generates ``k *
    oversample`` candidates per query from the 8-byte codes (cheap,
    quantization-blurred ranks), then the candidates — and ONLY the
    candidates — are exact-cosine reranked against their original
    vectors. The rerank reads k*oversample*|Q| full vectors instead
    of the corpus: a semi-join-sized exact stage on top of a
    code-column scan. Quantization error then costs recall only when
    a true neighbor falls outside the oversampled candidate set
    (recall@R is the dial; tests pin it on clustered data)."""
    from d2d_spark.functions.vectors import as_double, dot, norm

    cand = pq_topk(
        corpus_codes, queries, id_col, code_col, query_id_col, query_vec_col,
        model, k=k * oversample,
    ).select("query_id", "neighbor_id")
    vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("__cv")
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            as_double(F.col(query_vec_col)).alias("__qv"),
        )
    )
    scored = (
        cand.join(vecs, on="neighbor_id")
        .join(q, on="query_id")
        .withColumn(
            "cos_sim",
            dot(F.col("__qv"), F.col("__cv"))
            / F.nullif(norm(F.col("__qv")) * norm(F.col("__cv")), F.lit(0.0)),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


@dataclass(frozen=True)
class IvfPqModel:
    """IVFADC index model: unit-row coarse centroids (nc, d) +
    a PqModel trained on RESIDUALS (x_normalized - centroid)."""

    centroids: np.ndarray
    pq: "PqModel"


def _cell_residual_frame(
    corpus: DataFrame, id_col: str, vec_col: str, centroids: np.ndarray
) -> DataFrame:
    """(id, cell, __resid): L2-normalize each vector, assign its
    nearest (max dot) coarse centroid, emit the residual. Map-only
    Arrow kernel; NULL/ragged vectors are dropped (rows to filter
    upstream, same contract as pq_encode's NULL codes)."""
    import pandas as pd

    dim = centroids.shape[1]
    fields = [f for f in corpus.schema.fields if f.name == id_col]
    schema = T.StructType(
        fields
        + [
            T.StructField("cell", T.LongType()),
            T.StructField("__resid", T.ArrayType(T.DoubleType())),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = list(pdf[vec_col])
            good = [v is not None and len(v) == dim for v in vecs]
            X = np.array(
                [v if ok else [0.0] * dim for v, ok in zip(vecs, good)],
                dtype=np.float64,
            )
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            cells = np.argmax(Xn @ centroids.T, axis=1)
            R = Xn - centroids[cells]
            out = pdf[[id_col]][good].copy()
            out["cell"] = cells[good]
            out["__resid"] = pd.Series(
                [r.tolist() for r in R[good]], index=out.index, dtype="object"
            )
            yield out

    return corpus.select(id_col, vec_col).mapInPandas(kernel, schema)


def build_ivf_pq_index(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 8,
    ksub: int = 16,
    n_centroids: int = 64,
    iters: int = 5,
    pq_iters: int = 10,
    sample: int = 10_000,
) -> tuple[DataFrame, IvfPqModel]:
    """IVFADC index build (Jégou et al. 2011 §IV): coarse spherical
    k-means cells + product quantization OF THE RESIDUALS — the
    residual distribution is far tighter than the raw one, so the
    same m bytes buy much more precision than flat PQ.

    Returns (codes, model): ``codes`` is (id, cell, pq_code) — at
    production scale, WRITE it partitioned by cell so probe joins
    prune partitions — and ``model`` carries centroids + codebooks
    (nc*d + m*ksub*dsub doubles, broadcastable by construction).
    Two corpus passes (train sample + encode), both map-only."""
    from d2d_spark.operators.similarity import train_ivf_centroids

    C = train_ivf_centroids(corpus, id_col, vec_col, n_centroids, iters, sample)
    resid = _cell_residual_frame(corpus, id_col, vec_col, C)
    pq = train_pq(resid, id_col, "__resid", m=m, ksub=ksub, iters=pq_iters, sample=sample)
    codes = pq_encode(resid, "__resid", pq, out_col="pq_code")
    return codes, IvfPqModel(centroids=C, pq=pq)


def ivf_pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    id_col: str,
    query_id_col: str,
    query_vec_col: str,
    model: IvfPqModel,
    k: int = 5,
    n_probe: int = 8,
    cell_col: str = "cell",
    code_col: str = "pq_code",
) -> DataFrame:
    """IVFADC search: each query probes its ``n_probe`` best cells
    and ADC-scores ONLY those cells' codes. Score decomposes exactly
    as q·x̂ = q·centroid(cell) + q·residual̂: the first term computes
    once per (query, probed cell) on the driver, the second is m
    lookup-table gathers per candidate row. The probe side is a tiny
    literal frame (|Q| * n_probe rows) broadcast into an equi-join on
    cell — candidates never exceed the probed cells' membership, and
    with cell-partitioned storage the join prunes partitions.
    Returns (query_id, neighbor_id, score, rank); self-matches drop."""
    import pandas as pd

    for frame, col, side in ((queries, query_id_col, "query"), (codes, id_col, "corpus")):
        dt = frame.schema[col].dataType.simpleString()
        if dt not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"ivf_pq_topk needs integral {side} ids, got {col}: {dt}"
            )
    q_rows = queries.select(query_id_col, query_vec_col).collect()
    if not q_rows:
        raise ValueError("ivf_pq_topk got an empty queries frame")
    C, books = model.centroids, model.pq.codebooks
    m, dsub, dim = model.pq.m, model.pq.dsub, model.pq.dim
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([r[1] for r in q_rows], dtype=np.float64)
    if Q.shape[1] != dim:
        raise ValueError(f"query dim {Q.shape[1]} != model dim {dim}")
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    S = Qn @ C.T  # (|Q|, nc): the q·centroid terms
    p = min(n_probe, C.shape[0])
    probe_idx = np.argpartition(-S, p - 1, axis=1)[:, :p]
    lut = np.stack(
        [Qn[:, j * dsub : (j + 1) * dsub] @ books[j].T for j in range(m)], axis=1
    )
    spark = codes.sparkSession
    qcells = local_frame(
        spark,
        [
            (int(q_ids[qi]), int(qi), int(c), float(S[qi, c]))
            for qi in range(len(q_ids))
            for c in probe_idx[qi]
        ],
        f"query_id long, __qidx int, {cell_col} long, __qc double",
    )
    joined = F.broadcast(qcells).join(
        codes.select(
            F.col(id_col).alias("neighbor_id"), F.col(cell_col), F.col(code_col)
        ),
        cell_col,
    )
    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )

    kk = k + 1  # the query itself may appear in its own cells

    def kernel(batches):
        for pdf in batches:
            rows = pdf[pdf[code_col].notna()]
            if len(rows) == 0:
                continue
            qidx = rows["__qidx"].to_numpy(dtype=np.int64)
            cds = np.array(list(rows[code_col]), dtype=np.int64)  # (n, m)
            s = rows["__qc"].to_numpy(dtype=np.float64).copy()
            for j in range(m):
                s += lut[qidx, j, cds[:, j]]
            out = pd.DataFrame(
                {
                    "query_id": rows["query_id"].to_numpy(dtype=np.int64),
                    "neighbor_id": rows["neighbor_id"].to_numpy(dtype=np.int64),
                    "score": s,
                }
            )
            # per-batch top-k per query: O(|Q| * k) rows leave Python,
            # not the probed-cell membership (the pq_topk discipline).
            # Stable sort + id tie-break = the global window's total
            # order, so boundary ties cut deterministically
            yield out.sort_values(
                ["score", "neighbor_id"], ascending=[False, True], kind="mergesort"
            ).groupby("query_id", sort=False).head(kk)

    scored = joined.mapInPandas(kernel, out_schema).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )
