"""Rank fusion for hybrid retrieval — combine per-query rankings from
heterogeneous scorers (BM25 lexical, dense ANN, quantized ANN, quality
priors) into one list without calibrating their incomparable scores.

Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009):

    rrf(d) = sum_i  w_i / (c + rank_i(d))

using only the RANKS — the one signal every retrieval system emits on
a common scale. A document missing from a system's list contributes
nothing for that system. c (default 60, the paper's constant) damps
the head so one system's #1 cannot dominate an item every other
system places mid-list.

This is the glue the reference's ES-backed search path leaves to the
application (d22d ships documents to Elasticsearch and stops); here
retrieval composes inside the engine: `tfidf.bm25_search` for the
lexical arm, `similarity.*_topk` / `pq.ivf_pq_topk` for the dense
arms, this module to fuse.

Spark shape: every input is already a per-query top-k frame
(O(|Q| * k) rows by construction — the retrieval operators' egress
contract), so fusion is a chain of tiny outer joins on (query, doc)
plus one window rank: broadcast-sized at any corpus scale. The float
fold is a FIXED-ORDER sum over the system index (s_0 + s_1 + ...),
never a SQL SUM over rows, so fused scores are partition- and
engine-exact — what lets a fused ranking be driver-oracled.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["mmr_rerank", "ndcg_at_k", "rrf_fuse"]


def rrf_fuse(
    rankings: Sequence[DataFrame],
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
    c: float = 60.0,
    weights: Sequence[float] | None = None,
) -> DataFrame:
    """(query, doc, rrf_score, rank) — the fused top-``k`` per query.

    Every input frame needs ``query_col``, ``doc_col`` and an integer
    ``rank_col`` (1-based; ties already broken upstream — retrieval
    operators here all break by ascending doc id). A (query, doc)
    pair appearing twice in ONE ranking raises (its rank would be
    ambiguous). Fused ties break by ascending doc id, so the output
    is deterministic on any partitioning.

    Each slim ranking persists for the duration of the call's plan
    (the validation probe and the fusion join both consume it, and
    the upstream is typically a whole retrieval pipeline). Long-lived
    sessions fusing many distinct ranking sets should release the
    accumulated blocks per corpus via
    ``d2d_spark.cache.release("rrf_fuse")`` — always safe, lineage is
    intact (the minhash cache policy)."""
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    if c <= 0:
        raise ValueError(f"rrf_fuse: c must be > 0, got {c}")
    if k < 1:
        raise ValueError(f"rrf_fuse: k must be >= 1, got {k}")
    w = [1.0] * len(rankings) if weights is None else [float(x) for x in weights]
    if len(w) != len(rankings):
        raise ValueError(
            f"rrf_fuse: {len(rankings)} rankings but {len(w)} weights"
        )
    import math

    for i, x in enumerate(w):
        # a zero/negative/NaN weight silently zeroes or inverts a
        # system's contribution — range-check like c and k; to drop a
        # system, drop its ranking from the list instead
        if not math.isfinite(x) or x <= 0:
            raise ValueError(
                f"rrf_fuse: weight {i} is {x!r} — every weight must be a "
                "finite number > 0 (omit the ranking to exclude a system)"
            )
    from pyspark import StorageLevel

    from d2d_spark import cache as opcache

    # validate EVERY ranking's columns before the first persist — a
    # raise after iteration 0's persist would leak that frame's
    # registered cache blocks (the failed call has no consumer)
    for i, r in enumerate(rankings):
        missing = [col for col in (query_col, doc_col, rank_col) if col not in r.columns]
        if missing:
            raise ValueError(f"rrf_fuse: ranking {i} lacks columns {missing}")
    parts = []
    mine: list[DataFrame] = []  # this CALL's persists, for error cleanup
    for i, r in enumerate(rankings):
        # persist the slim ranking: the validation probe AND the fusion
        # join both consume it, and the upstream is typically a whole
        # retrieval pipeline — recomputing it per consumer multiplied
        # the cost several-fold (measured on the ann bench leg).
        # Registered for per-corpus release, the minhash discipline.
        slim = opcache.register(
            "rrf_fuse",
            r.select(query_col, doc_col, rank_col).persist(
                StorageLevel.MEMORY_AND_DISK
            ),
        )
        mine.append(slim)
        # ONE probe job: duplicate (query, doc) pairs make the rank
        # ambiguous; ranks are 1-based by contract — a 0-based list
        # silently shifts every contribution (w/(c+0) at the head) and
        # a NULL rank silently reads as "absent from this system"
        bad = (
            slim.groupBy(query_col, doc_col)
            .agg(
                F.count(F.lit(1)).alias("__n"),
                F.min(rank_col).alias("__mn"),
                F.sum(F.col(rank_col).isNull().cast("int")).alias("__nulls"),
            )
            .filter(
                (F.col("__n") > 1) | (F.col("__nulls") > 0) | (F.col("__mn") < 1)
            )
            .limit(1)
            .collect()
        )
        if bad:
            # a failed call has no consumer — drop what THIS call
            # persisted (not the whole tag: earlier successful calls'
            # frames may still have pending consumers)
            opcache.deregister("rrf_fuse", mine)
            b = bad[0]
            if b["__n"] > 1:
                raise ValueError(
                    f"rrf_fuse: ranking {i} lists a (query, doc) pair more "
                    "than once — its rank is ambiguous; dedup upstream"
                )
            raise ValueError(
                f"rrf_fuse: ranking {i} has a NULL or < 1 {rank_col!r} — "
                "ranks are 1-based integers (the retrieval operators' "
                "row_number contract)"
            )
        parts.append(
            slim.select(
                F.col(query_col).alias("__q"),
                F.col(doc_col).alias("__d"),
                (F.lit(w[i]) / (F.lit(float(c)) + F.col(rank_col))).alias(f"__s{i}"),
            )
        )
    fused = parts[0]
    for i, p in enumerate(parts[1:], start=1):
        fused = fused.join(p, ["__q", "__d"], "full_outer")
    # fixed-order fold (s_0 + s_1 + ...), not an agg: engine-exact
    score = F.coalesce(F.col("__s0"), F.lit(0.0))
    for i in range(1, len(parts)):
        score = score + F.coalesce(F.col(f"__s{i}"), F.lit(0.0))
    win = Window.partitionBy(query_col).orderBy(F.desc("rrf_score"), F.asc(doc_col))
    return (
        fused.select(
            F.col("__q").alias(query_col),
            F.col("__d").alias(doc_col),
            score.alias("rrf_score"),
        )
        .withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
    )


def mmr_rerank(
    candidates: DataFrame,
    vectors: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    score_col: str = "rrf_score",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-rank (Carbonell & Goldstein,
    SIGIR 1998) of a per-query candidate list — the diversity stage
    after fusion: ten near-identical copies of the best hit waste
    nine context slots, so each pick trades relevance against
    similarity to what is already picked:

        mmr(d) = lam * rel(d) - (1 - lam) * max_{s in S} cos(d, s)

    greedily for ``k`` rounds (first pick = pure relevance; lam = 1
    reproduces the input order). Returns (query, doc, mmr_score,
    rank) where ``mmr_score`` is the objective AT SELECTION TIME.

    Determinism: candidates process in ascending ``doc_col`` order
    and every argmax tie breaks toward the smaller doc id, so the
    result is independent of input partitioning — exact-duplicate
    embeddings (the planted-clone fixture shape) tie on every score
    and resolve by id on any engine.

    Spark shape: candidates are O(|Q| * k') by the retrieval egress
    contract, so the doc-vector equi-join is key-pruned against the
    corpus table and each query group is model-sized; the greedy loop
    runs in one applyInPandas kernel per query — numpy GEMM over a
    k' x d matrix, O(k' ** 2 * d) per query and embarrassingly
    parallel across queries. Nothing here scales with corpus size.
    Zero-norm candidate vectors carry similarity 0 (they repel
    nothing). Candidates MISSING from ``vectors``, duplicate
    (query, doc) rows (from duplicate candidates or duplicate vector
    ids), and non-finite scores or vector elements are refused loudly
    in one probe — each would silently re-rank a different list or
    re-emit a picked doc. The candidate-vector join persists for the
    probe + plan pair (release per corpus via
    ``d2d_spark.cache.release("mmr_rerank")``; a refused call
    releases its own frame)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    if k < 1:
        raise ValueError(f"mmr_rerank: k must be >= 1, got {k}")
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"mmr_rerank: lam must be in [0, 1], got {lam}")
    for col in (query_col, doc_col, score_col):
        if col not in candidates.columns:
            raise ValueError(f"mmr_rerank: candidates lack column {col!r}")
    from pyspark import StorageLevel

    from d2d_spark import cache as opcache

    slim = candidates.select(query_col, doc_col, score_col)
    # persist: the validation probe AND the returned plan both consume
    # the join, and the upstream is typically a whole retrieval
    # pipeline (the rrf_fuse discipline — recompute-per-consumer
    # measured several-fold there); registered for per-corpus release
    joined = opcache.register(
        "mmr_rerank",
        slim.join(
            vectors.select(F.col(id_col).alias(doc_col), F.col(vec_col).alias("__vec")),
            doc_col,
            "left",
        ).persist(StorageLevel.MEMORY_AND_DISK),
    )
    # ONE probe job, every silent-corruption mode at once: a missing
    # vector or a duplicate (query, doc) — from duplicate candidates
    # OR duplicate vector ids fanning the join — re-ranks a different
    # list; a non-finite score or vector element poisons the argmax
    # (-inf ties with the masked picked entries, NaN propagates
    # through max_sim) and re-emits an already-picked doc
    sc = F.col(score_col).cast("double")
    bad = (
        joined.groupBy(query_col, doc_col)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.max(F.col("__vec").isNull().cast("int")).alias("__novec"),
            F.max(
                (sc.isNull() | F.isnan(sc) | (F.abs(sc) == F.lit(float("inf"))))
                .cast("int")
            ).alias("__badscore"),
            F.max(
                F.coalesce(
                    F.exists(
                        "__vec", lambda x: x.isNull() | F.isnan(x.cast("double"))
                    ),
                    F.lit(False),
                ).cast("int")
            ).alias("__badel"),
        )
        .filter(
            (F.col("__n") > 1)
            | (F.col("__novec") > 0)
            | (F.col("__badscore") > 0)
            | (F.col("__badel") > 0)
        )
        .limit(1)
        .collect()
    )
    if bad:
        # a failed call has no consumer — drop what THIS call persisted
        opcache.deregister("mmr_rerank", [joined])
        b = bad[0]
        what = (
            "appears more than once (duplicate candidates or duplicate "
            "vector ids fanning the join)" if b["__n"] > 1
            else "has no corpus vector" if b["__novec"]
            else f"has a NULL/NaN/Inf {score_col!r}" if b["__badscore"]
            else "has a NULL/NaN element in its vector"
        )
        raise ValueError(
            f"mmr_rerank: candidate (query {b[query_col]!r}, doc "
            f"{b[doc_col]!r}) {what} — a silently dropped, duplicated or "
            "poisoned candidate would re-rank a different list; fix upstream"
        )
    out_schema = T.StructType(
        [
            joined.schema[query_col],
            joined.schema[doc_col],
            T.StructField("mmr_score", T.DoubleType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )
    lam_f = float(lam)
    kk = int(k)

    def kernel(pdf: pd.DataFrame):
        # ascending doc order => np.argmax's first-occurrence rule IS
        # the smallest-id tie-break (the twin mirrors this exactly)
        pdf = pdf.sort_values(doc_col, kind="mergesort").reset_index(drop=True)
        X = np.array(list(pdf["__vec"]), dtype=np.float64)
        n = np.linalg.norm(X, axis=1)
        Xn = np.divide(X, np.maximum(n, 1e-300)[:, None])
        Xn[n == 0] = 0.0  # zero vectors repel nothing
        rel = pdf[score_col].to_numpy(dtype=np.float64)
        m = len(pdf)
        picked: list[int] = []
        scores: list[float] = []
        max_sim = np.zeros(m, dtype=np.float64)
        active = np.ones(m, dtype=bool)
        for _ in range(min(kk, m)):
            mmr = lam_f * rel - (1.0 - lam_f) * max_sim
            mmr[~active] = -np.inf
            i = int(np.argmax(mmr))
            picked.append(i)
            scores.append(float(mmr[i]))
            active[i] = False
            max_sim = np.maximum(max_sim, Xn @ Xn[i])
        return pd.DataFrame(
            {
                query_col: pdf[query_col].iloc[picked].to_numpy(),
                doc_col: pdf[doc_col].iloc[picked].to_numpy(),
                "mmr_score": scores,
                "rank": np.arange(1, len(picked) + 1, dtype=np.int32),
            }
        )

    return joined.groupBy(query_col).applyInPandas(kernel, out_schema)


def ndcg_at_k(
    ranked: DataFrame,
    truth: DataFrame,
    query_col: str,
    doc_col: str,
    k: int,
    rank_col: str = "rank",
    rel_col: str = "rel",
    out_col: str = "ndcg",
) -> DataFrame:
    """Per-query nDCG@k of a ranked result against graded relevance
    labels — the ranking-quality companion to stats.binary_auc (AUC
    scores a classifier's ORDER; nDCG scores a retrieval CUTOFF with
    position discounting):

        DCG@k  = sum_{i<=k} (2^rel_i - 1) / log2(i + 1)
        nDCG@k = DCG@k / IDCG@k   (IDCG = DCG of the ideal ordering)

    ``ranked``: (query, doc, rank) rows — 1-based, unique per query
    (the retrieval operators' output contract; duplicates or rank 0
    refuse loudly). ``truth``: (query, doc, rel) graded labels;
    unlabeled retrieved docs count rel=0 and unretrieved labeled docs
    hurt only through the ideal. Queries with NO positive labels are
    dropped (nDCG undefined), like the classic trec_eval convention.

    Determinism: the per-query fold sums gains in RANK order inside
    one `F.aggregate` over the sorted (rank, gain) array — a
    fixed-order float fold, partition- and engine-exact (the rrf
    discipline); the ideal fold sorts gains descending with the same
    array machinery. Per-query state is <= k gains plus the query's
    labeled set — egress-contract-sized, never corpus-sized.

    Shape: one left join on (query, doc) + two per-query aggregates.
    At 100 TB the join carries O(|Q| * k) ranked rows against the
    label store; everything downstream is query-count-sized."""
    if k < 1:
        raise ValueError(f"ndcg_at_k: k must be >= 1, got {k}")
    for c, df_, what in (
        (query_col, ranked, "ranked"), (doc_col, ranked, "ranked"),
        (rank_col, ranked, "ranked"), (query_col, truth, "truth"),
        (doc_col, truth, "truth"), (rel_col, truth, "truth"),
    ):
        if c not in df_.columns:
            raise ValueError(f"ndcg_at_k: {what} frame lacks column {c!r}")
    bad = (
        ranked.filter(F.col(rank_col).isNull() | (F.col(rank_col) < 1))
        .limit(1)
        .count()
    )
    if bad:
        raise ValueError("ndcg_at_k: ranks must be 1-based non-NULL integers")
    dup = (
        ranked.groupBy(query_col, rank_col)
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError(
            "ndcg_at_k: duplicate (query, rank) rows — the input is not a "
            "ranking; dedupe or re-rank upstream"
        )
    # duplicate labels fan out the left join and double-count gains in
    # the DCG fold, silently inflating nDCG — refuse them like ranks
    tdup = (
        truth.groupBy(query_col, doc_col)
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .count()
    )
    if tdup:
        raise ValueError(
            "ndcg_at_k: duplicate (query, doc) truth labels — they fan out "
            "the join and double-count gains; dedupe the label store first"
        )
    q, d = F.col(query_col), F.col(doc_col)
    gain = F.pow(F.lit(2.0), F.col(rel_col).cast("double")) - F.lit(1.0)
    top = ranked.filter(F.col(rank_col) <= k).join(
        truth.select(q.alias("__q"), d.alias("__d"), gain.alias("__g")),
        (q == F.col("__q")) & (d == F.col("__d")),
        "left",
    ).select(q.alias("__q2"), F.col(rank_col).alias("__r"),
             F.coalesce("__g", F.lit(0.0)).alias("__g"))
    # fixed-order folds: sort the (rank, gain) pairs, then accumulate
    # gain/log2(rank+1) left-to-right — no SQL SUM over rows anywhere
    def fold(arr):
        return F.aggregate(
            arr,
            F.lit(0.0),
            lambda acc, x: acc
            + x["g"] / F.log2(x["r"].cast("double") + F.lit(1.0)),
        )

    dcg = (
        top.groupBy(F.col("__q2").alias(query_col))
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__r").alias("r"), F.col("__g").alias("g")))
            ).alias("__a")
        )
        .select(query_col, fold(F.col("__a")).alias("__dcg"))
    )
    ideal = (
        truth.filter(gain > 0)
        .groupBy(q.alias(query_col))
        .agg(
            F.slice(
                F.reverse(F.array_sort(F.collect_list(gain.alias("g")))), 1, k
            ).alias("__gs")
        )
        .select(
            query_col,
            F.aggregate(
                F.transform(
                    F.col("__gs"),
                    lambda g, i: F.struct((i + 1).alias("r"), g.alias("g")),
                ),
                F.lit(0.0),
                lambda acc, x: acc
                + x["g"] / F.log2(x["r"].cast("double") + F.lit(1.0)),
            ).alias("__idcg"),
        )
    )
    return ideal.join(dcg, query_col, "left").select(
        query_col,
        (F.coalesce("__dcg", F.lit(0.0)) / F.col("__idcg")).alias(out_col),
    )
