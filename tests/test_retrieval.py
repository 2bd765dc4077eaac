"""rrf_fuse — reciprocal rank fusion over per-query rankings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from d2d_spark.operators.retrieval import rrf_fuse


def _rank_df(spark, rows):
    return spark.createDataFrame(rows, "query_id long, doc_id long, rank int")


def test_rrf_matches_naive_python(spark):
    """Fused scores and ranks equal a per-query dict replay of the
    formula, including docs present in only one list."""
    r1 = _rank_df(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1)])
    r2 = _rank_df(spark, [(1, 11, 1), (1, 13, 2), (2, 21, 1), (2, 20, 2)])
    got = {
        (r["query_id"], r["doc_id"]): (r["rrf_score"], r["rank"])
        for r in rrf_fuse([r1, r2], k=10).collect()
    }
    naive: dict[int, dict[int, float]] = {}
    for df_rows in (
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1)],
        [(1, 11, 1), (1, 13, 2), (2, 21, 1), (2, 20, 2)],
    ):
        for q, d, rk in df_rows:
            naive.setdefault(q, {}).setdefault(d, 0.0)
            naive[q][d] += 1.0 / (60.0 + rk)
    for q, docs in naive.items():
        ordered = sorted(docs.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, (d, s) in enumerate(ordered, start=1):
            assert got[(q, d)] == (pytest.approx(s, abs=0), rank)
    # doc 11 is in both lists for query 1 -> it must fuse to the top
    assert got[(1, 11)][1] == 1


def test_rrf_weights_and_constant(spark):
    """Weights scale each system's contribution; c damps the head."""
    r1 = _rank_df(spark, [(1, 10, 1)])
    r2 = _rank_df(spark, [(1, 11, 1)])
    out = {
        r["doc_id"]: r["rrf_score"]
        for r in rrf_fuse([r1, r2], weights=[3.0, 1.0], c=10.0).collect()
    }
    assert out[10] == pytest.approx(3.0 / 11.0, abs=0)
    assert out[11] == pytest.approx(1.0 / 11.0, abs=0)


def test_rrf_k_truncation_and_tie_break(spark):
    """Equal fused scores break by ascending doc id; k truncates."""
    r1 = _rank_df(spark, [(1, 30, 1), (1, 20, 2), (1, 10, 3)])
    out = rrf_fuse([r1], k=2).orderBy("rank").collect()
    assert [(r["doc_id"], r["rank"]) for r in out] == [(30, 1), (20, 2)]
    # two single-system lists with mirrored ranks -> all-equal scores
    r2 = _rank_df(spark, [(1, 5, 1), (1, 7, 1)])
    with pytest.raises(ValueError, match="more than"):
        rrf_fuse([_rank_df(spark, [(1, 5, 1), (1, 5, 2)])])
    tied = rrf_fuse([r2], k=5).orderBy("rank").collect()
    assert [(r["doc_id"], r["rank"]) for r in tied] == [(5, 1), (7, 2)]


def test_rrf_validation(spark):
    r1 = _rank_df(spark, [(1, 10, 1)])
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="c must be"):
        rrf_fuse([r1], c=0)
    with pytest.raises(ValueError, match="k must be"):
        rrf_fuse([r1], k=0)
    with pytest.raises(ValueError, match="weights"):
        rrf_fuse([r1], weights=[1.0, 2.0])
    with pytest.raises(ValueError, match="lacks columns"):
        rrf_fuse([r1.drop("rank")])
    with pytest.raises(ValueError, match="1-based"):
        rrf_fuse([_rank_df(spark, [(1, 10, 0)])])  # 0-based off-by-one
    with pytest.raises(ValueError, match="1-based"):
        rrf_fuse([spark.createDataFrame([(1, 10, None)],
                                        "query_id long, doc_id long, rank int")])


def test_rrf_hybrid_bm25_dense_end_to_end(spark, sf_dir):
    """The intended composition: BM25 lexical + dense cosine rankings
    over the same corpus fuse into one list; a doc strong in both
    systems outranks a doc strong in only one."""
    from d2d_spark.operators.similarity import brute_force_topk
    from d2d_spark.operators.tfidf import bm25_search
    from d2d_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = read_table(spark, sf_dir, "embeddings")
    corpus = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id", "text", "embedding"
    )
    queries = corpus.filter(F.col("doc_id") % 100 == 0).limit(3)
    lex = bm25_search(
        corpus, queries.select(F.col("doc_id").alias("qid"), "text"),
        "text", "doc_id", "text", "qid", k=5,
    ).select("query_id", "doc_id", "rank")
    dense = brute_force_topk(
        corpus, queries, "doc_id", "embedding", "doc_id", "embedding", k=5
    ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
    fused = rrf_fuse([lex, dense], k=5)
    rows = fused.collect()
    assert rows, "fusion produced nothing"
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    for q, rs in per_q.items():
        ranks = sorted(x["rank"] for x in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert all(x["rrf_score"] > 0 for x in rs)


def _py_mmr(cands, vecs, k, lam):
    """Independent greedy MMR replay: cands = [(doc, rel)], vecs =
    {doc: list}; plain-Python loops, cosine from math, ties -> min id."""
    import math

    items = sorted(cands)  # ascending doc id
    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v] if n > 0 else [0.0] * len(v)

    U = {d: unit(vecs[d]) for d, _ in items}
    picked, out = [], []
    active = {d for d, _ in items}
    max_sim = {d: 0.0 for d, _ in items}
    for _ in range(min(k, len(items))):
        best, best_s = None, None
        for d, rel in items:
            if d not in active:
                continue
            s = lam * rel - (1.0 - lam) * max_sim[d]
            if best_s is None or s > best_s:
                best, best_s = d, s
        picked.append(best)
        out.append((best, best_s))
        active.discard(best)
        ub = U[best]
        for d, _ in items:
            sim = sum(a * b for a, b in zip(U[d], ub))
            max_sim[d] = max(max_sim[d], sim)
    return out


def test_mmr_rerank_matches_python_greedy(spark):
    """Operator ≡ the plain-Python greedy on a corpus with planted
    exact-duplicate vectors (ties resolve by id) and a zero vector."""
    import random

    from d2d_spark.operators.retrieval import mmr_rerank

    rng = random.Random(3)
    vecs = {d: [rng.uniform(-1, 1) for _ in range(8)] for d in range(20)}
    vecs[11] = list(vecs[4])  # exact duplicate pair
    vecs[12] = [0.0] * 8      # zero vector: repels nothing
    cands = []
    for q in (0, 1):
        docs = rng.sample(range(20), 12)
        if q == 0:
            docs = sorted(set(docs) | {4, 11, 12})
        for d in docs:
            cands.append((q, d, round(rng.uniform(0, 1), 3)))
    cdf = spark.createDataFrame(cands, "query_id long, doc_id long, rrf_score double")
    vdf = spark.createDataFrame(
        [(d, v) for d, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    for lam in (0.0, 0.5, 0.7, 1.0):
        got = {}
        for r in mmr_rerank(cdf, vdf, k=6, lam=lam).collect():
            got.setdefault(r["query_id"], []).append(
                (r["doc_id"], round(r["mmr_score"], 9), r["rank"])
            )
        for q in (0, 1):
            rel = {(d): s for qq, d, s in cands if qq == q}
            want = _py_mmr(list(rel.items()), vecs, 6, lam)
            got_q = sorted(got[q], key=lambda t: t[2])
            assert [g[0] for g in got_q] == [w[0] for w in want], (q, lam)
            for (gd, gs, _), (wd, ws) in zip(got_q, want):
                assert abs(gs - ws) < 1e-9, (q, lam, gd)


def test_mmr_rerank_lam1_is_relevance_order_and_guards(spark):
    import pytest
    from pyspark.sql import functions as F

    from d2d_spark.operators.retrieval import mmr_rerank

    cdf = spark.createDataFrame(
        [(0, 1, 0.9), (0, 2, 0.7), (0, 3, 0.8)],
        "query_id long, doc_id long, rrf_score double",
    )
    vdf = spark.createDataFrame(
        [(d, [float(d), 1.0]) for d in (1, 2, 3)],
        "vec_id long, embedding array<double>",
    )
    rows = mmr_rerank(cdf, vdf, k=3, lam=1.0).orderBy("rank").collect()
    assert [r["doc_id"] for r in rows] == [1, 3, 2]  # pure relevance
    assert [r["rank"] for r in rows] == [1, 2, 3]
    with pytest.raises(ValueError, match="lam"):
        mmr_rerank(cdf, vdf, lam=1.5)
    with pytest.raises(ValueError, match="k must"):
        mmr_rerank(cdf, vdf, k=0)
    with pytest.raises(ValueError, match="lack column"):
        mmr_rerank(cdf.drop("rrf_score"), vdf)
    with pytest.raises(ValueError, match="no corpus vector"):
        mmr_rerank(cdf, vdf.filter(F.col("vec_id") != 2))
    with pytest.raises(ValueError, match="NULL/NaN/Inf"):
        mmr_rerank(
            cdf.withColumn(
                "rrf_score",
                F.when(F.col("doc_id") == 2, F.lit(None)).otherwise(F.col("rrf_score")),
            ),
            vdf,
        )
    # -inf relevance would tie with the masked picked entries in the
    # argmax and re-emit a picked doc — must refuse, not corrupt
    with pytest.raises(ValueError, match="NULL/NaN/Inf"):
        mmr_rerank(
            cdf.withColumn(
                "rrf_score",
                F.when(F.col("doc_id") == 2, F.lit(float("-inf"))).otherwise(
                    F.col("rrf_score")
                ),
            ),
            vdf,
        )
    # duplicate vector ids fan the join: same doc at two ranks
    with pytest.raises(ValueError, match="more than once"):
        mmr_rerank(cdf, vdf.unionByName(vdf.filter(F.col("vec_id") == 2)))
    # duplicate (query, doc) candidates are just as ambiguous
    with pytest.raises(ValueError, match="more than once"):
        mmr_rerank(cdf.unionByName(cdf.limit(1)), vdf)
    # a NaN ELEMENT inside a non-NULL vector poisons max_sim
    with pytest.raises(ValueError, match="NULL/NaN element"):
        mmr_rerank(
            cdf,
            vdf.withColumn(
                "embedding",
                F.when(
                    F.col("vec_id") == 3,
                    F.array(F.lit(float("nan")), F.lit(1.0)),
                ).otherwise(F.col("embedding")),
            ),
        )


def test_mmr_rerank_partitioning_invariance(spark):
    """Same result on 1 and 16 input partitions (the tie-break and
    sort discipline, not partition luck)."""
    import random

    from d2d_spark.operators.retrieval import mmr_rerank

    rng = random.Random(9)
    cands = [(q, d, round(rng.uniform(0, 1), 3)) for q in range(5) for d in rng.sample(range(40), 15)]
    vecs = [(d, [rng.uniform(-1, 1) for _ in range(6)]) for d in range(40)]
    cdf = spark.createDataFrame(cands, "query_id long, doc_id long, rrf_score double")
    vdf = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    a = sorted(
        tuple(r) for r in mmr_rerank(cdf.repartition(1), vdf, k=5, lam=0.6).collect()
    )
    b = sorted(
        tuple(r) for r in mmr_rerank(cdf.repartition(16), vdf, k=5, lam=0.6).collect()
    )
    assert a == b


def _py_ndcg(ranked, truth, k):
    import math

    rel = {(q, d): r for q, d, r in truth}
    out = {}
    queries = {q for q, _, r in truth if r > 0}
    for q in queries:
        by_rank = sorted(((r, d) for qq, d, r in ranked if qq == q and r <= k))
        dcg = sum(
            (2.0 ** rel.get((q, d), 0) - 1.0) / math.log2(r + 1.0)
            for r, d in by_rank
        )
        gains = sorted(
            (2.0 ** r - 1.0 for qq, _, r in truth if qq == q), reverse=True
        )[:k]
        idcg = sum(g / math.log2(i + 2.0) for i, g in enumerate(gains))
        out[q] = dcg / idcg
    return out


def test_ndcg_at_k_matches_twin_and_edges(spark):
    import pytest

    from d2d_spark.operators.retrieval import ndcg_at_k

    ranked = [  # (query, doc, rank)
        ("q1", "a", 1), ("q1", "b", 2), ("q1", "x", 3), ("q1", "c", 4),
        ("q2", "z", 1), ("q2", "y", 2),          # reversed relevance
        ("q3", "m", 1),                          # no positive labels
        ("q4", "n", 1),                          # positives never retrieved
    ]
    truth = [  # (query, doc, rel) graded
        ("q1", "a", 3), ("q1", "b", 2), ("q1", "c", 1), ("q1", "d", 1),
        ("q2", "y", 2), ("q2", "z", 0),
        ("q3", "m", 0),
        ("q4", "p", 2),
    ]
    rdf = spark.createDataFrame(ranked, ["query", "doc", "rank"]).repartition(5)
    tdf = spark.createDataFrame(truth, ["query", "doc", "rel"]).repartition(3)
    for k in (2, 3, 10):
        got = {r["query"]: r["ndcg"] for r in ndcg_at_k(rdf, tdf, "query", "doc", k).collect()}
        exp = _py_ndcg(ranked, truth, k)
        assert set(got) == set(exp)  # q3 (no positives) is absent
        for q in exp:
            assert got[q] == exp[q], (k, q, got[q], exp[q])
    # ideal ranking scores exactly 1.0
    ideal = spark.createDataFrame(
        [("q1", "a", 1), ("q1", "b", 2), ("q1", "c", 3)], ["query", "doc", "rank"]
    )
    t1 = spark.createDataFrame(
        [("q1", "a", 3), ("q1", "b", 2), ("q1", "c", 1)], ["query", "doc", "rel"]
    )
    assert ndcg_at_k(ideal, t1, "query", "doc", 3).collect()[0]["ndcg"] == 1.0
    # retrieved-nothing-relevant query scores 0.0 (q4 above at k=1)
    got1 = {r["query"]: r["ndcg"] for r in ndcg_at_k(rdf, tdf, "query", "doc", 1).collect()}
    assert got1["q4"] == 0.0
    # guards
    with pytest.raises(ValueError, match="k must be"):
        ndcg_at_k(rdf, tdf, "query", "doc", 0)
    with pytest.raises(ValueError, match="1-based"):
        ndcg_at_k(
            spark.createDataFrame([("q", "d", 0)], ["query", "doc", "rank"]),
            t1, "query", "doc", 2,
        )
    with pytest.raises(ValueError, match="duplicate"):
        ndcg_at_k(
            spark.createDataFrame(
                [("q", "d", 1), ("q", "e", 1)], ["query", "doc", "rank"]
            ),
            t1, "query", "doc", 2,
        )
    with pytest.raises(ValueError, match="lacks column"):
        ndcg_at_k(rdf.drop("rank"), tdf, "query", "doc", 2)
    # duplicate (query, doc) truth labels fan out the join and
    # double-count gains — refused loudly (r10)
    with pytest.raises(ValueError, match="truth labels"):
        ndcg_at_k(
            ideal,
            spark.createDataFrame(
                [("q1", "a", 3), ("q1", "a", 2)], ["query", "doc", "rel"]
            ),
            "query", "doc", 2,
        )
