"""Property-based fuzz: mmr_rerank vs a brute-force in-Python greedy
over arbitrary candidate lists and vector tables — duplicate vectors
(exact score ties), zero vectors, negative components, k larger than
the candidate count, and the lam extremes."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from d2d_spark.operators.retrieval import mmr_rerank


def _py_mmr(cands, vecs, k, lam):
    """Plain-Python greedy MMR (ascending-id processing, min-id
    tie-break) — independent of the operator's numpy kernel."""
    items = sorted(cands)

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v] if n > 0 else [0.0] * len(v)

    U = {d: unit(vecs[d]) for d, _ in items}
    out = []
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
        out.append((best, best_s))
        active.discard(best)
        ub = U[best]
        for d, _ in items:
            max_sim[d] = max(max_sim[d], sum(a * b for a, b in zip(U[d], ub)))
    return out


# small universes keep each Spark round-trip cheap while still hitting
# duplicates, zero vectors and ties
vec_strategy = st.lists(
    st.sampled_from(
        [
            [1.0, 0.0, 0.0],
            [0.0, 1.0, 0.0],
            [1.0, 1.0, 0.0],
            [-1.0, 0.5, 0.25],
            [0.0, 0.0, 0.0],  # zero vector: repels nothing
            [0.5, 0.5, 0.5],
        ]
    ),
    min_size=2,
    max_size=8,
)
rel_strategy = st.lists(
    st.sampled_from([0.0, 0.125, 0.25, 0.5, 0.75, 1.0]), min_size=2, max_size=8
)


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vecs=vec_strategy,
    rels=rel_strategy,
    k=st.integers(1, 10),
    lam=st.sampled_from([0.0, 0.3, 0.7, 1.0]),
)
def test_mmr_fuzz_matches_python_greedy(_spark, vecs, rels, k, lam):
    n = min(len(vecs), len(rels))
    vec_tbl = {d: vecs[d] for d in range(n)}
    cands = [(d, rels[d]) for d in range(n)]
    cdf = _spark.createDataFrame(
        [(0, d, r) for d, r in cands], "query_id long, doc_id long, rrf_score double"
    )
    vdf = _spark.createDataFrame(
        [(d, v) for d, v in vec_tbl.items()], "vec_id long, embedding array<double>"
    )
    got = sorted(
        (r["rank"], r["doc_id"], r["mmr_score"])
        for r in mmr_rerank(cdf, vdf, k=k, lam=lam).collect()
    )
    want = _py_mmr(cands, vec_tbl, k, lam)
    assert len(got) == len(want)
    # The kernel and the pure-Python scorer can disagree by an ulp on
    # sims that are MATHEMATICALLY tied (duplicate vectors), flipping
    # a tie one way or the other — both chains are valid greedy
    # outputs. So instead of demanding the identical chain, REPLAY the
    # Spark chain under the independent scorer and require each pick
    # to be within 1e-9 of the best available at that step (exact
    # chains still pass trivially).
    items = sorted(cands)

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v] if n > 0 else [0.0] * len(v)

    U = {d: unit(vec_tbl[d]) for d, _ in items}
    active = {d for d, _ in items}
    max_sim = {d: 0.0 for d, _ in items}
    for _, gd, gs in got:
        scores = {
            d: lam * rel - (1.0 - lam) * max_sim[d]
            for d, rel in items
            if d in active
        }
        best_s = max(scores.values())
        assert scores[gd] >= best_s - 1e-9, (gd, lam)
        assert abs(gs - scores[gd]) < 1e-9, (gd, lam)
        active.discard(gd)
        ug = U[gd]
        for d, _ in items:
            max_sim[d] = max(max_sim[d], sum(a * b for a, b in zip(U[d], ug)))
    # every emitted doc exactly once, ranks dense from 1
    assert [g[0] for g in got] == list(range(1, len(want) + 1))
    assert len({g[1] for g in got}) == len(got)
