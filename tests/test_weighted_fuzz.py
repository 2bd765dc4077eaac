"""Property-based fuzz: weighted_jaccard_pairs and rrf_fuse vs
brute-force in-Python oracles over arbitrary weighted profiles and
rankings — empty overlaps, single-token profiles, all-equal weights,
threshold boundaries hit exactly (integer cross-multiplication makes
the boundary testable, unlike a float epsilon)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from d2d_spark.operators.dedup import weighted_jaccard_pairs
from d2d_spark.operators.retrieval import rrf_fuse

TOKENS = ["a", "b", "c", "d", "e"]

profiles_strategy = st.dictionaries(
    keys=st.integers(0, 6),
    values=st.dictionaries(
        keys=st.sampled_from(TOKENS),
        values=st.integers(1, 9),
        min_size=1,
        max_size=len(TOKENS),
    ),
    min_size=1,
    max_size=5,
)


def _brute_weighted(profiles, pct):
    out = {}
    ids = sorted(profiles)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            pa, pb = profiles[ids[x]], profiles[ids[y]]
            mn = sum(min(pa.get(t, 0), pb.get(t, 0)) for t in set(pa) | set(pb))
            if mn == 0:
                continue  # no shared token -> never a candidate pair
            mx = sum(max(pa.get(t, 0), pb.get(t, 0)) for t in set(pa) | set(pb))
            if 100 * mn >= pct * mx:
                out[(ids[x], ids[y])] = (
                    mn,
                    sum(pa.values()),
                    sum(pb.values()),
                )
    return out


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(profiles=profiles_strategy, pct=st.sampled_from([1, 30, 50, 100]))
def test_weighted_jaccard_fuzz_matches_brute_force(_spark, profiles, pct):
    rows = [(i, t, w) for i, p in profiles.items() for t, w in p.items()]
    df = _spark.createDataFrame(rows, "id long, tok string, w long")
    got = {
        (r["id_a"], r["id_b"]): (r["w_shared"], r["w_a"], r["w_b"])
        for r in weighted_jaccard_pairs(
            df, "id", "tok", "w", threshold_pct=pct, max_df=None
        ).collect()
    }
    assert got == _brute_weighted(profiles, pct)


rankings_strategy = st.lists(
    # one ranking = per-query permutations of a doc subset, encoded as
    # a list of (query, doc) in rank order per query
    st.dictionaries(
        keys=st.integers(0, 2),
        values=st.lists(st.integers(0, 8), min_size=1, max_size=5, unique=True),
        min_size=1,
        max_size=3,
    ),
    min_size=1,
    max_size=3,
)


def _brute_rrf(ranking_dicts, k, c):
    scores: dict[int, dict[int, float]] = {}
    for rd in ranking_dicts:
        for q, docs in rd.items():
            for rank, d in enumerate(docs, start=1):
                scores.setdefault(q, {}).setdefault(d, 0.0)
                scores[q][d] += 1.0 / (c + rank)
    out = {}
    for q, ds in scores.items():
        ordered = sorted(ds.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        for rank, (d, s) in enumerate(ordered, start=1):
            out[(q, d)] = (s, rank)
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(ranking_dicts=rankings_strategy, k=st.sampled_from([1, 3, 10]))
def test_rrf_fuzz_matches_brute_force(_spark, ranking_dicts, k):
    frames = []
    for rd in ranking_dicts:
        rows = [
            (q, d, rank)
            for q, docs in rd.items()
            for rank, d in enumerate(docs, start=1)
        ]
        frames.append(
            _spark.createDataFrame(rows, "query_id long, doc_id long, rank int")
        )
    got = {
        (r["query_id"], r["doc_id"]): (r["rrf_score"], r["rank"])
        for r in rrf_fuse(frames, k=k).collect()
    }
    want = _brute_rrf(ranking_dicts, k, 60.0)
    assert set(got) == set(want)
    for key, (s, rank) in want.items():
        assert got[key][1] == rank
        # the Spark fold sums the per-system terms in system order; the
        # brute force does the same adds in the same order -> exact
        assert got[key][0] == s
