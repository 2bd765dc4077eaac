"""Property-based fuzz: asof_join vs a brute-force in-Python oracle
over arbitrary keyed event sets, and sampling-nestedness invariants.

The planted fixtures in the registry exercise realistic shapes; these
push the edge cases — empty sides, all-ties, matches exactly at the
tolerance boundary, keys present on one side only."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from d2d_spark.operators.join import asof_join

KEYS = ["a", "b", "c"]

# left events: (key, ts) with repeats allowed
left_rows = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 30)), min_size=0, max_size=12
)
# right ticks: unique (key, ts) so the carried-forward winner is
# well-defined (equal-(key,ts) right rows have no deterministic order)
right_rows = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 30)), min_size=0, max_size=12, unique=True
)


def brute_force(lrows, rrows, tol=None):
    out = []
    for i, (k, ts) in enumerate(lrows):
        cands = [(rts, val) for (rk, rts), val in rrows.items() if rk == k and rts <= ts]
        best = max(cands) if cands else None
        if best is not None and tol is not None and best[0] < ts - tol:
            best = None
        out.append((i, k, ts, best[1] if best else None))
    return sorted(out)


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(lrows=left_rows, rrows=right_rows)
def test_asof_join_matches_brute_force(_spark, lrows, rrows):
    spark = _spark
    rmap = {(k, ts): 100 * ts + ord(k) for k, ts in rrows}
    left = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(lrows)] or [(None, None, None)],
        "idx long, k string, ts long",
    )
    if not lrows:
        left = left.filter("idx IS NOT NULL")
    right = spark.createDataFrame(
        [(k, ts, v) for (k, ts), v in rmap.items()] or [(None, None, None)],
        "k string, rts long, val long",
    )
    if not rmap:
        right = right.filter("k IS NOT NULL")

    got = sorted(
        (r["idx"], r["k"], r["ts"], r["val"])
        for r in asof_join(left, right, on="k", left_ts="ts", right_ts="rts").collect()
    )
    assert got == brute_force(lrows, rmap)

    # inner mode = left rows with a match only
    got_inner = sorted(
        (r["idx"], r["k"], r["ts"], r["val"])
        for r in asof_join(left, right, on="k", left_ts="ts", right_ts="rts", how="inner").collect()
    )
    assert got_inner == [row for row in brute_force(lrows, rmap) if row[3] is not None]


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(lrows=left_rows, rrows=right_rows, tol=st.integers(0, 10))
def test_asof_join_tolerance_matches_brute_force(_spark, lrows, rrows, tol):
    spark = _spark
    base = dt.datetime(2024, 1, 1)
    rmap = {(k, ts): 100 * ts + ord(k) for k, ts in rrows}
    left = spark.createDataFrame(
        [(i, k, base + dt.timedelta(seconds=ts)) for i, (k, ts) in enumerate(lrows)]
        or [(None, None, None)],
        "idx long, k string, ts timestamp",
    )
    if not lrows:
        left = left.filter("idx IS NOT NULL")
    right = spark.createDataFrame(
        [(k, base + dt.timedelta(seconds=ts), v) for (k, ts), v in rmap.items()]
        or [(None, None, None)],
        "k string, rts timestamp, val long",
    )
    if not rmap:
        right = right.filter("k IS NOT NULL")

    got = sorted(
        (r["idx"], r["k"], r["val"])
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts", tolerance=f"{tol} seconds"
        ).collect()
    )
    want = [(i, k, v) for i, k, _, v in brute_force(lrows, rmap, tol=tol)]
    assert got == sorted(want)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    keys=st.lists(st.integers(0, 10_000), min_size=1, max_size=40, unique=True),
    f1=st.floats(0.0, 1.0),
    f2=st.floats(0.0, 1.0),
    seed=st.integers(0, 5),
)
def test_hash_sample_nested_and_deterministic(_spark, keys, f1, f2, seed):
    """Growing the fraction only ever ADDS rows (nestedness), and the
    same fraction redraws identically."""
    from d2d_spark.operators.sampling import hash_sample

    spark = _spark
    lo, hi = sorted((f1, f2))
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    small = {r["k"] for r in hash_sample(df, "k", lo, seed).collect()}
    big = {r["k"] for r in hash_sample(df, "k", hi, seed).collect()}
    again = {r["k"] for r in hash_sample(df, "k", lo, seed).collect()}
    assert small <= big
    assert small == again
