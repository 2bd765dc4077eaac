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


def brute_force_dir(lrows, rrows, direction, tol=None):
    out = []
    for i, (k, ts) in enumerate(lrows):
        back = [(rts, val) for (rk, rts), val in rrows.items() if rk == k and rts <= ts]
        fwd = [(rts, val) for (rk, rts), val in rrows.items() if rk == k and rts >= ts]
        b = max(back) if back else None
        f = min(fwd) if fwd else None
        if tol is not None:
            if b is not None and b[0] < ts - tol:
                b = None
            if f is not None and f[0] > ts + tol:
                f = None
        if direction == "backward":
            best = b
        elif direction == "forward":
            best = f
        else:  # nearest, ties -> backward
            if b is None:
                best = f
            elif f is None:
                best = b
            else:
                best = f if (f[0] - ts) < (ts - b[0]) else b
        out.append((i, k, ts, best[1] if best else None))
    return sorted(out)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lrows=left_rows,
    rrows=right_rows,
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    tol=st.one_of(st.none(), st.integers(0, 10)),
)
def test_asof_join_directions_match_brute_force(_spark, lrows, rrows, direction, tol):
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
            left, right, on="k", left_ts="ts", right_ts="rts",
            direction=direction,
            tolerance=None if tol is None else f"{tol} seconds",
        ).collect()
    )
    want = sorted(
        (i, k, v) for i, k, _, v in brute_force_dir(lrows, rmap, direction, tol=tol)
    )
    assert got == want


def test_asof_nearest_tie_goes_backward(_spark):
    spark = _spark
    left = spark.createDataFrame([(0, "a", 10)], "idx long, k string, ts long")
    right = spark.createDataFrame(
        [("a", 7, 100), ("a", 13, 200)], "k string, rts long, val long"
    )
    got = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts", direction="nearest"
    ).collect()
    assert got[0]["val"] == 100  # equidistant -> backward wins
    # exact-timestamp match is inclusive in every direction
    right2 = spark.createDataFrame([("a", 10, 7)], "k string, rts long, val long")
    for d in ("backward", "forward", "nearest"):
        assert asof_join(
            left, right2, on="k", left_ts="ts", right_ts="rts", direction=d
        ).collect()[0]["val"] == 7
    import pytest as pt

    with pt.raises(ValueError, match="direction"):
        asof_join(left, right, on="k", left_ts="ts", right_ts="rts", direction="up")


def test_asof_null_payload_column_is_not_resurrected(_spark):
    """A matched right row's NULL column must stay NULL — per-column
    carries would resurrect a stale value from an OLDER right row
    (pandas merge_asof is row-wise)."""
    spark = _spark
    left = spark.createDataFrame([(0, "a", 3)], "idx long, k string, ts long")
    right = spark.createDataFrame(
        [("a", 1, 5, "x"), ("a", 2, None, "y")],
        "k string, rts long, val long, tag string",
    )
    for d in ("backward", "nearest"):
        r = asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts", direction=d
        ).collect()[0]
        assert r["val"] is None and r["tag"] == "y", d  # one ROW, not a mix
    fwd_right = spark.createDataFrame(
        [("a", 4, None, "y"), ("a", 9, 5, "x")],
        "k string, rts long, val long, tag string",
    )
    r = asof_join(
        left, fwd_right, on="k", left_ts="ts", right_ts="rts", direction="forward"
    ).collect()[0]
    assert r["val"] is None and r["tag"] == "y"


def test_asof_nearest_microsecond_equidistant_tie_goes_backward(_spark):
    """The reviewer-found case: double-cast epochs round at ~0.24us
    near 2024, flipping an exactly equidistant tie to forward —
    distances must compare as unix_micros longs."""
    spark = _spark
    base_us = 1566379815072828
    d_us = 4156011

    def ts(us):
        import datetime as dtm

        return dtm.datetime(1970, 1, 1) + dtm.timedelta(microseconds=us)

    left = spark.createDataFrame([(0, "a", ts(base_us))], "idx long, k string, t timestamp")
    right = spark.createDataFrame(
        [("a", ts(base_us - d_us), 1), ("a", ts(base_us + d_us), 2)],
        "k string, rt timestamp, val long",
    )
    r = asof_join(
        left, right, on="k", left_ts="t", right_ts="rt", direction="nearest"
    ).collect()[0]
    assert r["val"] == 1  # backward wins the exact tie


# ---------- merge_intervals ----------


def _py_merge(rows, tol):
    out = {}
    by = {}
    for k, s, e in rows:
        by.setdefault(k, []).append((s, e))
    for k, ivs in by.items():
        ivs.sort()
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1] + tol:
                merged[-1][1] = max(merged[-1][1], e)
                merged[-1][2] += 1
            else:
                merged.append([s, e, 1])
        out[k] = [tuple(m) for m in merged]
    return out


def test_merge_intervals_matches_python(spark):
    import pytest
    from pyspark.sql import functions as F

    from d2d_spark.operators.join import merge_intervals

    rows = [
        ("a", 1.0, 3.0), ("a", 3.0, 5.0),      # touching: merge
        ("a", 9.0, 12.0), ("a", 10.0, 11.0),   # containment
        ("a", 20.0, 21.0),
        ("b", 1.0, 2.0), ("b", 4.0, 5.0),      # gap 2: apart at tol 0
    ]
    df = spark.createDataFrame(rows, "k string, s double, e double")
    for tol in (0.0, 2.0):
        got = {}
        for r in merge_intervals(df.repartition(5), ["k"], "s", "e", tolerance=tol).collect():
            got.setdefault(r["k"], []).append((r["s"], r["e"], r["n_merged"]))
        for k in got:
            got[k].sort()
        assert got == _py_merge(rows, tol), tol
    # keyless (global) mode
    glob = merge_intervals(df, None, "s", "e").collect()
    assert {(r["s"], r["e"]) for r in glob} == {
        (1.0, 5.0), (9.0, 12.0), (20.0, 21.0),
    }
    # timestamp flavor with an interval-string tolerance
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    tdf = spark.createDataFrame(
        [
            ("u", t0, t0 + dt.timedelta(minutes=10)),
            ("u", t0 + dt.timedelta(minutes=14), t0 + dt.timedelta(minutes=20)),
            ("u", t0 + dt.timedelta(hours=2), t0 + dt.timedelta(hours=3)),
        ],
        "k string, s timestamp, e timestamp",
    )
    out = merge_intervals(tdf, ["k"], "s", "e", tolerance="5 minutes").collect()
    assert sorted((r["s"], r["e"], r["n_merged"]) for r in out) == [
        (t0, t0 + dt.timedelta(minutes=20), 2),
        (t0 + dt.timedelta(hours=2), t0 + dt.timedelta(hours=3), 1),
    ]
    # guards
    with pytest.raises(ValueError, match="reversed"):
        merge_intervals(
            spark.createDataFrame([("a", 5.0, 1.0)], "k string, s double, e double"),
            ["k"], "s", "e",
        )
    with pytest.raises(ValueError, match="reversed"):
        merge_intervals(
            spark.createDataFrame([(None, 1.0, 2.0)], "k string, s double, e double"),
            ["k"], "s", "e",
        )
    with pytest.raises(ValueError, match="tolerance"):
        merge_intervals(df, ["k"], "s", "e", tolerance=-1.0)
