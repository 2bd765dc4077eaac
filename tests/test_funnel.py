"""Funnel and retention aggregates vs independent pure-Python folds."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from d2d_spark.operators.funnel import funnel_counts, funnel_stages, retention_cohorts

STEPS = ["view", "click", "purchase"]


def py_funnel(events, steps, within=None):
    """Independent replay of the documented greedy-earliest chain."""
    s = [None] * len(steps)
    for ts, et in sorted(events):
        for k, name in enumerate(steps):
            if s[k] is None and et == name:
                if k == 0:
                    s[k] = ts
                elif s[k - 1] is not None and ts > s[k - 1] and (
                    within is None or ts - s[0] <= within
                ):
                    s[k] = ts
                break
    stage = 0
    for t in s:
        if t is None:
            break
        stage += 1
    return stage, s


def _mk(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime.fromtimestamp(ts, dt.timezone.utc), et) for u, ts, et in rows],
        "user_id long, ts timestamp, event_type string",
    )


CASES = [
    (1, [(10, "view"), (20, "click"), (30, "purchase")]),        # full chain
    (2, [(10, "view"), (20, "purchase"), (30, "click")]),        # purchase too early
    (3, [(10, "click"), (20, "purchase")]),                      # never starts
    (4, [(10, "view"), (10, "click")]),                          # tie: not strictly after
    (5, [(10, "view"), (11, "view"), (500, "click"), (501, "purchase")]),  # window test
    (6, [(10, "view"), (15, "click"), (15, "purchase")]),        # tie at stage 3
    (7, [(10, "other"), (20, "view"), (25, "click")]),           # non-step noise
]


def test_funnel_matches_python(spark):
    rows = [(u, ts, et) for u, evs in CASES for ts, et in evs]
    df = _mk(spark, rows)
    for within in (None, 100.0):
        got = {
            r["user"]: (r["stage"], [r[f"ts_step_{k+1}"] for k in range(3)])
            for r in funnel_stages(df, "user_id", "ts", "event_type", STEPS, within).collect()
        }
        for u, evs in CASES:
            want_stage, want_s = py_funnel(
                [(float(ts), et) for ts, et in evs], STEPS, within
            )
            if all(et not in STEPS for _, et in evs):
                assert u not in got
            else:
                assert got[u] == (want_stage, want_s), (u, within)


def test_funnel_window_cuts_chain(spark):
    df = _mk(spark, [(5, ts, et) for ts, et in CASES[4][1]])
    unbounded = funnel_stages(df, "user_id", "ts", "event_type", STEPS).collect()[0]
    assert unbounded["stage"] == 3
    windowed = funnel_stages(df, "user_id", "ts", "event_type", STEPS, within=100).collect()[0]
    assert windowed["stage"] == 1  # click at +490s falls outside


def test_funnel_counts(spark):
    rows = [(u, ts, et) for u, evs in CASES for ts, et in evs]
    got = {
        r["stage"]: r["n_users"]
        for r in funnel_counts(_mk(spark, rows), "user_id", "ts", "event_type", STEPS).collect()
    }
    # users reaching >= stage: 1,4,5,6,7 start; full chains: 1,5,6... check vs python
    want = {1: 0, 2: 0, 3: 0}
    for u, evs in CASES:
        st, _ = py_funnel([(float(ts), et) for ts, et in evs], STEPS)
        for k in range(1, st + 1):
            want[k] += 1
    assert got == {k: v for k, v in want.items() if v}


def test_funnel_partitioning_invariance(spark):
    rows = [(u, ts, et) for u, evs in CASES for ts, et in evs]
    df = _mk(spark, rows)
    a = sorted(tuple(r) for r in funnel_stages(df, "user_id", "ts", "event_type", STEPS).collect())
    b = sorted(
        tuple(r)
        for r in funnel_stages(
            df.repartition(7), "user_id", "ts", "event_type", STEPS
        ).collect()
    )
    assert a == b


def test_retention(spark):
    day = 86400
    rows = [
        (1, 0 * day + 10, "view"), (1, 1 * day + 10, "view"), (1, 7 * day + 10, "view"),
        (2, 0 * day + 20, "view"), (2, 2 * day + 20, "view"),
        (3, 1 * day + 30, "view"), (3, 2 * day + 30, "view"),  # later cohort
        (3, 1 * day + 40, "view"),  # same-day dup must not double count
    ]
    got = {
        (str(r["cohort_day"]), r["day_offset"]): r["n_users"]
        for r in retention_cohorts(
            _mk(spark, rows), "user_id", "ts", offsets=[0, 1, 2, 7]
        ).collect()
    }
    d0, d1 = "1970-01-01", "1970-01-02"
    assert got == {
        (d0, 0): 2, (d0, 1): 1, (d0, 2): 1, (d0, 7): 1,
        (d1, 0): 1, (d1, 1): 1,
    }


def test_validation(spark):
    df = _mk(spark, [(1, 10, "view")])
    with pytest.raises(ValueError, match=">= 2"):
        funnel_stages(df, "user_id", "ts", "event_type", ["view"])
    with pytest.raises(ValueError, match="distinct"):
        funnel_stages(df, "user_id", "ts", "event_type", ["view", "view"])
    with pytest.raises(ValueError, match="within"):
        funnel_stages(df, "user_id", "ts", "event_type", STEPS, within=0)
    with pytest.raises(ValueError, match="offsets"):
        retention_cohorts(df, "user_id", "ts", offsets=[-1])


def test_whale_key_guard(spark):
    rows = [(1, t, "view") for t in range(10, 15)] + [(2, 10, "view"), (2, 20, "cart")]
    df = _mk(spark, rows)
    with pytest.raises(ValueError, match="max_events_per_user=3"):
        funnel_stages(
            df, "user_id", "ts", "event_type", STEPS, max_events_per_user=3
        )
    with pytest.raises(ValueError, match=">= 1"):
        funnel_stages(
            df, "user_id", "ts", "event_type", STEPS, max_events_per_user=0
        )
    # under the cap: identical output to the unguarded call
    ok = funnel_stages(
        df, "user_id", "ts", "event_type", STEPS, max_events_per_user=5
    )
    plain = funnel_stages(df, "user_id", "ts", "event_type", STEPS)
    assert sorted(map(tuple, ok.collect())) == sorted(map(tuple, plain.collect()))


def test_funnel_universe_emits_stage0_population(spark):
    """universe= makes never-entered users first-class stage-0 rows:
    absent-from-events universe users appear at stage 0 with NULL
    step timestamps; users with events keep their fold result; users
    with events OUTSIDE the universe are kept (widen, never filter);
    NULL/duplicate universe ids collapse."""
    rows = [(u, ts, et) for u, evs in CASES for ts, et in evs]
    df = _mk(spark, rows)
    uni = spark.createDataFrame(
        [(1,), (2,), (99,), (98,), (98,), (None,)], "user_id long"
    )
    base = {r["user"]: r for r in funnel_stages(
        df, "user_id", "ts", "event_type", STEPS
    ).collect()}
    got = {r["user"]: r for r in funnel_stages(
        df, "user_id", "ts", "event_type", STEPS, universe=uni
    ).collect()}
    # every evented user unchanged (incl. 3..7, outside the universe)
    for u, r in base.items():
        assert tuple(got[u]) == tuple(r)
    # never-entered universe users: one stage-0 row each, NULL steps
    for u in (98, 99):
        r = got[u]
        assert r["stage"] == 0
        assert all(r[f"ts_step_{k+1}"] is None for k in range(3))
    assert set(got) == set(base) | {98, 99}  # NULL dropped, 98 deduped
    # counts denominate: stage-0 rows raise the population, not conversions
    n_total = funnel_stages(
        df, "user_id", "ts", "event_type", STEPS, universe=uni
    ).count()
    assert n_total == len(base) + 2


def test_funnel_strict_modes(spark):
    """ClickHouse windowFunnel strictness variants: strict_order
    kills the chain on ANY non-extending step event; strict_dedup
    kills it when a matched step type repeats. Hand-verified
    sequences, each asserted against the documented semantics."""
    from d2d_spark.operators.funnel import funnel_stages

    steps = ["a", "b", "c"]

    def run(rows, mode=None, within=None):
        df = spark.createDataFrame(rows, "u string, t double, s string")
        out = funnel_stages(df, "u", "t", "s", steps, within=within, mode=mode)
        return {r["user"]: r["stage"] for r in out.collect()}

    # clean chain: all modes agree
    clean = [("u", 1.0, "a"), ("u", 2.0, "b"), ("u", 3.0, "c")]
    for m in (None, "strict_order", "strict_dedup"):
        assert run(clean, m)["u"] == 3, m
    # interruption: a, b, a, c — default reaches 3 (the stray 'a' is
    # ignored); strict_order dies at the stray (stage freezes at 2);
    # strict_dedup dies too (repeat of matched 'a')
    inter = [("u", 1.0, "a"), ("u", 2.0, "b"), ("u", 3.0, "a"), ("u", 4.0, "c")]
    assert run(inter)["u"] == 3
    assert run(inter, "strict_order")["u"] == 2
    assert run(inter, "strict_dedup")["u"] == 2
    # out-of-order arrival: c before b — default waits and completes
    # when b then c appear later; strict_order dies at the early 'c'
    ooo = [("u", 1.0, "a"), ("u", 2.0, "c"), ("u", 3.0, "b"), ("u", 4.0, "c")]
    assert run(ooo)["u"] == 3
    assert run(ooo, "strict_order")["u"] == 1
    # strict_dedup: the early 'c' matched NOTHING (b unmatched), so it
    # is not a duplicate — the chain completes
    assert run(ooo, "strict_dedup")["u"] == 3
    # events before the chain starts never kill strict_order
    pre = [("u", 1.0, "b"), ("u", 2.0, "a"), ("u", 3.0, "b"), ("u", 4.0, "c")]
    assert run(pre, "strict_order")["u"] == 3
    # window expiry under strict_order is an interruption too
    win = [("u", 1.0, "a"), ("u", 10.0, "b"), ("u", 11.0, "c")]
    assert run(win, within=5.0)["u"] == 1
    assert run(win, "strict_order", within=5.0)["u"] == 1
    # bad mode refused
    import pytest as pt

    df = spark.createDataFrame(clean, "u string, t double, s string")
    with pt.raises(ValueError, match="mode"):
        funnel_stages(df, "u", "t", "s", steps, mode="strict")


def test_retention_window_days(spark):
    """Return-window retention: window_days widens each offset's hit
    window; a user with several return days inside one window counts
    ONCE; window_days=1 stays the classic exact-day variant."""
    import datetime as dt

    from d2d_spark.operators.funnel import retention_cohorts

    d0 = dt.datetime(2024, 1, 1, 12, 0)
    rows = (
        # u1: cohort day 0, returns on days 8 and 9 (one week-1 hit)
        [("u1", d0), ("u1", d0 + dt.timedelta(days=8)), ("u1", d0 + dt.timedelta(days=9))]
        # u2: cohort day 0, returns on day 13 (still week 1)
        + [("u2", d0), ("u2", d0 + dt.timedelta(days=13))]
        # u3: cohort day 0, returns on day 14 (week 2, NOT week 1)
        + [("u3", d0), ("u3", d0 + dt.timedelta(days=14))]
    )
    df = spark.createDataFrame(rows, "u string, t timestamp")
    weekly = {
        (str(r["cohort_day"]), r["day_offset"]): r["n_users"]
        for r in retention_cohorts(df, "u", "t", offsets=[0, 7, 14], window_days=7).collect()
    }
    assert weekly[("2024-01-01", 0)] == 3
    assert weekly[("2024-01-01", 7)] == 2   # u1 once, u2; u3 is day 14
    assert weekly[("2024-01-01", 14)] == 1  # u3
    # classic exact-day: day 8/9/13 hits vanish
    classic = {
        (str(r["cohort_day"]), r["day_offset"]): r["n_users"]
        for r in retention_cohorts(df, "u", "t", offsets=[0, 7, 14]).collect()
    }
    assert ("2024-01-01", 7) not in classic and classic[("2024-01-01", 14)] == 1
    import pytest as pt

    with pt.raises(ValueError, match="window_days"):
        retention_cohorts(df, "u", "t", offsets=[0], window_days=0)


def _closed_form_strict(rows, steps, within, mode):
    """The ORACLE's algorithms (plans/streaming_q.py funnel_so/sd
    legs), reimplemented in Python: strict_order as the
    consecutive-rank prefix walk from the first step-1 event,
    strict_dedup as the default greedy chain cut at the first repeat
    of a matched step (kill position compared lexicographically in
    (ts, type) order). Pinning fold ≡ closed form on random streams
    is what protects the driver oracle across fixture shapes."""
    se = sorted(((ts, et) for ts, et in rows if et in steps), key=lambda r: (r[0], r[1]))
    if not se:
        return None
    if mode == "strict_order":
        r1 = next((i for i, (_, et) in enumerate(se) if et == steps[0]), None)
        if r1 is None:
            return 0
        t1 = se[r1][0]
        stage, prev = 1, t1
        for k in range(1, len(steps)):
            idx = r1 + k
            if idx >= len(se):
                break
            ts, et = se[idx]
            if et == steps[k] and ts > prev and ts - t1 <= within:
                stage, prev = stage + 1, ts
            else:
                break
        return stage
    # strict_dedup: default greedy matches first
    m = [None] * len(steps)
    cands = [ts for ts, et in se if et == steps[0]]
    if cands:
        m[0] = min(cands)
    for k in range(1, len(steps)):
        if m[k - 1] is None:
            break
        cands = [
            ts for ts, et in se
            if et == steps[k] and ts > m[k - 1] and ts - m[0] <= within
        ]
        if cands:
            m[k] = min(cands)
    # repeat candidates: per matched type, every event at-or-after the
    # match except the match itself (first at e = m_j)
    kill = None
    for j, mj in enumerate(m):
        if mj is None:
            continue
        tail = sorted(ts for ts, et in se if et == steps[j] and ts >= mj)
        for ts in tail[1:]:  # drop one occurrence at mj: the match
            pos = (ts, steps[j])
            if kill is None or pos < kill:
                kill = pos
            break  # only the earliest repeat of this type can matter
    stage = 0
    for j, mj in enumerate(m):
        if mj is None:
            continue
        if kill is None or (mj, steps[j]) <= kill:
            stage += 1
    return stage


def test_funnel_strict_oracle_closed_form_fuzz(spark):
    """Random event streams (ts collisions, repeats, noise types,
    window expiries): the fold and the closed-form oracle algorithms
    must agree on every user, both strict modes."""
    import random

    steps = ["s1", "s2", "s3", "s4"]
    rng = random.Random(42)
    rows = []
    base = dt.datetime(2024, 1, 1)
    for u in range(250):
        n = rng.randint(0, 14)
        for _ in range(n):
            # coarse grid forces ts collisions; noise types are ignored
            ts = base + dt.timedelta(seconds=rng.randint(0, 40) * 25)
            et = rng.choice(steps + ["noise", "s1", "s2"])
            rows.append((u, ts, et))
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"]).repartition(7)
    within = 300.0
    for mode in ("strict_order", "strict_dedup"):
        got = {
            r["user"]: r["stage"]
            for r in funnel_stages(
                df, "user_id", "ts", "event_type", steps, within=within, mode=mode
            ).collect()
        }
        by_user = {}
        for u, ts, et in rows:
            by_user.setdefault(u, []).append((ts.timestamp(), et))
        mismatches = []
        for u, evs in by_user.items():
            exp = _closed_form_strict(evs, steps, within, mode)
            if exp is None:
                assert u not in got
                continue
            if got.get(u) != exp:
                mismatches.append((mode, u, got.get(u), exp, sorted(evs)))
        assert not mismatches, mismatches[:3]
