"""SCD type-2 history (operators/scd.py): DuckDB oracle over the
events fixture, collapse semantics, idempotent apply."""

from __future__ import annotations

import duckdb

from d2d_spark.operators.scd import scd2_apply, scd2_history
from d2d_spark.session import read_table

from .conftest import SF_SMALL


def _rows(df):
    return {
        (
            r.user_id,
            r.event_type,
            str(r.valid_from),
            str(r.valid_to) if r.valid_to is not None else None,
            r.is_current,
        )
        for r in df.collect()
    }


def test_scd2_history_matches_duckdb_oracle(spark, sf_dir):
    """user_id's event_type stream as a type-2 dimension: run
    boundaries, closing timestamps and current flags must match the
    SQL lag/lead formulation exactly."""
    ev = read_table(spark, sf_dir, "events")
    got = _rows(
        scd2_history(
            ev, ["user_id"], "ts", ["event_type"], order_cols=["event_id"]
        )
    )
    con = duckdb.connect()
    want = {
        (u, et, str(vf), str(vt) if vt is not None else None, cur)
        for u, et, vf, vt, cur in con.execute(
            f"""
            WITH ev AS (SELECT * FROM read_parquet('{SF_SMALL}/events.parquet')),
            lagged AS (
              SELECT user_id, event_type, ts,
                     LAG(event_type) OVER w AS prev
              FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            runs AS (
              SELECT user_id, event_type, ts AS valid_from
              FROM lagged WHERE prev IS NULL OR prev IS DISTINCT FROM event_type)
            SELECT user_id, event_type, valid_from,
                   LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) AS valid_to,
                   LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) IS NULL AS is_current
            FROM runs
            """
        ).fetchall()
    }
    assert got == want and len(got) > 50
    # exactly one open run per key
    by_key = {}
    for u, _, _, vt, cur in got:
        by_key.setdefault(u, 0)
        by_key[u] += int(cur)
        assert cur == (vt is None)
    assert set(by_key.values()) == {1}


def _snapshots(spark, rows):
    return spark.createDataFrame(rows, "k long, attr string, ts long")


def test_scd2_collapses_identical_snapshots(spark):
    df = _snapshots(
        spark,
        [(1, "a", 10), (1, "a", 20), (1, "b", 30), (1, "b", 40), (1, "a", 50)],
    )
    got = sorted(
        (r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_history(df, ["k"], "ts", ["attr"]).collect()
    )
    assert got == [
        (1, "a", 10, 30, False),
        (1, "a", 50, None, True),
        (1, "b", 30, 50, False),
    ]


def test_scd2_apply_idempotent_and_incremental(spark):
    base = _snapshots(spark, [(1, "a", 10), (1, "b", 30), (2, "x", 5)])
    hist = scd2_history(base, ["k"], "ts", ["attr"])
    batch = _snapshots(spark, [(1, "b", 40), (1, "c", 60), (3, "new", 7)])
    once = scd2_apply(hist, batch, ["k"], "ts", ["attr"])
    rows = sorted(
        (r.k, r.attr, r.valid_from, r.valid_to, r.is_current) for r in once.collect()
    )
    assert rows == [
        (1, "a", 10, 30, False),
        (1, "b", 30, 60, False),  # the unchanged (1,'b',40) snapshot collapsed
        (1, "c", 60, None, True),
        (2, "x", 5, None, True),
        (3, "new", 7, None, True),
    ]
    twice = scd2_apply(once, batch, ["k"], "ts", ["attr"])
    assert sorted(
        (r.k, r.attr, r.valid_from, r.valid_to, r.is_current) for r in twice.collect()
    ) == rows
    # full rebuild from scratch agrees with incremental application
    rebuilt = scd2_history(
        base.unionByName(batch), ["k"], "ts", ["attr"]
    )
    assert sorted(
        (r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
        for r in rebuilt.collect()
    ) == rows


def test_scd2_validates(spark):
    import pytest as pt

    df = _snapshots(spark, [(1, "a", 1)])
    with pt.raises(ValueError, match="non-empty"):
        scd2_history(df, [], "ts", ["attr"])
    with pt.raises(ValueError, match="non-empty"):
        scd2_history(df, ["k"], "ts", [])
