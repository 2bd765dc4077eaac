"""Multi-touch attribution (operators/attribution.py): every model
replayed by an independent Python twin on a hand fixture, credit
conservation, binned-path equivalence, and the guard surface."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from d2d_spark.operators.attribution import attribution

CONV = ["purchase"]
TCH = ["view", "click"]

ROWS = [
    # key a: a classic 3-touch journey then a second short journey
    ("a", 1.0, "view"), ("a", 3.0, "click"), ("a", 5.0, "view"),
    ("a", 6.0, "purchase"),
    ("a", 8.0, "click"), ("a", 20.0, "purchase"),
    # key b: conversion with no touches at all
    ("b", 4.0, "purchase"),
    # key c: exactly two touches
    ("c", 1.0, "click"), ("c", 2.0, "view"), ("c", 3.0, "purchase"),
    # key d: touches only, no conversion
    ("d", 1.0, "view"),
]


def _df(spark, rows=ROWS):
    return spark.createDataFrame(rows, "k string, t double, s string")


def _py_attr(rows, model, lookback=None, halflife=None):
    by_key: dict[str, list] = {}
    for k, t, s in rows:
        by_key.setdefault(k, []).append((t, s))
    out = {}
    for k, evs in by_key.items():
        evs.sort()
        for ct, cs in [(t, s) for t, s in evs if s in CONV]:
            tchs = [
                (t, s)
                for t, s in evs
                if s in TCH and t < ct and (lookback is None or t >= ct - lookback)
            ]
            n = len(tchs)
            if not n:
                continue
            if model == "last_touch":
                out[(k, ct, tchs[-1][0])] = 1.0
            elif model == "first_touch":
                out[(k, ct, tchs[0][0])] = 1.0
            elif model == "linear":
                for t, _ in tchs:
                    out[(k, ct, t)] = 1.0 / n
            elif model == "time_decay":
                ws = [2.0 ** (-(ct - t) / halflife) for t, _ in tchs]
                tot = sum(ws)
                for (t, _), w in zip(tchs, ws):
                    out[(k, ct, t)] = w / tot
            else:  # position
                for i, (t, _) in enumerate(tchs):
                    if n == 1:
                        out[(k, ct, t)] = 1.0
                    elif n == 2:
                        out[(k, ct, t)] = 0.5
                    elif i in (0, n - 1):
                        out[(k, ct, t)] = 0.4
                    else:
                        out[(k, ct, t)] = 0.2 / (n - 2)
    return out


@pytest.mark.parametrize("model", ["last_touch", "first_touch", "linear", "position"])
def test_models_match_python_twin_exactly(spark, model):
    got = {
        (r["k"], r["conv_ts"], r["touch_ts"]): r["credit"]
        for r in attribution(_df(spark), "k", "t", "s", CONV, TCH, model=model).collect()
    }
    assert got == _py_attr(ROWS, model)


def test_time_decay_matches_twin_and_normalizes(spark):
    got = {
        (r["k"], r["conv_ts"], r["touch_ts"]): r["credit"]
        for r in attribution(
            _df(spark), "k", "t", "s", CONV, TCH, model="time_decay", halflife="2 seconds"
        ).collect()
    }
    want = _py_attr(ROWS, "time_decay", halflife=2.0)
    assert got.keys() == want.keys()
    for key in got:
        assert math.isclose(got[key], want[key], rel_tol=1e-12), key
    # credits per conversion sum to exactly 1 (normalized division)
    sums: dict[tuple, float] = {}
    for (k, ct, _), c in got.items():
        sums[(k, ct)] = sums.get((k, ct), 0.0) + c
    for v in sums.values():
        assert math.isclose(v, 1.0, rel_tol=1e-12)


def test_lookback_bounds_the_window(spark):
    got = _py_attr(ROWS, "linear", lookback=5.0)
    spark_got = {
        (r["k"], r["conv_ts"], r["touch_ts"]): r["credit"]
        for r in attribution(
            _df(spark), "k", "t", "s", CONV, TCH, model="linear", lookback="5 seconds"
        ).collect()
    }
    assert spark_got == got
    # a@20 sees only click@8? 20-5=15 > 8 -> NO touch qualifies
    assert not any(k == "a" and ct == 20.0 for k, ct, _ in spark_got)


def test_binned_path_equals_plain(spark):
    plain = attribution(
        _df(spark), "k", "t", "s", CONV, TCH, model="linear", lookback="6 seconds"
    )
    binned = attribution(
        _df(spark), "k", "t", "s", CONV, TCH, model="linear",
        lookback="6 seconds", bin_width=2.0,
    )
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in binned.collect()}
    assert a == b and a


def test_include_unattributed_direct_bucket(spark):
    got = attribution(
        _df(spark), "k", "t", "s", CONV, TCH, model="last_touch",
        lookback="5 seconds", include_unattributed=True,
    ).collect()
    direct = [(r["k"], r["conv_ts"]) for r in got if r["touch_ts"] is None]
    # b@4 has no touches ever; a@20's only touch is outside the lookback
    assert sorted(direct) == [("a", 20.0), ("b", 4.0)]
    for r in got:
        if r["touch_ts"] is None:
            assert r["credit"] == 1.0 and r["n_touches"] == 0


def test_fixture_events_credit_conservation(spark, sf_dir):
    from d2d_spark.session import read_table

    ev = read_table(spark, sf_dir, "events")
    out = attribution(
        ev, "user_id", "ts", "event_type", ["purchase"], ["click", "view"],
        model="position", lookback="48 hours",
    )
    sums = out.groupBy("user_id", "conv_ts").agg(F.sum("credit").alias("s")).collect()
    assert sums and all(abs(r["s"] - 1.0) < 1e-9 for r in sums)
    # last_touch picks exactly the max qualifying touch_ts per conversion
    last = attribution(
        ev, "user_id", "ts", "event_type", ["purchase"], ["click", "view"],
        model="last_touch", lookback="48 hours",
    )
    agg = (
        out.groupBy("user_id", "conv_ts")
        .agg(F.max("touch_ts").alias("mx"))
        .join(last, ["user_id", "conv_ts"])
    )
    assert agg.filter(F.col("mx") != F.col("touch_ts")).count() == 0


def test_guards(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="model"):
        attribution(df, "k", "t", "s", CONV, TCH, model="shapley")
    with pytest.raises(ValueError, match="halflife"):
        attribution(df, "k", "t", "s", CONV, TCH, model="time_decay")
    with pytest.raises(ValueError, match="halflife"):
        attribution(df, "k", "t", "s", CONV, TCH, model="linear", halflife="1 hour")
    with pytest.raises(ValueError, match="non-empty"):
        attribution(df, "k", "t", "s", [], TCH)
    with pytest.raises(ValueError, match="bin_width"):
        attribution(df, "k", "t", "s", CONV, TCH, bin_width=5.0)
    with pytest.raises(ValueError, match="duplicate"):
        attribution(_df(spark, ROWS + [("a", 1.0, "click")]), "k", "t", "s", CONV, TCH)
    with pytest.raises(ValueError, match="NULL"):
        attribution(_df(spark, ROWS + [(None, 9.0, "view")]), "k", "t", "s", CONV, TCH)
    ts_df = spark.createDataFrame(
        [("a", __import__("datetime").date(2024, 1, 1), "view")],
        "k string, t date, s string",
    )
    with pytest.raises(ValueError, match="date"):
        attribution(ts_df, "k", "t", "s", CONV, TCH)


def test_stream_attribution_sink_equals_batch(spark, tmp_path):
    """Stream-maintained last-touch attribution EXACTLY equals the
    batch operator over everything seen, at EVERY drop prefix —
    including a conversion whose winning touch arrived in an EARLIER
    batch (the carry stitch) and a conversion whose carried touch is
    outside the lookback (direct bucket). Late data refused loudly."""
    from pyspark.sql import types as T

    from d2d_spark.streaming.filestream import (
        attribution_stream_state,
        file_stream,
        stream_attribution_sink,
    )

    src = tmp_path / "src"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType(
        [
            T.StructField("u", T.StringType()),
            T.StructField("t", T.DoubleType()),
            T.StructField("s", T.StringType()),
        ]
    )
    drops = [
        ("d1", [("a", 1.0, "view"), ("a", 3.0, "click"), ("b", 1.0, "view")]),
        # a converts at 4 -> credited to click@3 (same-prefix);
        # b converts at 30 -> its only touch view@1 is OUTSIDE the
        # 10s lookback -> direct bucket
        ("d2", [("a", 4.0, "purchase"), ("b", 30.0, "purchase")]),
        # a converts again at 6: the winning touch click@3 arrived
        # TWO batches ago (the carry stitch); c never converts
        ("d3", [("a", 6.0, "purchase"), ("c", 1.0, "view")]),
    ]
    seen = []
    for name, rows in drops:
        spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
            str(src / name)
        )
        seen.extend(rows)
        stream = file_stream(spark, str(src) + "/*", schema)
        stream_attribution_sink(
            stream, "u", "t", "s", ["purchase"], ["view", "click"],
            state, ckpt, lookback="10 seconds", include_unattributed=True,
        )
        pts, carry = attribution_stream_state(spark, state)
        got = {
            (r["key"], r["conv_ts"], r["touch_ts"], r["touch_state"], r["credit"])
            for r in pts.collect()
        }
        want = {
            (r["u"], r["conv_ts"], r["touch_ts"], r["touch_state"], r["credit"])
            for r in attribution(
                spark.createDataFrame(seen, schema), "u", "t", "s",
                ["purchase"], ["view", "click"], model="last_touch",
                lookback="10 seconds", include_unattributed=True,
            ).collect()
        }
        assert got == want, name
    # the stitched conversion exists and credits the old click
    assert ("a", 6.0, 3.0, "click", 1.0) in got
    # b@30's direct row exists (carried touch outside the lookback)
    assert ("b", 30.0, None, None, 1.0) in got
    # carry holds each key's latest touch + last event ts
    carried = {r["key"]: (r["last_ts"], r["touch_ts"], r["touch_state"])
               for r in carry.collect()}
    assert carried == {
        "a": (6.0, 3.0, "click"),
        "b": (30.0, 1.0, "view"),
        "c": (1.0, 1.0, "view"),
    }
    # late data (at or before the carry) is refused
    spark.createDataFrame([("a", 6.0, "view")], schema).write.mode(
        "overwrite"
    ).parquet(str(src / "d4"))
    stream = file_stream(spark, str(src) + "/*", schema)
    with pytest.raises(Exception, match="per-key time order"):
        stream_attribution_sink(
            stream, "u", "t", "s", ["purchase"], ["view", "click"],
            state, ckpt, lookback="10 seconds", include_unattributed=True,
        )


def test_binned_path_equals_plain_on_fixture_timestamps(spark, sf_dir):
    """The binned interval-join scale path is identical to the plain
    key join on REAL timestamp data (the hand-fixture test covers
    numeric order columns; this pins the epoch-seconds binning)."""
    from d2d_spark.session import read_table

    ev = read_table(spark, sf_dir, "events")
    plain = attribution(
        ev, "user_id", "ts", "event_type", ["purchase"], ["click", "view"],
        model="linear", lookback="48 hours", validate=False,
    )
    binned = attribution(
        ev, "user_id", "ts", "event_type", ["purchase"], ["click", "view"],
        model="linear", lookback="48 hours", bin_width=6 * 3600.0, validate=False,
    )
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in binned.collect()}
    assert a == b and a


def test_multi_model_equals_per_model_calls(spark):
    """r11: the multi-model fused path (one pair join + shared
    windows) emits, per model, EXACTLY the rows of the separate
    single-model calls — including the direct bucket — with the only
    difference being the trailing ``model`` column."""
    df = _df(spark)
    models = ["last_touch", "first_touch", "linear", "time_decay", "position"]
    fused = attribution(
        df, "k", "t", "s", ["purchase"], ["click", "view"],
        model=models, lookback="10 seconds", halflife="4 seconds",
        include_unattributed=True,
    )
    assert fused.columns[-1] == "model"
    got = {}
    for r in fused.collect():
        got.setdefault(r["model"], set()).add(tuple(r)[:-1])
    for m in models:
        single = attribution(
            df, "k", "t", "s", ["purchase"], ["click", "view"],
            model=m, lookback="10 seconds",
            halflife="4 seconds" if m == "time_decay" else None,
            include_unattributed=True,
        )
        want = {tuple(r) for r in single.collect()}
        assert got.get(m, set()) == want and want, m


def test_multi_model_guards(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="non-empty"):
        attribution(df, "k", "t", "s", ["purchase"], ["click"], model=[])
    with pytest.raises(ValueError, match="must be one of"):
        attribution(df, "k", "t", "s", ["purchase"], ["click"], model=["nope"])
    with pytest.raises(ValueError, match="duplicate"):
        attribution(
            df, "k", "t", "s", ["purchase"], ["click"],
            model=["linear", "linear"],
        )
    with pytest.raises(ValueError, match="halflife"):
        attribution(
            df, "k", "t", "s", ["purchase"], ["click"],
            model=["linear", "time_decay"],
        )


def test_time_decay_credit_is_partitioning_invariant(spark):
    """r12: the decay normalizer sums doubles — the ordered-frame fix
    pins bit-identical credits on ANY input partitioning (the unordered
    frame summed in physical row order and drifted in the last ulp
    when cached-plan partitioning changed)."""
    df = _df(spark)
    def run(d):
        out = attribution(
            d, "k", "t", "s", ["purchase"], ["click", "view"],
            model="time_decay", lookback="10 seconds", halflife="4 seconds",
            include_unattributed=True,
        )
        return sorted(tuple(r) for r in out.collect())
    a = run(df.coalesce(1))
    b = run(df.repartition(7))
    c = run(df.repartition(3, "k"))
    assert a == b == c and a
