

# ---------------------------------------------------------------------------
# merge_into (multi-clause MERGE)
# ---------------------------------------------------------------------------
def _merge_frames(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k long, status string, price double",
    )
    source = spark.createDataFrame(
        [(2, 25.0, "upd"), (3, 5.0, "del"), (5, 50.0, "new"), (6, 60.0, "skip")],
        "k long, price double, action string",
    )
    return target, source


def test_merge_into_all_clauses(spark):
    from d2d_spark.operators.writes import merge_into

    target, source = _merge_frames(spark)
    out = merge_into(
        target,
        source,
        on=["k"],
        matched_update={"price": "s.price", "status": "concat(t.status, '+')"},
        matched_update_condition="s.action = 'upd'",
        matched_delete_condition="s.action = 'del'",
        insert_unmatched=True,
        insert_values={"status": "s.action"},
    )
    got = sorted(tuple(r) for r in out.collect())
    assert got == [
        (1, "a", 10.0),        # target-only passthrough
        (2, "b+", 25.0),       # matched + update clause
        (4, "d", 40.0),        # target-only passthrough (k=3 deleted)
        (5, "new", 50.0),      # inserted, status from insert_values
        (6, "skip", 60.0),     # inserted (insert clause has no condition)
    ]
    assert out.columns == target.columns


def test_merge_into_no_insert_and_update_all_matched(spark):
    from d2d_spark.operators.writes import merge_into

    target, source = _merge_frames(spark)
    out = merge_into(
        target, source, on=["k"],
        matched_update={"price": "t.price + s.price"},
        insert_unmatched=False,
    )
    got = sorted(tuple(r) for r in out.collect())
    assert got == [
        (1, "a", 10.0), (2, "b", 45.0), (3, "c", 35.0), (4, "d", 40.0),
    ]


def test_merge_into_validation(spark):
    import pytest

    from d2d_spark.operators.writes import merge_into

    target, source = _merge_frames(spark)
    with pytest.raises(ValueError, match="at least one join key"):
        merge_into(target, source, on=[])
    with pytest.raises(ValueError, match="absent"):
        merge_into(target, source, on=["nope"])
    with pytest.raises(ValueError, match="no clause"):
        merge_into(target, source, on=["k"], insert_unmatched=False)
    with pytest.raises(ValueError, match="UPDATE join keys"):
        merge_into(target, source, on=["k"], matched_update={"k": "s.k"})
    dup = source.unionByName(source.limit(1))
    with pytest.raises(ValueError, match="duplicate join keys"):
        merge_into(target, dup, on=["k"], matched_update={"price": "s.price"})
    nulls = spark.createDataFrame([(None, 1.0, "x")], "k long, price double, action string")
    with pytest.raises(ValueError, match="NULL join keys"):
        merge_into(target, nulls, on=["k"], matched_update={"price": "s.price"})


def test_merge_into_refuses_lossy_casts(spark):
    """A lossy implicit coercion (string source into a numeric target,
    double into int) raises at plan time instead of silently NULLing
    inserted values under non-ANSI mode."""
    import pytest

    from d2d_spark.operators.writes import merge_into

    target = spark.createDataFrame([(1, 10)], "k long, qty int")
    bad_src = spark.createDataFrame([(5, "oops")], "k long, qty string")
    with pytest.raises(ValueError, match="string -> int"):
        merge_into(target, bad_src, on=["k"])
    narrowing = spark.createDataFrame([(5, 1.5)], "k long, qty double")
    with pytest.raises(ValueError, match="double -> int"):
        merge_into(target, narrowing, on=["k"])
    # safe widenings and exact decimal literals still pass silently
    targ_d = spark.createDataFrame([(1, "a", 10.0)], "k long, s string, v double")
    src_i = spark.createDataFrame([(5, 7)], "k long, v int")  # int -> double
    out = merge_into(targ_d, src_i, on=["k"], insert_values={"s": "'x'"})
    assert (5, "x", 7.0) in {tuple(r) for r in out.collect()}
    # bare 1.5 parses as decimal(2,1) in Spark SQL — exact into double
    out2 = merge_into(
        targ_d, src_i.select("k"), on=["k"], insert_values={"v": "1.5"}
    )
    assert (5, None, 1.5) in {tuple(r) for r in out2.collect()}
    # rank order is NOT capacity order: float's 24-bit mantissa
    # truncates int 16777217, double's 53 bits truncate bigint
    targ_f = spark.createDataFrame([(1, 2.0)], "k long, qty float")
    with pytest.raises(ValueError, match="int -> float"):
        merge_into(targ_f, spark.createDataFrame([(5, 16777217)], "k long, qty int"),
                   on=["k"])
    targ_dd = spark.createDataFrame([(1, 2.0)], "k long, qty double")
    with pytest.raises(ValueError, match="bigint -> double"):
        merge_into(targ_dd, spark.createDataFrame([(5, 2**60)], "k long, qty long"),
                   on=["k"])


def test_merge_into_skips_unreachable_insert_branch(spark):
    """With insert_unmatched=False the insert branch can never emit a
    row, so its types must not be probed — an update-only merge over a
    string source column with an explicit CAST stays valid."""
    from d2d_spark.operators.writes import merge_into

    target = spark.createDataFrame([(1, 10)], "k long, qty int")
    src = spark.createDataFrame([(1, "7")], "k long, qty string")
    out = merge_into(
        target, src, on=["k"],
        matched_update={"qty": "CAST(s.qty AS INT)"},
        insert_unmatched=False,
    )
    assert {tuple(r) for r in out.collect()} == {(1, 7)}


def test_merge_into_null_condition_is_false(spark):
    from d2d_spark.operators.writes import merge_into

    target = spark.createDataFrame([(1, 10.0)], "k long, price double")
    source = spark.createDataFrame([(1, None)], "k long, flag boolean")
    out = merge_into(
        target, source, on=["k"],
        matched_update={"price": "-1.0"},
        matched_update_condition="s.flag",  # NULL -> no update
        matched_delete_condition="s.flag",  # NULL -> no delete
    )
    assert [tuple(r) for r in out.collect()] == [(1, 10.0)]


def test_merge_into_survives_dunder_marker_columns(spark):
    """A real __t/__s column in either frame must not be clobbered by
    the presence markers."""
    from d2d_spark.operators.writes import merge_into

    target = spark.createDataFrame([(1, 5), (2, 6)], "k long, __t long")
    source = spark.createDataFrame([(2, 99), (3, 77)], "k long, __t long")
    out = merge_into(target, source, on=["k"], matched_update={"__t": "s.__t"})
    assert sorted(tuple(r) for r in out.collect()) == [(1, 5), (2, 99), (3, 77)]


# ---------------------------------------------------------------------------
# apply_changes (CDC op-log fold)
# ---------------------------------------------------------------------------
def test_apply_changes_latest_wins(spark):
    from d2d_spark.operators.writes import apply_changes

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, status string, price double",
    )
    changes = spark.createDataFrame(
        [
            (1, 1, "u", "a1", 11.0),
            (1, 3, "u", "a3", 13.0),   # latest upsert for k=1
            (1, 2, "d", None, None),   # superseded delete
            (2, 5, "d", None, None),   # latest = delete for k=2
            (2, 4, "u", "zz", 99.0),
            (4, 1, "u", "new", 40.0),  # brand-new key
            (5, 1, "d", None, None),   # delete of absent key = no-op
        ],
        "k long, seq long, op string, status string, price double",
    )
    out = apply_changes(target, changes, keys=["k"], seq_col="seq")
    assert sorted(tuple(r) for r in out.collect()) == [
        (1, "a3", 13.0),
        (3, "c", 30.0),
        (4, "new", 40.0),
    ]
    assert out.columns == target.columns


def test_apply_changes_validation(spark):
    import pytest

    from d2d_spark.operators.writes import apply_changes

    target = spark.createDataFrame([(1, 1.0)], "k long, v double")
    ok = spark.createDataFrame([(1, 1, "u", 2.0)], "k long, seq long, op string, v double")
    with pytest.raises(ValueError, match="at least one key"):
        apply_changes(target, ok, keys=[], seq_col="seq")
    with pytest.raises(ValueError, match="lacks columns"):
        apply_changes(target, ok.drop("seq"), keys=["k"], seq_col="seq")
    with pytest.raises(ValueError, match="payload columns"):
        apply_changes(target, ok.drop("v"), keys=["k"], seq_col="seq")
    bad_op = spark.createDataFrame(
        [(1, 1, "x", 2.0)], "k long, seq long, op string, v double"
    )
    with pytest.raises(ValueError, match="ops outside"):
        apply_changes(target, bad_op, keys=["k"], seq_col="seq")
    dup = ok.unionByName(ok)
    with pytest.raises(ValueError, match="duplicate \\(key, sequence\\)"):
        apply_changes(target, dup, keys=["k"], seq_col="seq")


def test_apply_changes_equals_sequential_replay(spark):
    """Random op log folded by apply_changes ≡ a sequential Python
    replay of the same log in sequence order."""
    import random

    from d2d_spark.operators.writes import apply_changes

    rng = random.Random(3)
    state = {k: float(k) for k in range(10)}
    target = spark.createDataFrame(
        [(k, v) for k, v in state.items()], "k long, v double"
    )
    log = []
    for seq in range(200):
        k = rng.randrange(0, 15)
        if rng.random() < 0.3:
            log.append((k, seq, "d", None))
        else:
            log.append((k, seq, "u", float(seq)))
    for k, seq, op, v in log:  # python replay in seq order
        if op == "d":
            state.pop(k, None)
        else:
            state[k] = v
    shuffled = log[:]
    rng.shuffle(shuffled)  # arrival order must not matter
    changes = spark.createDataFrame(shuffled, "k long, seq long, op string, v double")
    got = {r["k"]: r["v"] for r in apply_changes(target, changes, ["k"], "seq").collect()}
    assert got == state


# ---------------------------------------------------------------------------
# scd2_lookup (point-in-time enrichment)
# ---------------------------------------------------------------------------
def test_scd2_lookup_point_in_time(spark, sf_dir):
    """Every probe picks exactly the version valid at its time; the
    composition scd2_history -> scd2_lookup answers historical
    attribute questions exactly (checked against a per-row scan of
    the raw events)."""
    from pyspark.sql import functions as F

    from d2d_spark.operators.scd import scd2_history, scd2_lookup
    from d2d_spark.session import read_table

    ev = read_table(spark, sf_dir, "events").limit(600).cache()
    hist = scd2_history(ev, ["user_id"], "ts", ["event_type"], ["event_id"]).cache()
    # probes: each user's events shifted 1s forward (inside the run
    # that was current at that moment)
    probes = ev.select(
        "user_id", (F.col("ts") + F.expr("INTERVAL 1 SECOND")).alias("at_ts")
    ).limit(200)
    got = scd2_lookup(hist, probes, ["user_id"], "at_ts")
    rows = got.collect()
    assert len(rows) == probes.count()  # exactly one version per probe
    raw = [
        (r["user_id"], r["ts"], r["event_type"], r["event_id"]) for r in ev.collect()
    ]
    for r in rows:
        # expected attribute: type of the latest event at or before at_ts
        cand = [
            (ts, eid, et)
            for (u, ts, et, eid) in raw
            if u == r["user_id"] and ts <= r["at_ts"]
        ]
        want = max(cand)[2] if cand else None
        assert r["event_type"] == want, r


def test_scd2_lookup_misses_and_validation(spark):
    import datetime as dt

    import pytest
    from pyspark.sql import functions as F

    from d2d_spark.operators.scd import scd2_lookup

    t0 = dt.datetime(2024, 1, 1)
    hist = spark.createDataFrame(
        [(1, "a", t0, t0 + dt.timedelta(days=1), False),
         (1, "b", t0 + dt.timedelta(days=1), None, True)],
        "k long, attr string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    probes = spark.createDataFrame(
        [(1, t0 - dt.timedelta(hours=1)),  # before first version
         (1, t0 + dt.timedelta(hours=1)),  # in closed run
         (1, t0 + dt.timedelta(days=2)),   # in open run
         (2, t0)],                          # unknown key
        "k long, at timestamp",
    )
    got = {(r["k"], str(r["at"])): r["attr"] for r in
           scd2_lookup(hist, probes, ["k"], "at").collect()}
    assert len(got) == 4
    vals = sorted(got.values(), key=lambda x: (x is None, x))
    assert vals.count(None) == 2 and "a" in vals and "b" in vals
    with pytest.raises(ValueError, match="lacks"):
        scd2_lookup(hist.drop("valid_to"), probes, ["k"], "at")
    with pytest.raises(ValueError, match="collide"):
        scd2_lookup(hist, probes.withColumn("attr", F.lit("x")), ["k"], "at")


# ---------------------------------------------------------------------------
# stream_apply_changes (continuous CDC twin of apply_changes)
# ---------------------------------------------------------------------------
def test_stream_apply_changes_equals_batch(spark, tmp_path):
    """A random op log split across file-drop micro-batches in SHUFFLED
    arrival order folds to exactly the batch apply_changes snapshot of
    the whole log — at every intermediate prefix too."""
    import random

    from pyspark.sql import types as T

    from d2d_spark.operators.writes import apply_changes
    from d2d_spark.streaming.filestream import (
        file_stream,
        latest_cdc_snapshot,
        stream_apply_changes,
    )

    rng = random.Random(11)
    target = spark.createDataFrame(
        [(k, float(k)) for k in range(10)], "k long, v double"
    )
    log = []
    for seq in range(120):
        k = rng.randrange(0, 15)
        if rng.random() < 0.3:
            log.append((k, seq, "d", None))
        else:
            log.append((k, seq, "u", float(seq)))
    arrival = log[:]
    rng.shuffle(arrival)  # later drops carry EARLIER sequence numbers
    chunks = [arrival[:40], arrival[40:80], arrival[80:]]
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    src = tmp_path / "src"
    src.mkdir()
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    seen = []
    for i, chunk in enumerate(chunks):
        spark.createDataFrame(chunk, schema).write.mode("overwrite").parquet(
            str(src / f"d{i}")
        )
        seen.extend(chunk)
        stream = file_stream(spark, str(src) + "/*", schema)
        stream_apply_changes(stream, target, ["k"], "seq", state, ckpt)
        want_df = apply_changes(
            target, spark.createDataFrame(seen, schema), ["k"], "seq"
        )
        want = {(r["k"], r["v"]) for r in want_df.collect()}
        got = {
            (r["k"], r["v"])
            for r in latest_cdc_snapshot(spark, state).select("k", "v").collect()
        }
        assert got == want, f"prefix {i}: {got ^ want}"
    # retention: only the newest snapshot + its pre-state survive
    import os

    kept = [n for n in os.listdir(state) if n.startswith("state_after_batch_")]
    assert len(kept) <= 2, kept


def test_stream_apply_changes_tombstone_beats_late_upsert(spark, tmp_path):
    """A high-seq delete arriving BEFORE a low-seq upsert (across
    batches) keeps the key deleted; a later higher-seq upsert revives
    it — the fold a delete-forgets-the-key sink gets wrong."""
    from pyspark.sql import types as T

    from d2d_spark.streaming.filestream import (
        file_stream,
        latest_cdc_snapshot,
        stream_apply_changes,
    )

    target = spark.createDataFrame([(1, "a")], "k long, v string")
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("v", T.StringType()),
        ]
    )
    src = tmp_path / "src"
    src.mkdir()
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    expected = [set(), set(), {(1, "z")}]
    for i, drop in enumerate([[(1, 5, "d", None)], [(1, 3, "u", "b")], [(1, 7, "u", "z")]]):
        spark.createDataFrame(drop, schema).write.mode("overwrite").parquet(
            str(src / f"d{i}")
        )
        stream = file_stream(spark, str(src) + "/*", schema)
        stream_apply_changes(stream, target, ["k"], "seq", state, ckpt)
        got = {
            (r["k"], r["v"])
            for r in latest_cdc_snapshot(spark, state).collect()
        }
        assert got == expected[i], f"after drop {i}"


def test_stream_apply_changes_validation(spark, tmp_path):
    """Duplicate (key, seq) across batches, bad ops, and bookkeeping
    column collisions all refuse loudly."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from d2d_spark.streaming.filestream import file_stream, stream_apply_changes

    target = spark.createDataFrame([(1, "a")], "k long, v string")
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("v", T.StringType()),
        ]
    )
    src = tmp_path / "src"
    src.mkdir()
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    spark.createDataFrame([(1, 5, "u", "b")], schema).write.mode("overwrite").parquet(
        str(src / "d0")
    )
    stream_apply_changes(
        file_stream(spark, str(src) + "/*", schema), target, ["k"], "seq", state, ckpt
    )
    spark.createDataFrame([(1, 5, "u", "c")], schema).write.mode("overwrite").parquet(
        str(src / "d1")
    )
    with pytest.raises(Exception, match="repeats an already-applied"):
        stream_apply_changes(
            file_stream(spark, str(src) + "/*", schema),
            target, ["k"], "seq", state, ckpt,
        )
    with pytest.raises(ValueError, match="collides"):
        stream_apply_changes(
            file_stream(spark, str(src) + "/*", schema),
            target.withColumn("__seq", F.lit(1)),
            ["k"], "seq", str(tmp_path / "s2"), str(tmp_path / "c2"),
        )
    # a duplicate of the stored winner must raise even when a HIGHER
    # seq in the same batch would have hidden it from the per-key top-1
    src2 = tmp_path / "src_dup2"
    src2.mkdir()
    s4, c4 = str(tmp_path / "s4"), str(tmp_path / "c4")
    spark.createDataFrame([(1, 5, "u", "b")], schema).write.mode("overwrite").parquet(
        str(src2 / "d0")
    )
    stream_apply_changes(
        file_stream(spark, str(src2) + "/*", schema), target, ["k"], "seq", s4, c4
    )
    spark.createDataFrame(
        [(1, 5, "u", "dup"), (1, 9, "u", "new")], schema
    ).write.mode("overwrite").parquet(str(src2 / "d1"))
    with pytest.raises(Exception, match="repeats an already-applied"):
        stream_apply_changes(
            file_stream(spark, str(src2) + "/*", schema), target, ["k"], "seq", s4, c4
        )
    with pytest.raises(ValueError, match="lacks columns"):
        stream_apply_changes(
            file_stream(spark, str(src) + "/*", schema).drop("v"),
            target, ["k"], "seq", str(tmp_path / "s3"), str(tmp_path / "c3"),
        )


# ---------------------------------------------------------------------------
# stream_scd2_apply (continuous type-2 history twin of scd2_apply)
# ---------------------------------------------------------------------------
def test_stream_scd2_apply_equals_batch(spark, tmp_path):
    """A snapshot log split across file-drop micro-batches in SHUFFLED
    arrival order maintains exactly the batch scd2_history of every
    row seen so far — at every intermediate prefix. Exact duplicate
    snapshots collapse (replay idempotence)."""
    import random

    from pyspark.sql import types as T

    from d2d_spark.operators.scd import scd2_history
    from d2d_spark.streaming.filestream import (
        file_stream,
        latest_scd2_history,
        stream_scd2_apply,
    )

    rng = random.Random(7)
    log = []
    for k in range(6):
        attr = f"v{rng.randrange(3)}"
        for t in sorted(rng.sample(range(100), rng.randrange(3, 7))):
            if rng.random() < 0.6:
                attr = f"v{rng.randrange(3)}"
            log.append((k, t, attr))
    log.append(log[0])  # exact duplicate row: must collapse, not raise
    arrival = log[:]
    rng.shuffle(arrival)  # later drops carry EARLIER timestamps
    third = len(arrival) // 3
    chunks = [arrival[:third], arrival[third : 2 * third], arrival[2 * third :]]
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("attr", T.StringType()),
        ]
    )
    src = tmp_path / "src"
    src.mkdir()
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    seen = []
    for i, chunk in enumerate(chunks):
        spark.createDataFrame(chunk, schema).write.mode("overwrite").parquet(
            str(src / f"d{i}")
        )
        seen.extend(chunk)
        stream = file_stream(spark, str(src) + "/*", schema)
        stream_scd2_apply(stream, ["k"], "ts", ["attr"], state, ckpt)
        want = {
            tuple(r)
            for r in scd2_history(
                spark.createDataFrame(seen, schema), ["k"], "ts", ["attr"]
            ).collect()
        }
        got = {tuple(r) for r in latest_scd2_history(spark, state).collect()}
        assert got == want, f"prefix {i}: {got ^ want}"
    import os

    kept = [n for n in os.listdir(state) if n.startswith("state_after_batch_")]
    assert len(kept) <= 2, kept


def test_stream_scd2_apply_refuses_conflicting_version(spark, tmp_path):
    """The same (key, ts) with DIFFERENT tracked attributes — across
    batches — refuses loudly instead of picking an arbitrary order."""
    import pytest
    from pyspark.sql import types as T

    from d2d_spark.streaming.filestream import file_stream, stream_scd2_apply

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("attr", T.StringType()),
        ]
    )
    src = tmp_path / "src"
    src.mkdir()
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    spark.createDataFrame([(1, 10, "a")], schema).write.parquet(str(src / "d0"))
    stream_scd2_apply(file_stream(spark, str(src) + "/*", schema),
                      ["k"], "ts", ["attr"], state, ckpt)
    spark.createDataFrame([(1, 10, "B")], schema).write.parquet(str(src / "d1"))
    with pytest.raises(Exception, match="different tracked"):
        stream_scd2_apply(file_stream(spark, str(src) + "/*", schema),
                          ["k"], "ts", ["attr"], state, ckpt)
    with pytest.raises(ValueError, match="not a local filesystem"):
        stream_scd2_apply(file_stream(spark, str(src) + "/*", schema),
                          ["k"], "ts", ["attr"], "s3a://bucket/state", ckpt)
