"""Structured Streaming integration: the same window helpers running
on a real readStream (file source, availableNow trigger) must produce
the batch results; plus the incremental file-sync ledger semantics."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pandas as pd
import pytest
from pyspark.sql import functions as F

from d2d_spark.session import read_table
from d2d_spark.streaming.filestream import file_stream, sync_available_now
from d2d_spark.streaming.windows import tumbling_agg


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="d2d_stream_")
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


def _events_parquet_dir(spark, sf_dir, tmpdir):
    """Stage events (micro-ts normalized) as a source dir the stream
    can watch."""
    src = str(tmpdir / "src")
    read_table(spark, sf_dir, "events").repartition(4).write.parquet(src)
    return src


def test_stream_tumbling_equals_batch(spark, sf_dir, tmpdir):
    src = _events_parquet_dir(spark, sf_dir, tmpdir)
    batch_df = spark.read.parquet(src)
    schema = batch_df.schema

    aggs = lambda: [  # noqa: E731
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    ]
    expected = {
        (r.ws, r.event_type): (r.n_events, r.sum_value)
        for r in tumbling_agg(batch_df, "ts", "1 hour", aggs(), ["event_type"]).collect()
    }

    stream = file_stream(spark, src, schema, max_files_per_trigger=2)
    assert stream.isStreaming
    windowed = tumbling_agg(
        stream, "ts", "1 hour", aggs(), ["event_type"], watermark="1 day"
    )
    q = (
        windowed.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.ws, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("select * from tumbling_test").collect()
    }
    assert got == expected


def test_file_sync_incremental_ledger(spark, sf_dir, tmpdir):
    """New files are processed exactly once across restarts — the
    reference's diskcache transfer ledger, via checkpoint."""
    src, tgt, ckpt = (str(tmpdir / n) for n in ("src", "tgt", "ckpt"))
    ev = read_table(spark, sf_dir, "events").limit(100).cache()
    ev.write.parquet(src)
    schema = spark.read.parquet(src).schema

    stream = file_stream(spark, src, schema)
    sync_available_now(stream, tgt, ckpt, transform=lambda df: df.select("event_id", "user_id"))
    n1 = spark.read.parquet(tgt).count()
    assert n1 == 100

    # second pass with no new files: ledger skips everything
    sync_available_now(file_stream(spark, src, schema), tgt, ckpt,
                       transform=lambda df: df.select("event_id", "user_id"))
    assert spark.read.parquet(tgt).count() == n1

    # drop new files in: only they are appended
    ev.withColumn("event_id", F.col("event_id") + 1_000_000).write.mode("append").parquet(src)
    sync_available_now(file_stream(spark, src, schema), tgt, ckpt,
                       transform=lambda df: df.select("event_id", "user_id"))
    assert spark.read.parquet(tgt).count() == 200


def test_stateful_dedup_across_batches(spark, sf_dir, tmpdir):
    """Keys are emitted exactly once even when they recur in later
    micro-batches — checkpointed state, not per-batch dedup."""
    from d2d_spark.streaming.stateful import stateful_dedup_keys

    src = str(tmpdir / "src")
    ev = read_table(spark, sf_dir, "events").limit(400).cache()
    # two file groups with overlapping user_ids -> multiple batches
    ev.limit(200).write.parquet(src)
    ev.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = file_stream(spark, src, schema, max_files_per_trigger=1)
    deduped = stateful_dedup_keys(stream.select("user_id"), "user_id")
    q = (
        deduped.writeStream.format("memory")
        .queryName("stateful_dedup_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmpdir / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select user_id from stateful_dedup_t").collect()
    ids = [r.user_id for r in got]
    expected = {r.user_id for r in ev.select("user_id").distinct().collect()}
    assert len(ids) == len(set(ids)) == len(expected)
    assert set(ids) == expected


def test_stateful_running_totals(spark, sf_dir, tmpdir):
    """Final per-key totals equal the batch groupBy result."""
    from d2d_spark.streaming.stateful import stateful_running_totals

    src = str(tmpdir / "src")
    ev = read_table(spark, sf_dir, "events").limit(300).cache()
    ev.repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema

    stream = file_stream(spark, src, schema, max_files_per_trigger=1)
    totals = stateful_running_totals(
        stream.select("user_id", F.col("value").cast("double").alias("value")),
        "user_id",
        "value",
    )
    q = (
        totals.writeStream.format("memory")
        .queryName("running_totals_t")
        .outputMode("update")
        .option("checkpointLocation", str(tmpdir / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode: last row per key is the cumulative total
    import pandas as pd

    got = (
        spark.sql("select * from running_totals_t").toPandas()
        .groupby("user_id").tail(1).set_index("user_id")
    )
    exp = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("value").cast("double")).alias("s"))
        .toPandas()
        .set_index("user_id")
    )
    assert len(got) == len(exp)
    for uid, row in exp.iterrows():
        assert got.loc[uid, "n_events"] == row["n"]
        assert abs(got.loc[uid, "total"] - row["s"]) < 1e-6


def test_sync_with_mode_upsert(spark, sf_dir, tmpdir):
    """Streaming upsert: re-delivered keys overwrite instead of
    duplicating — the keyed sink the reference's INSERT IGNORE /
    REPLACE flushes approximate."""
    from d2d_spark.streaming.filestream import sync_with_mode

    src, tgt, ckpt = (str(tmpdir / n) for n in ("src", "tgt", "ckpt"))
    ev = read_table(spark, sf_dir, "events").limit(100).select("event_id", "event_type").cache()
    ev.write.parquet(src)
    schema = spark.read.parquet(src).schema

    sync_with_mode(file_stream(spark, src, schema), tgt, ckpt, mode="upsert", pks=["event_id"])
    assert spark.read.parquet(tgt).count() == 100

    # redeliver the same keys with changed payload -> overwritten, not duplicated
    ev.withColumn("event_type", F.lit("REPLAYED")).write.mode("append").parquet(src)
    sync_with_mode(file_stream(spark, src, schema), tgt, ckpt, mode="upsert", pks=["event_id"])
    back = spark.read.parquet(tgt)
    assert back.count() == 100
    assert back.filter("event_type = 'REPLAYED'").count() == 100


def test_stream_static_enrichment_join(spark, sf_dir, tmpdir):
    """Stream-static join: a streaming fact enriched with a static
    dimension (the streaming Migration2DB analog)."""
    src = str(tmpdir / "src")
    orders = read_table(spark, sf_dir, "orders").limit(200).cache()
    orders.write.parquet(src)
    schema = spark.read.parquet(src).schema

    customers = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    stream = file_stream(spark, src, schema)
    enriched = stream.join(customers, stream.o_custkey == customers.c_custkey, "left")
    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched_orders_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from enriched_orders_t")
    assert got.count() == 200
    # every order with a known customer carries a segment
    n_matched = got.filter(F.col("c_mktsegment").isNotNull()).count()
    want_matched = (
        orders.join(customers, orders.o_custkey == customers.c_custkey, "inner").count()
    )
    assert n_matched == want_matched


def test_stream_stream_join_with_watermarks(spark, sf_dir, tmpdir):
    """Stream-stream inner join with event-time range condition —
    both sides unbounded, state bounded by watermarks."""
    src = str(tmpdir / "src")
    ev = read_table(spark, sf_dir, "events").limit(2000).cache()
    ev.write.parquet(src)
    schema = spark.read.parquet(src).schema

    clicks = file_stream(spark, src, schema).filter(F.col("event_type") == "click")
    views = file_stream(spark, src, schema).filter(F.col("event_type") == "view")
    c = clicks.select("user_id", F.col("ts").alias("click_ts")).withWatermark("click_ts", "1 day")
    v = views.select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts")
    ).withWatermark("view_ts", "1 day")
    joined = c.join(
        v,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr("INTERVAL 2 HOURS"))
        & (F.col("view_ts") <= F.col("click_ts")),
        "inner",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmpdir / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("select count(*) c from ss_join_t").collect()[0].c

    bc = ev.filter("event_type = 'click'").select("user_id", F.col("ts").alias("click_ts"))
    bv = ev.filter("event_type = 'view'").select(F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts"))
    want = bc.join(
        bv,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr("INTERVAL 2 HOURS"))
        & (F.col("view_ts") <= F.col("click_ts")),
        "inner",
    ).count()
    assert got == want and want > 0


def test_incremental_rollup_matches_batch(spark, sf_dir, tmpdir):
    """The continuously-merged rollup equals a one-shot batch rollup
    over all data, across multiple micro-batches AND a second
    catch-up run with new files."""
    from d2d_spark.streaming.windows import incremental_rollup

    src, tgt, ckpt = (str(tmpdir / n) for n in ("src", "tgt", "ckpt"))
    ev = read_table(spark, sf_dir, "events").limit(1000).cache()
    ev.repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def run():
        incremental_rollup(
            file_stream(spark, src, schema, max_files_per_trigger=1),
            tgt, ckpt, ts_col="ts", duration="1 hour",
            keys=["event_type"], sum_cols={"value": "sum_value"},
        )

    run()
    # new data arrives -> only it is merged in
    extra = ev.withColumn("event_id", F.col("event_id") + 10_000_000)
    extra.write.mode("append").parquet(src)
    run()

    got = spark.read.parquet(tgt)
    want = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum(F.col("value").cast("double")).alias("sum_value"))
        .select(F.col("window.start").alias("ws"), "event_type", "n_rows", "sum_value")
    )
    g = {(r.ws, r.event_type): (r.n_rows, round(r.sum_value, 6)) for r in got.collect()}
    w = {(r.ws, r.event_type): (r.n_rows, round(r.sum_value, 6)) for r in want.collect()}
    assert g == w


def test_rollup_replayed_batch_is_skipped(spark, sf_dir, tmpdir):
    """Regression (r2 verdict #3): at-least-once foreachBatch replays a
    batch_id after a crash — the merge must be idempotent, including
    when the replay lands mid-sequence after later batches merged."""
    from d2d_spark.streaming.windows import make_rollup_merger

    tgt = str(tmpdir / "tgt")
    merge = make_rollup_merger(tgt, ts_col="ts", duration="1 hour",
                               keys=["event_type"], sum_cols={"value": "sum_value"})
    ev = read_table(spark, sf_dir, "events").limit(600).cache()
    b0, b1, b2 = (ev.filter(F.col("event_id") % 3 == i) for i in range(3))

    merge(b0, 0)
    merge(b1, 1)
    merge(b0, 0)  # replay of an old batch mid-sequence
    merge(b2, 2)
    merge(b2, 2)  # replay of the latest batch

    got = {(r.ws, r.event_type): (r.n_rows, round(r.sum_value, 6))
           for r in spark.read.parquet(tgt).collect()}
    want_df = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum(F.col("value").cast("double")).alias("sum_value"))
        .select(F.col("window.start").alias("ws"), "event_type", "n_rows", "sum_value")
    )
    want = {(r.ws, r.event_type): (r.n_rows, round(r.sum_value, 6)) for r in want_df.collect()}
    assert got == want


def test_watermark_drops_late_rows(spark, sf_dir, tmpdir):
    """Late-data policy: with a finished watermark, a second batch of
    events older than the watermark must NOT change closed windows
    (append-mode emission happens only once per closed window)."""
    from datetime import datetime

    src, ckpt = str(tmpdir / "src"), str(tmpdir / "ckpt")

    def ts(h, m=0):
        return datetime(2024, 1, 1, h, m)

    on_time = spark.createDataFrame(
        [(1, ts(10, 5)), (2, ts(10, 20)), (3, ts(12, 40))], "id long, ts timestamp"
    )
    on_time.write.parquet(src)
    schema = spark.read.parquet(src).schema

    def run_once():
        stream = file_stream(spark, src, schema)
        windowed = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("window.start").alias("ws"), "n")
        )
        q = (
            windowed.writeStream.format("parquet")
            .option("path", str(tmpdir / "out"))
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = {(r.ws, r.n) for r in spark.read.parquet(str(tmpdir / "out")).collect()}
    # watermark advanced to 11:40; the 10:00 window is closed+emitted
    assert (ts(10), 2) in first

    # a straggler for the CLOSED 10:00 window arrives
    spark.createDataFrame([(4, ts(10, 45))], "id long, ts timestamp").write.mode(
        "append"
    ).parquet(src)
    run_once()
    second = {(r.ws, r.n) for r in spark.read.parquet(str(tmpdir / "out")).collect()}
    # the closed window's emitted count is immutable: no (10:00, 3) row
    assert (ts(10), 3) not in second
    assert (ts(10), 2) in second


def test_stream_to_memory_mode_detection(spark, sf_dir, tmpdir):
    """The debug sink must pick the right output mode for plain
    streams, aggregations, and append-mode stateful operators (the
    review-found case: state ops declare their own mode)."""
    from d2d_spark.streaming.filestream import stream_to_memory
    from d2d_spark.streaming.stateful import stateful_dedup_keys

    src = str(tmpdir / "src")
    ev = read_table(spark, sf_dir, "events").limit(100).cache()
    ev.write.parquet(src)
    schema = spark.read.parquet(src).schema

    # plain projection -> append
    stream_to_memory(
        file_stream(spark, src, schema).select("event_id"), "stm_plain"
    )
    assert spark.sql("select count(*) c from stm_plain").collect()[0].c == 100

    # aggregation -> complete
    stream_to_memory(
        file_stream(spark, src, schema).groupBy("event_type").count(), "stm_agg"
    )
    assert spark.sql("select count(*) c from stm_agg").collect()[0].c > 0

    # append-mode stateful operator -> must NOT be forced into update
    dedup = stateful_dedup_keys(
        file_stream(spark, src, schema).select("user_id"), "user_id"
    )
    stream_to_memory(dedup, "stm_state")
    n = spark.sql("select count(*) c from stm_state").collect()[0].c
    assert n == ev.select("user_id").distinct().count()


def test_stateful_funnel_matches_batch(spark, sf_dir, tmpdir):
    """In-order micro-batches: the incremental funnel's final state
    per user equals the batch funnel over the whole stream."""
    from d2d_spark.operators.funnel import funnel_stages
    from d2d_spark.streaming.stateful import stateful_funnel

    steps = ["signup", "view", "click", "purchase"]
    src = str(tmpdir / "funnel_src")
    ev = read_table(spark, sf_dir, "events").limit(2000).cache()
    # time-ordered micro-batches => per-user event time is
    # non-decreasing across batches (the documented parity contract).
    # The file source orders by modification time, so each ts-quartile
    # writes as its OWN append a beat apart.
    import time as _time

    from pyspark.sql.window import Window as _W

    sliced = ev.withColumn(
        "__b", F.ntile(4).over(_W.orderBy("ts", "event_id"))
    ).cache()
    for i in range(1, 5):
        sliced.filter(F.col("__b") == i).drop("__b").write.mode(
            "append"
        ).parquet(src)
        _time.sleep(1.2)
    schema = spark.read.parquet(src).schema

    stream = file_stream(spark, src, schema, max_files_per_trigger=1)
    out = stateful_funnel(stream, "user_id", "ts", "event_type", steps, within=172_800.0)
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_t")
        .outputMode("update")
        .option("checkpointLocation", str(tmpdir / "funnel_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        spark.sql("select * from funnel_t").toPandas()
        .groupby("user_id").tail(1).set_index("user_id")
    )
    exp = funnel_stages(
        ev, "user_id", "ts", "event_type", steps, within=172_800.0
    ).toPandas().set_index("user")
    assert len(got) == len(exp)
    for uid, row in exp.iterrows():
        assert got.loc[uid, "stage"] == row["stage"], uid
        for k in range(4):
            a, b = got.loc[uid, f"ts_step_{k+1}"], row[f"ts_step_{k+1}"]
            assert (pd.isna(a) and pd.isna(b)) or a == b, (uid, k)


def test_stateful_funnel_validation(spark, sf_dir):
    from d2d_spark.streaming.stateful import stateful_funnel

    ev = read_table(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="distinct funnel steps"):
        stateful_funnel(ev, "user_id", "ts", "event_type", ["a"])
    with pytest.raises(ValueError, match="within"):
        stateful_funnel(ev, "user_id", "ts", "event_type", ["a", "b"], within=0)
