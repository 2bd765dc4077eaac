"""Event-time window operators.

The reference has no event-time processing at all (SURVEY §2.10) — its
"streaming" is bounded iteration plus a watchdog file trigger. These
are the capability extensions the rebuild adds: tumbling / sliding /
session windows with watermarks, written so the SAME function works on
a batch DataFrame and a streaming one (Structured Streaming unifies
the API; only the sink differs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    aggs: list[Column],
    keys: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window aggregation. On a stream, pass `watermark` to
    bound state; late rows beyond it are dropped (the late-data
    policy). window.start/end surface as ws/we timestamps."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    gb = [F.window(F.col(ts_col), duration)] + [F.col(k) for k in (keys or [])]
    out = df.groupBy(*gb).agg(*aggs)
    return out.select(
        F.col("window.start").alias("ws"), F.col("window.end").alias("we"), "*"
    ).drop("window")


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    aggs: list[Column],
    keys: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Sliding-window aggregation — each event lands in
    duration/slide overlapping windows."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    gb = [F.window(F.col(ts_col), duration, slide)] + [F.col(k) for k in (keys or [])]
    out = df.groupBy(*gb).agg(*aggs)
    return out.select(
        F.col("window.start").alias("ws"), F.col("window.end").alias("we"), "*"
    ).drop("window")


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    aggs: list[Column],
    keys: list[str],
    watermark: str | None = None,
) -> DataFrame:
    """Session-window aggregation: a session closes after `gap` of
    inactivity per key. State is merged incrementally on streams."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    gb = [F.session_window(F.col(ts_col), gap)] + [F.col(k) for k in keys]
    out = df.groupBy(*gb).agg(*aggs)
    return out.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "*",
    ).drop("session_window")


def incremental_rollup(
    stream: DataFrame,
    target_path: str,
    checkpoint_path: str,
    ts_col: str,
    duration: str,
    keys: list[str],
    sum_cols: dict[str, str] | None = None,
    fmt: str = "parquet",
):
    """Continuously-maintained windowed rollup table (the hypertable
    continuous-aggregate pattern): each micro-batch computes partial
    (count, sums) per (window, keys) and MERGES them into the target
    by adding to existing partials — correct cumulative aggregates
    across batches, unlike a blind upsert that would overwrite one
    batch's partial with another's.

    Merge math: count and sum are associative, so batch partials add;
    avg and friends derive from (sum, count) at read time.

    Replay safety: foreachBatch is at-least-once — an additive merge
    re-applied after a crash between the target swap and the
    checkpoint commit would double-count. A marker ledger next to the
    target records every merged batch_id, making the merge
    idempotent: a replayed batch is skipped.
    """
    import os as _os

    from pyspark.sql import functions as F

    sum_cols = sum_cols or {}
    group_keys = ["ws", "we", *keys]
    ledger_dir = f"{target_path}.merged_batches"

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        marker = _os.path.join(ledger_dir, f"batch_{batch_id}")
        if _os.path.exists(marker):
            return  # replayed batch: already merged
        spark = batch_df.sparkSession
        aggs = [F.count(F.lit(1)).alias("n_rows")] + [
            F.sum(F.col(c).cast("double")).alias(alias) for c, alias in sum_cols.items()
        ]
        part = (
            batch_df.groupBy(F.window(F.col(ts_col), duration), *keys)
            .agg(*aggs)
            .select(
                F.col("window.start").alias("ws"), F.col("window.end").alias("we"),
                *keys, "n_rows", *[alias for alias in sum_cols.values()],
            )
        )
        if not _os.path.exists(target_path):
            part.write.format(fmt).mode("overwrite").save(target_path)
            _os.makedirs(ledger_dir, exist_ok=True)
            open(marker, "w").close()
            return
        current = spark.read.format(fmt).load(target_path)
        joined = current.unionByName(part)
        merged = joined.groupBy(*group_keys).agg(
            F.sum("n_rows").alias("n_rows"),
            *[F.sum(alias).alias(alias) for alias in sum_cols.values()],
        )
        # durable staging swap (see operators.writes.write_mode)
        import shutil as _shutil
        import uuid as _uuid

        staging = f"{target_path}.__stage_{_uuid.uuid4().hex[:8]}"
        merged.write.format(fmt).mode("overwrite").save(staging)
        _shutil.rmtree(target_path, ignore_errors=True)
        _os.replace(staging, target_path)
        _os.makedirs(ledger_dir, exist_ok=True)
        open(marker, "w").close()

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
