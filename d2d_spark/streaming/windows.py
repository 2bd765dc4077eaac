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


def _with_watermark(df: DataFrame, ts_col: str, watermark: str) -> DataFrame:
    """Apply a watermark, casting a TIMESTAMP_NTZ event-time column to
    instant TIMESTAMP first — Spark rejects watermarks on NTZ
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), and under the engine's
    pinned UTC session timezone the cast is wall-clock-identical."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df.withWatermark(ts_col, watermark)


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
        df = _with_watermark(df, ts_col, watermark)
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
        df = _with_watermark(df, ts_col, watermark)
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
        df = _with_watermark(df, ts_col, watermark)
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
    checkpoint commit would double-count. The ledger of merged
    batch_ids lives INSIDE the target directory (`_merged_batches/`,
    underscore-prefixed so parquet file listing ignores it) and is
    staged together with the data, so the swap commits data + marker
    atomically: there is no window where the data is live but the
    marker is missing, and a replayed batch is always skipped.
    """
    merge_batch = make_rollup_merger(target_path, ts_col, duration, keys, sum_cols, fmt)
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


_LEDGER = "_merged_batches"


def make_rollup_merger(
    target_path: str,
    ts_col: str,
    duration: str,
    keys: list[str],
    sum_cols: dict[str, str] | None = None,
    fmt: str = "parquet",
):
    """Build the idempotent foreachBatch merger for incremental_rollup
    (factored out so replay behavior is unit-testable). The batch_id
    ledger rides inside the staged directory and swaps in with the
    data — crash-safe idempotence, see incremental_rollup docstring.

    The ledger assumes ONE checkpoint lifetime per target: batch ids
    restart at 0 if the checkpoint is deleted/rebuilt, which this
    ledger cannot distinguish from a replay — repoint a rebuilt
    checkpoint at a FRESH target (or use an ACID table MERGE), never
    at a target with existing markers."""
    import os as _os
    import shutil as _shutil

    from pyspark.sql import functions as F

    if "://" in target_path:
        # the batch-id ledger rides on local-FS rename/copy semantics;
        # on an object store the honest continuous-aggregate answer is
        # an ACID table format's MERGE, not this directory swap
        raise ValueError(
            "incremental_rollup targets a local/shared mount; for "
            f"remote path {target_path!r} use a transactional table "
            "format (Delta/Iceberg MERGE) as the rollup target"
        )
    if fmt not in ("parquet", "orc"):
        # the merge leg reads the target back with no schema/options;
        # only self-describing formats round-trip that safely (CSV
        # would come back headerless all-string and corrupt the merge)
        raise ValueError(f"incremental_rollup needs a self-describing format, got {fmt!r}")
    sum_cols = sum_cols or {}
    group_keys = ["ws", "we", *keys]

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # a target missing because a crash hit _swap_paths between its
        # two renames must be RESTORED before anything else — including
        # the replay-marker check, which must see the restored ledger —
        # never reinitialized from one batch. Stale staged attempts
        # from crashed batches get dropped (single writer), not leaked.
        from d2d_spark.operators.writes import _drop_stage_debris, restore_swap_debris

        restore_swap_debris(spark, target_path)
        _drop_stage_debris(spark, target_path)
        if _os.path.exists(_os.path.join(target_path, _LEDGER, f"batch_{batch_id}")):
            return  # replayed batch: already merged
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
        import uuid as _uuid

        staging = f"{target_path}.__stage_{_uuid.uuid4().hex[:8]}"
        if not _os.path.exists(target_path):
            part.write.format(fmt).mode("overwrite").save(staging)
            _stage_ledger(staging, None, batch_id)
            _os.replace(staging, target_path)  # data + marker land together
            return
        current = spark.read.format(fmt).load(target_path)
        merged = current.unionByName(part).groupBy(*group_keys).agg(
            F.sum("n_rows").alias("n_rows"),
            *[F.sum(alias).alias(alias) for alias in sum_cols.values()],
        )
        merged.write.format(fmt).mode("overwrite").save(staging)
        # prior markers + this batch's marker go into staging BEFORE
        # the swap: the ledger is never behind the data it describes
        _stage_ledger(staging, _os.path.join(target_path, _LEDGER), batch_id)
        from d2d_spark.operators.writes import _swap_paths

        _swap_paths(spark, staging, target_path)

    def _stage_ledger(staging: str, prior_ledger: str | None, batch_id: int) -> None:
        dst = _os.path.join(staging, _LEDGER)
        if prior_ledger and _os.path.isdir(prior_ledger):
            _shutil.copytree(prior_ledger, dst)
        else:
            _os.makedirs(dst, exist_ok=True)
        open(_os.path.join(dst, f"batch_{batch_id}"), "w").close()

    return merge_batch
