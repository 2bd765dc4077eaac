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
