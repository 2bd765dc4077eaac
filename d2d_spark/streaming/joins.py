"""Stream-stream joins and watermark-bounded streaming dedup.

The reference's pipeline joins are batch-only (Migration2DB,
d22d/task.py:183-328, re-run by the watchdog on file change); Spark's
Structured Streaming can express the same correlation CONTINUOUSLY —
two unbounded sources, state bounded by watermarks. These wrappers
encode the contract Spark enforces lazily (and sometimes only at
runtime): both sides watermarked, an event-time range condition so
the state store can evict, and outer joins only with both bounds.

State sizing at 100 TB/day rates: the store holds only rows inside
``lookback + watermark`` per side, keyed by the join keys — a fixed
time-window of data regardless of total stream history. Without the
range condition Spark would buffer BOTH streams forever; that is the
unbounded-state footgun `stream_stream_join` refuses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _require_streaming(df: DataFrame, side: str) -> None:
    if not df.isStreaming:
        raise ValueError(f"{side} side must be a streaming DataFrame")


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    watermark: str = "1 hour",
    lookback: str = "1 hour",
    lookahead: str | None = "0 seconds",
    how: str = "inner",
) -> DataFrame:
    """Join two unbounded streams with bounded state.

    Matches right rows whose event time falls in
    ``[left_ts - lookback, left_ts + lookahead]`` for equal join
    keys. Both sides get ``watermark`` applied to their event-time
    column; the range condition plus the watermarks let the state
    store evict rows older than ``watermark + lookback``, so state is
    O(rate x window), never O(stream history).

    ``how`` may be ``inner``, ``left_outer``, ``right_outer`` or
    ``full_outer``. Outer results for unmatched rows emit only after
    the watermark passes (correctness requires knowing no future
    match can arrive) — plan for that latency.

    Right-side columns that collide with left names come back
    suffixed ``_r`` (both survive; streaming joins can't merge
    payloads the way batch `key_merge` does without another stateful
    stage).
    """
    _require_streaming(left, "left")
    _require_streaming(right, "right")
    keys = [on] if isinstance(on, str) else list(on)
    if not keys:
        raise ValueError("stream-stream join requires at least one equality key")
    if how not in ("inner", "left_outer", "right_outer", "full_outer"):
        raise ValueError(f"unsupported join type {how!r}")
    if lookahead is None and how != "inner":
        raise ValueError(
            "outer stream-stream joins need BOTH time bounds (lookahead=None "
            "leaves future matches open, so unmatched rows could never emit)"
        )

    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)

    # disambiguate: rename every right column (keys included) so the
    # join condition never hits Spark's ambiguous-column trap on
    # self-join-shaped streams
    shared = set(left.columns)
    ren = {c: (f"{c}_r" if c in shared else c) for c in r.columns}
    r = r.select(*[F.col(c).alias(ren[c]) for c in r.columns])
    rts = ren[right_ts]

    cond = None
    for k in keys:
        c = F.col(k) == F.col(ren[k])
        cond = c if cond is None else cond & c
    cond = cond & (F.col(rts) >= F.col(left_ts) - F.expr(f"INTERVAL {lookback}"))
    if lookahead is not None:
        cond = cond & (F.col(rts) <= F.col(left_ts) + F.expr(f"INTERVAL {lookahead}"))

    joined = l.join(r, cond, how)
    # drop the duplicated key columns for matched-key ergonomics on
    # inner joins; outer joins keep both (either side may be NULL)
    if how == "inner":
        joined = joined.drop(*[ren[k] for k in keys if ren[k] != k])
    return joined


def drop_duplicates_within_watermark(
    stream: DataFrame,
    keys: list[str] | str,
    ts_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming dedup whose state EXPIRES: a key is suppressed only
    while it stays inside the watermark window, then its state is
    dropped. The right tool when duplicates arrive close together
    (retries, at-least-once sources) — unlike `dropDuplicates` on a
    stream, state does not grow with total distinct keys forever.

    Falls back to watermarked ``dropDuplicates([*keys, ts_col])`` on
    Spark < 3.5 (same eviction bound; exact-timestamp duplicates only,
    so retries that re-stamp event time are NOT collapsed — the 3.5+
    native form is strictly better).
    """
    _require_streaming(stream, "input")
    key_list = [keys] if isinstance(keys, str) else list(keys)
    wm = stream.withWatermark(ts_col, watermark)
    if hasattr(wm, "dropDuplicatesWithinWatermark"):
        return wm.dropDuplicatesWithinWatermark(key_list)
    return wm.dropDuplicates([*key_list, ts_col])
