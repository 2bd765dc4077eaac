"""Slowly-changing-dimension (type 2) history tracking — the
warehouse-side answer to "what did this row look like on date X?".
The reference's writes only keep latest-wins state
(d22d/utils/db/__init__.py insert/replace paths); type-2 history is
the standard extension every dimensional warehouse needs, and it
composes with this repo's snapshot sources (JDBC pulls, file drops)
and crash-safe write modes.

Spark shape: ONE window shuffle on the business key. Change
detection is a null-safe lag compare on the tracked-attribute
struct; consecutive identical snapshots collapse, so the output is
one row per (key, attribute-run) with ``valid_from`` / ``valid_to``
/ ``is_current``. ``scd2_apply`` folds a new snapshot batch into an
existing history by replaying the union through the same builder —
which makes it idempotent by construction (reapplying a batch adds
only collapsed duplicates, i.e. nothing).

At 100 TB: the window partitions by business key — uniform unless
one key dominates (a dimension table with a hot key is a modeling
bug, not a layout one); apply's rebuild cost is history + batch
through one shuffle. For very large dimensions, partition the
stored history by key range and apply per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tracked_cols: list[str],
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse a snapshot log (many rows per key over time) into
    type-2 history: (keys, tracked, valid_from, valid_to, is_current),
    one row per run of identical tracked attributes, ordered runs
    closed by the next run's ``valid_from`` (open run: valid_to NULL,
    is_current true). ``order_cols`` breaks same-timestamp ties
    deterministically (e.g. an event id)."""
    if not key_cols or not tracked_cols:
        raise ValueError("key_cols and tracked_cols must be non-empty")
    order = [F.col(ts_col), *[F.col(c) for c in (order_cols or [])]]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    st = F.struct(*[F.col(c) for c in tracked_cols])
    prev = F.lag(st).over(w)
    runs = (
        df.withColumn("__chg", ~prev.eqNullSafe(st))
        .filter("__chg")  # first row per key: lag NULL -> eqNullSafe false -> change
        .drop("__chg")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        runs.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(*key_cols, *tracked_cols, "valid_from", "valid_to", "is_current")
    )


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tracked_cols: list[str],
) -> DataFrame:
    """Fold a batch of new snapshots into an existing type-2 history:
    rows whose attributes changed close the key's current run and open
    a new one; unchanged snapshots disappear (collapse); unknown keys
    open fresh history. Implemented as a replay — history rows convert
    back to change events (``valid_from`` is when each run began) and
    rebuild with the batch through ``scd2_history`` — so applying the
    same batch twice is a no-op and out-of-order batches land
    correctly rather than corrupting the chain. Timestamps should be
    unique per key across history and batch (the usual CDC contract);
    equal-timestamp conflicts order arbitrarily."""
    events = history.select(
        *key_cols, *tracked_cols, F.col("valid_from").alias(ts_col)
    )
    batch = updates.select(*key_cols, *tracked_cols, F.col(ts_col))
    return scd2_history(events.unionByName(batch), key_cols, ts_col, tracked_cols)


def scd2_lookup(
    history: DataFrame,
    probes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time enrichment against a type-2 history: each probe
    row picks the history version whose validity interval contains
    its timestamp — ``valid_from <= ts < valid_to`` (open current
    rows match everything at-or-after valid_from). Probes with no
    version at their time keep NULL attributes (left join).

    The join is an equi-join ON THE KEYS with the interval predicate
    as a residual condition — per key the history holds one row per
    attribute RUN (bounded, versions not events), so the per-key
    fan-out is run-count, not quadratic. This is the lookup side of
    scd2_history: history answers "what were the attributes of key K
    at time T" without storing the raw event stream."""
    for c in (valid_from, valid_to):
        if c not in history.columns:
            raise ValueError(f"scd2_lookup: history lacks {c!r}")
    overlap = [c for c in probes.columns if c in history.columns and c not in key_cols]
    if overlap:
        raise ValueError(
            f"scd2_lookup: probe columns {overlap} collide with history — "
            "rename upstream so the enriched row is unambiguous"
        )
    h = history.alias("h")
    p = probes.alias("p")
    cond = [F.col(f"p.{k}") == F.col(f"h.{k}") for k in key_cols]
    ts = F.col(f"p.{ts_col}")
    cond.append(F.col(f"h.{valid_from}") <= ts)
    cond.append(F.col(f"h.{valid_to}").isNull() | (ts < F.col(f"h.{valid_to}")))
    out_history = [c for c in history.columns if c not in key_cols]
    return p.join(h, cond, "left").select(
        *[F.col(f"p.{c}") for c in probes.columns],
        *[F.col(f"h.{c}") for c in out_history],
    )
