"""Snapshot diffing — what changed between two versions of a keyed
table. The verification layer the migration/write machinery calls
for: after an incremental sync or a staged merge, ``table_diff``
answers "what did this run actually do" (and its summary is the
cheap drift monitor between a source and its replica).

Spark shape: ONE full-outer join on the business key; change
classification is a null-safe struct compare of the non-key columns
— all JVM, no Python. At 100 TB both sides shuffle once on the key
(or zero times if both are bucketed on it — `skew.write_bucketed`),
and the output is only the changed rows, which for a healthy
incremental pipeline is a tiny fraction of the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff of two keyed snapshots: one row per key that was
    ``added`` (only in new), ``removed`` (only in old) or ``changed``
    (both, but the compared columns differ — null-safe, so NULL->value
    and value->NULL both count). Unchanged keys are absent. Output:
    key columns + ``change_type`` + each compared column as an
    ``old_<col>`` / ``new_<col>`` pair.

    ``compare_cols`` defaults to every shared non-key column; columns
    existing on only one side are ignored (schema evolution is
    `profile.schema_drift`'s job, not row diffing's)."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    shared = [c for c in old.columns if c in set(new.columns) and c not in key_cols]
    cols = compare_cols if compare_cols is not None else shared
    missing = [c for c in cols if c not in shared]
    if missing:
        raise ValueError(f"compare_cols not present on both sides: {missing}")
    o = old.select(
        *key_cols,
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"old_{c}") for c in cols],
    )
    n = new.select(
        *key_cols,
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"new_{c}") for c in cols],
    )
    j = o.join(n, key_cols, "full")
    if cols:
        same = F.struct(*[F.col(f"old_{c}") for c in cols]).eqNullSafe(
            F.struct(*[F.col(f"new_{c}") for c in cols])
        )
    else:
        same = F.lit(True)  # key-only tables: presence is the diff
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    out_cols = [*key_cols, F.col("__ct").alias("change_type")]
    for c in cols:
        out_cols += [f"old_{c}", f"new_{c}"]
    return (
        j.withColumn("__ct", change)
        .filter(F.col("__ct").isNotNull())
        .select(*out_cols)
    )


def table_checksum(
    df: DataFrame, cols: list[str] | None = None
) -> int:
    """Order-insensitive 64-bit content fingerprint: xxhash64 per row
    over the chosen columns (NULLs fold in explicitly, so NULL vs
    'null' differ), summed with wraparound. Two tables with equal
    checksums almost certainly hold the same multiset of rows — the
    O(scan), zero-shuffle-to-driver drift check to run on source and
    replica BEFORE paying for a full ``table_diff`` (one long per
    table crosses the wire, not a row). Sum (not xor) so duplicate
    row multiplicity changes the value."""
    use = cols if cols is not None else df.columns
    if not use:
        raise ValueError("table_checksum needs at least one column")
    h = F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in use])
    # sum in DECIMAL(38,0): a long sum of 64-bit hashes overflows (an
    # ANSI runtime error); the wraparound happens explicitly below
    total = df.agg(F.sum(h.cast("decimal(38,0)")).alias("s")).first()[0]
    return int(total or 0) & 0xFFFFFFFFFFFFFFFF


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> dict:
    """Counts only: {added, removed, changed, unchanged} — one join +
    one aggregate; `unchanged` derives from the old-side total so the
    whole check is a single pass over the diff plus one count."""
    d = table_diff(old, new, key_cols, compare_cols)
    counts = {
        r["change_type"]: r["n"]
        for r in d.groupBy("change_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_old = old.select(*key_cols).distinct().count()
    out = {k: counts.get(k, 0) for k in ("added", "removed", "changed")}
    out["unchanged"] = n_old - out["removed"] - out["changed"]
    return out


def snapshot_to_changes(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    seq_value,
    op_col: str = "op",
    seq_col: str = "seq",
    upsert_op: str = "u",
    delete_op: str = "d",
) -> DataFrame:
    """Derive the CDC change feed that turns snapshot ``old`` into
    snapshot ``new`` — the inverse of writes.apply_changes, closing
    the loop between the diff family and the CDC family:

        apply_changes(old, snapshot_to_changes(old, new, keys, s),
                      keys, seq) == new        (test-pinned)

    Emits one row per key that CHANGED: upserts carry the new payload
    (added + value-changed keys, whole-row semantics), deletes carry
    the removed key with NULL payload. Unchanged keys emit nothing —
    the feed is minimal, which is what makes replaying it cheap.
    ``seq_value`` stamps every change (a batch id / watermark — the
    caller owns sequencing across feeds). Payload columns are taken
    from NEW's schema; the comparison is null-safe whole-row.

    Shape: one null-safe full-outer join on the keys (the table_diff
    shape) + a projection. Keys must be unique per snapshot on both
    sides (refused via one aggregate — a duplicate key makes 'the'
    change ill-defined)."""
    if not keys:
        raise ValueError("snapshot_to_changes: need at least one key column")
    for side, frame in (("old", old), ("new", new)):
        missing = [c for c in keys if c not in frame.columns]
        if missing:
            raise ValueError(f"snapshot_to_changes: {side} lacks key columns {missing}")
        dup = (
            frame.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"snapshot_to_changes: {side} snapshot has duplicate keys — "
                "'the' change for a duplicated key is ill-defined; dedup first"
            )
    payload = [c for c in new.columns if c not in keys]
    lacking = [c for c in payload if c not in old.columns]
    if lacking:
        raise ValueError(
            f"snapshot_to_changes: old snapshot lacks payload columns "
            f"{lacking} — schema evolution between snapshots needs "
            "evolve_and_append upstream, not a change feed"
        )
    # both structs project NEW's payload order so the null-safe
    # whole-row compare is field-aligned
    o = old.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        F.struct(*[F.col(c) for c in payload]).alias("__old_p"),
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        F.struct(*[F.col(c) for c in payload]).alias("__new_p"),
        F.lit(True).alias("__in_new"),
    )
    j = o.join(n, [f"__k_{k}" for k in keys], "full")
    added_or_changed = F.col("__in_new").isNotNull() & (
        F.col("__in_old").isNull() | ~F.col("__old_p").eqNullSafe(F.col("__new_p"))
    )
    removed = F.col("__in_old").isNotNull() & F.col("__in_new").isNull()
    changes = j.filter(added_or_changed | removed).select(
        *[F.col(f"__k_{k}").alias(k) for k in keys],
        *[
            F.when(removed, F.lit(None)).otherwise(F.col(f"__new_p.{c}")).alias(c)
            for c in payload
        ],
        F.when(removed, F.lit(delete_op)).otherwise(F.lit(upsert_op)).alias(op_col),
        F.lit(seq_value).alias(seq_col),
    )
    return changes
