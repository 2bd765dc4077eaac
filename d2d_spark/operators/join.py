"""Join operators.

The reference's only native join is `Migration2DB` (d22d/task.py:183-328):
an in-memory hash join — build side materialized into a dict keyed by
``str(format_value(row[key2]))`` (last duplicate key wins), probe side
streamed, right columns merged over left, unmatched left rows pass
through (left outer). The README documents full-outer behavior
(README.md:283-320); we expose ``how=`` covering both.

Spark-first physical analog: the build-side-in-memory dict IS a
broadcast hash join, so we broadcast the build side when asked (the
reference requires it to fit in memory; we merely prefer it and let
AQE/size checks fall back to shuffle join at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from d2d_spark.functions.scalars import format_value


def dedup_build_side(df: DataFrame, key: str, order_col: str | None = None) -> DataFrame:
    """Collapse duplicate build keys to one row per key, mirroring the
    reference's dict overwrite (last wins, d22d/task.py:257). With no
    stream order in Spark, the caller picks the winner via
    ``order_col`` (max wins); default = deterministic max over all
    columns is avoided — we require an explicit order column.
    """
    if order_col is None:
        return df.dropDuplicates([key])
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def key_merge(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    how: str = "left",
    broadcast_right: bool | str = "auto",
    normalize_keys: bool = True,
) -> DataFrame:
    """Migration2DB key-merge (d22d/task.py:243-328).

    Joins on string-normalized keys (`format_value`: trim, integral
    float -> int), merges right columns over left (right wins on name
    collisions, format_data d22d/task.py:322-328). ``how='left'`` is
    code-faithful; ``how='full'`` is doc-faithful (README.md:283-320).

    ``broadcast_right='auto'`` (default) leaves the physical choice to
    Catalyst/AQE: small build sides broadcast (the reference's
    dict-in-memory analog), big ones fall back to sort-merge instead
    of OOMing — the reference required the build side to fit in
    memory; we merely prefer it. ``True`` forces the broadcast hint
    (the hint wins regardless of size — 100 TB footgun, opt-in only).
    """
    lk = format_value(F.col(left_key)) if normalize_keys else F.col(left_key).cast("string")
    rk = format_value(F.col(right_key)) if normalize_keys else F.col(right_key).cast("string")
    lj = left.withColumn("__jk", lk)
    rj = right.withColumn("__jk", rk)
    if broadcast_right is True:
        rj = F.broadcast(rj)

    shared = [c for c in left.columns if c in set(right.columns)]
    # right wins on collisions when matched; left value kept when no match
    rj = rj.select(
        "__jk", *[F.col(c).alias(f"__r_{c}" if c in shared else c) for c in right.columns]
    )
    joined = lj.join(rj, on="__jk", how="full_outer" if how == "full" else how)
    merged = joined
    for c in shared:
        merged = merged.withColumn(c, F.coalesce(F.col(f"__r_{c}"), F.col(c))).drop(f"__r_{c}")
    out_cols = list(left.columns) + [c for c in right.columns if c not in shared]
    return merged.select(*out_cols)
