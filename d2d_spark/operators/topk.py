"""Sort / limit / offset / top-k — SURVEY.md §2.7.

LIMIT maps to a global TakeOrderedAndProject (no full sort of the
data: each partition produces its top-k, the driver merges — exactly
what you want at 100 TB). OFFSET pagination is expressed with a
row_number window over an explicit total order, since "offset" has no
meaning without one in a distributed table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """ORDER BY ... LIMIT k. Spark plans TakeOrderedAndProject:
    per-partition heaps, no global shuffle."""
    return df.orderBy(*order).limit(k)


def limit_offset(df: DataFrame, order: list[Column], limit: int, offset: int) -> DataFrame:
    """SQL `LIMIT offset, n` (d22d/utils/db/myutils.py:886-888). A
    single-partition window over the global order — fine for
    page-sized results, which is the only sane use of OFFSET."""
    w = Window.orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") > offset) & (F.col("__rn") <= offset + limit))
        .drop("__rn")
    )
