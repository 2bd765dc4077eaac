"""Aggregation operators — SURVEY.md §2.5.

Covers the reference's aggregate surface: per-table/query COUNT
(every connector's get_count), GROUP BY passthrough, the ES terms
aggregation (count-by-key ordered desc) and its top_hits sub-agg
(latest-row-per-key), and whole-row DISTINCT (`quchong`,
d22d/task.py:118-122 — a Python set there, a spillable shuffle here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_count(df: DataFrame, *keys: str, desc: bool = True) -> DataFrame:
    """ES terms aggregation (d22d/utils/db/myutils.py:476-522): count
    rows per key, ordered by count (desc) then key for determinism.
    Map-side partial aggregation is automatic (hash aggregate)."""
    out = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    order = [F.col("cnt").desc() if desc else F.col("cnt").asc()] + [F.col(k) for k in keys]
    return out.orderBy(*order)


def top_hits_per_key(
    df: DataFrame, keys: list[str], order_col: str, n: int = 1, desc: bool = True
) -> DataFrame:
    """ES top_hits sub-agg (myutils.py:497-521): the latest/top n rows
    per key. One shuffle on the key, ranked within partitions."""
    oc = F.col(order_col).desc() if desc else F.col(order_col).asc()
    w = Window.partitionBy(*keys).orderBy(oc)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def distinct_rows(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """`quchong` whole-row dedup (d22d/task.py:76,118-122). The
    reference keeps a Python set in memory (documented OOM hazard,
    README.md:154); dropDuplicates shuffles and spills instead."""
    return df.dropDuplicates(subset) if subset else df.dropDuplicates()


def table_count(df: DataFrame) -> int:
    """get_count analog — Spark answers parquet counts from footer
    metadata without a full scan."""
    return df.count()


def sketch_quantiles(
    df: DataFrame, col: str, probs: list[float], k: int = 200
) -> DataFrame:
    """Mergeable KLL quantile sketch: one bounded-size sketch per
    partition, merged in a single reduce — the 100 TB replacement for
    exact percentiles (whose sort-based aggregation buffers whole
    groups). Error is rank-based and shrinks with k; pytest bounds it
    against the exact answer. One row out: q_<prob> columns."""
    sk = F.expr(f"kll_sketch_agg_double({col}, {k})")
    agg = df.agg(sk.alias("__sk"))
    cols = [
        F.expr(f"kll_sketch_get_quantile_double(__sk, {p})").alias(
            f"q_{str(p).replace('.', '_')}"
        )
        for p in probs
    ]
    return agg.select(*cols)


def sketch_distinct_counts(df: DataFrame, cols: list[str]) -> DataFrame:
    """HLL distinct estimates for several columns in ONE pass — no
    per-column shuffle, sketches merge associatively (the same
    aggregate runs map-side partial at any scale). approx 2% error at
    the default lgConfigK; pytest-bounded vs exact."""
    aggs = [
        F.expr(f"hll_sketch_estimate(hll_sketch_agg({c}))").alias(f"n_{c}") for c in cols
    ]
    return df.agg(*aggs)
