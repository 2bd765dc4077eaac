"""Table profiling and schema-drift preflight.

The reference exposes per-table counts (``get_count``) and infers
target DDL from the first row; a migration at 100 TB wants more before
it moves anything: per-column null rates, cardinality estimates, and
ranges (to pick partition/watermark columns), and a schema diff
against the target (to catch drift before a write fails mid-job).

``profile_table`` computes everything in ONE aggregation pass — a
single shuffle-free partial-agg job regardless of column count — and
reshapes the one-row result to a per-column report entirely plan-side
(array-of-structs explode; no driver collect). Cardinality is
HyperLogLog++ (``approx_count_distinct``), mergeable and bounded-error
at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: types min/max/mean make no sense for (or Spark refuses to order)
_UNORDERED = ("array", "map", "struct", "binary")


def profile_table(df: DataFrame, columns: list[str] | None = None, rsd: float = 0.05) -> DataFrame:
    """One row per column: ``column, dtype, n_rows, n_nulls,
    null_frac, approx_distinct, min, max, mean, stddev``.

    min/max are stringified for a uniform report schema; mean/stddev
    are NULL for non-numeric columns, min/max NULL for unorderable
    ones. ``rsd`` is the HLL relative standard deviation."""
    dtypes = dict(df.dtypes)
    cols = columns or df.columns
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"profile_table: no such columns {missing}")

    def numeric(c: str) -> bool:
        t = dtypes[c]
        return t in ("tinyint", "smallint", "int", "bigint", "float", "double") or t.startswith(
            "decimal"
        )

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        orderable = not dtypes[c].startswith(_UNORDERED)
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nn"),
            F.approx_count_distinct(c, rsd).alias(f"{c}__nd"),
            (F.min(c).cast("string") if orderable else F.lit(None).cast("string")).alias(
                f"{c}__min"
            ),
            (F.max(c).cast("string") if orderable else F.lit(None).cast("string")).alias(
                f"{c}__max"
            ),
            (F.avg(c) if numeric(c) else F.lit(None).cast("double")).alias(f"{c}__mean"),
            (F.stddev(c) if numeric(c) else F.lit(None).cast("double")).alias(f"{c}__sd"),
        ]
    one = df.agg(*aggs)

    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.lit(dtypes[c]).alias("dtype"),
                (F.col("__n") - F.col(f"{c}__nn")).alias("n_nulls"),
                ((F.col("__n") - F.col(f"{c}__nn")) / F.nullif(F.col("__n"), F.lit(0)))
                .cast("double")
                .alias("null_frac"),
                F.col(f"{c}__nd").alias("approx_distinct"),
                F.col(f"{c}__min").alias("min"),
                F.col(f"{c}__max").alias("max"),
                F.col(f"{c}__mean").alias("mean"),
                F.col(f"{c}__sd").alias("stddev"),
            )
            for c in cols
        ]
    )
    return (
        one.select(F.col("__n").alias("n_rows"), F.explode(entries).alias("e"))
        .select("e.column", "e.dtype", "n_rows", "e.n_nulls", "e.null_frac",
                "e.approx_distinct", "e.min", "e.max", "e.mean", "e.stddev")
    )


def schema_drift(source: DataFrame, target: DataFrame) -> DataFrame:
    """Column-level diff of two schemas: ``(column, change,
    source_type, target_type)`` with change in ``added`` (source-only),
    ``removed`` (target-only), ``type_changed``. Empty result =
    schemas agree (order-insensitive). Plan-side metadata only — no
    data is read."""
    spark = source.sparkSession
    src, tgt = dict(source.dtypes), dict(target.dtypes)
    rows = []
    for c, t in src.items():
        if c not in tgt:
            rows.append((c, "added", t, None))
        elif tgt[c] != t:
            rows.append((c, "type_changed", t, tgt[c]))
    rows += [(c, "removed", None, t) for c, t in tgt.items() if c not in src]
    return spark.createDataFrame(
        rows, "column string, change string, source_type string, target_type string"
    )
