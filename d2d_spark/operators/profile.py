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


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str | None = None,
    source_col: str | None = None,
    deciles: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """Document-corpus data card: one long-format frame of
    ``(section, key, value)`` doubles covering size totals, an
    approximate (HLL-derived, clamped to [0, 1]) duplicate
    rate, token-length and quality-score quantiles, and (optional)
    per-language / per-source composition.

    Shape at scale: ONE global aggregation pass (map-side partials;
    percentile_approx and HLL are mergeable sketches) plus one small
    groupBy per composition column — nothing collects to the driver,
    and each section's cost is a partial-agg shuffle of at most
    |distinct keys| rows.
    """
    from d2d_spark.functions.text import fingerprint, quality_score, token_count_ws

    base = df.select(
        F.col(text_col).alias("__t"),
        fingerprint(F.col(text_col)).alias("__fp"),
        token_count_ws(F.col(text_col)).cast("double").alias("__tok"),
        quality_score(F.col(text_col)).alias("__q"),
        *([F.col(lang_col).alias("__lang")] if lang_col else []),
        *([F.col(source_col).alias("__src")] if source_col else []),
    )
    qs = list(deciles)
    one = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum(F.length("__t")).cast("double").alias("n_chars"),
        F.sum("__tok").alias("n_tokens"),
        F.approx_count_distinct("__fp").cast("double").alias("n_distinct_fp"),
        F.percentile_approx("__tok", qs).alias("tok_q"),
        F.percentile_approx("__q", qs).alias("qual_q"),
    )
    entries = F.array(
        F.struct(F.lit("totals").alias("section"), F.lit("n_docs").alias("key"), F.col("n_docs").alias("value")),
        F.struct(F.lit("totals").alias("section"), F.lit("n_chars").alias("key"), F.col("n_chars").alias("value")),
        F.struct(F.lit("totals").alias("section"), F.lit("n_tokens").alias("key"), F.col("n_tokens").alias("value")),
        F.struct(
            F.lit("totals").alias("section"),
            F.lit("approx_dup_frac").alias("key"),
            # HLL cardinality carries ~rsd relative error, so the raw
            # ratio can dip slightly negative (or over 1) on a
            # dup-free corpus — clamp to the meaningful range
            F.least(
                F.greatest(
                    (F.col("n_docs") - F.col("n_distinct_fp"))
                    / F.nullif(F.col("n_docs"), F.lit(0.0)),
                    F.lit(0.0),
                ),
                F.lit(1.0),
            ).alias("value"),
        ),
        *[
            F.struct(
                F.lit("token_quantiles").alias("section"),
                F.lit(f"p{int(q * 100)}").alias("key"),
                F.col("tok_q")[i].cast("double").alias("value"),
            )
            for i, q in enumerate(qs)
        ],
        *[
            F.struct(
                F.lit("quality_quantiles").alias("section"),
                F.lit(f"p{int(q * 100)}").alias("key"),
                F.col("qual_q")[i].cast("double").alias("value"),
            )
            for i, q in enumerate(qs)
        ],
    )
    out = one.select(F.explode(entries).alias("e")).select("e.section", "e.key", "e.value")
    if lang_col:
        out = out.unionByName(
            base.groupBy("__lang").agg(F.count(F.lit(1)).cast("double").alias("value")).select(
                F.lit("lang").alias("section"), F.col("__lang").alias("key"), "value"
            )
        )
    if source_col:
        out = out.unionByName(
            base.groupBy("__src").agg(F.count(F.lit(1)).cast("double").alias("value")).select(
                F.lit("source").alias("section"), F.col("__src").alias("key"), "value"
            )
        )
    return out
