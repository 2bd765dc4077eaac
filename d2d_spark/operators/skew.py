"""Skew and co-location strategies for big joins — the knobs that
matter at 100 TB (SURVEY §7.4d). AQE's skew-join handles most cases
at runtime; these are the explicit tools for when it can't:

  salted_join     — a hot key's rows hash-split across N reducer
                    groups; the other side replicates N ways. Turns
                    one straggler reducer into N even ones at the
                    cost of replicating the (smaller) right side.
  write_bucketed /
  bucketed_join   — pre-shuffle both tables into the same bucket
                    layout once at write time; every future join on
                    the bucket key runs with ZERO exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``left`` has skewed keys. For ``how`` in
    {'inner', 'left', 'left_semi'} the result is identical to
    ``left.join(right, on, how)``; only the shuffle layout changes:
    left rows scatter by (key, salt), right rows replicate across all
    salts, so no single reducer owns a whole hot key. Right/full/anti
    joins are rejected — every unmatched right replica would surface
    n_salts times; salt the other side instead."""
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        raise ValueError(
            f"salted_join(how={how!r}): unmatched right rows would duplicate "
            "n_salts times; swap sides or use AQE skew handling"
        )
    l = left.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    r = right.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return l.join(r, on=keys + ["__salt"], how=how).drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int = 8,
    sort: bool = True,
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) by the
    join key. Both sides of a recurring join written this way join
    shuffle-free forever — the write pays the exchange once."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.mode("overwrite").format(fmt).saveAsTable(table)


def bucketed_join(
    spark: SparkSession, t1: str, t2: str, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed catalog tables on the bucket
    key — planner elides both exchanges (verify: no Exchange in the
    executed plan, tests/test_skew.py)."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(t1).join(spark.table(t2), on=keys, how=how)
