"""Deterministic random-data generation per schema — the reference's
`gen_pass`/`insert_random_data` test-data path (d22d/utils/utils.py:
483-510, d22d/utils/db/__init__.py:1114-1119) as a distributed,
seeded range job: `spark.range(n)` partitions the id space, every
column is a pure function of (id, seed), so the same call yields the
same table on 1 core or 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CHARSET = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"


def _col_for(dt: T.DataType, id_col: Column, salt: int) -> Column:
    h = F.xxhash64(id_col, F.lit(salt))
    u = (F.pmod(h, F.lit(1 << 31)) / F.lit(float(1 << 31)))  # uniform [0,1)
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return F.pmod(h, F.lit(1_000_000)).cast(dt)
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return (u * 1000).cast(dt)
    if isinstance(dt, T.DecimalType):
        return (u * 1000).cast(dt)
    if isinstance(dt, T.BooleanType):
        return (F.pmod(h, F.lit(2)) == 0)
    if isinstance(dt, T.DateType):
        return F.date_add(F.lit("2020-01-01").cast("date"), F.pmod(h, F.lit(3650)).cast("int"))
    if isinstance(dt, T.TimestampType):
        return F.timestamp_seconds(F.lit(1577836800) + F.pmod(h, F.lit(86400 * 3650)))
    if isinstance(dt, T.StringType):
        # 8-16 chars drawn from the charset, all JVM-side
        length = (F.pmod(h, F.lit(9)) + 8).cast("int")
        idxs = F.transform(
            F.sequence(F.lit(1), length),
            lambda i: F.pmod(F.xxhash64(id_col, i, F.lit(salt)), F.lit(len(_CHARSET))).cast("int") + 1,
        )
        chars = F.transform(idxs, lambda i: F.substring(F.lit(_CHARSET), 1, 62).substr(i, F.lit(1)))
        return F.concat_ws("", chars)
    if isinstance(dt, T.BinaryType):
        return F.encode(F.conv(F.pmod(h, F.lit(1 << 30)).cast("string"), 10, 16), "UTF-8")
    return F.lit(None).cast(dt)


def random_dataframe(
    spark: SparkSession, schema: T.StructType, n: int, seed: int = 0, partitions: int | None = None
) -> DataFrame:
    """n rows matching `schema`, fully deterministic in (schema, n,
    seed). Scale-out by construction: spark.range splits the id
    domain; no Python, no driver data."""
    base = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    cols = [
        _col_for(f.dataType, F.col("id"), seed * 1000 + i).alias(f.name)
        for i, f in enumerate(schema.fields)
    ]
    return base.select(*cols)
