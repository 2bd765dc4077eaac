"""In-memory connector (ListD, d22d/utils/db/__init__.py:1469-1498):
a dict of named row-lists, the reference's test/bootstrap database,
plus its key-value projections get_dict_kv / get_dict_kv_set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from d2d_spark.sources.base import Connector, require_spark


class MemoryConnector(Connector):
    def __init__(self, tables: dict[str, list[dict]] | None = None, spark: SparkSession | None = None):
        self.tables: dict[str, list[dict]] = dict(tables or {})
        self.spark = require_spark(spark)

    def get_indexes(self) -> list[str]:
        return sorted(self.tables)

    def get_count(self, index: str) -> int:
        return len(self.tables[index])

    def read(self, index: str, **kw) -> DataFrame:
        rows = self.tables[index]
        if not rows:
            raise ValueError(f"table {index!r} is empty; schema unknowable")
        return self.spark.createDataFrame([Row(**r) for r in rows])

    def write(self, df: DataFrame, index: str, mode: str = "overwrite", pks=None, **kw) -> None:
        rows = [r.asDict(recursive=True) for r in df.collect()]
        if mode == "append" and index in self.tables:
            self.tables[index].extend(rows)
        else:
            self.tables[index] = rows

    # key-value projections (ListD.get_dict_kv / get_dict_kv_set)
    def get_dict_kv(self, index: str, key: str, value: str) -> dict:
        """{key: last value} — duplicate keys collapse, last wins."""
        return {r[key]: r[value] for r in self.tables[index]}

    def get_dict_kv_set(self, index: str, key: str, value: str) -> dict:
        """{key: set of all values}."""
        out: dict = {}
        for r in self.tables[index]:
            out.setdefault(r[key], set()).add(r[value])
        return out


def kv_pairs(df: DataFrame, key: str, value: str, collapse: str = "last", order_col: str | None = None) -> DataFrame:
    """Distributed analog of get_dict_kv: one (key, value) row per key.
    ``collapse='last'`` needs an order column; 'set' aggregates all
    values per key (get_dict_kv_set)."""
    if collapse == "set":
        return df.groupBy(key).agg(F.collect_set(value).alias(value))
    if order_col is None:
        return df.dropDuplicates([key]).select(key, value)
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(key, value)
    )
