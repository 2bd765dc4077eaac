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
        """§2.6 write modes over the in-memory row list. Keyed modes
        (`ignore`/`replace`/`upsert`) implement the reference's SQL
        semantics (INSERT IGNORE never deletes, REPLACE/ON DUPLICATE
        KEY UPDATE merge by key — d22d/utils/db/myutils.py:693-752);
        they REQUIRE pks rather than silently degrading to overwrite,
        because Migration's default mode is 'ignore' and a silent
        overwrite here discards existing rows."""
        rows = [r.asDict(recursive=True) for r in df.collect()]
        existing = self.tables.get(index)
        if mode in ("ignore", "replace", "upsert"):
            if not pks:
                raise ValueError(f"mode={mode!r} needs pks")
            if existing is None:
                existing = []  # create case: same keyed dedup applies
            key = lambda r: tuple(r[k] for k in pks)
            if mode == "ignore":
                # INSERT IGNORE: first occurrence of a new key wins,
                # existing rows untouched.
                seen = {key(r) for r in existing}
                out = list(existing)
                for r in rows:
                    k = key(r)
                    if k not in seen:
                        out.append(r)
                        seen.add(k)
                self.tables[index] = out
            else:
                # REPLACE / upsert: incoming wins; duplicate incoming
                # keys resolve last-wins like the reference's
                # executemany order.
                merged = {key(r): r for r in existing}
                for r in rows:
                    merged[key(r)] = r
                self.tables[index] = list(merged.values())
            return
        if mode == "append" and existing is not None:
            existing.extend(rows)
        elif mode in ("append", "overwrite"):
            self.tables[index] = rows
        else:
            raise ValueError(f"unknown write mode {mode!r}")

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
