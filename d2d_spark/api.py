"""Engine façade — the two-lines-of-code public API.

The reference's users interact three ways (SURVEY §3): Migration
runs, direct connector calls, and raw SQL shipped to a remote engine.
Here all three meet one object: connectors register tables into the
session catalog, and OUR engine runs the SQL (Catalyst plans it; the
reference never planned SQL, it delegated).

>>> eng = Engine.local()
>>> eng.register_dir("/root/testdata/sf0.01")      # parquet dir -> views
>>> eng.sql("SELECT o_orderstatus, count(*) FROM orders GROUP BY 1")
>>> eng.migrate(CsvConnector("/in"), JsonlConnector("/out"), "user")
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from d2d_spark.migrate import Migration, Migration2DB
from d2d_spark.session import TABLES, get_spark, load_tables
from d2d_spark.sources.base import Sink, Source


class Engine:
    def __init__(self, spark: SparkSession):
        self.spark = spark

    @classmethod
    def local(cls, app_name: str = "d2d_spark", **kw) -> "Engine":
        return cls(get_spark(app_name, **kw))

    # -- catalog -------------------------------------------------------
    def register_dir(self, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
        """Register a fixture/warehouse directory's tables as views."""
        return load_tables(self.spark, sf_dir, names)

    def register(self, source: Source, index: str, view: str | None = None) -> DataFrame:
        """Expose any connector table to SQL."""
        df = source.read(index)
        df.createOrReplaceTempView(view or index)
        return df

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    # -- query ---------------------------------------------------------
    def sql(self, statement: str) -> DataFrame:
        """Raw-SQL entry point (§3.3) — planned by Catalyst, not
        delegated: pushdown/pruning/join-choice apply to every
        registered connector table."""
        return self.spark.sql(statement)

    # -- migrate -------------------------------------------------------
    def migrate(self, src: Source, dst: Sink, table: str | None = None, **kw) -> list[str]:
        return Migration(src, dst, table_from=table, **kw).run()

    def migrate_join(self, src1: Source, src2: Source, dst: Sink, **kw) -> DataFrame:
        return Migration2DB(src1, src2, dst, **kw).run()

    def migrate_incremental(
        self, src: Source, dst: Sink, table: str, watermark_col: str, **kw
    ) -> list[str]:
        """High-watermark re-sync: moves only rows newer than the
        target's current max watermark (cron-safe, pushdown-backed)."""
        from d2d_spark.migrate import IncrementalMigration

        return IncrementalMigration(
            src, dst, table_from=table, watermark_col=watermark_col, **kw
        ).run()

    # -- preflight / maintenance --------------------------------------
    def profile(self, name: str, **kw) -> DataFrame:
        """One-pass per-column stats report for a registered table."""
        from d2d_spark.operators.profile import profile_table

        return profile_table(self.table(name), **kw)

    def schema_drift(self, source: str, target: str) -> DataFrame:
        """Column-level schema diff between two registered tables."""
        from d2d_spark.operators.profile import schema_drift

        return schema_drift(self.table(source), self.table(target))

    def compact(self, path: str, target_file_mb: float = 128, **kw) -> dict:
        """Rewrite a table directory into target-sized files."""
        from d2d_spark.operators.maintenance import compact_table

        return compact_table(self.spark, path, target_file_mb, **kw)
