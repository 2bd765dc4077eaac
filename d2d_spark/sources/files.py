"""File-format connectors: CSV, delimited text, JSON-lines, Parquet.

The reference treats a directory of files as a database and each
file's basename as the table name (BaseFileD,
d22d/utils/db/__init__.py:491-551); CsvD :554-598, TxtD :601-637,
JsonListD :824-836. Reads stream via DictReader; writes back up an
existing target with a timestamp suffix before replacing it
(:546-547).

Spark-first: each table is a *path* — one file or a part-file
directory, transparently — read/written by the built-in DataSource
implementations (distributed scans, pushdown, schema inference for
free). The timestamped-backup-before-overwrite behavior is preserved
as ``backup=True``.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

from d2d_spark.sources.base import Connector, require_spark


class FileConnector(Connector):
    """Directory-of-tables connector; ``index`` = file basename."""

    fmt: str = ""
    ext: str = ""

    def __init__(self, root: str, spark: SparkSession | None = None, **options: str):
        self.root = root
        self.spark = require_spark(spark)
        self.options = options

    # -- paths ---------------------------------------------------------
    def path(self, index: str) -> str:
        return os.path.join(self.root, f"{index}{self.ext}")

    def get_indexes(self) -> list[str]:
        """Tables = entries (plain file or part-file directory) named
        ``<name><ext>``. Backups (``*.bak``) and dotfiles are never
        tables — read() appends the extension to whatever is returned
        here, so anything else would resolve to a phantom path."""
        if not os.path.isdir(self.root):
            return []
        return sorted(
            name[: -len(self.ext)]
            for name in os.listdir(self.root)
            if name.endswith(self.ext)
            and not name.startswith(".")
            and not name.endswith(".bak")
            and ".bak" not in name
        )

    # -- read ----------------------------------------------------------
    def _read_options(self, **kw) -> dict[str, str]:
        return {**self.options, **{k: str(v) for k, v in kw.items()}}

    def read(self, index: str, **kw) -> DataFrame:
        reader = self.spark.read.format(self.fmt)
        for k, v in self._read_options(**kw).items():
            reader = reader.option(k, v)
        return reader.load(self.path(index))

    # -- write ---------------------------------------------------------
    def write(
        self,
        df: DataFrame,
        index: str,
        mode: str = "overwrite",
        pks: list[str] | None = None,
        backup: bool = False,
        single_file: bool = False,
        **kw,
    ) -> None:
        """``mode`` follows §2.6: append/overwrite pass through to the
        DataFrameWriter; ignore/replace/upsert run the key-merge
        dataflow from operators.writes. ``backup`` snapshots the
        current target to ``<name>.<ts>.bak`` first (BaseFileD
        create_index semantics); ``single_file`` coalesces to one
        part (only for small exports — it serializes the write)."""
        target = self.path(index)
        if backup and os.path.exists(target):
            stamp = time.strftime("%Y%m%d%H%M%S")
            bak = f"{target}.{stamp}.bak"
            (shutil.copytree if os.path.isdir(target) else shutil.copy2)(target, bak)
        if single_file:
            df = df.coalesce(1)
        if mode in ("append", "overwrite"):
            writer = df.write.format(self.fmt).mode(mode)
            for k, v in self._read_options(**kw).items():
                writer = writer.option(k, v)
            writer.save(target)
            return
        from d2d_spark.operators.writes import write_mode

        if pks is None:
            raise ValueError(f"mode={mode!r} requires pks")
        write_mode(
            df,
            target,
            mode=mode,
            pks=pks,
            fmt=self.fmt,
            spark=self.spark,
            # the target must be re-read and re-written with THIS
            # connector's format options (header/sep/...), not defaults
            options=self._read_options(**kw),
        )


class ParquetConnector(FileConnector):
    fmt = "parquet"
    ext = ".parquet"

    def get_count(self, index: str) -> int:
        # metadata-only count: Catalyst serves COUNT(*) from parquet
        # row-group footers without reading data pages
        return self.read(index).count()


class CsvConnector(FileConnector):
    """CSV with header row (CsvD). `inferSchema` costs an extra pass;
    pass schema= at read time on large tables instead."""

    fmt = "csv"
    ext = ".csv"

    def __init__(self, root, spark=None, header=True, inferSchema=True, **options):
        super().__init__(
            root, spark, header=str(header).lower(), inferSchema=str(inferSchema).lower(), **options
        )

    def get_count(self, index: str) -> int:
        """Line count minus headers — one text scan, no schema
        inference pass (the reference's get_line_num_fast,
        d22d/utils/db/__init__.py:477-488). Multi-line quoted records
        would need the full CSV parse; header=false means raw lines."""
        import glob as _glob

        path = self.path(index)
        lines = self.spark.read.text(path).count()
        if self.options.get("header") != "true":
            return lines
        n_files = (
            len([p for p in _glob.glob(os.path.join(path, "part-*")) if os.path.isfile(p)])
            if os.path.isdir(path)
            else 1
        )
        return lines - n_files


class TxtConnector(CsvConnector):
    """Header + arbitrary-delimiter text (TxtD); quotes stripped by the
    CSV reader's quote handling."""

    ext = ".txt"

    def __init__(self, root, spark=None, sep="\t", **options):
        super().__init__(root, spark, sep=sep, **options)


class JsonlConnector(FileConnector):
    """JSON-lines (JsonListD) — one JSON object per line; nested
    values stay first-class structs/arrays instead of the reference's
    stringified JSON (§1.2 capability upgrade)."""

    fmt = "json"
    ext = ".jsonl"


class OrcConnector(FileConnector):
    """ORC (no reference counterpart — warehouse-interop extension).
    Columnar like parquet: predicate pushdown, column pruning and
    stripe-level statistics all apply, so it slots into the same
    scan-heavy plans without a penalty at scale."""

    fmt = "orc"
    ext = ".orc"


class AvroConnector(FileConnector):
    """Avro (row-oriented interop format, common as a Kafka/ingest
    landing format). The `spark-avro` datasource is a separate module
    not bundled with every distribution — construction probes for it
    and raises a clear gate error when absent rather than failing
    deep inside a job with a ClassNotFoundException."""

    fmt = "avro"
    ext = ".avro"

    def __init__(self, root: str, spark: SparkSession | None = None, **options: str):
        super().__init__(root, spark, **options)
        # the registration, not the class, is what's missing when the
        # module isn't deployed — ask Spark's own datasource resolver
        jvm = self.spark.sparkContext._jvm
        try:
            jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
                "avro", self.spark._jsparkSession.sessionState().conf()
            )
        except Exception as e:
            # chain the cause: the probe touches internal APIs, and a
            # failure that is NOT a missing module (stopped session,
            # relocated internal class) must stay diagnosable
            raise NotImplementedError(
                "the avro datasource did not resolve — usually the spark-avro "
                "module is not on the classpath (submit with --packages "
                "org.apache.spark:spark-avro_2.13:<spark-version>); see the "
                "chained exception for the actual resolver error"
            ) from e
