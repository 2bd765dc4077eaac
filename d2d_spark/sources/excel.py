"""Excel connector (XlsIbyFileD/XlsxIbyFileD,
d22d/utils/db/__init__.py:839-982): .xlsx tables, first row = column
names, multi-sheet union, sheet rollover on write every ``max_rows``
rows, illegal-XML-character scrubbing.

Byte codec: pandas+openpyxl when installed (full fidelity: dates,
styles); otherwise the self-contained SpreadsheetML codec in
``xlsx_lite`` (stdlib zip+XML, values only) — the connector works
everywhere, including this sandbox, through the same code paths.
"""

from __future__ import annotations

import glob
import io
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from d2d_spark.functions.scalars import scrub_illegal_xml
from d2d_spark.sources.base import Connector, check_executor_local_root, require_spark

try:  # pragma: no cover - absent in the sandbox
    import openpyxl  # noqa: F401

    HAVE_ENGINE = True
except ImportError:
    HAVE_ENGINE = False


def _decode_workbook(data: bytes) -> pd.DataFrame:
    """Workbook bytes -> one frame (all sheets unioned, reference
    get_cols_name_set semantics). Format is sniffed from the bytes:
    OLE2 signature -> legacy BIFF8 ``.xls`` via the self-contained
    ``xls_lite`` codec (openpyxl cannot read .xls and xlrd is absent,
    so the codec is the .xls path regardless of installed engines);
    otherwise SpreadsheetML ``.xlsx``."""
    from d2d_spark.sources.xls_lite import read_sheets as read_xls
    from d2d_spark.sources.xls_lite import sniff_xls

    if sniff_xls(data):
        sheets = read_xls(data)
    elif HAVE_ENGINE:
        sheets = pd.read_excel(io.BytesIO(data), sheet_name=None)
    else:
        from d2d_spark.sources.xlsx_lite import read_sheets

        sheets = read_sheets(data)
    return pd.concat(sheets.values(), ignore_index=True)


def _schema_of(pdf: pd.DataFrame):
    """Spark schema from pandas dtypes: numeric/bool map directly,
    everything else (object, all-NULL, strings) is a string column —
    deterministic for any sample content.

    A repeated header name makes ``pdf[c]`` return a DataFrame (no
    ``.dtype``) and would surface as an opaque AttributeError mid-read
    — and Spark schemas reject duplicate field names anyway — so
    duplicates are refused up front with the offending names."""
    from pyspark.sql import types as T

    names = [str(c) for c in pdf.columns]
    dupes = sorted({n for n in names if names.count(n) > 1})
    if dupes:
        raise ValueError(
            f"workbook header row repeats column name(s) {dupes}; rename the "
            "duplicate headers to unique names before reading"
        )
    kind_map = {"i": T.LongType(), "u": T.LongType(), "f": T.DoubleType(), "b": T.BooleanType()}
    return T.StructType(
        [
            T.StructField(str(c), kind_map.get(pdf[c].dtype.kind, T.StringType()))
            for c in pdf.columns
        ]
    )


def _write_workbook(
    sheets: list[tuple[str, pd.DataFrame]], path: str, ext: str = ".xlsx"
) -> None:
    if ext == ".xls":
        # legacy BIFF8: always the self-contained codec (openpyxl
        # writes only .xlsx)
        from d2d_spark.sources.xls_lite import write_sheets as write_xls

        write_xls(sheets, path)
    elif HAVE_ENGINE:
        with pd.ExcelWriter(path, engine="openpyxl") as writer:
            for name, chunk in sheets:
                chunk.to_excel(writer, sheet_name=name, index=False)
    else:
        from d2d_spark.sources.xlsx_lite import write_sheets

        write_sheets(sheets, path)


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

    def part_dir(self, index: str) -> str:
        """Directory of distributed workbook parts for ``index``."""
        return self.path(index) + ".d"

    def read(self, index: str, **kw) -> DataFrame:
        """Workbook -> DataFrame. Excel files are not splittable, so
        the scale unit is one executor task per workbook: files are
        listed driver-side and decoded inside a parallelized map, not
        on the driver. Reads either a single ``<index>.xlsx`` or a
        directory of distributed parts ``<index>.xlsx.d/``."""
        path = self.path(index)
        if not os.path.exists(path) and os.path.isdir(self.part_dir(index)):
            path = self.part_dir(index)
            parts = sorted(glob.glob(os.path.join(path, f"*{self.ext}")))
            if not parts:
                raise FileNotFoundError(
                    f"workbook part directory {path!r} holds no parts — "
                    "the distributed write saw only empty partitions"
                )
            sample = parts[0]
        else:
            sample = path

        # binaryFile keeps the workbook bytes executor-side
        bin_df = (
            self.spark.read.format("binaryFile")
            .option("pathGlobFilter", f"*{self.ext}")
            .load(path)
        )
        # Schema from the pandas dtypes of one driver-side sample
        # decode (the executors re-decode that file — schema needs a
        # driver peek, and only the one sample pays twice). Mapping
        # dtypes directly (object -> string) stays well-defined for
        # empty workbooks and all-NULL columns, where row-based
        # inference would raise CANNOT_INFER_EMPTY_SCHEMA.
        with open(sample, "rb") as f:
            first = _decode_workbook(f.read())
        if not len(first.columns):
            raise ValueError(f"workbook {sample!r} has no header row to infer a schema from")
        schema = _schema_of(first)

        def per_file(iterator):
            for pdf in iterator:
                for content in pdf["content"]:
                    yield _decode_workbook(bytes(content))

        return bin_df.select("content").mapInPandas(per_file, schema=schema)

    #: above this many rows, refuse the driver-side single-workbook
    #: assembly — the caller must take the distributed part path
    DRIVER_ROW_CAP = 1_000_000

    def write(
        self,
        df: DataFrame,
        index: str,
        mode: str = "overwrite",
        pks=None,
        distributed: bool | None = None,
        **kw,
    ) -> None:
        """Scrub illegal XML chars (reference :896-909), roll over to a
        new sheet every max_rows_per_sheet (reference :887-893).

        Two shapes:
          - single workbook (small exports): driver-side assembly,
            REFUSED above DRIVER_ROW_CAP rows (bounded limit-probe,
            not a full count);
          - ``distributed=True``: each partition writes its own
            ``part-*.xlsx`` into ``<index>.xlsx.d/`` FROM THE
            EXECUTORS via mapInPandas — no driver collect, sheet
            rollover inside each part; ``read`` unions the parts.
        """
        scrubbed = df.select(
            *[
                scrub_illegal_xml(df[c]).alias(c) if dt == "string" else df[c]
                for c, dt in df.dtypes
            ]
        )
        if distributed is None:
            distributed = False
        if not distributed:
            probe = df.limit(self.DRIVER_ROW_CAP + 1).count()
            if probe > self.DRIVER_ROW_CAP:
                raise ValueError(
                    f"single-workbook Excel write caps at {self.DRIVER_ROW_CAP:,} "
                    "driver-side rows; pass distributed=True to write "
                    "partition-parallel workbook parts"
                )
            pdf = scrubbed.toPandas()
            os.makedirs(self.root, exist_ok=True)
            _write_workbook(
                list(sheet_chunks(pdf, self.max_rows_per_sheet)),
                self.path(index),
                ext=self.ext,
            )
            return

        out_dir = self.part_dir(index)
        check_executor_local_root(df.sparkSession, out_dir, "distributed Excel write")
        if mode == "overwrite" and os.path.isdir(out_dir):
            import shutil

            shutil.rmtree(out_dir)
        os.makedirs(out_dir, exist_ok=True)
        max_rows = self.max_rows_per_sheet
        out_schema = "part string, n_rows long"
        # one token per WRITE (driver-side): task retries of this write
        # overwrite their own part (idempotent), while a later
        # mode='append' write gets a fresh token and accumulates parts
        # instead of clobbering same-numbered partitions
        import uuid

        write_token = uuid.uuid4().hex[:8]
        ext = self.ext

        def write_part(batches):
            from pyspark import TaskContext

            pdfs = [b for b in batches if len(b)]
            if not pdfs:
                yield pd.DataFrame({"part": pd.Series(dtype="object"), "n_rows": pd.Series(dtype="int64")})
                return
            part = pd.concat(pdfs, ignore_index=True)
            # deterministic per-(write, partition) name: a retried or
            # speculative task overwrites its own part (os.replace
            # last-wins) instead of adding a second uuid-named copy of
            # the same rows — Spark task retries stay idempotent
            pid = TaskContext.get().partitionId()
            name = f"part-{write_token}-{pid:05d}{ext}"
            tmp = os.path.join(out_dir, f".{name}.{TaskContext.get().taskAttemptId()}.tmp")
            _write_workbook(list(sheet_chunks(part, max_rows)), tmp, ext=ext)
            os.replace(tmp, os.path.join(out_dir, name))
            yield pd.DataFrame({"part": [name], "n_rows": [len(part)]})

        # the tiny (part, n_rows) manifest is the only thing collected
        scrubbed.mapInPandas(write_part, schema=out_schema).collect()


class XlsConnector(ExcelConnector):
    """Directory of legacy ``<table>.xls`` workbooks (reference
    XlsIbyFileD, d22d/utils/db/__init__.py:839-939, minus the xlrd
    dependency): same rectangular-table, first-row-header,
    multi-sheet-union semantics as ``ExcelConnector``, byte codec =
    the self-contained BIFF8 ``xls_lite`` (read AND write — xlrd/xlwt
    are not needed). The distributed ``part-*.xls`` write path and
    driver-row cap are inherited unchanged. The default sheet
    rollover honors BIFF8's 65,536-row sheet cap (row indexes are
    u16), where .xlsx sheets allow ~1M rows."""

    ext = ".xls"

    def __init__(self, root: str, spark: SparkSession | None = None, max_rows_per_sheet: int = 65_535):
        super().__init__(root, spark, max_rows_per_sheet=max_rows_per_sheet)


def sheet_chunks(pdf: "pd.DataFrame", max_rows: int):
    """(sheet_name, frame-slice) pairs implementing the reference's
    sheet rollover: sheet1 gets the first max_rows rows, sheet2 the
    next, … An empty frame still yields one empty sheet (a workbook
    needs at least one)."""
    for i, start in enumerate(range(0, max(len(pdf), 1), max_rows)):
        yield f"sheet{i + 1}", pdf.iloc[start : start + max_rows]
