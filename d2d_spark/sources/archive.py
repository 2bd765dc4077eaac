"""Archive source (ZipD/RarD, d22d/utils/db/__init__.py:640-694):
iterate an archive's member files, first line = column names, one
dict per subsequent line, with a pluggable per-file parser
(get_file_data_func :645-651). Read-only, like the reference.

Spark-first: ``binaryFiles`` ships whole archive bytes to executors
(archives aren't splittable — the scale unit is one task per
archive), members are decompressed and parsed executor-side, and
``spark.read.json`` on the parsed stream gives genuine type
inference. Gzip needs none of this: Spark's text/csv readers
decompress ``.gz`` transparently.
"""

from __future__ import annotations

import io
import json
import zipfile
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FileParser = Callable[[str, bytes], Iterator[dict]]

try:  # pragma: no cover - absent in the sandbox
    import rarfile  # noqa: F401

    HAVE_RAR = True
except ImportError:
    HAVE_RAR = False


def _default_parser(name: str, content: bytes) -> Iterator[dict]:
    """header line + comma-split rows (the reference's default
    get_file_data_func)."""
    text = content.decode("utf-8", errors="replace")
    lines = [ln for ln in text.splitlines() if ln.strip()]
    if not lines:
        return
    header = [h.strip() for h in lines[0].split(",")]
    for line in lines[1:]:
        yield dict(zip(header, (v.strip() for v in line.split(","))))


def read_zip(
    spark: SparkSession,
    path: str,
    member_suffix: str = "",
    parser: FileParser = _default_parser,
) -> DataFrame:
    """Every member of every zip under ``path`` -> one DataFrame."""

    def explode_archive(kv):
        _, content = kv
        with zipfile.ZipFile(io.BytesIO(content)) as zf:
            for info in zf.infolist():
                if info.is_dir() or not info.filename.endswith(member_suffix):
                    continue
                for row in parser(info.filename, zf.read(info)):
                    yield json.dumps(row, ensure_ascii=False, default=str)

    rdd = spark.sparkContext.binaryFiles(path).flatMap(explode_archive)
    if rdd.isEmpty():
        return spark.createDataFrame([], T.StructType([]))
    return spark.read.json(rdd)


def read_rar(
    spark: SparkSession,
    path: str,
    member_suffix: str = "",
    parser: FileParser = _default_parser,
) -> DataFrame:
    """Every member of every rar under ``path`` -> one DataFrame
    (reference RarD, d22d/utils/db/__init__.py:640-694 +
    d22d/utils/rarutils.py). Same executor-side explode shape as
    read_zip. Codec: the ``rarfile`` package (full, incl. compressed
    members) when installed; otherwise the self-contained
    ``rar_lite`` container parser, which decodes STORED members of
    RAR4/RAR5 archives and raises a clear capability error on
    compressed ones (RAR compression is proprietary — only the
    container format is re-implementable)."""

    def explode_archive(kv):
        _, content = kv
        if HAVE_RAR:
            import rarfile

            with rarfile.RarFile(io.BytesIO(content)) as rf:
                for info in rf.infolist():
                    # suffix test BEFORE rf.read: unwanted members
                    # must not be decompressed and materialized
                    if info.is_dir() or not info.filename.endswith(member_suffix):
                        continue
                    for row in parser(info.filename, rf.read(info)):
                        yield json.dumps(row, ensure_ascii=False, default=str)
            return
        from d2d_spark.sources.rar_lite import rar_members

        # name filter passed down: a compressed member of an UNWANTED
        # type must not fail an archive whose wanted members are stored
        for name, data in rar_members(
            bytes(content), want=lambda n: n.endswith(member_suffix)
        ):
            for row in parser(name, data):
                yield json.dumps(row, ensure_ascii=False, default=str)

    rdd = spark.sparkContext.binaryFiles(path).flatMap(explode_archive)
    if rdd.isEmpty():
        return spark.createDataFrame([], T.StructType([]))
    return spark.read.json(rdd)
