"""Key-value blob store: opaque binary payloads addressed by string
key — the reference's BaseStore protocol (d22d/model/midhardware.py:
4-48: list/check/get/save/delete) and its GridFS backing
(d22d/utils/db/__init__.py:1026-1036), re-expressed over a filesystem
or object-store prefix.

Spark-first shape:

  - one object per key under ``root/`` (the GridFS layout every blob
    consumer expects), filenames sanitized with the same
    secure_filename rule the reference applies to file payloads;
  - bulk save is DISTRIBUTED: ``save_dataframe`` writes each
    partition's blobs from the executors (foreachPartition) — the
    driver never sees payload bytes, so a 100 TB blob column streams
    out at partition parallelism;
  - bulk read is the built-in ``binaryFile`` DataSource:
    ``read_all()`` returns (key, payload, length, mod_time) with
    pushdown on path globs — the scan side scales like any file scan
    (list/read parallelized over executors).

Single-key get/save/check/delete are driver-side conveniences for
protocol parity (the reference API is single-key); anything hot-path
should use the DataFrame forms.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d2d_spark.sources.base import require_spark

_UNSAFE = set('\\/:*?"<>|')


def _safe_name(key: str) -> str:
    """Python-side mirror of functions.scalars.secure_filename (d22d
    secure_filename, d22d/utils/db/__init__.py:54-85): strip path
    separators and shell-unsafe characters so a hostile key cannot
    escape the store root."""
    cleaned = "".join("_" if c in _UNSAFE or ord(c) < 32 else c for c in key)
    cleaned = cleaned.strip(". ")
    return cleaned[:250] or "_"


class BlobStore:
    """list/check/get/save/delete over ``root`` + Spark bulk paths.

    ``root`` may be a local path (tested here) or any Hadoop-visible
    URI for the read side; the distributed write side uses plain
    ``open`` per executor, so point it at a shared mount (or swap
    ``_open_for_write`` for an fsspec opener) for remote stores.
    """

    def __init__(self, root: str, spark: SparkSession | None = None):
        self.root = root
        self.spark = require_spark(spark)
        os.makedirs(root, exist_ok=True)

    # -- single-key protocol parity (reference BaseStore) --------------
    def _path(self, key: str) -> str:
        return os.path.join(self.root, _safe_name(key))

    def list(self) -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(n for n in os.listdir(self.root) if not n.startswith("."))

    def check(self, key: str) -> bool:
        return os.path.isfile(self._path(key))

    def get(self, key: str) -> bytes:
        with open(self._path(key), "rb") as f:
            return f.read()

    def save(self, key: str, payload: bytes) -> None:
        tmp = self._path(key) + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, self._path(key))  # atomic: readers never see partial blobs

    def delete(self, key: str) -> None:
        try:
            os.remove(self._path(key))
        except FileNotFoundError:
            pass

    # -- distributed bulk paths ----------------------------------------
    def save_dataframe(self, df: DataFrame, key_col: str, payload_col: str) -> None:
        """Write one object per row from the EXECUTORS — each partition
        streams its own blobs, nothing is collected to the driver.
        Last-writer-wins on duplicate keys (GridFS put semantics)."""
        root = self.root
        os.makedirs(root, exist_ok=True)

        def write_partition(rows):
            for row in rows:
                key, payload = row[0], row[1]
                if key is None or payload is None:
                    continue
                name = _safe_name(str(key))
                tmp = os.path.join(root, f".{name}.tmp")
                with open(tmp, "wb") as f:
                    f.write(bytes(payload))
                os.replace(tmp, os.path.join(root, name))

        df.select(key_col, payload_col).foreachPartition(write_partition)

    def read_all(self, glob: str | None = None) -> DataFrame:
        """All blobs as (key, payload, length, mod_time) via the
        binaryFile DataSource — a distributed scan with path-glob
        pruning (pass ``glob`` to read a key subset without listing
        the rest)."""
        reader = self.spark.read.format("binaryFile")
        if glob:
            reader = reader.option("pathGlobFilter", glob)
        raw = reader.load(self.root)
        return raw.select(
            F.element_at(F.split(F.col("path"), "/"), -1).alias("key"),
            F.col("content").alias("payload"),
            F.col("length"),
            F.col("modificationTime").alias("mod_time"),
        )
