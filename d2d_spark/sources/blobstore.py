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
from urllib.parse import quote, unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d2d_spark.sources.base import check_executor_local_root, require_spark

#: filesystem name limit is 255 bytes, and writes stage to
#: ``.{name}.tmp`` (+5 bytes); refuse keys whose encoding exceeds the
#: staged form rather than truncate (truncation re-introduces
#: collisions)
_MAX_NAME = 250


def _safe_name(key: str) -> str:
    """Collision-free, reversible key -> filename encoding: RFC 3986
    percent-encoding of every non-alphanumeric byte. Distinct keys
    ('a/b' vs 'a:b') get distinct names, a hostile key cannot escape
    the store root (no '/' survives), and the original key is
    recovered exactly by :func:`_key_of` — both single-key and
    read_all() paths return true keys, not sanitized shadows."""
    if not key:
        raise ValueError("blob key must be non-empty")
    name = quote(key, safe="._-")
    if name.startswith("."):  # never collide with hidden/tmp staging
        name = "%2E" + name[1:]
    if len(name.encode("utf-8")) > _MAX_NAME:
        raise ValueError(
            f"blob key encodes to {len(name)} bytes (> {_MAX_NAME}); "
            "shorten the key or shard it into a sub-prefix"
        )
    return name


def _key_of(name: str) -> str:
    """Inverse of _safe_name."""
    return unquote(name)


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
        """Original (decoded) keys — never the on-disk encodings."""
        if not os.path.isdir(self.root):
            return []
        # staging files are dot-prefixed (and _safe_name never emits a
        # leading '.'), so the dot filter alone separates blobs from
        # debris — filtering '*.tmp' here would hide a legitimate key
        # like 'report.tmp'
        return sorted(
            _key_of(n) for n in os.listdir(self.root) if not n.startswith(".")
        )

    def check(self, key: str) -> bool:
        return os.path.isfile(self._path(key))

    def get(self, key: str) -> bytes:
        with open(self._path(key), "rb") as f:
            return f.read()

    def save(self, key: str, payload: bytes) -> None:
        # dot-prefixed staging like the bulk path: list()/read_all()
        # can never observe a half-written or crash-leaked temp file
        name = _safe_name(key)
        tmp = os.path.join(self.root, f".{name}.tmp")
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
        check_executor_local_root(df.sparkSession, root, "save_dataframe")
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
        # staging debris is dot-prefixed and thus already invisible to
        # Hadoop file listing (no '*.tmp' filter — that would hide a
        # legitimate key like 'report.tmp'); decode the filename back
        # to the ORIGINAL key (url_decode is the JVM-side inverse of
        # _safe_name's percent-encoding)
        return raw.select(
            F.url_decode(F.element_at(F.split(F.col("path"), "/"), -1)).alias("key"),
            F.col("content").alias("payload"),
            F.col("length"),
            F.col("modificationTime").alias("mod_time"),
        )
