"""Warehouse maintenance: small-file compaction and range-clustered
rewrites.

At 100 TB the two chronic table ailments are (1) small files —
streaming/incremental appends leave thousands of KB-sized parquet
files whose open/footer costs dominate scans — and (2) random row
placement, which defeats parquet min/max row-group skipping so every
predicate reads every file.

Both fixes are rewrites, so both go through the same crash-safe
staging swap the keyed write modes use (`_swap_paths`): the rewritten
table materializes beside the target and replaces it with
backup-and-rename; a crash never leaves a half-rewritten table.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d2d_spark.operators.writes import _swap_paths
from d2d_spark.sources.base import require_spark


def data_file_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(file_count, total_bytes) of a table directory's data files,
    via the Hadoop FileSystem (works on any scheme). Metadata-only."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    n = total = 0
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        n += 1
        total += st.getLen()
    return n, total


def _is_hive_partitioned(spark: SparkSession, path: str) -> bool:
    """True if the directory has `col=value` subdirectories (hive
    partition layout)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    for st in fs.listStatus(p):
        if st.isDirectory() and "=" in st.getPath().getName():
            return True
    return False


def compact_table(
    spark: SparkSession | None,
    path: str,
    target_file_mb: float = 128,
    fmt: str = "parquet",
    min_files: int = 2,
) -> dict:
    """Rewrite a table directory into ~``target_file_mb``-sized files.

    Output file count = ceil(total_bytes / target), floor 1 — a
    coalesce-style repartition, one shuffle-light job (round-robin
    repartition) regardless of input file count. No-op (returns the
    stats unchanged) when the table already has < ``min_files`` files
    or is already at/under the target count, so a cron'd compaction
    pass is cheap when there is nothing to do.

    Returns ``{files_before, bytes, files_after, compacted}``.
    """
    spark = require_spark(spark)
    if _is_hive_partitioned(spark, path):
        # a flat rewrite would fold `col=value` directories into data
        # columns and destroy the partition layout (and its pruning);
        # compact each partition directory individually instead
        raise ValueError(
            f"compact_table: {path} is hive-partitioned; run compact_table "
            "on each partition directory (col=value/) instead"
        )
    n_files, total = data_file_stats(spark, path)
    target_bytes = max(1, int(target_file_mb * (1 << 20)))
    want = max(1, -(-total // target_bytes)) if total else 1
    if n_files < min_files or n_files <= want:
        return {"files_before": n_files, "bytes": total, "files_after": n_files, "compacted": False}
    df = spark.read.format(fmt).load(path)
    staging = f"{path}.__compact_{uuid.uuid4().hex[:8]}"
    df.repartition(int(want)).write.format(fmt).mode("overwrite").save(staging)
    _swap_paths(spark, staging, path)
    after, _ = data_file_stats(spark, path)
    return {"files_before": n_files, "bytes": total, "files_after": after, "compacted": True}


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    n_files: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` range-clustered on ``cluster_by``: rows are
    range-partitioned and sorted within files on the cluster keys, so
    every output file covers a narrow, near-disjoint key range and
    parquet min/max statistics actually prune — a point/range
    predicate on the cluster key reads O(matching files), not the
    table. The poor-man's Z-order for the single-key-prefix case,
    with zero table-format dependencies.

    New tables only (overwrite): clustering is a physical property of
    the whole table, so incremental appends belong in a follow-up
    ``compact_table``-style re-cluster pass.
    """
    if not cluster_by:
        raise ValueError("cluster_by needs at least one column")
    cols = [F.col(c) for c in cluster_by]
    part = df.repartitionByRange(n_files, *cols) if n_files else df.repartitionByRange(*cols)
    part.sortWithinPartitions(*cols).write.format(fmt).mode("overwrite").save(path)


def cluster_ranges(spark: SparkSession, path: str, column: str) -> list[tuple]:
    """Per-file (min, max) of ``column`` from parquet footer metadata —
    the statistics a clustered write exists to sharpen. Diagnostic
    helper for tests/audits; footer-only, no data read."""
    import pyarrow.parquet as pq

    out = []
    root = path[len("file://"):] if path.startswith("file://") else path
    for name in sorted(os.listdir(root)):
        if not name.endswith(".parquet") or name.startswith(("_", ".")):
            continue
        md = pq.ParquetFile(os.path.join(root, name)).metadata
        lo = hi = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == column and col.statistics is not None:
                    s = col.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        out.append((lo, hi))
    return out
