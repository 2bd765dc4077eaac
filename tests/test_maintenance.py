"""Small-file compaction and range-clustered writes."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from d2d_spark.operators.maintenance import (
    cluster_ranges,
    compact_table,
    data_file_stats,
    write_clustered,
)
from d2d_spark.session import read_table


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="d2d_maint_")
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


def test_compaction_reduces_file_count_preserves_rows(spark, sf_dir, tmpdir):
    orders = read_table(spark, sf_dir, "orders")
    path = str(tmpdir / "orders")
    orders.repartition(40).write.parquet(path)  # simulate small-file buildup
    before, _ = data_file_stats(spark, path)
    assert before == 40
    rows_before = sorted(r.o_orderkey for r in spark.read.parquet(path).collect())

    stats = compact_table(spark, path, target_file_mb=128)
    assert stats["compacted"] is True
    assert stats["files_before"] == 40 and stats["files_after"] == 1
    rows_after = sorted(r.o_orderkey for r in spark.read.parquet(path).collect())
    assert rows_after == rows_before

    # second pass is a no-op
    again = compact_table(spark, path, target_file_mb=128)
    assert again["compacted"] is False and again["files_after"] == 1


def test_compaction_respects_target_size(spark, sf_dir, tmpdir):
    orders = read_table(spark, sf_dir, "orders")
    path = str(tmpdir / "orders")
    orders.repartition(40).write.parquet(path)
    _, total = data_file_stats(spark, path)
    # pick a (fractional-MB) target that forces ~3 output files
    stats = compact_table(spark, path, target_file_mb=total / 3 / (1 << 20))
    assert stats["compacted"] is True
    assert 1 < stats["files_after"] < 40


def test_clustered_write_gives_disjoint_ranges(spark, sf_dir, tmpdir):
    orders = read_table(spark, sf_dir, "orders")
    path = str(tmpdir / "clustered")
    write_clustered(orders, path, ["o_orderkey"], n_files=4)
    ranges = [r for r in cluster_ranges(spark, path, "o_orderkey") if r[0] is not None]
    assert len(ranges) == 4
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # near-disjoint: file ranges do not interleave
    # and rows survive intact
    assert spark.read.parquet(path).count() == orders.count()
    # contrast: an unclustered multi-file write overlaps
    messy = str(tmpdir / "messy")
    orders.orderBy(F.col("o_totalprice")).repartition(4).write.parquet(messy)
    messy_ranges = [r for r in cluster_ranges(spark, messy, "o_orderkey") if r[0] is not None]
    overlaps = sum(
        1
        for i, (lo1, hi1) in enumerate(messy_ranges)
        for lo2, hi2 in messy_ranges[i + 1 :]
        if not (hi1 <= lo2 or hi2 <= lo1)
    )
    assert overlaps > 0


def test_write_clustered_validates(spark, sf_dir, tmpdir):
    with pytest.raises(ValueError, match="cluster_by"):
        write_clustered(read_table(spark, sf_dir, "orders"), str(tmpdir / "x"), [])


def test_compaction_refuses_hive_partitioned_layout(spark, sf_dir, tmpdir):
    """Review finding: a flat rewrite would fold col=value directories
    into data columns and destroy partition pruning."""
    orders = read_table(spark, sf_dir, "orders")
    path = str(tmpdir / "part")
    orders.write.partitionBy("o_orderstatus").parquet(path)
    with pytest.raises(ValueError, match="hive-partitioned"):
        compact_table(spark, path)
    # ...but compacting ONE partition directory works
    sub = next(
        str(p) for p in (tmpdir / "part").iterdir() if p.is_dir() and "=" in p.name
    )
    stats = compact_table(spark, sub, target_file_mb=128, min_files=1)
    assert spark.read.parquet(sub).count() > 0
    assert stats["files_after"] >= 1
