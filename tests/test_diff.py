"""Snapshot diffing (operators/diff.py): DuckDB oracle over orders
versions, null-safe change detection, summary counts."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from d2d_spark.operators.diff import diff_summary, table_diff
from d2d_spark.session import read_table

from .conftest import SF_SMALL


def test_table_diff_matches_duckdb_oracle(spark, sf_dir):
    """Old = orders below a key cutoff; new = a shifted slice with a
    price bump on one status — added/removed/changed must match the
    SQL full-outer formulation exactly."""
    orders = read_table(spark, sf_dir, "orders")
    old = orders.filter("o_orderkey <= 3000").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = (
        orders.filter("o_orderkey BETWEEN 1000 AND 4000")
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.when(
                F.col("o_orderstatus") == "P",
                (F.col("o_totalprice").cast("decimal(18,2)") * 2).cast("double"),
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
    )
    got = {
        (r.o_orderkey, r.change_type, r.old_o_totalprice, r.new_o_totalprice)
        for r in table_diff(old, new, ["o_orderkey"]).collect()
    }
    con = duckdb.connect()
    want = {
        tuple(r)
        for r in con.execute(
            f"""
            WITH orders AS (SELECT * FROM read_parquet('{SF_SMALL}/orders.parquet')),
            old AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                    FROM orders WHERE o_orderkey <= 3000),
            new AS (SELECT o_orderkey, o_orderstatus,
                           CASE WHEN o_orderstatus = 'P'
                                THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE)
                                ELSE o_totalprice END AS o_totalprice
                    FROM orders WHERE o_orderkey BETWEEN 1000 AND 4000)
            SELECT COALESCE(o.o_orderkey, n.o_orderkey),
                   CASE WHEN o.o_orderkey IS NULL THEN 'added'
                        WHEN n.o_orderkey IS NULL THEN 'removed'
                        ELSE 'changed' END,
                   o.o_totalprice, n.o_totalprice
            FROM old o FULL JOIN new n USING (o_orderkey)
            WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
               OR (o.o_orderstatus, o.o_totalprice) IS DISTINCT FROM
                  (n.o_orderstatus, n.o_totalprice)
            """
        ).fetchall()
    }
    assert got == want and len(got) > 100


def test_table_diff_null_transitions_and_summary(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, "d")], "k long, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "now-set"), (3, None), (5, "e")], "k long, v string"
    )
    got = {
        (r.k, r.change_type, r.old_v, r.new_v)
        for r in table_diff(old, new, ["k"]).collect()
    }
    assert got == {
        (2, "changed", None, "now-set"),
        (3, "changed", "c", None),
        (4, "removed", "d", None),
        (5, "added", None, "e"),
    }
    assert diff_summary(old, new, ["k"]) == {
        "added": 1,
        "removed": 1,
        "changed": 2,
        "unchanged": 1,
    }


def test_table_diff_validates_and_key_only(spark):
    old = spark.createDataFrame([(1,), (2,)], "k long")
    new = spark.createDataFrame([(2,), (3,)], "k long")
    got = {(r.k, r.change_type) for r in table_diff(old, new, ["k"]).collect()}
    assert got == {(1, "removed"), (3, "added")}
    with pytest.raises(ValueError, match="non-empty"):
        table_diff(old, new, [])
    with pytest.raises(ValueError, match="both sides"):
        table_diff(old, new, ["k"], compare_cols=["nope"])


def test_table_checksum_detects_drift_and_ignores_order(spark, sf_dir):
    import pytest as pt

    from d2d_spark.operators.diff import table_checksum

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    a = table_checksum(orders)
    # row order and partitioning are irrelevant
    assert table_checksum(orders.orderBy(F.desc("o_orderkey")).repartition(13)) == a
    # any single-row change moves the checksum
    drifted = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") == orders.first().o_orderkey, 0.0).otherwise(
            F.col("o_totalprice")
        ),
    )
    assert table_checksum(drifted) != a
    # duplicate multiplicity changes the value (sum, not xor)
    assert table_checksum(orders.union(orders.limit(1))) != a
    # NULL is not the string 'null'
    one = spark.createDataFrame([(1, None)], "k long, v string")
    two = spark.createDataFrame([(1, "null")], "k long, v string")
    assert table_checksum(one) != table_checksum(two)
    # column subset restricts the fingerprint
    assert table_checksum(orders, ["o_orderkey"]) == table_checksum(
        drifted, ["o_orderkey"]
    )
    with pt.raises(ValueError, match="at least one column"):
        table_checksum(orders.select())
    # empty table: stable zero
    assert table_checksum(orders.filter("o_orderkey < 0")) == 0


def test_snapshot_to_changes_round_trip(spark):
    """The closure property: apply_changes(old, snapshot_to_changes(
    old, new)) reproduces new EXACTLY — adds, whole-row updates,
    deletes, NULL-involved changes; unchanged keys emit nothing."""
    import pytest as pt
    from pyspark.sql import functions as F

    from d2d_spark.operators.diff import snapshot_to_changes
    from d2d_spark.operators.writes import apply_changes

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, "d", 40.0)],
        "id long, v string, x double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),      # unchanged
            (2, "b", 20.0),      # NULL -> value
            (3, None, 30.0),     # value -> NULL
            (5, "e", 50.0),      # added
        ],                        # 4 removed
        "id long, v string, x double",
    )
    feed = snapshot_to_changes(old, new, ["id"], seq_value=7)
    ops = {r["id"]: r["op"] for r in feed.collect()}
    assert ops == {2: "u", 3: "u", 4: "d", 5: "u"}  # 1 emits nothing
    replayed = apply_changes(old, feed, ["id"], "seq")
    want = {tuple(r) for r in new.collect()}
    assert {tuple(r) for r in replayed.select("id", "v", "x").collect()} == want
    # empty feed on identical snapshots
    assert snapshot_to_changes(old, old, ["id"], 1).count() == 0
    # guards
    with pt.raises(ValueError, match="duplicate keys"):
        snapshot_to_changes(old.unionAll(old.limit(1)), new, ["id"], 1)
    with pt.raises(ValueError, match="lacks payload"):
        snapshot_to_changes(old.drop("x"), new, ["id"], 1)
    with pt.raises(ValueError, match="key column"):
        snapshot_to_changes(old, new, [], 1)
