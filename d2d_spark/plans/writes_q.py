"""Write-semantics queries: UPDATE/DELETE dataflows and partitioned
warehouse round-trips, oracle-verified by expressing the end state as
plain SELECTs over the original tables."""

from __future__ import annotations

import tempfile
from pathlib import Path

from pyspark.sql import functions as F

from d2d_spark.operators.writes import delete_rows, update_rows
from d2d_spark.plans.registry import query
from d2d_spark.session import read_table

STAGE = Path(tempfile.gettempdir()) / "d2d_spark_stage"


@query(
    "update_delete_rows_orders",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'P' THEN 'PENDING' ELSE o_orderstatus END AS o_orderstatus,
           CASE WHEN o_orderstatus = 'P'
                THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE)
                ELSE o_totalprice END AS o_totalprice
    FROM orders WHERE o_orderkey <= 2000 AND NOT (o_orderstatus = 'F')
    """,
    tags=("writes", "update", "delete"),
)
def update_delete_rows_orders(spark, sf_dir):
    """UPDATE then DELETE on one dataflow: SET status='PENDING',
    price=price*2 WHERE status='P' (matched rows rewritten, others
    pass through), then DELETE WHERE status='F' — survivors only;
    NULL predicates neither update nor delete."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    updated = update_rows(
        o,
        {
            "o_orderstatus": F.lit("PENDING"),
            "o_totalprice": (F.col("o_totalprice").cast("decimal(18,2)") * 2).cast("double"),
        },
        F.col("o_orderstatus") == "P",
    )
    out = delete_rows(updated, F.col("o_orderstatus") == "F")
    return out.select("o_orderkey", "o_orderstatus", "o_totalprice")


@query(
    "partitioned_write_prune",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("warehouse", "partitioning"),
)
def partitioned_write_prune(spark, sf_dir):
    """Hive-style partitioned table round-trip (reference
    create_table(partitioned=…)+LOAD DATA, d22d/utils/db/__init__.py:
    1145-1198): write orders partitioned by o_orderstatus, read back
    filtered to one partition. The filter prunes at the directory
    level — the scan never opens other partitions' files (the 100 TB
    posture for any status/date-sliced table)."""
    root = str(STAGE / "warehouse" / "orders_by_status")
    orders = read_table(spark, sf_dir, "orders")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(root)
    back = spark.read.parquet(root).filter(F.col("o_orderstatus") == "F")
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .orderBy("o_orderpriority")
    )
