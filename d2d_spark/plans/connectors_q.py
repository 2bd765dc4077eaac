"""Connector-layer queries: round-trips through the custom sources
verified against oracles that read the original parquet directly —
proving the source/sink encode/decode chain is lossless.

Each query stages its intermediate files under /tmp/d2d_spark_stage
(overwritten per run, so re-execution is idempotent).
"""

from __future__ import annotations

import tempfile
from pathlib import Path

from pyspark.sql import functions as F

from d2d_spark.migrate import Migration, apply_format_data
from d2d_spark.plans.registry import query
from d2d_spark.session import read_table
from d2d_spark.sources import BlobStore, CsvConnector, JsonlConnector, SqlFileConnector

STAGE = Path(tempfile.gettempdir()) / "d2d_spark_stage"


@query(
    "sqlfile_roundtrip_orders",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders WHERE o_orderkey <= 1000
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("source", "sqlfile"),
)
def sqlfile_roundtrip_orders(spark, sf_dir):
    """orders -> .sql dump (INSERT statements, compressed 100/stmt) ->
    parse back -> aggregate. The oracle aggregates the parquet
    directly: value-hash equality proves the dump codec is lossless
    for ints, floats, strings, and dates."""
    root = str(STAGE / "sqlfile")
    conn = SqlFileConnector(root, spark)
    sample = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    conn.write(
        sample.select("o_orderkey", "o_orderstatus", "o_totalprice"),
        "orders",
        compress=100,
        pks=["o_orderkey"],
    )
    back = conn.read("orders")
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "csv_blob_roundtrip",
    oracle="""
    SELECT 'csv' AS leg, c_mktsegment AS k, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal,
           CAST(NULL AS VARCHAR) AS payload_md5
    FROM customer GROUP BY c_mktsegment
    UNION ALL
    SELECT 'blob' AS leg, concat('doc_', CAST(doc_id AS VARCHAR)) AS k,
           CAST(octet_length(encode(text)) AS BIGINT) AS n,
           CAST(NULL AS DOUBLE) AS bal,
           md5(text) AS payload_md5
    FROM documents WHERE doc_id % 20 = 0
    """,
    tags=("source", "csv", "blobstore", "kv"),
)
def csv_blob_roundtrip(spark, sf_dir):
    """Two lossless-codec round-trips in one tagged result.

    csv leg: customer -> CSV (header, schema re-inferred on read) ->
    aggregate; proves quoting/escaping and type inference survive.

    blob leg: K/V blob store (reference BaseStore protocol,
    d22d/model/midhardware.py:4-48) — document text bytes saved one
    object per key FROM THE EXECUTORS (foreachPartition — no driver
    collect), read back as a distributed binaryFile scan, verified by
    content md5 + byte length; the bulk paths are partition-parallel."""
    conn = CsvConnector(str(STAGE / "csv"), spark)
    conn.write(read_table(spark, sf_dir, "customer"), "customer")
    csv_leg = (
        conn.read("customer")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("bal"),
        )
        .select(
            F.lit("csv").alias("leg"),
            F.col("c_mktsegment").alias("k"),
            "n",
            "bal",
            F.lit(None).cast("string").alias("payload_md5"),
        )
    )

    root = str(STAGE / "blobstore")
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    store = BlobStore(root, spark)
    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    blobs = d.select(
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("key"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    store.save_dataframe(blobs, "key", "payload")
    blob_leg = store.read_all().select(
        F.lit("blob").alias("leg"),
        F.col("key").alias("k"),
        F.col("length").alias("n"),
        F.lit(None).cast("double").alias("bal"),
        F.md5("payload").alias("payload_md5"),
    )
    return csv_leg.unionAll(blob_leg)


@query(
    "migration_transform_supplier",
    oracle="""
    SELECT s_nationkey AS nation, COUNT(*) AS n_suppliers,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM supplier WHERE s_acctbal > 0
    GROUP BY s_nationkey ORDER BY s_nationkey
    """,
    tags=("migration", "transform"),
)
def migration_transform_supplier(spark, sf_dir):
    """A full Migration run: supplier -> expression format_data
    (project/rename) + row filter -> JSON-lines sink -> read the sink
    back and aggregate. Exercises the whole facade path the reference
    documents as its 2-line API."""
    from d2d_spark.sources import ParquetConnector

    class _Src:
        def read(self, index, **kw):
            return read_table(spark, sf_dir, index)

        def get_indexes(self):
            return ["supplier"]

    out_root = str(STAGE / "mig_out")
    dst = JsonlConnector(out_root, spark)
    df = _Src().read("supplier").filter(F.col("s_acctbal") > 0)
    df = apply_format_data(
        df, {"nation": F.col("s_nationkey"), "bal": F.col("s_acctbal")}
    ).select("nation", "bal")
    dst.write(df, "supplier_out", mode="overwrite")
    back = dst.read("supplier_out")
    return (
        back.groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(F.col("bal").cast("decimal(18,2)")).cast("double").alias("total_bal"),
        )
        .orderBy("nation")
    )
