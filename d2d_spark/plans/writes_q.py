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
    WITH updel AS (
      SELECT 'updel' AS leg, o_orderkey AS k,
             CASE WHEN o_orderstatus = 'P' THEN 'PENDING' ELSE o_orderstatus END AS attr,
             CASE WHEN o_orderstatus = 'P'
                  THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE)
                  ELSE o_totalprice END AS price,
             CAST(NULL AS VARCHAR) AS valid_from, CAST(NULL AS VARCHAR) AS valid_to,
             CAST(NULL AS BOOLEAN) AS is_current
      FROM orders WHERE o_orderkey <= 2000 AND NOT (o_orderstatus = 'F')),
    lagged AS (
      SELECT user_id, event_type, ts, event_id, LAG(event_type) OVER w AS prev
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    runs AS (
      SELECT user_id, event_type, ts AS vf, event_id FROM lagged
      WHERE prev IS NULL OR prev IS DISTINCT FROM event_type),
    scd AS (
      -- event_id tiebreak mirrors the Spark side's order_cols: a
      -- fixture with same-(user, ts) run starts must not flip
      -- valid_to between the tied runs across engines
      SELECT 'scd2' AS leg, user_id AS k, event_type AS attr,
             CAST(NULL AS DOUBLE) AS price,
             strftime(vf, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
             strftime(LEAD(vf) OVER (PARTITION BY user_id ORDER BY vf, event_id),
                      '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
             LEAD(vf) OVER (PARTITION BY user_id ORDER BY vf, event_id) IS NULL AS is_current
      FROM runs),
    dold AS (SELECT o_orderkey, o_orderstatus, o_totalprice
             FROM orders WHERE o_orderkey <= 3000),
    dnew AS (SELECT o_orderkey, o_orderstatus,
                    CASE WHEN o_orderstatus = 'P'
                         THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE)
                         ELSE o_totalprice END AS o_totalprice
             FROM orders WHERE o_orderkey BETWEEN 1000 AND 4000),
    dif AS (
      SELECT 'diff' AS leg, COALESCE(o.o_orderkey, n.o_orderkey) AS k,
             CASE WHEN o.o_orderkey IS NULL THEN 'added'
                  WHEN n.o_orderkey IS NULL THEN 'removed'
                  ELSE 'changed' END AS attr,
             n.o_totalprice AS price,
             CAST(NULL AS VARCHAR) AS valid_from, CAST(NULL AS VARCHAR) AS valid_to,
             CAST(NULL AS BOOLEAN) AS is_current
      FROM dold o FULL JOIN dnew n USING (o_orderkey)
      WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
         OR (o.o_orderstatus, o.o_totalprice) IS DISTINCT FROM
            (n.o_orderstatus, n.o_totalprice)),
    mt AS (SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS p
           FROM orders WHERE o_orderkey <= 3000),
    ms AS (SELECT o_orderkey AS k, o_orderstatus AS st,
                  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE) AS np
           FROM orders WHERE o_orderkey BETWEEN 2000 AND 5000),
    mg AS (
      SELECT 'merge' AS leg, COALESCE(t.k, s.k) AS k,
             CASE WHEN t.k IS NULL THEN s.st ELSE t.st END AS attr,
             CASE WHEN t.k IS NULL THEN s.np
                  WHEN s.k IS NOT NULL AND s.st = 'P' THEN s.np
                  ELSE t.p END AS price,
             CAST(NULL AS VARCHAR) AS valid_from, CAST(NULL AS VARCHAR) AS valid_to,
             CAST(NULL AS BOOLEAN) AS is_current
      FROM mt t FULL JOIN ms s ON t.k = s.k
      WHERE NOT (t.k IS NOT NULL AND s.k IS NOT NULL AND s.st = 'F')),
    -- cdc: latest-seq-wins fold. Feed = seq-1 upsert (doubled price)
    -- for every key in [2000, 5000], then a seq-2 delete for 'P'
    -- keys, so per 'P' key the delete SUPERSEDES the earlier upsert:
    -- survivors = target keys untouched by the feed; everything else
    -- is the feed's latest non-delete payload.
    cdc_f AS (SELECT o_orderkey AS k, o_orderstatus AS st,
                     CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE) AS np,
                     o_orderstatus = 'P' AS del
              FROM orders WHERE o_orderkey BETWEEN 2000 AND 5000),
    cdc AS (
      SELECT 'cdc' AS leg, t.k, t.st AS attr, t.p AS price,
             CAST(NULL AS VARCHAR) AS valid_from, CAST(NULL AS VARCHAR) AS valid_to,
             CAST(NULL AS BOOLEAN) AS is_current
      FROM mt t LEFT JOIN cdc_f f ON t.k = f.k WHERE f.k IS NULL
      UNION ALL
      SELECT 'cdc', f.k, f.st, f.np,
             CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS BOOLEAN)
      FROM cdc_f f WHERE NOT f.del),
    -- scdlk: point-in-time lookup against the scd2 run history —
    -- each purchase event probes "what was this user's attribute 30
    -- minutes earlier"; probes before the user's first run enrich
    -- NULL (left join).
    hist AS (
      SELECT user_id, event_type, vf,
             LEAD(vf) OVER (PARTITION BY user_id ORDER BY vf, event_id) AS vt
      FROM runs),
    probes AS (
      SELECT user_id, event_id, ts - INTERVAL 30 MINUTE AS pts
      FROM events WHERE event_type = 'purchase'),
    scdlk AS (
      SELECT 'scdlk' AS leg, p.event_id AS k, h.event_type AS attr,
             CAST(NULL AS DOUBLE) AS price,
             strftime(h.vf, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
             strftime(h.vt, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
             CASE WHEN h.user_id IS NULL THEN CAST(NULL AS BOOLEAN)
                  ELSE h.vt IS NULL END AS is_current
      FROM probes p LEFT JOIN hist h
        ON p.user_id = h.user_id AND h.vf <= p.pts
       AND (h.vt IS NULL OR p.pts < h.vt))
    SELECT * FROM updel UNION ALL SELECT * FROM scd
    UNION ALL SELECT * FROM dif UNION ALL SELECT * FROM mg
    UNION ALL SELECT * FROM cdc UNION ALL SELECT * FROM scdlk
    """,
    tags=("writes", "update", "delete", "scd2", "diff", "merge", "cdc", "scd2-lookup"),
)
def update_delete_rows_orders(spark, sf_dir):
    """Four write-semantics legs. 'updel': UPDATE then DELETE on one
    dataflow — SET status='PENDING', price=price*2 WHERE status='P'
    (matched rows rewritten, others pass through), then DELETE WHERE
    status='F' (survivors only; NULL predicates neither update nor
    delete). 'scd2': type-2 dimension history from operators/scd —
    the events stream per user collapsed into attribute runs with
    valid_from/valid_to/is_current, hash-checked against the SQL
    lag/lead formulation (timestamps as strings, the engine-stable
    convention). 'diff': operators/diff.table_diff between two orders
    versions (key-shifted slice + price bump on one status) — change
    classification and new values hash-checked against the SQL
    full-join IS DISTINCT FROM formulation. 'merge': multi-clause
    MERGE INTO (operators/writes.merge_into — Delta-style WHEN
    MATCHED AND status='F' DELETE / WHEN MATCHED AND status='P'
    UPDATE price / WHEN NOT MATCHED INSERT, one full-outer join)
    against a CASE full-join replay in SQL. 'cdc': CDC change-feed
    apply (operators/writes.apply_changes) — the feed carries a seq-1
    upsert for every key plus a seq-2 delete for 'P' keys, so the
    latest-seq-wins fold must let the delete supersede the earlier
    upsert; the oracle replays the folded outcome as an anti-join +
    filtered feed. 'scdlk': scd2_lookup point-in-time enrichment —
    every purchase event asks "what was this user's attribute 30
    minutes before", hitting mid-history runs, current rows, and
    before-first-run NULLs; the oracle replays the interval
    containment over the same lag/lead run table."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    updated = update_rows(
        o,
        {
            "o_orderstatus": F.lit("PENDING"),
            "o_totalprice": (F.col("o_totalprice").cast("decimal(18,2)") * 2).cast("double"),
        },
        F.col("o_orderstatus") == "P",
    )
    survivors = delete_rows(updated, F.col("o_orderstatus") == "F")
    updel = survivors.select(
        F.lit("updel").alias("leg"),
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("attr"),
        F.col("o_totalprice").alias("price"),
        F.lit(None).cast("string").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(None).cast("boolean").alias("is_current"),
    )
    from d2d_spark.operators.scd import scd2_history

    ev = read_table(spark, sf_dir, "events")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    scd = scd2_history(ev, ["user_id"], "ts", ["event_type"], ["event_id"]).select(
        F.lit("scd2").alias("leg"),
        F.col("user_id").alias("k"),
        F.col("event_type").alias("attr"),
        F.lit(None).cast("double").alias("price"),
        F.date_format("valid_from", fmt).alias("valid_from"),
        F.date_format("valid_to", fmt).alias("valid_to"),
        "is_current",
    )
    from d2d_spark.operators.diff import table_diff

    orders = read_table(spark, sf_dir, "orders")
    dold = orders.filter("o_orderkey <= 3000").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    dnew = orders.filter("o_orderkey BETWEEN 1000 AND 4000").select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderstatus") == "P",
            (F.col("o_totalprice").cast("decimal(18,2)") * 2).cast("double"),
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    dif = table_diff(dold, dnew, ["o_orderkey"]).select(
        F.lit("diff").alias("leg"),
        F.col("o_orderkey").alias("k"),
        F.col("change_type").alias("attr"),
        F.col("new_o_totalprice").alias("price"),
        F.lit(None).cast("string").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(None).cast("boolean").alias("is_current"),
    )
    from d2d_spark.operators.writes import merge_into

    mt = orders.filter("o_orderkey <= 3000").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    ms = orders.filter("o_orderkey BETWEEN 2000 AND 5000").select(
        "o_orderkey",
        "o_orderstatus",
        (F.col("o_totalprice").cast("decimal(18,2)") * 2)
        .cast("double")
        .alias("np"),
    )
    merged = merge_into(
        mt,
        ms,
        on=["o_orderkey"],
        matched_update={"o_totalprice": "s.np"},
        matched_update_condition="s.o_orderstatus = 'P'",
        matched_delete_condition="s.o_orderstatus = 'F'",
        insert_unmatched=True,
        insert_values={"o_totalprice": "s.np", "o_orderstatus": "s.o_orderstatus"},
    )
    mg = merged.select(
        F.lit("merge").alias("leg"),
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("attr"),
        F.col("o_totalprice").alias("price"),
        F.lit(None).cast("string").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(None).cast("boolean").alias("is_current"),
    )
    from d2d_spark.operators.writes import apply_changes

    # cdc leg: two changes per 'P' key (seq-1 upsert, then a seq-2
    # delete that must supersede it) exercises the latest-seq-wins
    # fold, not just a single-change merge
    feed_src = orders.filter("o_orderkey BETWEEN 2000 AND 5000")
    up1 = feed_src.select(
        "o_orderkey",
        "o_orderstatus",
        (F.col("o_totalprice").cast("decimal(18,2)") * 2)
        .cast("double")
        .alias("o_totalprice"),
        F.lit(1).alias("seq"),
        F.lit("u").alias("op"),
    )
    del2 = feed_src.filter(F.col("o_orderstatus") == "P").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice"),
        F.lit(2).alias("seq"),
        F.lit("d").alias("op"),
    )
    snapshot = apply_changes(mt, up1.unionByName(del2), ["o_orderkey"], "seq")
    cdc = snapshot.select(
        F.lit("cdc").alias("leg"),
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("attr"),
        F.col("o_totalprice").alias("price"),
        F.lit(None).cast("string").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(None).cast("boolean").alias("is_current"),
    )
    from d2d_spark.operators.scd import scd2_lookup

    history = scd2_history(ev, ["user_id"], "ts", ["event_type"], ["event_id"])
    probes = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        (F.col("ts") - F.expr("INTERVAL 30 MINUTES")).alias("pts"),
    )
    looked = scd2_lookup(history, probes, ["user_id"], "pts")
    scdlk = looked.select(
        F.lit("scdlk").alias("leg"),
        F.col("event_id").alias("k"),
        F.col("event_type").alias("attr"),
        F.lit(None).cast("double").alias("price"),
        F.date_format("valid_from", fmt).alias("valid_from"),
        F.date_format("valid_to", fmt).alias("valid_to"),
        "is_current",
    )
    return (
        updel.unionByName(scd)
        .unionByName(dif)
        .unionByName(mg)
        .unionByName(cdc)
        .unionByName(scdlk)
    )


@query(
    "partitioned_write_prune",
    oracle="""
    SELECT 'prune' AS leg, o_orderpriority AS k, CAST(NULL AS VARCHAR) AS op,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    UNION ALL
    SELECT 'cdcgen', CAST(k AS VARCHAR), op, CAST(NULL AS BIGINT),
           CAST(np AS DOUBLE) FROM (
      WITH old_s AS MATERIALIZED (
        SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS p
        FROM orders WHERE o_orderkey <= 3000),
      new_s AS MATERIALIZED (
        SELECT o_orderkey AS k, o_orderstatus AS st,
               CASE WHEN o_orderstatus = 'P'
                    THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE)
                    ELSE o_totalprice END AS p
        FROM orders WHERE o_orderkey BETWEEN 1000 AND 4000)
      SELECT COALESCE(o.k, n.k) AS k,
             CASE WHEN n.k IS NULL THEN 'd' ELSE 'u' END AS op,
             n.p AS np
      FROM old_s o FULL JOIN new_s n ON o.k = n.k
      WHERE o.k IS NULL OR n.k IS NULL
         OR (o.st, o.p) IS DISTINCT FROM (n.st, n.p))
    UNION ALL
    -- evolve: final table state after a schema-drifted append — the
    -- first batch lacks o_totalprice, so mergeSchema reads it as NULL
    SELECT 'evolve', CAST(o_orderkey AS VARCHAR), o_orderstatus,
           CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
    FROM orders WHERE o_orderkey <= 1000
    UNION ALL
    SELECT 'evolve', CAST(o_orderkey AS VARCHAR), o_orderstatus,
           CAST(NULL AS BIGINT), o_totalprice
    FROM orders WHERE o_orderkey BETWEEN 1001 AND 2000
    UNION ALL
    -- backfill: dynamic-partition overwrite of the 'P' partition only
    -- (run twice — idempotence is the contract); untouched partitions
    -- keep the base rows, 'P' holds exactly the doubled batch
    SELECT 'backfill', CAST(o_orderkey AS VARCHAR), o_orderstatus,
           CAST(NULL AS BIGINT), o_totalprice
    FROM orders WHERE o_orderkey <= 3000 AND o_orderstatus <> 'P'
    UNION ALL
    SELECT 'backfill', CAST(o_orderkey AS VARCHAR), o_orderstatus,
           CAST(NULL AS BIGINT),
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE)
    FROM orders WHERE o_orderstatus = 'P' AND o_orderkey BETWEEN 1000 AND 4000
    UNION ALL
    -- pruned: footer-stats file skipping must be INVISIBLE to the
    -- result — identical to the plain filtered scan
    SELECT 'pruned', o_orderpriority, CAST(NULL AS VARCHAR), COUNT(*),
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
    FROM orders WHERE o_orderkey BETWEEN 500 AND 1500
    GROUP BY o_orderpriority
    """,
    tags=(
        "warehouse", "partitioning", "cdc-gen", "schema-evolution",
        "backfill", "data-skipping",
    ),
)
def partitioned_write_prune(spark, sf_dir):
    """Two warehouse legs.

    prune: Hive-style partitioned table round-trip (reference
    create_table(partitioned=…)+LOAD DATA, d22d/utils/db/__init__.py:
    1145-1198): write orders partitioned by o_orderstatus, read back
    filtered to one partition. The filter prunes at the directory
    level — the scan never opens other partitions' files (the 100 TB
    posture for any status/date-sliced table).

    cdcgen (r9): diff.snapshot_to_changes between two derived order
    snapshots (the update_delete suite's dold/dnew shapes) — the
    minimal upsert/delete feed, checked against a null-safe
    full-outer SQL diff; its closure property
    (apply_changes(old, feed) == new) is pytest-pinned.

    evolve (r9): writes.evolve_and_append — a first batch WITHOUT
    o_totalprice, then a drifted second batch WITH it; the
    mergeSchema read-back must show the old rows as NULL and the new
    rows populated (the oracle is the plain two-slice UNION). The
    cast-ladder refusals are pytest-pinned (test_writes).

    backfill (r9): writes.overwrite_partitions — base table of keys
    <= 3000 partitioned by status, then the 'P' partition alone is
    overwritten with a doubled [1000, 4000] batch, TWICE (idempotent
    reruns are the contract); untouched partitions must survive
    byte-for-byte and 'P' must hold exactly the batch.

    pruned (r9): maintenance.read_pruned over a write_clustered
    table — footer min/max file skipping with the exact residual
    re-applied, so the pruned read must equal the plain filtered
    scan no matter how many files were skipped (the skip-rate
    assertion lives in test_maintenance)."""
    root = str(STAGE / "warehouse" / "orders_by_status")
    orders = read_table(spark, sf_dir, "orders")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(root)
    back = spark.read.parquet(root).filter(F.col("o_orderstatus") == "F")
    ns = F.lit(None).cast("string")
    prune = (
        back.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .select(
            F.lit("prune").alias("leg"),
            F.col("o_orderpriority").alias("k"),
            ns.alias("op"),
            "n",
            "total",
        )
    )
    from d2d_spark.operators.diff import snapshot_to_changes

    old_s = orders.filter(F.col("o_orderkey") <= 3000).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.col("o_totalprice").alias("p"),
    )
    new_s = orders.filter(F.col("o_orderkey").between(1000, 4000)).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.when(
            F.col("o_orderstatus") == "P",
            (F.col("o_totalprice").cast("decimal(18,2)") * 2).cast("double"),
        )
        .otherwise(F.col("o_totalprice"))
        .alias("p"),
    )
    feed = snapshot_to_changes(old_s, new_s, ["k"], seq_value=1)
    cdcgen = feed.select(
        F.lit("cdcgen").alias("leg"),
        F.col("k").cast("string").alias("k"),
        F.col("op"),
        F.lit(None).cast("bigint").alias("n"),
        F.col("p").cast("double").alias("total"),
    )
    nb = F.lit(None).cast("bigint")
    from d2d_spark.operators.writes import evolve_and_append

    ev_path = str(STAGE / "warehouse" / "orders_evolved")
    import shutil

    shutil.rmtree(ev_path, ignore_errors=True)
    b1 = orders.filter("o_orderkey <= 1000").select("o_orderkey", "o_orderstatus")
    b2 = orders.filter("o_orderkey BETWEEN 1001 AND 2000").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    evolve_and_append(b1, ev_path)
    evolve_and_append(b2, ev_path)
    evolved = spark.read.option("mergeSchema", True).parquet(ev_path)
    evolve = evolved.select(
        F.lit("evolve").alias("leg"),
        F.col("o_orderkey").cast("string").alias("k"),
        F.col("o_orderstatus").alias("op"),
        nb.alias("n"),
        F.col("o_totalprice").alias("total"),
    )
    from d2d_spark.operators.writes import overwrite_partitions

    bf_path = str(STAGE / "warehouse" / "orders_backfill")
    base = orders.filter("o_orderkey <= 3000").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    base.write.mode("overwrite").partitionBy("o_orderstatus").parquet(bf_path)
    batch = orders.filter(
        (F.col("o_orderstatus") == "P") & F.col("o_orderkey").between(1000, 4000)
    ).select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 2)
        .cast("double")
        .alias("o_totalprice"),
        "o_orderstatus",
    )
    overwrite_partitions(batch, bf_path, ["o_orderstatus"])
    overwrite_partitions(batch, bf_path, ["o_orderstatus"])  # idempotent rerun
    backfill = spark.read.parquet(bf_path).select(
        F.lit("backfill").alias("leg"),
        F.col("o_orderkey").cast("string").alias("k"),
        F.col("o_orderstatus").alias("op"),
        nb.alias("n"),
        F.col("o_totalprice").alias("total"),
    )
    from d2d_spark.operators.maintenance import read_pruned, write_clustered

    cl_path = str(STAGE / "warehouse" / "orders_clustered")
    write_clustered(
        orders.select("o_orderkey", "o_totalprice", "o_orderpriority"),
        cl_path,
        ["o_orderkey"],
        n_files=8,
    )
    rp = read_pruned(spark, cl_path, "o_orderkey", lo=500, hi=1500)
    pruned = (
        rp.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
        .select(
            F.lit("pruned").alias("leg"),
            F.col("o_orderpriority").alias("k"),
            ns.alias("op"),
            "n",
            "total",
        )
    )
    return (
        prune.unionByName(cdcgen)
        .unionByName(evolve)
        .unionByName(backfill)
        .unionByName(pruned)
    )
