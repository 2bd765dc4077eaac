"""Event-time window queries over `events` — the streaming capability
extension (SURVEY §2.10), verified in batch mode against SQL oracles.

The exact same d2d_spark.streaming.windows helpers run on readStream
DataFrames (tests/test_streaming.py proves it with availableNow
micro-batches); batch mode is what the DuckDB oracle can check:
Structured Streaming guarantees the results coincide.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from d2d_spark.plans.registry import query
from d2d_spark.session import read_table
from d2d_spark.streaming.windows import session_agg, sliding_agg, tumbling_agg

DEC = "decimal(18,2)"

#: the resample+locf grid over the sparse user slice — shared verbatim
#: by the resample_locf and roll oracle legs below
_LOCF_SQL = """
      WITH rs AS (SELECT event_type, date_trunc('hour', ts) AS b, COUNT(*) AS n,
                         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
                  FROM events WHERE user_id % 37 = 0 GROUP BY 1, 2),
      bounds AS (SELECT event_type, MIN(b) AS lo, MAX(b) AS hi FROM rs GROUP BY 1),
      grid AS (SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS b
               FROM bounds),
      j AS (SELECT g.event_type, g.b, rs.n, rs.v, rs.b IS NULL AS gap
            FROM grid g LEFT JOIN rs ON g.event_type = rs.event_type AND g.b = rs.b)
      SELECT event_type, b, gap,
             LAST_VALUE(n IGNORE NULLS) OVER w AS n_f,
             LAST_VALUE(v IGNORE NULLS) OVER w AS v_f
      FROM j WINDOW w AS (PARTITION BY event_type ORDER BY b
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@query(
    "windowed_aggs_events",
    oracle=f"""
    SELECT 'tumbling_1h' AS kind,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 2, 3
    UNION ALL
    SELECT 'sliding_2h_1h' AS kind,
           strftime(date_trunc('hour', ts) - to_hours(off), '%Y-%m-%d %H:%M:%S') AS window_start,
           '' AS event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events CROSS JOIN (SELECT unnest([0, 1]) AS off)
    GROUP BY 2
    UNION ALL
    SELECT 'funnel' AS kind, fm.csv AS window_start,
           CAST(fm.user_id AS VARCHAR) AS event_type,
           fm.stage AS n_events, CAST(NULL AS DOUBLE) AS sum_value
    FROM (
      WITH f0 AS (SELECT DISTINCT user_id FROM events
                  WHERE event_type IN ('signup','view','click','purchase')),
      s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
             WHERE event_type = 'signup' GROUP BY user_id),
      s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
             WHERE e.event_type = 'view' AND e.ts > s1.t1
               AND epoch(e.ts) - epoch(s1.t1) <= 172800 GROUP BY e.user_id),
      s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
             JOIN s2 USING (user_id) JOIN s1 USING (user_id)
             WHERE e.event_type = 'click' AND e.ts > s2.t2
               AND epoch(e.ts) - epoch(s1.t1) <= 172800 GROUP BY e.user_id),
      s4 AS (SELECT e.user_id, MIN(e.ts) AS t4 FROM events e
             JOIN s3 USING (user_id) JOIN s1 USING (user_id)
             WHERE e.event_type = 'purchase' AND e.ts > s3.t3
               AND epoch(e.ts) - epoch(s1.t1) <= 172800 GROUP BY e.user_id)
      SELECT f0.user_id,
             CAST(t1 IS NOT NULL AS INT) + CAST(t2 IS NOT NULL AS INT)
             + CAST(t3 IS NOT NULL AS INT) + CAST(t4 IS NOT NULL AS INT) AS stage,
             concat(coalesce(strftime(t1, '%Y-%m-%d %H:%M:%S'), ''), '|',
                    coalesce(strftime(t2, '%Y-%m-%d %H:%M:%S'), ''), '|',
                    coalesce(strftime(t3, '%Y-%m-%d %H:%M:%S'), ''), '|',
                    coalesce(strftime(t4, '%Y-%m-%d %H:%M:%S'), '')) AS csv
      FROM f0 LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
              LEFT JOIN s3 USING (user_id) LEFT JOIN s4 USING (user_id)
    ) fm
    UNION ALL
    SELECT 'resample_locf' AS kind,
           strftime(b, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type || (CASE WHEN gap THEN '*' ELSE '' END) AS event_type,
           n_f AS n_events, v_f AS sum_value
    FROM (
      {_LOCF_SQL}
    )
    UNION ALL
    SELECT 'retention' AS kind,
           strftime(cohort_day, '%Y-%m-%d') AS window_start,
           CAST(day_offset AS VARCHAR) AS event_type,
           COUNT(*) AS n_events, CAST(NULL AS DOUBLE) AS sum_value
    FROM (
      WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      first AS (SELECT user_id, MIN(d) AS cohort_day FROM days GROUP BY user_id)
      SELECT DISTINCT days.user_id, first.cohort_day,
             date_diff('day', first.cohort_day, days.d) AS day_offset
      FROM days JOIN first USING (user_id)
      WHERE date_diff('day', first.cohort_day, days.d) IN (0, 1, 2, 7)
    ) GROUP BY cohort_day, day_offset
    UNION ALL
    SELECT 'retention_w7' AS kind,
           strftime(cohort_day, '%Y-%m-%d') AS window_start,
           CAST(day_offset AS VARCHAR) AS event_type,
           COUNT(*) AS n_events, CAST(NULL AS DOUBLE) AS sum_value
    FROM (
      WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
                    FROM events WHERE ts IS NOT NULL),
      first AS (SELECT user_id, MIN(d) AS cohort_day FROM days GROUP BY user_id)
      SELECT DISTINCT days.user_id, first.cohort_day, oo.o AS day_offset
      FROM days JOIN first USING (user_id)
      CROSS JOIN (SELECT unnest([0, 7, 14]) AS o) oo
      WHERE date_diff('day', first.cohort_day, days.d) >= oo.o
        AND date_diff('day', first.cohort_day, days.d) < oo.o + 7
    ) GROUP BY cohort_day, day_offset
    UNION ALL
    -- windowFunnel strict modes, replayed WITHOUT the fold:
    -- strict_order = a consecutive-rank prefix walk from the first
    -- step-1 event (any non-extending next event freezes the chain);
    -- strict_dedup = the default greedy chain cut at the first
    -- repeat of an already-matched step (kill position compared
    -- lexicographically in the fold's (ts, type) processing order)
    SELECT kind, '' AS window_start, CAST(user_id AS VARCHAR) AS event_type,
           stage AS n_events, CAST(NULL AS DOUBLE) AS sum_value
    FROM (
      WITH se AS MATERIALIZED (
        SELECT user_id, event_id, event_type AS et, epoch(ts) AS e,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_type) AS rn
        FROM events
        WHERE event_type IN ('signup', 'view', 'click', 'purchase')
          AND ts IS NOT NULL),
      pop AS MATERIALIZED (SELECT DISTINCT user_id FROM se),
      so1 AS MATERIALIZED (
        SELECT user_id, MIN(rn) AS r1 FROM se WHERE et = 'signup'
        GROUP BY user_id),
      so_g AS (
        SELECT p.user_id, s.r1, e1.e AS t1,
               e2.et AS et2, e2.e AS x2, e3.et AS et3, e3.e AS x3,
               e4.et AS et4, e4.e AS x4
        FROM pop p LEFT JOIN so1 s USING (user_id)
        LEFT JOIN se e1 ON e1.user_id = p.user_id AND e1.rn = s.r1
        LEFT JOIN se e2 ON e2.user_id = p.user_id AND e2.rn = s.r1 + 1
        LEFT JOIN se e3 ON e3.user_id = p.user_id AND e3.rn = s.r1 + 2
        LEFT JOIN se e4 ON e4.user_id = p.user_id AND e4.rn = s.r1 + 3),
      so AS (
        SELECT 'funnel_so' AS kind, user_id,
               CASE WHEN r1 IS NULL THEN 0
                    WHEN NOT COALESCE(et2 = 'view' AND x2 > t1
                                      AND x2 - t1 <= 172800, FALSE) THEN 1
                    WHEN NOT COALESCE(et3 = 'click' AND x3 > x2
                                      AND x3 - t1 <= 172800, FALSE) THEN 2
                    WHEN NOT COALESCE(et4 = 'purchase' AND x4 > x3
                                      AND x4 - t1 <= 172800, FALSE) THEN 3
                    ELSE 4 END AS stage
        FROM so_g),
      g1 AS MATERIALIZED (SELECT user_id, MIN(e) AS m1 FROM se
                          WHERE et = 'signup' GROUP BY user_id),
      g2 AS MATERIALIZED (SELECT se.user_id, MIN(e) AS m2
                          FROM se JOIN g1 USING (user_id)
                          WHERE et = 'view' AND e > m1 AND e - m1 <= 172800
                          GROUP BY se.user_id),
      g3 AS MATERIALIZED (SELECT se.user_id, MIN(e) AS m3
                          FROM se JOIN g2 USING (user_id) JOIN g1 USING (user_id)
                          WHERE et = 'click' AND e > m2 AND e - m1 <= 172800
                          GROUP BY se.user_id),
      g4 AS MATERIALIZED (SELECT se.user_id, MIN(e) AS m4
                          FROM se JOIN g3 USING (user_id) JOIN g1 USING (user_id)
                          WHERE et = 'purchase' AND e > m3 AND e - m1 <= 172800
                          GROUP BY se.user_id),
      mm AS MATERIALIZED (
        SELECT p.user_id, g1.m1, g2.m2, g3.m3, g4.m4
        FROM pop p LEFT JOIN g1 USING (user_id) LEFT JOIN g2 USING (user_id)
        LEFT JOIN g3 USING (user_id) LEFT JOIN g4 USING (user_id)),
      rep AS (
        SELECT se.user_id, se.e, se.et,
               ROW_NUMBER() OVER (PARTITION BY se.user_id, se.et
                                  ORDER BY se.e, se.event_id) AS rd
        FROM se JOIN mm USING (user_id)
        WHERE CASE se.et WHEN 'signup' THEN mm.m1 WHEN 'view' THEN mm.m2
                         WHEN 'click' THEN mm.m3 ELSE mm.m4 END IS NOT NULL
          AND se.e >= CASE se.et WHEN 'signup' THEN mm.m1 WHEN 'view' THEN mm.m2
                                 WHEN 'click' THEN mm.m3 ELSE mm.m4 END),
      k1 AS MATERIALIZED (
        SELECT user_id, ke, ket FROM (
          SELECT user_id, e AS ke, et AS ket,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY e, et) AS rk
          FROM rep WHERE rd >= 2) WHERE rk = 1),
      sd AS (
        SELECT 'funnel_sd' AS kind, mm.user_id,
               CAST(COALESCE(mm.m1 IS NOT NULL AND (k1.user_id IS NULL
                 OR mm.m1 < k1.ke
                 OR (mm.m1 = k1.ke AND 'signup' <= k1.ket)), FALSE) AS INT)
             + CAST(COALESCE(mm.m2 IS NOT NULL AND (k1.user_id IS NULL
                 OR mm.m2 < k1.ke
                 OR (mm.m2 = k1.ke AND 'view' <= k1.ket)), FALSE) AS INT)
             + CAST(COALESCE(mm.m3 IS NOT NULL AND (k1.user_id IS NULL
                 OR mm.m3 < k1.ke
                 OR (mm.m3 = k1.ke AND 'click' <= k1.ket)), FALSE) AS INT)
             + CAST(COALESCE(mm.m4 IS NOT NULL AND (k1.user_id IS NULL
                 OR mm.m4 < k1.ke
                 OR (mm.m4 = k1.ke AND 'purchase' <= k1.ket)), FALSE) AS INT)
               AS stage
        FROM mm LEFT JOIN k1 USING (user_id))
      SELECT kind, user_id, CAST(stage AS BIGINT) AS stage FROM so
      UNION ALL
      SELECT kind, user_id, CAST(stage AS BIGINT) AS stage FROM sd
    )
    """,
    tags=(
        "streaming", "window", "tumbling", "sliding", "funnel", "retention",
        "resample", "gapfill", "funnel-strict", "return-window",
    ),
)
def windowed_aggs_events(spark, sf_dir):
    """Event-time analytics suite, five tagged legs.

    tumbling_1h / sliding_2h_1h: tumbling 1-hour windows per
    event_type AND sliding 2-hour windows advancing hourly (every
    event lands in exactly two windows; oracle: explicit offset
    unnest). Count + exact-decimal value sum; streaming-identical
    code path (F.window groupBy).

    funnel: per-user greedy-earliest-chain funnel
    (operators/funnel.py) signup→view→click→purchase inside a 48-hour
    window anchored at the chain start — the ClickHouse windowFunnel
    analog. The oracle replays the documented greedy semantics as
    chained per-stage MIN subqueries (a different algorithm than the
    Spark array fold — a genuine cross-algorithm differential); the
    csv column pins every stage timestamp, not just the depth.

    retention: cohort retention (ClickHouse retention analog) —
    cohort = first-event day, exact distinct users at day offsets
    0/1/2/7.

    (The r8 roll/ewma legs moved to session_windows_per_user with
    9-dp rounding — one float-hash-sensitive leg was blinding this
    whole suite's driver signal; this query is back to the exact-only
    r2–r7 shape.)

    resample_locf: operators/timeseries resample (1-hour buckets per
    event_type over a SPARSE user slice, so real gaps exist) +
    gap_fill with last-observation-carried-forward — the hypertable
    time_bucket_gapfill/locf pair; generated rows are tagged with a
    '*' suffix so the gap flag itself is hash-checked. Oracle:
    generate_series grid + LAST_VALUE IGNORE NULLS replay.

    retention_w7 (r9 rotation): the return-window retention variant
    (window_days=7 at offsets 0/7/14 — 'retained in week k') vs an
    offset-grid DISTINCT replay. Exact integers.

    funnel_so / funnel_sd (r9 rotations): the ClickHouse windowFunnel
    strictness modes, per-user deepest stage. The oracle replays each
    with a structurally DIFFERENT algorithm than the Spark fold:
    strict_order as a consecutive-rank prefix walk from the first
    step-1 event (once started, the IMMEDIATELY next step-typed
    events must be exactly view/click/purchase, strictly later and
    inside the 48 h window, else the chain freezes where it stands);
    strict_dedup as the default greedy chain cut at the first repeat
    of an already-matched step — candidate repeats are events of a
    matched type at a strictly later position than their match
    (same-timestamp duplicates included via a per-(user, type)
    ROW_NUMBER), the earliest candidate in the fold's (ts, type)
    processing order is the kill, and a stage counts iff its match
    position sorts at-or-before the kill. Exact integers."""
    # r11 (guide §2.3/§5): eight legs (tumbling, sliding, three funnel
    # modes, resample, two retention variants) all consume the same
    # four events columns — persist the projection once (opcache) so
    # the parquet scan runs once instead of eight times.
    from pyspark import StorageLevel

    from d2d_spark import cache as opcache

    ev = opcache.register(
        "windowed_suite",
        read_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_type", "value")
        .persist(StorageLevel.MEMORY_AND_DISK),
    )
    ev.count()  # fill before the eight legs race on the cold block
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
    ]
    tumbling = tumbling_agg(ev, "ts", "1 hour", aggs=aggs, keys=["event_type"]).select(
        F.lit("tumbling_1h").alias("kind"),
        F.date_format("ws", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )
    sliding = sliding_agg(ev, "ts", "2 hours", "1 hour", aggs=aggs).select(
        F.lit("sliding_2h_1h").alias("kind"),
        F.date_format("ws", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.lit("").alias("event_type"),
        "n_events",
        "sum_value",
    )
    from d2d_spark.operators.funnel import funnel_stages, retention_cohorts

    steps = ["signup", "view", "click", "purchase"]
    fs = funnel_stages(ev, "user_id", "ts", "event_type", steps, within=172_800.0)
    fmt = [
        F.coalesce(
            F.date_format(
                F.timestamp_seconds(F.col(f"ts_step_{k + 1}")), "yyyy-MM-dd HH:mm:ss"
            ),
            F.lit(""),
        )
        for k in range(4)
    ]
    funnel = fs.select(
        F.lit("funnel").alias("kind"),
        F.concat(fmt[0], F.lit("|"), fmt[1], F.lit("|"), fmt[2], F.lit("|"), fmt[3]).alias(
            "window_start"
        ),
        F.col("user").cast("string").alias("event_type"),
        F.col("stage").cast("long").alias("n_events"),
        F.lit(None).cast("double").alias("sum_value"),
    )
    from d2d_spark.operators.timeseries import gap_fill, resample

    sparse = ev.filter(F.col("user_id") % 37 == 0)
    rs = resample(
        sparse,
        ["event_type"],
        "ts",
        "1 hour",
        {
            "n": F.count(F.lit(1)),
            "v": F.sum(F.col("value").cast(DEC)).cast("double"),
        },
    )
    gf = gap_fill(rs, ["event_type"], "bucket", "1 hour", ["n", "v"], fill="locf")
    resampled = gf.select(
        F.lit("resample_locf").alias("kind"),
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.concat(
            F.col("event_type"),
            F.when(F.col("gap"), F.lit("*")).otherwise(F.lit("")),
        ).alias("event_type"),
        F.col("n").alias("n_events"),
        F.col("v").alias("sum_value"),
    )
    retention = retention_cohorts(ev, "user_id", "ts", offsets=[0, 1, 2, 7]).select(
        F.lit("retention").alias("kind"),
        F.date_format("cohort_day", "yyyy-MM-dd").alias("window_start"),
        F.col("day_offset").cast("string").alias("event_type"),
        F.col("n_users").alias("n_events"),
        F.lit(None).cast("double").alias("sum_value"),
    )
    # r9 rotations: the return-window retention variant and the two
    # ClickHouse windowFunnel strictness modes — all exact-integer
    # legs (no float surface), replayed by structurally DIFFERENT
    # algorithms in the oracle (offset-window grid; consecutive-rank
    # prefix walk; kill-position cut of the greedy chain)
    retention_w7 = retention_cohorts(
        ev, "user_id", "ts", offsets=[0, 7, 14], window_days=7
    ).select(
        F.lit("retention_w7").alias("kind"),
        F.date_format("cohort_day", "yyyy-MM-dd").alias("window_start"),
        F.col("day_offset").cast("string").alias("event_type"),
        F.col("n_users").alias("n_events"),
        F.lit(None).cast("double").alias("sum_value"),
    )
    def strict_leg(mode: str, tag: str):
        st = funnel_stages(
            ev, "user_id", "ts", "event_type", steps, within=172_800.0, mode=mode
        )
        return st.select(
            F.lit(tag).alias("kind"),
            F.lit("").alias("window_start"),
            F.col("user").cast("string").alias("event_type"),
            F.col("stage").cast("long").alias("n_events"),
            F.lit(None).cast("double").alias("sum_value"),
        )

    funnel_so = strict_leg("strict_order", "funnel_so")
    funnel_sd = strict_leg("strict_dedup", "funnel_sd")
    return (
        tumbling.unionAll(sliding)
        .unionAll(funnel)
        .unionAll(resampled)
        .unionAll(retention)
        .unionAll(retention_w7)
        .unionAll(funnel_so)
        .unionAll(funnel_sd)
    )


@query(
    "session_windows_per_user",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 2 HOUR THEN 1 ELSE 0 END AS new_s
      FROM events WHERE ts IS NOT NULL),
    sessions AS (
      SELECT user_id, ts,
             CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1
                  AS BIGINT) AS sid
      FROM marked),
    bounds AS (
      SELECT user_id, sid, MIN(ts) AS s_start, MAX(ts) AS s_end, COUNT(*) AS n
      FROM sessions GROUP BY user_id, sid)
    SELECT 'sess' AS kind, CAST(user_id AS VARCHAR) AS uid,
           strftime(s_start, '%Y-%m-%d %H:%M:%S') AS t,
           strftime(s_end + INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S') AS t2,
           n AS n_events, CAST(NULL AS DOUBLE) AS x,
           CAST(NULL AS DOUBLE) AS z, CAST(NULL AS BOOLEAN) AS flag
    FROM bounds
    UNION ALL
    SELECT 'sess_ev', CAST(s.user_id AS VARCHAR),
           strftime(s.ts, '%Y-%m-%d %H:%M:%S'),
           strftime(b.s_start, '%Y-%m-%d %H:%M:%S'),
           s.sid, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           CAST(NULL AS BOOLEAN)
    FROM sessions s JOIN bounds b ON b.user_id = s.user_id AND b.sid = s.sid
    UNION ALL
    SELECT 'roll', event_type,
           strftime(b, '%Y-%m-%d %H:%M:%S'), CAST(NULL AS VARCHAR),
           CAST(SUM(n_f) OVER w4 AS BIGINT),
           round(MAX(v_f) OVER w4, 9),
           round(CASE WHEN COUNT(v_f) OVER w6 >= 3
                      THEN (v_f - AVG(v_f) OVER w6)
                           / NULLIF(STDDEV_SAMP(v_f) OVER w6, 0.0) END, 9),
           abs(CASE WHEN COUNT(v_f) OVER w6 >= 3
                    THEN (v_f - AVG(v_f) OVER w6)
                         / NULLIF(STDDEV_SAMP(v_f) OVER w6, 0.0) END) > 2.0
    FROM (
      {_LOCF_SQL}
    ) WINDOW w4 AS (PARTITION BY event_type ORDER BY b
                    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
             w6 AS (PARTITION BY event_type ORDER BY b
                    ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
    UNION ALL
    SELECT 'ewma', event_type, strftime(d, '%Y-%m-%d'), CAST(NULL AS VARCHAR),
           n, round(y, 9), CAST(NULL AS DOUBLE), CAST(NULL AS BOOLEAN)
    FROM (
      WITH RECURSIVE base AS MATERIALIZED (
        SELECT event_type, d, n,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
        FROM (SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n
              FROM events WHERE ts IS NOT NULL GROUP BY 1, 2)
      ),
      rec AS (
        SELECT event_type, d, n, rn, CAST(n AS DOUBLE) AS y
        FROM base WHERE rn = 1
        UNION ALL
        SELECT b.event_type, b.d, b.n, b.rn,
               0.75 * r.y + 0.25 * CAST(b.n AS DOUBLE)
        FROM rec r JOIN base b ON b.event_type = r.event_type AND b.rn = r.rn + 1
      )
      SELECT event_type, d, n, y FROM rec
    )
    UNION ALL
    SELECT 'holt', event_type, strftime(d, '%Y-%m-%d'), CAST(NULL AS VARCHAR),
           n, round(l, 9), round(b, 9), CAST(NULL AS BOOLEAN)
    FROM (
      WITH RECURSIVE hbase AS MATERIALIZED (
        SELECT event_type, d, n,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
        FROM (SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n
              FROM events WHERE ts IS NOT NULL GROUP BY 1, 2)
      ),
      hrec AS (
        -- anchor 0.0 must be an explicit DOUBLE: a bare 0.0 types the
        -- column DECIMAL(2,1) and the recursion quantizes every trend
        SELECT event_type, d, n, rn, CAST(n AS DOUBLE) AS l,
               CAST(0.0 AS DOUBLE) AS b
        FROM hbase WHERE rn = 1
        UNION ALL
        SELECT x.event_type, x.d, x.n, x.rn,
               0.25 * CAST(x.n AS DOUBLE) + 0.75 * (r.l + r.b),
               0.5 * ((0.25 * CAST(x.n AS DOUBLE) + 0.75 * (r.l + r.b)) - r.l)
               + 0.5 * r.b
        FROM hrec r JOIN hbase x ON x.event_type = r.event_type AND x.rn = r.rn + 1
      )
      SELECT event_type, d, n, l, b FROM hrec
    )
    UNION ALL
    SELECT 'cusum', event_type, strftime(d, '%Y-%m-%d'), CAST(NULL AS VARCHAR),
           n, round(sp, 9), round(sn, 9), sp > 20.0 OR sn > 20.0
    FROM (
      WITH RECURSIVE cbase AS MATERIALIZED (
        SELECT event_type, d, n,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
        FROM (SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n
              FROM events WHERE ts IS NOT NULL GROUP BY 1, 2)
      ),
      crec AS (
        SELECT event_type, d, n, rn,
               greatest(0.0, 0.0 + ((CAST(n AS DOUBLE) - 50.0) - 5.0)) AS sp,
               greatest(0.0, 0.0 + ((50.0 - CAST(n AS DOUBLE)) - 5.0)) AS sn
        FROM cbase WHERE rn = 1
        UNION ALL
        SELECT x.event_type, x.d, x.n, x.rn,
               greatest(0.0, r.sp + ((CAST(x.n AS DOUBLE) - 50.0) - 5.0)),
               greatest(0.0, r.sn + ((50.0 - CAST(x.n AS DOUBLE)) - 5.0))
        FROM crec r JOIN cbase x ON x.event_type = r.event_type AND x.rn = r.rn + 1
      )
      SELECT event_type, d, n, sp, sn FROM crec
    )
    """,
    tags=("streaming", "window", "session", "rolling", "ewma", "zscore"),
)
def session_windows_per_user(spark, sf_dir):
    """Sessionization + rolling-timeseries suite, six tagged legs
    (the r8 float legs moved here from windowed_aggs_events so one
    hash-sensitive leg can't blind the whole window family; every
    float column carries the 9-dp rounding discipline the tfidf/bm25
    legs use, in BOTH the plan and the oracle — the no-rounding
    bit-exactness claims stay in pytest).

    sess: per-SESSION aggregates — Spark's native session_window (2h
    inactivity gap) per user vs a gaps-and-islands SQL oracle.
    Session end = last event + gap, matching Spark's semantics.

    sess_ev: per-EVENT session ids — operators/timeseries.sessionize
    (lag boundary + running sum + per-session min on ONE key shuffle)
    assigns each event its 1-based session ordinal and session-start
    stamp; the oracle extends the same gaps-and-islands SQL down to
    event grain. Together with 'sess' this pins that the per-event
    assignment aggregates EXACTLY to the native session windows.

    roll: operators/timeseries rolling_stats over the locf grid of
    the sparse user slice (see windowed_aggs_events' resample leg) —
    trailing 4-bucket sum of exact bigint counts (n_events) and max
    of the DEC-exact fill (x, 9-dp) — PLUS rolling_zscore_outliers
    columns on the same rows (z = 9-dp trailing-6 z-score of the
    fill, min_periods=3; flag = |z| > 2), the verdict-prescribed
    'z-score as columns of the roll leg' shape.

    ewma: operators/timeseries ewma over per-type daily counts, the
    exact recurrence y = 0.75*y + 0.25*x, rounded to 9 dp on both
    sides; the oracle replays it as a recursive CTE."""
    # r11 (guide §2.3/§5): six legs (session agg, per-event session
    # ids, the rolling chain, ewma) share one events projection —
    # persist it once instead of re-scanning per leg.
    from pyspark import StorageLevel

    from d2d_spark import cache as opcache

    ev = opcache.register(
        "session_suite",
        read_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type", "value")
        .persist(StorageLevel.MEMORY_AND_DISK),
    )
    ev.count()  # fill before the six legs race on the cold block
    nd, nb, ns = (
        F.lit(None).cast("double"),
        F.lit(None).cast("boolean"),
        F.lit(None).cast("string"),
    )
    fmt = "yyyy-MM-dd HH:mm:ss"
    sess = session_agg(
        ev, "ts", "2 hours", aggs=[F.count(F.lit(1)).alias("n_events")], keys=["user_id"]
    ).select(
        F.lit("sess").alias("kind"),
        F.col("user_id").cast("string").alias("uid"),
        F.date_format("session_start", fmt).alias("t"),
        F.date_format("session_end", fmt).alias("t2"),
        F.col("n_events").cast("long").alias("n_events"),
        nd.alias("x"),
        nd.alias("z"),
        nb.alias("flag"),
    )
    from d2d_spark.operators.timeseries import (
        ewma as ts_ewma,
        gap_fill,
        resample,
        rolling_stats,
        rolling_zscore_outliers,
        sessionize,
    )

    # r12 (guide §2.6): the two eager construction chains — the
    # sessionize validation probe and the resample -> gap_fill ->
    # rolling chain (its fused probe) — are independent and read only
    # the filled cache; overlap them so their ~8 driver jobs back-fill
    # instead of serializing.
    from d2d_spark.parallel import run_concurrent

    def _sess_chain():
        return sessionize(
            ev.filter(F.col("ts").isNotNull()),
            ["user_id"],
            "ts",
            "2 hours",
            tiebreak_cols=["event_id"],
        )

    def _roll_chain():
        sparse = ev.filter(F.col("user_id") % 37 == 0)
        rs = resample(
            sparse,
            ["event_type"],
            "ts",
            "1 hour",
            {
                "n": F.count(F.lit(1)),
                "v": F.sum(F.col("value").cast(DEC)).cast("double"),
            },
        )
        gf = gap_fill(rs, ["event_type"], "bucket", "1 hour", ["n", "v"], fill="locf")
        rolled = rolling_stats(
            gf, ["event_type"], "bucket", "n", 4, stats=("sum",), out_prefix="rs_",
            validate=False,  # gap_fill output is a validated regular grid
        )
        rolled = rolling_stats(
            rolled, ["event_type"], "bucket", "v", 4, stats=("max",), out_prefix="rv_",
            validate=False,
        )
        return rolling_zscore_outliers(
            rolled, ["event_type"], "bucket", "v", window=6, threshold=2.0,
            min_periods=3, validate=False,
        )

    se, rolled = run_concurrent([_sess_chain, _roll_chain])
    sess_ev = se.select(
        F.lit("sess_ev").alias("kind"),
        F.col("user_id").cast("string").alias("uid"),
        F.date_format("ts", fmt).alias("t"),
        F.date_format("session_start", fmt).alias("t2"),
        F.col("session_seq").cast("long").alias("n_events"),
        nd.alias("x"),
        nd.alias("z"),
        nb.alias("flag"),
    )
    roll_leg = rolled.select(
        F.lit("roll").alias("kind"),
        F.col("event_type").alias("uid"),
        F.date_format("bucket", fmt).alias("t"),
        ns.alias("t2"),
        F.col("rs_sum").cast("long").alias("n_events"),
        F.round("rv_max", 9).alias("x"),
        F.round("zscore", 9).alias("z"),
        F.col("is_outlier").alias("flag"),
    )
    daily = (
        ev.filter(F.col("ts").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ew = ts_ewma(daily, ["event_type"], "d", "n", alpha=0.25, validate=False)
    ewma_leg = ew.select(
        F.lit("ewma").alias("kind"),
        F.col("event_type").alias("uid"),
        F.date_format("d", "yyyy-MM-dd").alias("t"),
        ns.alias("t2"),
        F.col("n").alias("n_events"),
        F.round("ewma", 9).alias("x"),
        nd.alias("z"),
        nb.alias("flag"),
    )
    # holt / cusum (r9): the other two sequential folds over the SAME
    # daily frame — Holt's level+trend recurrence (alpha=0.25,
    # beta=0.5; both exact binary) and two-sided CUSUM shift sums
    # (target=50, slack=5, threshold=20 — integer inputs keep every
    # sum an exact whole double, so the shift FLAG is engine-exact) —
    # each replayed by its own recursive CTE, floats at 9 dp
    from d2d_spark.operators.timeseries import cusum_changepoints, holt_linear

    ho = holt_linear(daily, ["event_type"], "d", "n", 0.25, 0.5, validate=False)
    holt_leg = ho.select(
        F.lit("holt").alias("kind"),
        F.col("event_type").alias("uid"),
        F.date_format("d", "yyyy-MM-dd").alias("t"),
        ns.alias("t2"),
        F.col("n").alias("n_events"),
        F.round("level", 9).alias("x"),
        F.round("trend", 9).alias("z"),
        nb.alias("flag"),
    )
    cu = cusum_changepoints(
        daily, ["event_type"], "d", "n",
        target=50.0, slack=5.0, threshold=20.0, validate=False,
    )
    cusum_leg = cu.select(
        F.lit("cusum").alias("kind"),
        F.col("event_type").alias("uid"),
        F.date_format("d", "yyyy-MM-dd").alias("t"),
        ns.alias("t2"),
        F.col("n").alias("n_events"),
        F.round("cusum_pos", 9).alias("x"),
        F.round("cusum_neg", 9).alias("z"),
        F.col("is_shift").alias("flag"),
    )
    return (
        sess.unionAll(sess_ev)
        .unionAll(roll_leg)
        .unionAll(ewma_leg)
        .unionAll(holt_leg)
        .unionAll(cusum_leg)
    )


@query(
    "stateful_dedup_users",
    oracle="SELECT DISTINCT user_id FROM events ORDER BY user_id",
    tags=("streaming", "stateful"),
)
def stateful_dedup_users(spark, sf_dir):
    """Custom stateful operator (applyInPandasWithState) end-to-end:
    events staged as a file stream, keys deduped across micro-batches
    via checkpointed keyed state, result materialized. The mechanism
    is not SQL-expressible but its RESULT is plain DISTINCT — so the
    oracle still hash-checks it exactly."""
    import tempfile
    from pathlib import Path

    from d2d_spark.streaming.filestream import file_stream
    from d2d_spark.streaming.stateful import stateful_dedup_keys

    stage = Path(tempfile.gettempdir()) / "d2d_spark_stage" / "stateful_q"
    src, ckpt = str(stage / "src"), str(stage / "ckpt")
    ev = read_table(spark, sf_dir, "events").select("user_id")
    ev.write.mode("overwrite").parquet(src)
    import shutil

    shutil.rmtree(ckpt, ignore_errors=True)
    schema = spark.read.parquet(src).schema
    stream = file_stream(spark, src, schema, max_files_per_trigger=8)
    deduped = stateful_dedup_keys(stream, "user_id")
    # shuffle partitions fix the state-store count at query start; a
    # vanilla session's 200 is waste at this key cardinality — set a
    # sane count for the stream, restore for whoever runs next
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        q = (
            deduped.writeStream.format("memory")
            .queryName("stateful_dedup_q")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    return spark.sql("select user_id from stateful_dedup_q").orderBy("user_id")
