"""Scale-safe global ranking — SQL's ``RANK() OVER (ORDER BY v)``
without the single-task global sort.

Spark's ``F.rank().over(Window.orderBy(v))`` (no partitionBy) moves
EVERY row to one task — the documented whale-key pathology of the
per-key window family (`stats.spearman_corr`, `group_quantiles_exact`
docstrings). This module is the distributed answer, the same
value-collapse + bucket-offset + within-bucket-window prefix sum the
exact-quantile family runs (`quantiles.quantiles_exact` steps 1-3,
proven by three driver-oracled operators: quantiles, ks_two_sample,
binary_auc):

  1. collapse to (value, count) — the working set becomes DISTINCT
     values, with map-side combine;
  2. deterministic explicit bucket boundaries (one-row
     percentile_approx over the distinct values, broadcast fold-in);
  3. per-bucket subtotals cumsum on a bucket-count-sized window, then
     a within-bucket cumulative window — no unpartitioned window ever
     sees value- or row-scale data;
  4. join the per-value rank back to the rows on the value (an
     equi-join on a distinct-valued build side — broadcast when small,
     shuffle-hash otherwise; ties collapsed, so no skew amplification
     beyond the input's own value skew).

Tie semantics per SQL: ``rank`` = min rank (ties share the smallest),
``dense`` = distinct-value index, ``avg`` = average rank (the
Spearman / Mann-Whitney convention, exact multiples of 0.5),
``percent`` = (rank - 1) / (n - 1). All four derive from the same two
cumulative counts, so asking for several costs one pass.

Reference hook: the reference forwards ORDER BY to the remote engine
(d22d/utils/db/myutils.py:884-885) and has no rank primitive at all;
`df.orderBy` covers output ordering here, and this operator covers
rank-DERIVED columns, which an orderBy cannot express at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_METHODS = ("rank", "dense", "avg", "percent")


def ranked_values(
    df: DataFrame,
    value_col: str,
    *,
    ascending: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """The collapsed rank frame: one row per DISTINCT non-NULL value
    of ``value_col`` with every tie statistic the SQL rank family
    needs —

        (__v, __c, __rank, __dense, __avg_rank, __n, __nd)

    ``__rank`` = min rank of the tie group (long), ``__dense`` =
    1-based distinct index (long), ``__avg_rank`` = average rank as
    DECIMAL(28,6) (exact: ranks are integers, the tie offset an exact
    half), ``__n`` = total non-NULL rows, ``__nd`` = distinct values.
    Descending order is derived from the ascending cumulative counts
    by reflection (rank_desc = n - cum_incl + 1 over the tie group) —
    one pass either way.

    This is the shared core of `rank_global` and the global mode of
    `stats.spearman_corr`; join it back on the value to decorate
    rows. No ``Window.partitionBy()`` (unpartitioned window) anywhere:
    the only ordered windows run over bucket-count-sized frames or
    within a bucket."""
    v = F.col(value_col)
    from pyspark import StorageLevel

    from d2d_spark import cache as opcache

    # r11 (guide §2.4): the collapse feeds the boundary sketch, the
    # per-bucket offsets, the totals AND the bucketed scan — persist
    # once per call (the quantiles/binary_auc discipline) so the scan
    # + value-collapse shuffle run once, not once per consumer. The
    # eager fill pins the blocks BEFORE the consumers race on an
    # unfilled cache inside one job (the minhash lesson); the final
    # localCheckpoint below lets this cache release at return.
    counts = opcache.register(
        "ranks",
        df.filter(v.isNotNull())
        .groupBy(v.alias("__v"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .persist(StorageLevel.MEMORY_AND_DISK),
    )
    counts.count()
    if num_partitions is not None and num_partitions < 1:
        raise ValueError(f"num_partitions must be >= 1, got {num_partitions}")
    nb = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    bnds = counts.agg(
        F.percentile_approx(
            "__v", F.array(*[F.lit((i + 1) / nb) for i in range(max(nb - 1, 1))]), 10_000
        ).alias("__b")
    )
    bucketed = counts.crossJoin(F.broadcast(bnds)).select(
        "__v",
        "__c",
        F.coalesce(
            F.aggregate(
                "__b", F.lit(0), lambda acc, b: acc + (b < F.col("__v")).cast("int")
            ),
            F.lit(0),
        ).alias("__pid"),
    )
    # per-bucket offsets for BOTH cumulative counts (rows and distinct
    # values): <= #buckets rows, safe on one ordered window
    offs = (
        bucketed.groupBy("__pid")
        .agg(F.sum("__c").alias("__pc"), F.count(F.lit(1)).alias("__pd"))
        .select(
            "__pid",
            F.coalesce(
                F.sum("__pc").over(
                    Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("__off"),
            F.coalesce(
                F.sum("__pd").over(
                    Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("__doff"),
        )
    )
    w_in = (
        Window.partitionBy("__pid")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_cum = (
        bucketed.join(F.broadcast(offs), "__pid")
        .select(
            "__v",
            "__c",
            (F.col("__off") + F.sum("__c").over(w_in)).alias("__cum"),
            (F.col("__doff") + F.count(F.lit(1)).over(w_in)).alias("__dense_asc"),
        )
    )
    totals = counts.agg(
        F.coalesce(F.sum("__c"), F.lit(0)).alias("__n"),
        F.count(F.lit(1)).alias("__nd"),
    )
    out = with_cum.crossJoin(F.broadcast(totals))
    if ascending:
        rank = F.col("__cum") - F.col("__c") + F.lit(1)
        dense = F.col("__dense_asc")
    else:
        # reflect: values strictly ABOVE v number n - cum_incl, so the
        # descending min rank of v's tie group is n - cum_incl + 1
        rank = F.col("__n") - F.col("__cum") + F.lit(1)
        dense = F.col("__nd") - F.col("__dense_asc") + F.lit(1)
    # avg = rank + (c - 1)/2 = (2*rank + c - 1) / 2 — integer halves,
    # exact in DECIMAL(28,6)
    avg = (
        (rank * F.lit(2) + F.col("__c") - F.lit(1)).cast("decimal(28,6)")
        / F.lit(2)
    ).cast("decimal(28,6)")
    ranked = out.select(
        "__v",
        "__c",
        rank.cast("long").alias("__rank"),
        dense.cast("long").alias("__dense"),
        avg.alias("__avg_rank"),
        "__n",
        "__nd",
    )
    # r11 (guide §3.3 "materialise an intermediate to truncate the
    # plan"): the rank frame is DISTINCT-VALUE sized — bounded by the
    # same working-set contract as the persisted collapse — but its
    # LINEAGE embeds the input plan ~6x (collapse + sketch + offsets +
    # totals + bucketed scan). A caller that chains rank_global calls
    # (topk_setops' rank/rankd/rankp legs, the equivalence tests)
    # multiplies plans 6x PER CALL, and Spark re-renders the full plan
    # string per AQE stage update — measured minutes of driver CPU in
    # generateTreeString on a 4-deep chain. localCheckpoint cuts the
    # lineage at a bounded frame; the collapse cache has served every
    # consumer by now, so it releases here instead of accumulating.
    ranked = ranked.localCheckpoint(eager=True)
    opcache.deregister("ranks", [counts])
    return ranked


def rank_global(
    df: DataFrame,
    value_col: str,
    method: str = "rank",
    out_col: str = "rank",
    *,
    ascending: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a GLOBAL rank column over ``value_col`` — equivalent to
    ``F.<method>().over(Window.orderBy(value_col))`` but with no
    unpartitioned window in the plan (partitioning-invariance and
    small-data equivalence vs the window functions are test-pinned).

    ``method``: ``rank`` (SQL RANK, long), ``dense`` (DENSE_RANK,
    long), ``avg`` (average/fractional rank, DECIMAL(28,6) exact
    halves — the Spearman convention), ``percent`` (PERCENT_RANK,
    double, 0.0 when n == 1 per SQL). NULL values receive a NULL rank
    and do not count toward n (SQL window NULL ordering is a
    sort-direction artifact, not a semantic rank; filter first if you
    need them placed).

    Shape: the `ranked_values` prefix sum + one equi-join back on the
    value. 100 TB cost = the value-collapse groupBy plus that join —
    both shuffle on the value; the rank frame is distinct-valued, so
    Spark broadcasts it whenever the distinct count is small."""
    if method not in _METHODS:
        raise ValueError(f"rank_global: method must be one of {_METHODS}, got {method!r}")
    rv = ranked_values(
        df, value_col, ascending=ascending, num_partitions=num_partitions
    )
    if method == "rank":
        expr = F.col("__rank")
    elif method == "dense":
        expr = F.col("__dense")
    elif method == "avg":
        expr = F.col("__avg_rank")
    else:  # percent
        expr = F.when(
            F.col("__n") > 1,
            (F.col("__rank") - F.lit(1)).cast("double") / (F.col("__n") - F.lit(1)),
        ).otherwise(F.lit(0.0))
    build = rv.select(F.col("__v"), expr.alias(out_col))
    return df.join(build, df[value_col] == build["__v"], "left").drop("__v")
