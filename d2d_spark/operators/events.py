"""Event-sequence analytics: funnel conversion and cohort retention.

The reference ships event data to Elasticsearch and leaves sequence
questions to Kibana; a Spark-native engine should answer them
directly — "of the users who VIEWED, how many CLICKED then BOUGHT,
in order, within 7 days?" (funnel) and "of the users who first
appeared in week W, how many came back k weeks later?" (retention).

Both are pure DataFrame algebra, one or two shuffles, no UDFs:

  funnel     — ONE groupBy(user) collects per-step sorted timestamp
               arrays, then a chain of higher-order-function folds
               picks each step's earliest qualifying time (strictly
               after the previous step, optionally within a horizon
               of step 1). State per user = that user's events for
               the funnel's types only — the same per-key bound as
               session windows; no per-user iteration on the driver.
  retention  — first-seen period per user (one agg), distinct active
               periods per user (one agg), one equi-join, count. All
               keys are uniform (user id, period), so both shuffles
               AQE-split cleanly at 100 TB.

Greedy earliest matching is exact for these semantics: taking the
earliest qualifying event at every step can only make later steps
easier to satisfy, so "completed step k" is invariant under any
other valid assignment (the standard funnel argument).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PERIOD_DAYS = {"day": 1, "week": 7}


def funnel_times(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: list[str],
    within: str | None = None,
) -> DataFrame:
    """Per-user step-completion times: one row per user who completed
    step 1, with ``t_1 .. t_n`` timestamps (NULL from the first
    uncompleted step on). ``within`` (e.g. ``'7 days'``) bounds every
    later step to ``t_1 + within`` — the horizon-anchored funnel.
    Later steps must be STRICTLY after the previous step's time.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    aggs = [
        F.sort_array(
            F.collect_list(F.when(F.col(type_col) == F.lit(s), F.col(ts_col)))
        ).alias(f"__arr_{i}")
        for i, s in enumerate(steps)
    ]
    per_user = events.groupBy(F.col(user_col).alias("user")).agg(*aggs)

    # F.get (not element_at) — out-of-range must be NULL, not an ANSI
    # runtime error, and empty arrays are the common case
    out = per_user.withColumn("t_1", F.get(F.col("__arr_0"), 0))
    cutoff = (
        F.col("t_1") + F.expr(f"INTERVAL {within}") if within is not None else None
    )
    def _qualifier(prev):
        # factory, not a default arg: F.filter reads the lambda's
        # positional arity, and a second defaulted param would be
        # bound to the element INDEX, not this column
        def qualifies(x):
            cond = x > prev
            if cutoff is not None:
                cond = cond & (x <= cutoff)
            return cond

        return qualifies

    for k in range(1, len(steps)):
        qualifies = _qualifier(F.col(f"t_{k}"))
        # materialize each step in its own withColumn: the next
        # step's filter references THIS column, and inlining chained
        # HOFs re-derives the whole prefix per step
        out = out.withColumn(
            f"t_{k + 1}", F.get(F.filter(F.col(f"__arr_{k}"), qualifies), 0)
        )
    return out.filter(F.col("t_1").isNotNull()).drop(
        *[f"__arr_{i}" for i in range(len(steps))]
    )


def funnel_conversion(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: list[str],
    within: str | None = None,
) -> DataFrame:
    """The funnel summary: ``(step, step_name, users)`` — how many
    users reached each step in order. ``users`` is monotonically
    non-increasing by construction."""
    t = funnel_times(events, user_col, type_col, ts_col, steps, within)
    counted = t.agg(
        *[
            F.count(F.col(f"t_{k + 1}")).alias(f"__c{k + 1}")
            for k in range(len(steps))
        ]
    )
    # melt the one summary row to long form without another job
    pairs = F.array(
        *[
            F.struct(
                F.lit(k + 1).alias("step"),
                F.lit(steps[k]).alias("step_name"),
                F.col(f"__c{k + 1}").alias("users"),
            )
            for k in range(len(steps))
        ]
    )
    return (
        counted.select(F.explode(pairs).alias("p"))
        .select("p.step", "p.step_name", "p.users")
    )


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    period: str = "week",
) -> DataFrame:
    """Cohort x offset retention counts:
    ``(cohort, offset, users, cohort_size)`` — users whose FIRST
    event fell in ``cohort`` and who were active ``offset`` periods
    later (offset 0 = the cohort period itself, so
    ``users == cohort_size`` there). ``period`` is 'day' or 'week'
    (calendar-truncated, Monday weeks)."""
    if period not in _PERIOD_DAYS:
        raise ValueError(f"period must be one of {sorted(_PERIOD_DAYS)}")
    days = _PERIOD_DAYS[period]
    u = F.col(user_col)
    first = events.groupBy(u.alias("user")).agg(
        F.date_trunc(period, F.min(ts_col)).cast("date").alias("cohort")
    )
    active = (
        events.select(
            u.alias("user"),
            F.date_trunc(period, F.col(ts_col)).cast("date").alias("p"),
        )
        .distinct()
    )
    j = active.join(first, "user")
    per_cell = (
        j.groupBy(
            "cohort",
            (F.datediff(F.col("p"), F.col("cohort")) / days).cast("int").alias("offset"),
        )
        .agg(F.count_distinct("user").alias("users"))
    )
    sizes = first.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    return per_cell.join(sizes, "cohort").select(
        "cohort", "offset", "users", "cohort_size"
    )
