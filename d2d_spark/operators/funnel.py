"""Event-funnel and retention analytics — the ClickHouse
`windowFunnel` / `retention` capability family (the reference fronts
ES/ClickHouse for event analytics; these are the two canonical
event-sequence aggregates those engines ship natively).

Semantics (documented exactly, because funnel engines differ):

  funnel_stages — GREEDY EARLIEST-CHAIN funnel. Per user, events are
  scanned in (ts, tiebreak) order; stage 1 matches at the user's
  earliest step-1 event; stage k+1 matches at the earliest step-k+1
  event STRICTLY AFTER the stage-k match; with ``within`` set, every
  match must also fall within that many seconds of the CHAIN START
  (the stage-1 match). Greedy-earliest is deterministic and exactly
  replayable in plain SQL (chained per-stage min subqueries) — the
  trade-off, shared with most production funnel implementations, is
  that a later chain start reaching further is NOT searched for.

  retention_cohorts — classic cohort retention: a user's cohort is
  the day of their first event; retained at offset d means the user
  has an event exactly d days after their cohort day. Counts are
  exact distinct users per (cohort_day, offset).

Spark shape: ONE groupBy per aggregate. The funnel folds each user's
sorted (ts, type) event array with ``F.aggregate`` — state is the
n_steps-wide array of match timestamps, so per-user work is linear
in events and the shuffle carries (user, array<ts>) only. Retention
is two grouped aggregates (first-event day, then distinct users per
offset). No windows over global order, no Python.

At 100 TB: both shuffle once on user_id (uniform unless one user is
a whale — same exposure as any sessionization); funnel state is
n_steps timestamps per user, retention state one date per user.
The collect_list per user is bounded by per-user event counts —
cap upstream (cap_per_key) for adversarial actors.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TS = "double"  # epoch seconds; exact for sub-microsecond fixtures


def _fold_funnel(
    events: Column, steps: list[str], within: float | None, mode: str | None = None
) -> Column:
    """Fold a (ts, type)-sorted event array into the array of stage
    match times (NULL = stage unreached). State s[k] is the stage-k
    match timestamp; an event matching step k+1 fills s[k+1] when
    s[k] is set, the event is strictly later, and (with ``within``)
    sits inside the window anchored at s[1].

    ``mode`` adds the ClickHouse windowFunnel strictness variants
    (only STEP-TYPED events enter the fold, so — as in ClickHouse —
    only condition events can interrupt):

      'strict_order' — once the chain has started, an event that does
          NOT extend it (wrong type next, window expired, repeat of a
          matched step) KILLS it: the deepest stage freezes there.
      'strict_dedup' — a second occurrence of an ALREADY-MATCHED step
          type kills the chain (the repeat itself never extends).

    (ClickHouse's strict_increase is this fold's DEFAULT: matches
    already require strictly increasing timestamps.) Dead chains are
    tracked as one boolean alongside the stage array — state stays
    n+1 scalars per user."""
    n = len(steps)
    strict = mode is not None
    zero_arr = F.array(*[F.lit(None).cast(_TS) for _ in range(n)])
    zero = (
        F.struct(zero_arr.alias("s"), F.lit(False).alias("dead"))
        if strict
        else zero_arr
    )

    def step(acc: Column, ev: Column) -> Column:
        ts, et = ev["ts"], ev["et"]
        arr = acc["s"] if strict else acc
        dead = acc["dead"] if strict else F.lit(False)
        cols, takes = [], []
        for k in range(n):
            cur = F.element_at(arr, k + 1)
            prev_ok = (
                F.lit(True)
                if k == 0
                else (
                    F.element_at(arr, k).isNotNull()
                    & (ts > F.element_at(arr, k))
                )
            )
            win_ok = (
                F.lit(True)
                if within is None or k == 0
                else (ts - F.element_at(arr, 1) <= F.lit(float(within)))
            )
            take = cur.isNull() & (et == F.lit(steps[k])) & prev_ok & win_ok
            if strict:
                take = take & ~dead
            takes.append(take)
            cols.append(F.when(take, ts).otherwise(cur))
        if not strict:
            return F.array(*cols)
        extended = takes[0]
        for t in takes[1:]:
            extended = extended | t
        started = F.element_at(arr, 1).isNotNull()
        if mode == "strict_order":
            new_dead = dead | (started & ~extended)
        else:  # strict_dedup
            repeat = F.lit(False)
            for k in range(n):
                repeat = repeat | (
                    (et == F.lit(steps[k])) & F.element_at(arr, k + 1).isNotNull()
                )
            new_dead = dead | repeat
        return F.struct(F.array(*cols).alias("s"), new_dead.alias("dead"))

    folded = F.aggregate(events, zero, step)
    return folded["s"] if strict else folded


def funnel_stages(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
    within: float | None = None,
    max_events_per_user: int | None = None,
    universe: DataFrame | None = None,
    mode: str | None = None,
) -> DataFrame:
    """(user, stage, stage_ts...) — per-user greedy-earliest funnel
    progress: ``stage`` = deepest step reached, plus one ``ts_step_k``
    column per step with the match time (epoch seconds, NULL =
    unreached). One groupBy; see module docstring for the exact chain
    semantics.

    By default only users with AT LEAST ONE step-typed event appear
    in the output — a user with zero matching events is absent
    entirely, not emitted as stage 0 (present users can still land on
    stage 0 when no event starts a chain — e.g. only later-step
    events, or every chain disqualified by ``within``). Pass
    ``universe`` (a one-column frame of user ids) to make the
    never-entered population first-class: every distinct non-NULL
    universe user absent from the event fold is emitted at stage 0
    with all step timestamps NULL, so stage-0 counts denominate
    conversion without a caller-side join recipe. Users with events
    but outside the universe are kept (the universe widens the
    output, never filters it — filter upstream to restrict). Scale
    shape: one extra key equi-join on the model-to-corpus-sized user
    frame; everything else unchanged.

    Per-user state is the user's step-typed event list; upstream
    discipline bounds it. ``max_events_per_user`` makes the bound a
    contract: one cheap pre-aggregate, and any user over the cap
    raises loudly instead of ballooning an executor (the grid-bomb
    guard discipline)."""
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError(f"need >= 2 funnel steps, got {steps}")
    if mode not in (None, "strict_order", "strict_dedup"):
        raise ValueError(
            f"funnel_stages: mode must be None | 'strict_order' | "
            f"'strict_dedup', got {mode!r}"
        )
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps}")
    if within is not None and within <= 0:
        raise ValueError(f"within must be > 0 seconds, got {within}")
    if max_events_per_user is not None:
        if max_events_per_user < 1:
            raise ValueError(
                f"max_events_per_user must be >= 1, got {max_events_per_user}"
            )
        whale = (
            df.filter(F.col(type_col).isin(steps) & F.col(ts_col).isNotNull())
            .groupBy(user_col)
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > max_events_per_user)
            .limit(1)
            .collect()
        )
        if whale:
            raise ValueError(
                f"funnel_stages: user {whale[0][0]!r} has {whale[0]['__n']} "
                f"step events (> max_events_per_user={max_events_per_user}) — "
                "dedup/sample upstream or raise the cap explicitly; a whale "
                "key would balloon one executor's collect_list state"
            )
    ev = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).cast("timestamp").cast(_TS).alias("ts"),
                F.col(type_col).alias("et"),
            )
        )
    )
    folded = (
        df.filter(F.col(type_col).isin(steps) & F.col(ts_col).isNotNull())
        .groupBy(F.col(user_col).alias("user"))
        .agg(_fold_funnel(ev, steps, within, mode).alias("__s"))
    )
    stage = F.aggregate(
        F.col("__s"), F.lit(0), lambda acc, t: F.when(t.isNotNull(), acc + 1).otherwise(acc)
    )
    # stages fill strictly in order, so the count of non-NULLs IS the
    # deepest prefix reached
    out = folded.select(
        "user",
        stage.alias("stage"),
        *[
            F.element_at(F.col("__s"), k + 1).alias(f"ts_step_{k + 1}")
            for k in range(len(steps))
        ],
    )
    if universe is not None:
        uni = (
            universe.select(F.col(universe.columns[0]).alias("user"))
            .filter(F.col("user").isNotNull())
            .distinct()
        )
        missing = uni.join(out.select("user"), "user", "left_anti").select(
            "user",
            F.lit(0).cast("int").alias("stage"),
            *[
                F.lit(None).cast("double").alias(f"ts_step_{k + 1}")
                for k in range(len(steps))
            ],
        )
        out = out.unionByName(missing)
    return out


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
    within: float | None = None,
) -> DataFrame:
    """(stage, n_users) — how many users reached AT LEAST each stage
    (stage 1..n; the classic conversion funnel). Derived from
    funnel_stages with one more tiny aggregate."""
    st = funnel_stages(df, user_col, ts_col, type_col, steps, within)
    n = len(list(steps))
    lvls = F.sequence(F.lit(1), F.lit(n))
    return (
        st.select(F.explode(F.filter(lvls, lambda k: k <= F.col("stage"))).alias("stage"))
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    offsets: Sequence[int] = (0, 1, 7, 14, 30),
    window_days: int = 1,
) -> DataFrame:
    """(cohort_day, day_offset, n_users) — exact cohort retention:
    cohort = date of the user's first event; the user counts at
    offset d iff they have an event in [cohort_day + d,
    cohort_day + d + window_days) days. The default window_days=1 is
    CLASSIC (exact-day) retention; larger windows give the
    "return-window" variant product analytics prefer for weekly
    granularities (retained in week 1 = any event on days 7..13:
    offsets=(7,), window_days=7). A user counts ONCE per offset
    however many return days land in its window. Two grouped
    aggregates + one small join; offsets beyond the data run simply
    produce no rows.

    Shape note: with window_days > 1 each (user, day) row can serve
    several offsets, so rows fan out by at most len(offsets) before
    the per-offset DISTINCT — still user-bounded, one extra shuffle
    for the distinct."""
    offsets = sorted(set(int(o) for o in offsets))
    if not offsets or offsets[0] < 0:
        raise ValueError(f"offsets must be non-negative, got {offsets}")
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    days = df.filter(F.col(ts_col).isNotNull()).select(
        F.col(user_col).alias("user"), F.to_date(ts_col).alias("__d")
    ).distinct()
    first = days.groupBy("user").agg(F.min("__d").alias("cohort_day"))
    joined = days.join(first, "user").select(
        "user", "cohort_day", F.datediff("__d", "cohort_day").alias("__delta")
    )
    if window_days == 1:
        # no distinct here: `days` is already unique on (user, day) and
        # day_offset is a function of (user, day), so these rows are
        # duplicate-free by construction
        hits = joined.select(
            "user", "cohort_day", F.col("__delta").alias("day_offset")
        ).filter(F.col("day_offset").isin(offsets))
    else:
        offs = F.array(*[F.lit(o) for o in offsets])
        hits = (
            joined.select(
                "user",
                "cohort_day",
                F.explode(
                    F.filter(
                        offs,
                        lambda o: (F.col("__delta") >= o)
                        & (F.col("__delta") < o + F.lit(window_days)),
                    )
                ).alias("day_offset"),
            )
            .distinct()  # several return days can hit one window
        )
    return hits.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )
