"""Join operators.

The reference's only native join is `Migration2DB` (d22d/task.py:183-328):
an in-memory hash join — build side materialized into a dict keyed by
``str(format_value(row[key2]))`` (last duplicate key wins), probe side
streamed, right columns merged over left, unmatched left rows pass
through (left outer). The README documents full-outer behavior
(README.md:283-320); we expose ``how=`` covering both.

Spark-first physical analog: the build-side-in-memory dict IS a
broadcast hash join, so we broadcast the build side when asked (the
reference requires it to fit in memory; we merely prefer it and let
AQE/size checks fall back to shuffle join at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from d2d_spark.functions.scalars import format_value


def dedup_build_side(df: DataFrame, key: str, order_col: str | None = None) -> DataFrame:
    """Collapse duplicate build keys to one row per key, mirroring the
    reference's dict overwrite (last wins, d22d/task.py:257). With no
    stream order in Spark, the caller picks the winner via
    ``order_col`` (max wins); default = deterministic max over all
    columns is avoided — we require an explicit order column.
    """
    if order_col is None:
        return df.dropDuplicates([key])
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def key_merge(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    how: str = "left",
    broadcast_right: bool | str = "auto",
    normalize_keys: bool = True,
) -> DataFrame:
    """Migration2DB key-merge (d22d/task.py:243-328).

    Joins on string-normalized keys (`format_value`: trim, integral
    float -> int), merges right columns over left (right wins on name
    collisions, format_data d22d/task.py:322-328). ``how='left'`` is
    code-faithful; ``how='full'`` is doc-faithful (README.md:283-320).

    ``broadcast_right='auto'`` (default) leaves the physical choice to
    Catalyst/AQE: small build sides broadcast (the reference's
    dict-in-memory analog), big ones fall back to sort-merge instead
    of OOMing — the reference required the build side to fit in
    memory; we merely prefer it. ``True`` forces the broadcast hint
    (the hint wins regardless of size — 100 TB footgun, opt-in only).
    """
    lk = format_value(F.col(left_key)) if normalize_keys else F.col(left_key).cast("string")
    rk = format_value(F.col(right_key)) if normalize_keys else F.col(right_key).cast("string")
    lj = left.withColumn("__jk", lk)
    rj = right.withColumn("__jk", rk)
    if broadcast_right is True:
        rj = F.broadcast(rj)

    shared = [c for c in left.columns if c in set(right.columns)]
    # right wins on collisions when MATCHED — including a matched
    # right NULL (the reference's dict overwrite replaces the value
    # unconditionally; coalesce would conflate 'matched but NULL'
    # with 'no match' and keep a stale left value)
    rj = rj.select(
        "__jk",
        F.lit(True).alias("__matched"),
        *[F.col(c).alias(f"__r_{c}" if c in shared else c) for c in right.columns],
    )
    joined = lj.join(rj, on="__jk", how="full_outer" if how == "full" else how)
    merged = joined
    for c in shared:
        merged = merged.withColumn(
            c,
            F.when(F.col("__matched"), F.col(f"__r_{c}")).otherwise(F.col(c)),
        ).drop(f"__r_{c}")
    out_cols = list(left.columns) + [c for c in right.columns if c not in shared]
    return merged.select(*out_cols)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    how: str = "left",
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Point-in-time (as-of) join — the market-data / feature-store
    join Spark lacks natively — with pandas merge_asof's three
    directions:

      backward (default) — the LATEST right row with right_ts <=
          left_ts (the classic as-of);
      forward  — the EARLIEST right row with right_ts >= left_ts
          (next-event lookup: the fill after an order, the response
          after a request);
      nearest  — whichever of the two is closer in absolute time,
          ties to the backward match (the pandas convention).

    Built as a composition, not a UDF: tag and union both sides,
    sort within key by time, and carry the last-seen right payload
    with last_value(ignoreNulls) over a running window (ascending for
    backward, descending for forward; nearest computes both carries
    over the SAME partitioning and picks per row). ONE shuffle on
    (key) in every direction — versus the naive theta-join which
    explodes to a per-key cross product. ``tolerance`` (e.g.
    '1 hour') voids matches farther than that from left_ts on the
    relevant side, like pandas merge_asof.
    """
    from pyspark.sql import Window

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"asof_join: direction must be backward | forward | nearest, "
            f"got {direction!r}"
        )
    lcols = left.columns
    rcols = [c for c in right.columns if c not in (on, right_ts)]
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in rcols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
        F.col(right_ts).alias("__rts"),
    )
    # right rows sort BEFORE left rows at equal timestamps in BOTH
    # traversal orders, so a tick at exactly left_ts matches
    # (asof semantics are inclusive on each side)
    u = l.unionByName(r)
    # carry the WHOLE right row as ONE struct (NULL on left rows), not
    # per-column last(ignoreNulls): per-column carries would let a
    # matched right row's NULL field resurrect a STALE value from an
    # older right row — columns of one output row could even come from
    # different right rows. merge_asof semantics are row-wise.
    u = u.withColumn(
        "__rrow",
        F.when(
            F.col("__is_left") == 0,
            F.struct(
                F.col("__rts").alias("__rts"),
                *[F.col(f"__r_{c}").alias(f"__r_{c}") for c in rcols],
            ),
        ),
    )
    wb = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").desc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    need_b = direction in ("backward", "nearest")
    need_f = direction in ("forward", "nearest")
    carry_cols = []
    if need_b:
        carry_cols.append(F.last("__rrow", ignorenulls=True).over(wb).alias("__cb"))
    if need_f:
        carry_cols.append(F.last("__rrow", ignorenulls=True).over(wf).alias("__cf"))
    carried = u.select("*", *carry_cols)
    if need_b:
        carried = carried.withColumn("__cb_rts", F.col("__cb.__rts"))
        for c in rcols:
            carried = carried.withColumn(f"__cb_{c}", F.col(f"__cb.__r_{c}"))
    if need_f:
        carried = carried.withColumn("__cf_rts", F.col("__cf.__rts"))
        for c in rcols:
            carried = carried.withColumn(f"__cf_{c}", F.col(f"__cf.__r_{c}"))
    out = carried.filter(F.col("__is_left") == 1)
    valid_b = F.col("__cb_rts").isNotNull() if need_b else F.lit(False)
    valid_f = F.col("__cf_rts").isNotNull() if need_f else F.lit(False)
    if tolerance is not None:
        iv = F.expr(f"INTERVAL {tolerance}")
        if need_b:
            valid_b = valid_b & (F.col("__cb_rts") >= F.col("__ts") - iv)
        if need_f:
            valid_f = valid_f & (F.col("__cf_rts") <= F.col("__ts") + iv)
    if direction == "backward":
        picked = [F.when(valid_b, F.col(f"__cb_{c}")).alias(c) for c in rcols]
    elif direction == "forward":
        picked = [F.when(valid_f, F.col(f"__cf_{c}")).alias(c) for c in rcols]
    else:
        # nearest: closer absolute distance wins, ties -> backward.
        # Timestamps compare as unix_micros LONGS — a double epoch
        # cast rounds at ~0.24us near 2024, which can flip an exactly
        # equidistant tie to forward; numeric order columns compare
        # in their own type.
        ts_type = left.schema[left_ts].dataType.simpleString()
        if ts_type in ("timestamp", "timestamp_ntz"):
            def _d(c):
                return F.unix_micros(c)
        else:
            def _d(c):
                return c
        ts_d = _d(F.col("__ts"))
        use_f = valid_f & (
            ~valid_b
            | ((_d(F.col("__cf_rts")) - ts_d) < (ts_d - _d(F.col("__cb_rts"))))
        )
        picked = [
            F.when(use_f, F.col(f"__cf_{c}"))
            .otherwise(F.when(valid_b, F.col(f"__cb_{c}")))
            .alias(c)
            for c in rcols
        ]
    out = out.select(*lcols, *picked)
    if how == "inner":
        out = out.dropna(subset=rcols, how="all")
    return out


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: list[str] | str | None = None,
    bin_width: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Join two interval sets on OVERLAP: emit (l, r) when
    ``l.start <= r.end AND r.start <= l.end`` (closed endpoints),
    optionally also requiring equality on ``on`` keys — the
    sessions-x-outages / spans-x-annotations join that a plain
    equi-join can't express.

    Two physical paths:

    - ``bin_width=None``: the declarative theta-join. Catalyst can
      only broadcast-nested-loop this, so it is right ONLY when one
      side is broadcast-small. Refused when both sides are plans we
      can't size (no silent cartesian at 100 TB).
    - ``bin_width=w``: the scale path. Each interval explodes to the
      w-width bins it covers, pairs meet by (keys, bin) EQUI-join
      (hash shuffle, AQE-skew-splittable), and each overlapping pair
      is emitted exactly once — only in the canonical bin containing
      ``greatest(l.start, r.start)``, which any overlapping pair
      covers on both sides — so no distinct/dedup shuffle is needed.
      Explode factor is len(interval)/w + 1: pick w near the median
      interval length (cost reasoning in SCALE.md).

    Timestamp columns are binned via their epoch seconds (``w`` in
    seconds); the exact overlap predicate stays on the original
    values. NULL or reversed (start > end) intervals never match,
    same as the SQL predicate's NULL semantics.

    Right columns colliding with left names come back with
    ``suffix``.
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))

    shared = set(left.columns)
    ren = {c: (f"{c}{suffix}" if c in shared else c) for c in right.columns}
    r = right.select(*[F.col(c).alias(ren[c]) for c in right.columns])
    rs, re_ = ren[right_start], ren[right_end]

    overlap = (F.col(left_start) <= F.col(re_)) & (F.col(rs) <= F.col(left_end))
    eq = None
    for k in keys:
        c = F.col(k) == F.col(ren[k])
        eq = c if eq is None else eq & c

    if bin_width is None:
        if not keys:
            raise ValueError(
                "interval_overlap_join without keys or bin_width is a "
                "broadcast-nested-loop cartesian; pass bin_width= for the "
                "scale path or on= keys to bound the blowup"
            )
        out = left.join(r, eq & overlap, "inner")
        return out.drop(*[ren[k] for k in keys if ren[k] != k])

    if bin_width <= 0:
        raise ValueError("bin_width must be positive")

    def _num(col: str, df_schema) -> F.Column:
        # bin on epoch seconds for time types; exact filter stays on
        # the original column so no precision is lost (as_double
        # handles the TIMESTAMP_NTZ/DATE -> double cast refusal)
        from d2d_spark.functions.scalars import as_double

        return as_double(F.col(col), df_schema[col].dataType.simpleString())

    lnum_s, lnum_e = _num(left_start, left.schema), _num(left_end, left.schema)
    rnum_s = _num(rs, r.schema)
    rnum_e = _num(re_, r.schema)
    w = float(bin_width)

    # ANSI trap: F.sequence errors on descending ranges, so reversed/
    # NULL intervals must be filtered BEFORE the expression computes
    lb = (
        left.filter(F.col(left_start).isNotNull() & (F.col(left_start) <= F.col(left_end)))
        .withColumn("__bin", F.explode(F.sequence(
            F.floor(lnum_s / F.lit(w)), F.floor(lnum_e / F.lit(w))
        )))
    )
    rb = (
        r.filter(F.col(rs).isNotNull() & (F.col(rs) <= F.col(re_)))
        .withColumn("__binr", F.explode(F.sequence(
            F.floor(rnum_s / F.lit(w)), F.floor(rnum_e / F.lit(w))
        )))
    )

    cond = F.col("__bin") == F.col("__binr")
    if eq is not None:
        cond = cond & eq
    joined = lb.join(rb, cond, "inner").filter(overlap)
    # emit each pair once: only in the bin holding the later start
    canonical = F.floor(
        F.greatest(lnum_s, rnum_s) / F.lit(w)
    ) == F.col("__bin")
    out = joined.filter(canonical).drop("__bin", "__binr")
    return out.drop(*[ren[k] for k in keys if ren[k] != k])


def golden_record(
    df: DataFrame,
    key_cols: list[str],
    order_col: str | None,
    rules: dict[str, str],
    tiebreak_cols: tuple = (),
) -> DataFrame:
    """Survivorship merge (master-data 'golden record'): collapse
    every row sharing a key into ONE record, choosing each column's
    surviving value by a per-column rule — the step after a key-merge
    union when several sources disagree about the same entity. Rules:

      latest / earliest — the column's value on the newest/oldest row
          (by ``order_col`` then ``tiebreak_cols``) WHERE THE COLUMN
          IS NON-NULL: a source that left a field blank never
          overwrites one that filled it (the survivorship property a
          plain last-wins dedup lacks).
      max / min         — plain extrema (NULLs ignored).
      longest           — the longest non-null string (completeness
          proxy for names/addresses/comments); equal-length ties take
          the lexicographically largest (struct-compare order),
          deterministically.
      sum / count       — additive facts; count counts NON-NULL
          values of the column.

    Output: one row per key, columns = keys + rules' keys. ONE
    groupBy — every rule is an aggregate expression over the same
    shuffle, no windows, no second pass. Determinism: with a unique
    (key, order, tiebreaks) ordering, latest/earliest are exact;
    duplicated order tuples fall through to value comparison
    (documented struct order), still partitioning-deterministic."""
    known = {"latest", "earliest", "max", "min", "longest", "sum", "count"}
    if not rules:
        raise ValueError("golden_record: need at least one column rule")
    bad = {c: r for c, r in rules.items() if r not in known}
    if bad:
        raise ValueError(f"golden_record: unknown rules {bad}; choose from {sorted(known)}")
    ties = list(tiebreak_cols)
    needs_order = [c for c, r in rules.items() if r in ("latest", "earliest")]
    if needs_order and order_col is None:
        raise ValueError(
            f"golden_record: columns {needs_order} use latest/earliest — pass order_col"
        )
    referenced = list(rules) + list(key_cols) + ties
    if needs_order:
        referenced.append(order_col)
    missing = [c for c in referenced if c not in df.columns]
    if missing:
        raise ValueError(f"golden_record: input lacks columns {missing}")
    clash = [c for c in rules if c in key_cols]
    if clash:
        raise ValueError(
            f"golden_record: {clash} are key columns AND rule targets — the "
            "output would carry duplicate column names; alias a copy first"
        )
    aggs = []
    for c, r in rules.items():
        col = F.col(c)
        if r in ("latest", "earliest"):
            ranked = F.when(
                col.isNotNull(),
                F.struct(
                    F.col(order_col).alias("__o"),
                    *[F.col(t).alias(f"__t{i}") for i, t in enumerate(ties)],
                    col.alias("__v"),
                ),
            )
            agg = (F.max(ranked) if r == "latest" else F.min(ranked))["__v"]
        elif r == "longest":
            agg = F.max(
                F.when(col.isNotNull(), F.struct(F.length(col).alias("__l"), col.alias("__v")))
            )["__v"]
        elif r == "max":
            agg = F.max(col)
        elif r == "min":
            agg = F.min(col)
        elif r == "sum":
            agg = F.sum(col)
        else:  # count
            agg = F.count(col)
        aggs.append(agg.alias(c))
    return df.groupBy(*key_cols).agg(*aggs)


def merge_intervals(
    df: DataFrame,
    key_cols: list[str] | None,
    start_col: str,
    end_col: str,
    tolerance: float | str = 0,
    validate: bool = True,
) -> DataFrame:
    """Coalesce overlapping (or within-``tolerance``) intervals per
    key into their union — the gaps-and-islands companion of
    interval_overlap_join (that one PAIRS intervals; this one UNIONS
    them: merging outage windows, de-overlapping annotation spans,
    stitching sessions). Closed endpoints: [1,3] and [3,5] merge;
    with tolerance t, a gap of exactly t still merges ([1,3],[5,7] at
    t=2). Returns (keys..., start_col, end_col, n_merged) — one row
    per merged island, end = max end seen (containment-safe: [1,10],
    [2,3] yields [1,10]).

    ``tolerance``: a number for numeric bounds, an interval string
    ('5 minutes') for timestamps. NULL or reversed (start > end)
    intervals are REFUSED (one aggregate probe) — silently dropping
    them would report unions over data that was never unioned; filter
    upstream deliberately, or pass validate=False after doing so.

    Spark shape: ONE key shuffle — sort by (start, end), an island
    starts where start exceeds the running max of prior ends (+
    tolerance), islands number by running sum, then one groupBy on
    (keys, island). The classic pattern, partitioning-deterministic
    because the running max is order-insensitive to ties."""
    from pyspark.sql import Window

    keys = list(key_cols or [])
    if validate:
        any_bad = (
            F.col(start_col).isNull()
            | F.col(end_col).isNull()
            | (F.col(start_col) > F.col(end_col))
        )
        for c in keys:
            any_bad = any_bad | F.col(c).isNull()
        bad = df.agg(F.max(any_bad).alias("bad")).first()
        if bad["bad"]:
            raise ValueError(
                "merge_intervals: NULL keys/bounds or reversed (start > end) "
                "intervals — a union over undefined intervals is undefined; "
                "filter or repair upstream (validate=False after doing so)"
            )
    if isinstance(tolerance, str):
        tol = F.expr(f"INTERVAL {tolerance}")
    else:
        if float(tolerance) < 0:
            raise ValueError(f"merge_intervals: tolerance must be >= 0, got {tolerance}")
        # keep integral tolerances as INT literals: DATE bounds add
        # whole days only (date_add rejects a double), and numeric
        # bounds promote an int fine either way
        tol = (
            F.lit(int(tolerance))
            if float(tolerance).is_integer()
            else F.lit(float(tolerance))
        )
    w_prev = (
        Window.partitionBy(*keys)
        .orderBy(start_col, end_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(*keys)
        .orderBy(start_col, end_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_max_end = F.max(F.col(end_col)).over(w_prev)
    boundary = prev_max_end.isNull() | (F.col(start_col) > prev_max_end + tol)
    island = F.sum(boundary.cast("int")).over(w_run)
    grouped = df.withColumn("__island", island).groupBy(*keys, "__island").agg(
        F.min(start_col).alias(start_col),
        F.max(end_col).alias(end_col),
        F.count(F.lit(1)).alias("n_merged"),
    )
    return grouped.drop("__island")
