"""Multi-touch attribution — the credit-assignment member of the
event-analytics family (funnel.py answers "did the chain complete",
paths.py "which chains are walked", timeseries.sessionize "where are
the visit boundaries"; this module answers "which touchpoints get
credit for a conversion"):

  attribution — per conversion event, distribute one unit of credit
                over the key's preceding touch events inside a
                lookback window, under the standard models:

    last_touch  — the latest touch before the conversion gets 1.0
                  (the default in most ad platforms);
    first_touch — the earliest touch in the window gets 1.0;
    linear      — every touch in the window gets 1/n;
    time_decay  — touch weight 2^(-age/halflife), normalized to sum 1
                  per conversion (recent touches dominate);
    position    — U-shape 40/20/40: first and last get 0.40 each, the
                  middle touches share 0.20 (n=1 -> 1.0, n=2 -> 0.5
                  each) — the "position-based" industry convention.

Spark shape: conversions and touches are two filters over ONE scan;
pairs meet by a key equi-join with the time-window predicate as a
residual — per-key fan-out is conversions x touches-in-lookback, the
honest cost of any all-touch model. For skewed keys or long lookbacks
pass ``bin_width`` (seconds) to route the pairing through
interval_overlap_join's binned equi-join (each conversion's lookback
interval and each touch explode to time bins; pairs meet by
(key, bin) — AQE-splittable, no per-key cross). Credits are window
expressions over (key, conversion) partitions — one more shuffle,
output-sized. No driver-side state.

Determinism: the operator REFUSES duplicate (key, ts) rows and NULL
keys/times/states (one aggregate probe, the paths.py discipline) — a
tie between two touches makes first/last/position ill-defined.
Conversions may also be touches for LATER conversions (a purchase can
open the next journey's window); a conversion never attributes to
itself (strict touch_ts < conv_ts).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from d2d_spark.operators.paths import _probe_events

_MODELS = ("last_touch", "first_touch", "linear", "time_decay", "position")


def _secs(what: str, spec: str) -> float:
    parts = spec.strip().split()
    unit = parts[-1].lower().rstrip("s")
    per = {"second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800}
    if unit not in per or len(parts) != 2:
        raise ValueError(
            f"attribution: {what} needs a DAY-TIME interval "
            f"('<n> seconds..weeks'), got {spec!r}"
        )
    s = float(parts[0]) * per[unit]
    if s <= 0:
        raise ValueError(f"attribution: {what} must be positive, got {spec!r}")
    return s


def _pair_frame(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    conv_states: list,
    tch_states: list,
    look_s: float | None,
    bin_width: float | None,
):
    """The shared (conversion, touch) pair join — one construction for
    the single-model path and the r11 multi-model path, so both emit
    identical pair rows by definition. Returns (pairs, conv, _num)."""
    conv = df.filter(F.col(state_col).isin(conv_states)).select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("conv_ts"),
        F.col(state_col).alias("conv_state"),
    )
    tch = df.filter(F.col(state_col).isin(tch_states)).select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("touch_ts"),
        F.col(state_col).alias("touch_state"),
    )
    # timestamps compare/age as integer microseconds (the asof_join
    # discipline); plain numeric order columns in their own type
    ts_type = df.schema[ts_col].dataType.simpleString()
    if ts_type in ("timestamp", "timestamp_ntz"):
        def _num(c):
            return F.unix_micros(c) / F.lit(1_000_000.0)
    elif ts_type == "date":
        raise ValueError("attribution: date columns have no sub-day window; cast to timestamp")
    else:
        def _num(c):
            return c.cast("double")

    in_window = F.col("touch_ts") < F.col("conv_ts")
    if look_s is not None:
        in_window = in_window & (
            _num(F.col("touch_ts")) >= _num(F.col("conv_ts")) - F.lit(look_s)
        )
    if bin_width is None:
        pairs = tch.join(conv, "__k").filter(in_window)
    else:
        from d2d_spark.operators.join import interval_overlap_join

        cw = conv.select(
            "__k",
            "conv_ts",
            "conv_state",
            (_num(F.col("conv_ts")) - F.lit(look_s)).alias("__ws"),
            _num(F.col("conv_ts")).alias("__we"),
        )
        tw = tch.select(
            "__k", "touch_ts", "touch_state",
            _num(F.col("touch_ts")).alias("__ts_n"),
        )
        pairs = interval_overlap_join(
            tw.withColumn("__te_n", F.col("__ts_n")),
            cw,
            "__ts_n",
            "__te_n",
            "__ws",
            "__we",
            on="__k",
            bin_width=bin_width,
        ).filter(in_window).select(
            "__k", "conv_ts", "conv_state", "touch_ts", "touch_state"
        )
    return pairs, conv, _num


def attribution(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    conversion_states: Sequence[str],
    touch_states: Sequence[str],
    model: str | Sequence[str] = "last_touch",
    lookback: str | None = None,
    halflife: str | None = None,
    bin_width: float | None = None,
    include_unattributed: bool = False,
    validate: bool = True,
) -> DataFrame:
    """(key, conv_ts, conv_state, touch_ts, touch_state, n_touches,
    credit) — one row per credited (conversion, touch) pair; credits
    over each conversion sum to exactly 1.0 (last/first emit a single
    row). ``lookback`` ('48 hours') bounds how far back touches
    qualify — None means every earlier touch of the key qualifies
    (unbounded per-key fan-out; pass a lookback at scale).
    ``halflife`` is required for (and only for) time_decay.
    ``include_unattributed`` adds conversions with NO qualifying touch
    as (touch_ts NULL, touch_state NULL, n_touches 0, credit 1.0) rows
    — the "direct conversion" bucket.

    Cost model at 100 TB: the pair join is the whole story. Default
    path = key equi-join + time residual (sort-merge, per-key
    conversions x touches); ``bin_width`` (seconds, requires
    lookback) = the binned interval join — explode factor
    lookback/bin_width + 1 on the conversion side, 1-2 bins per touch
    — when keys are skewed or lookbacks long. Results are identical
    (pytest-pinned).

    r11 (guide §1.2, fewer passes): ``model`` may be a SEQUENCE of
    models. The pair join and the rank/count windows then run ONCE
    and every requested model's credits are projected off the same
    persisted scored frame (opcache tag 'attribution', output-sized);
    the result gains a ``model`` column (last position) and each
    model's rows are bit-identical to its single-model call — the
    per-model credit expressions are shared, not re-derived. Five
    models for the price of one pair join instead of five."""
    if not isinstance(model, str):
        return _attribution_multi(
            df, key_col, ts_col, state_col, conversion_states, touch_states,
            list(model), lookback, halflife, bin_width, include_unattributed,
            validate,
        )
    if model not in _MODELS:
        raise ValueError(f"attribution: model must be one of {_MODELS}, got {model!r}")
    conv_states = list(conversion_states)
    tch_states = list(touch_states)
    if not conv_states or not tch_states:
        raise ValueError("attribution: conversion_states and touch_states must be non-empty")
    if model == "time_decay":
        if halflife is None:
            raise ValueError("attribution: time_decay needs halflife= ('6 hours')")
        half_s = _secs("halflife", halflife)
    elif halflife is not None:
        raise ValueError(f"attribution: halflife only applies to time_decay, not {model}")
    look_s = _secs("lookback", lookback) if lookback is not None else None
    if bin_width is not None and look_s is None:
        raise ValueError(
            "attribution: bin_width (the binned scale path) needs a lookback — "
            "an unbounded window has no interval to bin"
        )
    if validate:
        _probe_events(df, key_col, ts_col, state_col, (), "attribution")

    pairs, conv, _num = _pair_frame(
        df, key_col, ts_col, state_col, conv_states, tch_states, look_s, bin_width
    )

    part = Window.partitionBy("__k", "conv_ts")
    n = F.count(F.lit(1)).over(part)
    asc = Window.partitionBy("__k", "conv_ts").orderBy(F.col("touch_ts").asc())
    desc = Window.partitionBy("__k", "conv_ts").orderBy(F.col("touch_ts").desc())
    if model == "last_touch":
        scored = pairs.withColumn("__rn", F.row_number().over(desc)).filter(
            F.col("__rn") == 1
        ).withColumn("n_touches", F.lit(1).cast("long")).withColumn(
            "credit", F.lit(1.0)
        )
    elif model == "first_touch":
        scored = pairs.withColumn("__rn", F.row_number().over(asc)).filter(
            F.col("__rn") == 1
        ).withColumn("n_touches", F.lit(1).cast("long")).withColumn(
            "credit", F.lit(1.0)
        )
    elif model == "linear":
        scored = pairs.withColumn("n_touches", n.cast("long")).withColumn(
            "credit", F.lit(1.0) / F.col("n_touches")
        )
    elif model == "time_decay":
        age = _num(F.col("conv_ts")) - _num(F.col("touch_ts"))
        wgt = F.pow(F.lit(2.0), -age / F.lit(half_s))
        # r12: the weight normalizer is a sum of DOUBLES — over an
        # UNORDERED window frame Spark adds them in physical row
        # order, so the last ulp of credit depended on partitioning
        # (surfaced when cached-plan partitioning changed). An ordered
        # full frame pins the summation order to the touch timestamps
        # (unique within a conversion by the probe's contract):
        # deterministic on any partitioning, and identical between the
        # single- and multi-model paths.
        osum = (
            Window.partitionBy("__k", "conv_ts")
            .orderBy(F.col("touch_ts").asc())
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        scored = (
            pairs.withColumn("__w", wgt)
            .withColumn("n_touches", n.cast("long"))
            .withColumn("credit", F.col("__w") / F.sum("__w").over(osum))
        )
    else:  # position (U-shape 40/20/40)
        scored = (
            pairs.withColumn("__ra", F.row_number().over(asc))
            .withColumn("__rd", F.row_number().over(desc))
            .withColumn("n_touches", n.cast("long"))
            .withColumn(
                "credit",
                F.when(F.col("n_touches") == 1, F.lit(1.0))
                .when(F.col("n_touches") == 2, F.lit(0.5))
                .when((F.col("__ra") == 1) | (F.col("__rd") == 1), F.lit(0.4))
                .otherwise(F.lit(0.2) / (F.col("n_touches") - 2)),
            )
        )
    out = scored.select(
        F.col("__k").alias(key_col),
        "conv_ts",
        "conv_state",
        "touch_ts",
        "touch_state",
        "n_touches",
        "credit",
    )
    if include_unattributed:
        direct = (
            conv.join(
                scored.select("__k", "conv_ts").distinct(),
                ["__k", "conv_ts"],
                "left_anti",
            )
            .select(
                F.col("__k").alias(key_col),
                "conv_ts",
                "conv_state",
                F.lit(None).cast(df.schema[ts_col].dataType).alias("touch_ts"),
                F.lit(None).cast(df.schema[state_col].dataType).alias("touch_state"),
                F.lit(0).cast("long").alias("n_touches"),
                F.lit(1.0).alias("credit"),
            )
        )
        out = out.unionByName(direct)
    return out


def _attribution_multi(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    conversion_states: Sequence[str],
    touch_states: Sequence[str],
    models: list,
    lookback: str | None,
    halflife: str | None,
    bin_width: float | None,
    include_unattributed: bool,
    validate: bool,
) -> DataFrame:
    """Several credit models off ONE pair join (r11, guide §1.2):
    builds the (conversion, touch) pairs and the rank/count windows
    once, persists the scored frame (opcache tag 'attribution' —
    output-sized, the honest footprint of sharing), and projects each
    model's credits with the SAME expressions the single-model path
    uses — per-model rows are bit-identical to five separate calls.
    Output schema = single-model schema + a trailing ``model``
    column."""
    if not models:
        raise ValueError("attribution: model sequence must be non-empty")
    bad = [m for m in models if m not in _MODELS]
    if bad:
        raise ValueError(f"attribution: model must be one of {_MODELS}, got {bad}")
    if len(set(models)) != len(models):
        raise ValueError(f"attribution: duplicate models in {models}")
    conv_states = list(conversion_states)
    tch_states = list(touch_states)
    if not conv_states or not tch_states:
        raise ValueError("attribution: conversion_states and touch_states must be non-empty")
    if "time_decay" in models:
        if halflife is None:
            raise ValueError("attribution: time_decay needs halflife= ('6 hours')")
        half_s = _secs("halflife", halflife)
    elif halflife is not None:
        raise ValueError(
            f"attribution: halflife only applies to time_decay, not {models}"
        )
    look_s = _secs("lookback", lookback) if lookback is not None else None
    if bin_width is not None and look_s is None:
        raise ValueError(
            "attribution: bin_width (the binned scale path) needs a lookback — "
            "an unbounded window has no interval to bin"
        )
    if validate:
        _probe_events(df, key_col, ts_col, state_col, (), "attribution")

    pairs, conv, _num = _pair_frame(
        df, key_col, ts_col, state_col, conv_states, tch_states, look_s, bin_width
    )

    from pyspark import StorageLevel

    from d2d_spark import cache as opcache

    part = Window.partitionBy("__k", "conv_ts")
    asc = Window.partitionBy("__k", "conv_ts").orderBy(F.col("touch_ts").asc())
    desc = Window.partitionBy("__k", "conv_ts").orderBy(F.col("touch_ts").desc())
    base = (
        pairs.withColumn("__ra", F.row_number().over(asc))
        .withColumn("__rd", F.row_number().over(desc))
        .withColumn("__n", F.count(F.lit(1)).over(part).cast("long"))
    )
    if "time_decay" in models:
        age = _num(F.col("conv_ts")) - _num(F.col("touch_ts"))
        base = base.withColumn("__w", F.pow(F.lit(2.0), -age / F.lit(half_s)))
        # ordered full frame: the same deterministic summation order
        # as the single-model path (see the r12 note there)
        osum = (
            Window.partitionBy("__k", "conv_ts")
            .orderBy(F.col("touch_ts").asc())
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        base = base.withColumn("__sw", F.sum("__w").over(osum))
    # all three window specs share ONE (__k, conv_ts) exchange; the
    # persist lets every model leg read the scored rows instead of
    # re-running the pair join per leg, and the eager count fills the
    # cache before the union's legs race on it inside one job
    base = opcache.register(
        "attribution", base.persist(StorageLevel.MEMORY_AND_DISK)
    )
    base.count()

    outs = []
    for m in models:
        if m == "last_touch":
            scored = base.filter(F.col("__rd") == 1).withColumn(
                "n_touches", F.lit(1).cast("long")
            ).withColumn("credit", F.lit(1.0))
        elif m == "first_touch":
            scored = base.filter(F.col("__ra") == 1).withColumn(
                "n_touches", F.lit(1).cast("long")
            ).withColumn("credit", F.lit(1.0))
        elif m == "linear":
            scored = base.withColumn("n_touches", F.col("__n")).withColumn(
                "credit", F.lit(1.0) / F.col("n_touches")
            )
        elif m == "time_decay":
            scored = base.withColumn("n_touches", F.col("__n")).withColumn(
                "credit", F.col("__w") / F.col("__sw")
            )
        else:  # position (U-shape 40/20/40)
            scored = base.withColumn("n_touches", F.col("__n")).withColumn(
                "credit",
                F.when(F.col("n_touches") == 1, F.lit(1.0))
                .when(F.col("n_touches") == 2, F.lit(0.5))
                .when((F.col("__ra") == 1) | (F.col("__rd") == 1), F.lit(0.4))
                .otherwise(F.lit(0.2) / (F.col("n_touches") - 2)),
            )
        outs.append(
            scored.select(
                F.col("__k").alias(key_col),
                "conv_ts",
                "conv_state",
                "touch_ts",
                "touch_state",
                "n_touches",
                "credit",
                F.lit(m).alias("model"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    if include_unattributed:
        direct = (
            conv.join(
                base.select("__k", "conv_ts").distinct(),
                ["__k", "conv_ts"],
                "left_anti",
            )
            .select(
                F.col("__k").alias(key_col),
                "conv_ts",
                "conv_state",
                F.lit(None).cast(df.schema[ts_col].dataType).alias("touch_ts"),
                F.lit(None).cast(df.schema[state_col].dataType).alias("touch_state"),
                F.lit(0).cast("long").alias("n_touches"),
                F.lit(1.0).alias("credit"),
            )
        )
        for m in models:
            out = out.unionByName(direct.withColumn("model", F.lit(m)))
    return out
