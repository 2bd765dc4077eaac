"""Custom stateful streaming operators via applyInPandasWithState —
the extension point the reference lacks entirely (its dedup is an
in-memory set inside one process, d22d/task.py:118-122; state here is
checkpointed, partitioned by key, and survives restarts).

Both operators work on a keyed stream and keep O(keys) state, not
O(rows): the 1000-executor posture is that state shards by the
groupBy key and each micro-batch touches only the keys it contains.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_dedup_keys(stream: DataFrame, key_col: str) -> DataFrame:
    """Emit each key the first time it is ever seen, across
    micro-batches and restarts (streaming INSERT IGNORE: the state is
    the remembered PK set, per key-shard)."""
    out_schema = T.StructType([stream.schema[key_col]])
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        state.update((True,))
        yield pd.DataFrame({key_col: [key[0]]})

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


def stateful_running_totals(
    stream: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Per-key running (count, sum) emitted once per micro-batch the
    key appears in — cumulative across batches via keyed state."""
    out_schema = T.StructType(
        [
            stream.schema[key_col],
            T.StructField("n_events", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("n", T.LongType()), T.StructField("s", T.DoubleType())]
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n], "total": [s]})

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def stateful_funnel(
    stream: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within: float | None = None,
) -> DataFrame:
    """Incremental event funnel: the streaming twin of
    operators/funnel.funnel_stages (SAME greedy earliest-chain rule,
    same ``within`` window anchored at the chain start), with per-user
    state = the n_steps stage-match timestamps — O(users) state
    however long the stream runs. Emits (user, stage, ts_step_k...)
    every micro-batch the user appears in; 'update'-mode sinks keep
    the latest row per user.

    Parity contract: when each user's event TIME is non-decreasing
    across micro-batches (in-order streams; within a batch order is
    irrelevant — the kernel sorts), the final state is IDENTICAL to
    the batch funnel over the union. A late-arriving earlier event
    cannot retroactively restart a better chain (its stage slots are
    already taken) — standard streaming lateness semantics: results
    converge to the batch answer on in-order data, degrade
    conservatively on late data, never un-reach a stage."""
    from d2d_spark.operators.funnel import funnel_stages as _  # noqa: F401 (semantics twin)
    from pyspark.sql import functions as F

    if len(steps) < 2 or len(set(steps)) != len(steps):
        raise ValueError(f"need >= 2 distinct funnel steps, got {steps}")
    if within is not None and within <= 0:
        raise ValueError(f"within must be > 0 seconds, got {within}")
    n = len(steps)
    out_schema = T.StructType(
        [stream.schema[user_col], T.StructField("stage", T.IntegerType())]
        + [T.StructField(f"ts_step_{k + 1}", T.DoubleType()) for k in range(n)]
    )
    state_schema = T.StructType(
        [T.StructField(f"s{k}", T.DoubleType()) for k in range(n)]
    )
    prepped = stream.filter(
        F.col(type_col).isin(steps) & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col),
        F.col(ts_col).cast("timestamp").cast("double").alias("__ts"),
        F.col(type_col).alias("__et"),
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        s = list(state.get) if state.exists else [None] * n
        rows = []
        for pdf in pdfs:
            rows.extend(zip(pdf["__ts"], pdf["__et"]))
        for ts, et in sorted(rows):
            ts = float(ts)
            for k, name in enumerate(steps):
                if s[k] is None and et == name:
                    if k == 0:
                        s[k] = ts
                    elif (
                        s[k - 1] is not None
                        and ts > s[k - 1]
                        and (within is None or ts - s[0] <= within)
                    ):
                        s[k] = ts
        state.update(tuple(s))
        stage = 0
        for t in s:
            if t is None:
                break
            stage += 1
        yield pd.DataFrame(
            {user_col: [key[0]], "stage": [stage]}
            | {f"ts_step_{k + 1}": [s[k]] for k in range(n)}
        )

    return prepped.groupBy(user_col).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
