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
