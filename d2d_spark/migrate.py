"""Migration façades — the reference's two-lines-of-code API
(d22d/task.py Migration :31-180, Migration2DB :183-328) over the
Spark engine.

What changes under the hood (SURVEY §3.1 "Spark shape"): the
windows/batch/retry loop, progress math, and first-row DDL disappear —
partitioned execution, task retries, and plan schemas replace them.
What stays: the user-facing semantics — per-row ``format_data``
rename/add/drop/skip, ``quchong`` whole-row dedup, ``size`` row cap,
per-table PKs, insert modes, migrate-all-tables-when-unset.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from d2d_spark.operators.join import dedup_build_side, key_merge
from d2d_spark.sources.base import Sink, Source

RowFn = Callable[[dict], dict | None]


def apply_format_data(df: DataFrame, fn: RowFn | dict[str, Column] | None, sample: int = 100) -> DataFrame:
    """The per-row transform bridge (format_data, d22d/task.py:113-125).

    Expression fast path: a {col: Column} dict becomes withColumns —
    pure Catalyst, codegen, no Python in the hot path. Callable path:
    the reference's dict->dict contract runs in Arrow-batched
    mapInPandas; output schema is inferred by running the transform
    over a driver-side sample (the plan-level analog of the
    reference's infer-from-first-row), then applied distributed.
    Returning a falsy value drops the row (:115-117).
    """
    if fn is None:
        return df
    if isinstance(fn, dict):
        out = df
        for name, expr in fn.items():
            out = out.withColumn(name, expr)
        return out

    sample_rows = [r.asDict(recursive=True) for r in df.limit(sample).collect()]
    transformed = [t for t in (fn(r) for r in sample_rows) if t]
    if not transformed:
        raise ValueError("format_data dropped every sample row; cannot infer output schema")
    spark = df.sparkSession
    schema = spark.createDataFrame(pd.DataFrame(transformed)).schema
    cols = [f.name for f in schema.fields]

    def run(batches):
        for pdf in batches:
            out = []
            for rec in pdf.to_dict("records"):
                try:
                    t = fn(rec)
                except Exception as e:
                    # reference parity: failures carry the offending row
                    # (d22d/task.py:172-180 logs index + payload, re-raises)
                    raise RuntimeError(f"format_data failed on row {rec!r}") from e
                if t:
                    out.append(t)
            if out:
                # a key the sample never saw would be silently dropped
                # by the fixed-column DataFrame below — fail loudly
                # instead (schema drift is a bug, not a column to lose)
                extra = set().union(*(t.keys() for t in out)) - set(cols)
                if extra:
                    raise ValueError(
                        f"format_data emitted keys absent from the sampled schema: "
                        f"{sorted(extra)}; emit them in the first {sample} rows or "
                        f"raise the sample size"
                    )
            yield pd.DataFrame(out, columns=cols) if out else pd.DataFrame(
                {c: pd.Series(dtype="object") for c in cols}
            )

    return df.mapInPandas(run, schema=schema)


def _split_pks(pks: str | list[str] | None) -> list[str]:
    if not pks:
        return []
    return [p.strip() for p in pks.split(",")] if isinstance(pks, str) else list(pks)


def _effective_mode(mode: str, pks: list[str]) -> str:
    """Keyed modes need keys: with no PKs declared, the reference's
    INSERT IGNORE / REPLACE degrade to plain INSERTs (no unique key to
    conflict on) — rows accumulate. Degrading to overwrite instead
    would wipe the target on every keyless default run."""
    if not pks and mode in ("ignore", "replace", "upsert"):
        return "append"
    return mode


class Migration:
    """table(s) from one connector to another.

    >>> Migration(CsvConnector("/in"), JsonlConnector("/out"),
    ...           table_from="user", format_data=lambda d: {**d, "k": 1}).run()
    """

    def __init__(
        self,
        database_from: Source,
        database_to: Sink,
        table_from: str | None = None,
        table_to: str | None = None,
        pks: str | list[str] = "",
        pkd: dict[str, str] | None = None,
        quchong: bool = False,
        size: int | None = None,
        mode: str = "ignore",
        format_data: RowFn | dict[str, Column] | None = None,
        write_kwargs: dict | None = None,
    ):
        self.source = database_from
        self.sink = database_to
        self.table_from = table_from
        self.table_to = table_to
        self.pks = _split_pks(pks)
        self.pkd = {k: _split_pks(v) for k, v in (pkd or {}).items()}
        self.quchong = quchong
        self.size = size
        self.mode = mode
        self.format_data = format_data
        self.write_kwargs = write_kwargs or {}

    def run_one(self, table_from: str, table_to: str | None = None, pks: list[str] | None = None) -> DataFrame:
        df = self.source.read(table_from)
        df = apply_format_data(df, self.format_data)
        if self.quchong:
            # the reference's in-memory set (OOM-unsafe, README.md:154)
            # becomes a shuffled, spill-safe distinct
            df = df.dropDuplicates()
        if self.size is not None:
            df = df.limit(self.size)
        pks = pks if pks is not None else self.pks
        self.sink.write(
            df,
            table_to or table_from,
            mode=_effective_mode(self.mode, pks),
            pks=pks or None,
            **self.write_kwargs,
        )
        return df

    def run(self) -> list[str]:
        """Migrate the named table, or every table the source holds
        (d22d/task.py:78-101), with per-table PKs from ``pkd``."""
        if self.table_from is not None:
            self.run_one(self.table_from, self.table_to, None)
            return [self.table_from]
        done = []
        for table in self.source.get_indexes():
            self.run_one(table, None, self.pkd.get(table, self.pks))
            done.append(table)
        return done


class Migration2DB:
    """Join two tables by key into a new table (d22d/task.py:183-328).

    ``how='left'`` is code-faithful (unmatched right rows dropped);
    ``how='full'`` is doc-faithful (README.md:283-320 shows right-only
    rows surviving). ``legacy_semantics`` collapses duplicate build
    keys last-wins like the reference's dict overwrite — requiring an
    ``order_col`` to define "last" deterministically.
    """

    def __init__(
        self,
        database_from1: Source,
        database_from2: Source,
        database_to: Sink,
        table_from1: str,
        table_from2: str,
        table_to: str,
        migration_key1: str,
        migration_key2: str,
        how: str = "full",
        pks: str | list[str] = "",
        quchong: bool = False,
        size: int | None = None,
        mode: str = "ignore",
        format_data: Callable[[DataFrame], DataFrame] | None = None,
        legacy_semantics: bool = False,
        order_col: str | None = None,
        broadcast_right: bool | str = "auto",
    ):
        self.src1, self.src2, self.sink = database_from1, database_from2, database_to
        self.t1, self.t2, self.t_out = table_from1, table_from2, table_to
        self.k1, self.k2 = migration_key1, migration_key2
        self.how = how
        self.pks = _split_pks(pks)
        self.quchong = quchong
        self.size = size
        self.mode = mode
        self.format_data = format_data
        self.legacy_semantics = legacy_semantics
        self.order_col = order_col
        self.broadcast_right = broadcast_right

    def run(self) -> DataFrame:
        left = self.src1.read(self.t1)
        right = self.src2.read(self.t2)
        if self.legacy_semantics:
            right = dedup_build_side(right, self.k2, self.order_col)
        df = key_merge(
            left, right, self.k1, self.k2, how=self.how, broadcast_right=self.broadcast_right
        )
        if self.format_data is not None:
            df = self.format_data(df)
        if self.quchong:
            df = df.dropDuplicates()
        if self.size is not None:
            df = df.limit(self.size)
        self.sink.write(
            df, self.t_out, mode=_effective_mode(self.mode, self.pks), pks=self.pks or None
        )
        return df
