"""Mergeable distinct-count sketches — a persisted HLL register store.

`operators/agg.py` answers "how many distinct X right now" in one
pass (`sketch_distinct_counts`). At 100 TB the question is usually
INCREMENTAL: each day/corpus/partition builds its own sketch once,
and "distinct users this quarter, per country" is a cheap merge of
the stored sketches — no re-scan of a quarter of raw data. That
needs the sketch to be a first-class, persistable value with a
build / merge / estimate lifecycle, which is what this module adds
on top of Spark's Apache DataSketches HLL builtins
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``,
JVM-side, no Python in the loop).

Scale shape: a build is ONE hash aggregate whose state per group is
a 2^lgk-register sketch (lgk=12 -> ~2.5 KB dense, ~1.6% relative
error), with map-side partial merge absorbing row skew; the shuffle
moves sketches, not rows. A merge is the same aggregate over stored
sketch rows — input size = number of stored groups, independent of
the original corpus size. Estimates never re-touch raw data.

The sketch column carries its ``lgk`` in StructField metadata (the
same stamp discipline as the CMS shape guard, operators/freq.py);
metadata survives parquet round-trips, so a mismatched merge of
stores built at different precisions fails loudly instead of
silently degrading to the coarser sketch.

Reference parity: the reference has no sketch layer at all — its
distinct counts are exact SQL ``COUNT(DISTINCT ...)`` pushed to the
backing database. This module is part of the 100-TB extension
surface (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: DataSketches accepts lgConfigK in [4, 21]
_LGK_RANGE = (4, 21)


def _lgk_meta(lgk: int) -> dict:
    return {"d2d.hll.lgk": int(lgk)}


def _lgk_of(df: DataFrame, col: str = "sketch") -> int | None:
    meta = df.schema[col].metadata or {}
    v = meta.get("d2d.hll.lgk")
    return int(v) if v is not None else None


def _check_lgk(lgk: int) -> None:
    lo, hi = _LGK_RANGE
    if not (lo <= int(lgk) <= hi):
        raise ValueError(f"lgk must be in [{lo}, {hi}], got {lgk}")


def hll_build(
    df: DataFrame,
    col: str,
    by: list[str] | str | None = None,
    lgk: int = 12,
) -> DataFrame:
    """One HLL sketch per ``by`` group (or one global row) counting
    distinct values of ``col``. NULLs are absence, not a distinct
    value (matching COUNT(DISTINCT) semantics). Returns
    ``by... , sketch<binary>`` with lgk stamped on the column.
    """
    _check_lgk(lgk)
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))
    agg = F.expr(f"hll_sketch_agg({col}, {int(lgk)})").alias(
        "sketch", metadata=_lgk_meta(lgk)
    )
    return df.groupBy(*keys).agg(agg)


def hll_merge(
    parts: DataFrame,
    by: list[str] | str | None = None,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union stored sketches down to one per ``by`` group. Input rows
    are sketches (e.g. one per day x country loaded from the store);
    output is one sketch per country. Mixed-lgk stores refuse to
    merge — the union would silently adopt the coarsest precision.
    """
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))
    lgk = _lgk_of(parts, sketch_col)
    if lgk is None:
        raise ValueError(
            f"column {sketch_col!r} carries no d2d.hll.lgk stamp; merge only "
            "sketches produced by hll_build/hll_merge (or re-stamp the column)"
        )
    # allowDifferentLgConfigK=false: the column-level lgk stamp is one
    # merged value per frame, so an append-mode store mixing lgk
    # batches would slip past it — the JVM aggregate failing loudly is
    # the real guard; the stamp check above is the friendly fast path
    agg = F.expr(f"hll_union_agg({sketch_col}, false)").alias(
        "sketch", metadata=_lgk_meta(lgk)
    )
    return parts.groupBy(*keys).agg(agg)


def hll_estimate(
    sketches: DataFrame, sketch_col: str = "sketch", out_col: str = "n_distinct"
) -> DataFrame:
    """Replace the sketch column with its cardinality estimate."""
    others = [c for c in sketches.columns if c != sketch_col]
    return sketches.select(
        *others,
        F.expr(f"hll_sketch_estimate({sketch_col})").cast("long").alias(out_col),
    )


def save_hll(sketches: DataFrame, path: str, mode: str = "append") -> None:
    """Persist sketch rows. Parquet keeps both the binary payload and
    the lgk field metadata, so a later `load_hll` + `hll_merge` is
    shape-checked. ``append`` is the incremental-corpus workflow:
    each batch writes its sketch rows; estimates always merge first.
    """
    sketches.write.mode(mode).parquet(path)


def load_hll(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def incremental_distinct(
    spark,
    store_path: str,
    by: list[str] | str | None = None,
    sketch_col: str = "sketch",
) -> DataFrame:
    """The read side of the incremental workflow: merge everything in
    the store per group and estimate. Cost is proportional to stored
    sketch rows (groups x batches), never to the raw corpora."""
    return hll_estimate(
        hll_merge(load_hll(spark, store_path), by=by, sketch_col=sketch_col)
    )
