"""KMV (k-minimum-values) distinct sketch with SET-OPERATION
estimates — the theta-sketch capability HLL cannot provide.

HLL (`operators/hll.py`) unions perfectly but cannot intersect:
"distinct users in BOTH corpus A and corpus B" (overlap analysis,
dedup impact estimation, audience intersection) needs a sketch whose
state is a SAMPLE of the hash space, not registers. KMV keeps the k
smallest hash values of the distinct set (Bar-Yossef et al. 2002;
the Apache DataSketches theta sketch is the production refinement of
the same idea). With the k-th minimum normalized to theta in (0, 1]:

  estimate(A)          = (k - 1) / theta_A
  union                = k smallest of the merged value sets
  intersect(A, B)      = |{h in A∩B : h < theta}| / theta,
                         theta = min(theta_A, theta_B)
  difference(A, B)     = |{h in A\\B : h < theta}| / theta

Scale shape: a build is one hash + distinct + TakeOrdered(k) — the
shuffle carries at most k values per partition (map-side partial
top-k), and the sketch itself is k int64s (k=1024 -> 8 KB, ~3%
relative error ~ 1/sqrt(k-2)). Set operations run on stored sketch
ROWS (k per sketch), never on raw data — same incremental posture as
the HLL store: build once per corpus/day, intersect for free later.

Hashing is pluggable like the CMS family (`operators/freq.py`): the
default is xxhash64 folded to non-negative; pass a portable
polynomial ``hasher`` to reproduce the whole sketch in any engine —
which is how the driver oracle checks every value of the sketch, not
just the estimates.

The sketch column carries ``k`` and the hash ``space`` in StructField
metadata (the freq.py stamp discipline): mixing sketches built at
different k or under different hashers would silently bias every
estimate, so it refuses loudly.

Reference parity: none — the reference's distinct counts are exact
SQL pushed to the backing store. 100-TB extension surface
(SURVEY.md §2.11).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hash values are folded into [0, _SPACE) — theta = h_k / _SPACE
_SPACE = (1 << 62) - 57  # large prime keeps pmod unbiased and < 2^62

Hasher = Callable[[Column], Column]


def _default_hasher(col: Column) -> Column:
    return F.pmod(F.xxhash64(col), F.lit(_SPACE))


def _k_meta(k: int, space: int) -> dict:
    return {"d2d.kmv.k": k, "d2d.kmv.space": space}


def _k_of(df: DataFrame, col: str = "h") -> int | None:
    meta = df.schema[col].metadata or {}
    v = meta.get("d2d.kmv.k")
    return int(v) if v is not None else None


def _space_of(df: DataFrame, col: str = "h") -> int:
    meta = df.schema[col].metadata or {}
    return int(meta.get("d2d.kmv.space", _SPACE))


def _check_k(k: int) -> None:
    if k < 8:
        raise ValueError(f"k must be >= 8 for a usable estimate, got {k}")
    if k > 1_000_000:
        raise ValueError(
            f"k={k} is {k * 8 >> 20} MB of sketch per group — use an exact "
            "COUNT(DISTINCT) at that size"
        )


def _require_same_k(a: DataFrame, b: DataFrame, op: str) -> int:
    ka, kb = _k_of(a), _k_of(b)
    if ka is None or kb is None:
        raise ValueError(
            f"kmv_{op}: sketch column carries no d2d.kmv.k stamp; only "
            "kmv_build/kmv_union outputs (or re-stamped columns) are valid"
        )
    if ka != kb:
        raise ValueError(
            f"kmv_{op}: sketches built with different k ({ka} vs {kb}) — "
            "every estimate would be biased; rebuild at one k"
        )
    sa, sb = _space_of(a), _space_of(b)
    if sa != sb:
        raise ValueError(
            f"kmv_{op}: sketches hash into different spaces ({sa} vs {sb}) — "
            "values are not comparable; rebuild with one hasher"
        )
    return ka


def kmv_build(
    df: DataFrame,
    col: str,
    k: int = 1024,
    hasher: Hasher | None = None,
    space: int = _SPACE,
) -> DataFrame:
    """The sketch: one row per kept hash value, column ``h``, at most
    k rows — the k smallest hashes of the DISTINCT values of ``col``.
    NULLs are absence and are dropped. Deterministic for a given
    (col, k, hasher), so independently-built sketches are mergeable
    and comparable.

    A custom ``hasher`` must map uniformly into [0, ``space``) and
    ship its space alongside (both are stamped on the column) — the
    portable polynomial family in plans/curation_q.py does, which is
    how the driver oracle reproduces every sketch value in SQL."""
    _check_k(k)
    h = (hasher or _default_hasher)(F.col(col))
    return (
        df.filter(F.col(col).isNotNull())
        .select(h.alias("h", metadata=_k_meta(k, space)))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_build_grouped(
    df: DataFrame,
    col: str,
    by: str | list[str],
    k: int = 1024,
    hasher: Hasher | None = None,
    space: int = _SPACE,
) -> DataFrame:
    """One sketch per ``by`` group (the incremental-store pattern:
    build per day x corpus once, intersect/union stored rows later).
    One distinct shuffle + one window; per-group egress is k rows."""
    from pyspark.sql import Window

    _check_k(k)
    keys = [by] if isinstance(by, str) else list(by)
    h = (hasher or _default_hasher)(F.col(col))
    w = Window.partitionBy(*keys).orderBy("h")
    return (
        df.filter(F.col(col).isNotNull())
        .select(*keys, h.alias("h", metadata=_k_meta(k, space)))
        .distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_union(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union sketch: k smallest of the combined value sets — exactly
    the sketch of the unioned inputs (lossless merge, like HLL)."""
    k = _require_same_k(a, b, "union")
    return (
        a.unionByName(b)
        .select(F.col("h").alias("h", metadata=_k_meta(k, _space_of(a))))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def _theta(sk: DataFrame) -> DataFrame:
    """(n_kept, theta) one-row frame: theta = 1.0 when the sketch
    holds the whole distinct set (fewer than k values kept)."""
    k = _k_of(sk)
    space = _space_of(sk)
    return sk.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.when(
            F.count(F.lit(1)) < k, F.lit(1.0)
        ).otherwise(F.max("h").cast("double") / F.lit(float(space))).alias("theta"),
    )


def kmv_estimate(sk: DataFrame, out_col: str = "n_distinct") -> DataFrame:
    """Point estimate of the distinct count: exact below k, else
    (k - 1) / theta."""
    k = _k_of(sk)
    if k is None:
        raise ValueError("kmv_estimate: no d2d.kmv.k stamp on the sketch")
    return _theta(sk).select(
        F.when(F.col("theta") >= 1.0, F.col("n_kept").cast("double"))
        .otherwise(F.lit(float(k - 1)) / F.col("theta"))
        .alias(out_col)
    )


def _set_estimate(a: DataFrame, b: DataFrame, join_how: str, op: str) -> DataFrame:
    """Shared theta-style estimator: survivors of the join below the
    common theta, scaled by 1/theta. Sketches are k rows, so both
    sides broadcast and the whole estimate is sketch-sized work."""
    _require_same_k(a, b, op)
    ta, tb = _theta(a), _theta(b)
    theta = (
        ta.select(F.col("theta").alias("__ta"))
        .crossJoin(tb.select(F.col("theta").alias("__tb")))
        .select(F.least("__ta", "__tb").alias("__theta"))
    )
    survivors = a.join(F.broadcast(b), on="h", how=join_how)
    return (
        survivors.crossJoin(F.broadcast(theta))
        .filter(F.col("h").cast("double") / F.lit(float(_space_of(a))) < F.col("__theta"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .crossJoin(F.broadcast(theta))
        .select((F.col("__n").cast("double") / F.col("__theta")).alias("estimate"))
    )


def kmv_intersect_estimate(a: DataFrame, b: DataFrame) -> DataFrame:
    """Estimated |A ∩ B| — the query HLL fundamentally cannot answer
    from merged state."""
    return _set_estimate(a, b, "left_semi", "intersect")


def kmv_difference_estimate(a: DataFrame, b: DataFrame) -> DataFrame:
    """Estimated |A \\ B|."""
    return _set_estimate(a, b, "left_anti", "difference")


def save_kmv(sk: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist; the k stamp survives parquet metadata round-trips."""
    sk.write.mode(mode).parquet(path)


def load_kmv(spark, path: str) -> DataFrame:
    df = spark.read.parquet(path)
    if _k_of(df) is None:
        raise ValueError(f"{path}: no d2d.kmv.k stamp — not a kmv_build output")
    return df


def kmv_estimate_grouped(
    sk: DataFrame, by: str | list[str], out_col: str = "n_distinct"
) -> DataFrame:
    """Per-group distinct estimate over a `kmv_build_grouped` store —
    one hash aggregate over k-row-per-group sketch state (never raw
    data): exact for groups that kept fewer than k values, else
    (k - 1) / theta with theta the group's k-th minimum."""
    k = _k_of(sk)
    if k is None:
        raise ValueError("kmv_estimate_grouped: no d2d.kmv.k stamp on the sketch")
    space = _space_of(sk)
    keys = [by] if isinstance(by, str) else list(by)
    per = sk.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__n_kept"),
        (F.max("h").cast("double") / F.lit(float(space))).alias("__theta"),
    )
    return per.select(
        *keys,
        F.when(F.col("__n_kept") < k, F.col("__n_kept").cast("double"))
        .otherwise(F.lit(float(k - 1)) / F.col("__theta"))
        .alias(out_col),
    )
