"""Frequency estimation over unbounded key spaces — count-min sketch
and heavy hitters.

Corpus curation keeps asking "how often does this token / n-gram /
domain occur?" at cardinalities where an exact `groupBy` answer is
itself a large table (trillions of distinct n-grams at 100 TB). The
count-min sketch (Cormode & Muthukrishnan 2005) bounds the state at
``depth * width`` counters regardless of input cardinality, at the
cost of one-sided error: estimates only ever OVERcount, by at most
``2N / width`` with probability ``1 - 2^-depth`` (N = total items;
the Markov bound per row is 2N/width at probability 1/2, made
exponentially unlikely by taking the min over ``depth`` rows).

Everything is DataFrame algebra — the sketch IS a DataFrame of
``(row, bucket, c)`` counters:

  build  — one projection computes all ``depth`` bucket ids per item
           (pure xxhash64 Columns), one explode, one groupBy over a
           key space bounded by depth*width. Map-side partial
           aggregation absorbs item skew; the shuffle moves at most
           depth*width*partitions rows however big the corpus is.
  merge  — union + re-sum: counters are linear, so sketches built on
           different corpora/days combine exactly (same mergeability
           contract as the KLL/HLL sketches in operators/agg.py).
  lookup — explode the probe items the same way, broadcast-join the
           sketch, take min over the depth rows per item.

`heavy_hitters` stays EXACT: Spark's hash aggregate does map-side
combine, so top-k-by-count is one uniform shuffle of the distinct
keys and a TakeOrdered — the right tool whenever the distinct-key
table fits a shuffle at all. Reach for the sketch when it doesn't.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: a hash family maps (item column, row index) -> bucket-able int64
Hasher = Callable[[Column, int], Column]

#: counter-table shape guard: a sketch wider than this is almost
#: certainly a mis-keyed call (the POINT is bounded state)
_MAX_COUNTERS = 50_000_000


def _default_hasher(col: Column, i: int) -> Column:
    """xxhash64 seeded by the row index — the production family."""
    return F.xxhash64(col, F.lit(i))


def _bucketed(
    df: DataFrame, col: str, depth: int, width: int, hasher: Hasher
) -> DataFrame:
    """(row, bucket) pairs for every item under the depth independent
    hash functions. NULL items are dropped (they are absence, not a
    countable key)."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(hasher(F.col(col), i), F.lit(width)).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.filter(F.col(col).isNotNull())
        .select(F.explode(pairs).alias("rb"))
        .select(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    )


def _check_shape(depth: int, width: int) -> None:
    if depth < 1 or width < 1:
        raise ValueError(f"depth and width must be >= 1, got depth={depth} width={width}")
    if depth * width > _MAX_COUNTERS:
        raise ValueError(
            f"depth*width = {depth * width} counters exceeds {_MAX_COUNTERS}; "
            "a count-min sketch this large defeats its purpose — lower width "
            "or use an exact groupBy, which Spark handles at that scale"
        )


def _shape_meta(depth: int, width: int) -> dict:
    return {"cms_depth": depth, "cms_width": width}


def _shape_of(sketch: DataFrame) -> tuple[int, int] | None:
    """(depth, width) stamped on the counter column at build time, or
    None for a sketch frame from an external source."""
    meta = sketch.schema["c"].metadata or {}
    if "cms_depth" in meta and "cms_width" in meta:
        return int(meta["cms_depth"]), int(meta["cms_width"])
    return None


def cms_build(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 8192,
    hasher: Hasher | None = None,
) -> DataFrame:
    """Build the sketch: a DataFrame of (row, bucket, c) with at most
    depth*width rows. Deterministic for a given (col, depth, width) —
    the hash seeds are the row indexes, so independently-built
    sketches over the same data are identical and mergeable with any
    other sketch built with the same shape. The shape is stamped on
    the counter column's metadata so a mismatched lookup/merge fails
    loudly instead of silently under-counting.

    ``hasher`` swaps the hash family (default xxhash64-by-row-index):
    any pairwise-independent-ish (Column, row index) -> int64 map
    works — e.g. a polynomial hash over integer keys when the sketch
    must be reproducible outside Spark. Build and lookup MUST use the
    same family; the shape stamp can't check that, so keep the
    hasher with the sketch."""
    _check_shape(depth, width)
    return (
        _bucketed(df, col, depth, width, hasher or _default_hasher)
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("c", metadata=_shape_meta(depth, width)))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Combine sketches built with the SAME (depth, width): counters
    are linear, so union + re-sum equals the sketch of the combined
    input exactly (tests pin this). Sketches carrying mismatched
    shape stamps refuse to merge — the result would be garbage."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    shapes = {s for s in map(_shape_of, sketches) if s is not None}
    if len(shapes) > 1:
        raise ValueError(f"cms_merge: sketches have different shapes {sorted(shapes)}")
    meta = _shape_meta(*shapes.pop()) if shapes else None
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("c").alias("c", metadata=meta))


def cms_lookup(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 8192,
    hasher: Hasher | None = None,
) -> DataFrame:
    """Estimated count per distinct probe item: min over the depth
    counter rows. The sketch is bounded by construction, so it
    broadcasts; the probe is one map-side join + one per-item min.
    Estimates are >= the true count, never under — PROVIDED the
    (depth, width) match the build; the shape stamped on the sketch
    at build time is checked here, so a mismatch raises instead of
    silently probing rows that don't exist (est 0 for everything) or
    hashing into the wrong buckets."""
    _check_shape(depth, width)
    stamped = _shape_of(sketch)
    if stamped is not None and stamped != (depth, width):
        raise ValueError(
            f"cms_lookup: sketch was built with (depth, width)={stamped}, "
            f"lookup asked for {(depth, width)} — estimates would be garbage"
        )
    h = hasher or _default_hasher
    probes = items.filter(F.col(col).isNotNull()).select(col).distinct()
    bucketed = probes.select(
        F.col(col),
        *[
            F.pmod(h(F.col(col), i), F.lit(width)).alias(f"__b{i}")
            for i in range(depth)
        ],
    )
    out = bucketed
    for i in range(depth):
        row_i = F.broadcast(
            sketch.filter(F.col("row") == i).select(
                F.col("bucket").alias(f"__b{i}"), F.col("c").alias(f"__c{i}")
            )
        )
        out = out.join(row_i, on=f"__b{i}", how="left")
    # an empty counter row means the bucket was never touched: 0
    # (F.least needs >= 2 columns, so depth 1 uses its row directly)
    counters = [F.coalesce(F.col(f"__c{i}"), F.lit(0)) for i in range(depth)]
    est = counters[0] if depth == 1 else F.least(*counters)
    return out.select(F.col(col), est.alias("est_count"))


def heavy_hitters(df: DataFrame, col: str, k: int = 100) -> DataFrame:
    """EXACT top-k items by count — map-side combine + TakeOrdered;
    ties break by item text so the cut is deterministic. Scales as
    long as the distinct-key table shuffles at all; beyond that,
    estimate with cms_build/cms_lookup over a candidate set."""
    from d2d_spark.operators.topk import top_k

    counts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return top_k(counts, [F.col("cnt").desc(), F.col(col)], k)
