"""Vector math over ``array<float>`` embedding columns — pure Column
expressions (F.zip_with / F.aggregate fold), no UDFs: the arithmetic
runs JVM-side per row and scales linearly with partitions.

Determinism note: folds run sequentially left-to-right in double
precision, which is also how DuckDB's list_* kernels accumulate — so
oracle comparisons are bit-stable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def as_double(a: Column) -> Column:
    """Pre-cast a float array to ``array<double>`` once per row.

    ``dot`` casts each element inside its fold lambda; on an all-pairs
    stage that is 2 x dim interpreted casts PER PAIR. Casting each
    side's array once before the pair join lets Catalyst's
    SimplifyCasts elide the in-fold casts (double -> double is a
    no-op), leaving the fold as bare multiply-add. Float -> double is
    exact, so results are bit-identical to casting inside the fold."""
    return F.transform(a, lambda x: x.cast("double"))


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """NULL (not an ANSI DIVIDE_BY_ZERO crash) when either vector has
    zero norm — zero vectors have no direction; threshold filters
    drop the NULL rows."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def sign_projection_bucket(vec: Column, n_bits: int = 8) -> Column:
    """Random-hyperplane LSH bucket id from integer-weight projections.

    Weights are a deterministic pseudo-random integer function of
    (element index i, hyperplane j) — exact in any engine, so the
    bucketing is reproducible across Spark, the DuckDB oracle, and a
    1000-executor cluster alike. Cosine-similar vectors agree on most
    sign bits, so near-neighbors collide in buckets.
    """
    bits = []
    for j in range(n_bits):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, i: x.cast("double") * _int_weight(i, j),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)))
    out = F.lit(0)
    for b in bits:
        out = out * 2 + b
    return out


def _int_weight(i: Column, j: int) -> Column:
    # LCG-style integer hash of (i, j) mapped to a small signed weight.
    # i is cast to long first: int32 would overflow (Spark wraps
    # silently, other engines promote — results would diverge).
    h = (i.cast("long") * 1103515245 + F.lit(j) * 12345 + 7) % 97
    return (h - 48).cast("double")


def quantize_int8(vec: Column) -> Column:
    """Symmetric int8 quantization of a float vector: struct of
    ``(scale, q)`` with ``q[i] = round(v[i] / scale)`` in [-127, 127]
    and ``scale = max(|v|) / 127``. A 4x storage/shuffle cut for
    embedding columns at warehouse scale; cosine on dequantized
    vectors stays within ~1% of exact (pinned in tests). Pure Column
    expressions — runs in the scan projection. Zero vectors keep
    scale 0 and all-zero codes."""
    absmax = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    scale = (absmax / F.lit(127.0)).cast("float")
    q = F.transform(
        vec,
        lambda x: F.when(scale > 0, F.round(x / scale).cast("tinyint")).otherwise(
            F.lit(0).cast("tinyint")
        ),
    )
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_int8(qv: Column) -> Column:
    """Inverse of ``quantize_int8``: float array ``q[i] * scale``."""
    return F.transform(qv["q"], lambda x: (x * qv["scale"]).cast("float"))
