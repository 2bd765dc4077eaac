"""Exact decimal moment sums through the Arrow boundary.

The stats family's determinism contract quantizes values to
DECIMAL(18,6) and sums values / pairwise products in exact decimal —
partition-order-invariant, replayable bit-for-bit by any engine. In
the JVM those sums run above the compact-long precision ceiling
(products are DECIMAL(37,12)), so every row pays BigDecimal multiply
+ add: measured 1.75 s warm for lineitem's 4-column / 14-sum moment
pass against 0.22 s for the same pass over doubles (8x), and a
50-component long-limb rewrite INSIDE the JVM measured 3-4x slower
still (sum(decimal(38,0)) is the same BigDecimal path).

This module computes the IDENTICAL integer sums on the other side of
the Arrow boundary (guide §4.2 — let Spark do distribution and hand
whole batches to vectorized native code): values arrive as scaled
int64 Arrow columns, each batch is split into three 21-bit limbs,
pairwise products reduce to nine int64-safe numpy multiply+sums per
pair, and per-batch component sums accumulate in arbitrary-precision
Python ints. One output row per (partition, group, statistic); the
driver folds partials with integer addition — associative, so the
result is exactly the decimal sum the JVM would have produced.

Exactness audit (why no overflow, no rounding):
  - inputs are unscaled DECIMAL(18,6) values as int64: |v| < 1e18;
  - limbs: x2 = v >> 42 in [-2^21, 2^21), x1/x0 in [0, 2^21)
    (arithmetic shift + mask is exact for negatives too:
    v = (v>>21)*2^21 + (v & (2^21-1)) with floor semantics);
  - each of the nine limb products is < 2^44; a batch is capped at
    2^18 rows, so every per-batch component sum is < 2^62 (int64);
  - column sums split at 32 bits the same way;
  - reconstruction (c4<<84) + (c3<<63) + (c2<<42) + (c1<<21) + c0 and
    all cross-batch/cross-partition folds are Python ints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: slice batches so every per-batch int64 component sum stays < 2^62
_MAX_BATCH_ROWS = 1 << 18


def exact_moment_sums(
    base: DataFrame, d: int, grouped: bool = False
) -> dict:
    """Exact integer moment sums of ``base``'s ``__v0..__v{d-1}``
    scaled-long columns (optionally split by a boolean ``__g``
    column when ``grouped``). Returns ``{group_key: {"n": int,
    "s0".."s{d-1}": int, "p{i}_{j}": int}}`` where group_key is
    ``None`` ungrouped, else the boolean group value. Sums are the
    unscaled integers of the decimal sums the JVM aggregate would
    produce (values at the input scale, products at twice it).

    NULL values are refused loudly — callers filter first (the
    listwise-deletion contract), and under ANSI a NaN/Inf cast
    raises before ever reaching this kernel."""
    pairs = [(i, j) for i in range(d) for j in range(i, d)]
    names = ["n"] + [f"s{i}" for i in range(d)] + [f"p{i}_{j}" for i, j in pairs]
    out_schema = "g boolean, k string, v string"

    def _partials(batches):
        import numpy as np
        import pyarrow as pa

        M21 = np.int64((1 << 21) - 1)
        M32 = np.int64(0xFFFFFFFF)

        def colsum(a):
            hi = a >> np.int64(32)
            lo = a & M32
            return (int(hi.sum(dtype=np.int64)) << 32) + int(lo.sum(dtype=np.int64))

        def prodsum(la, lb):
            a2, a1, a0 = la
            b2, b1, b0 = lb
            c4 = int((a2 * b2).sum(dtype=np.int64))
            c3 = int((a2 * b1).sum(dtype=np.int64)) + int((a1 * b2).sum(dtype=np.int64))
            c2 = (
                int((a2 * b0).sum(dtype=np.int64))
                + int((a1 * b1).sum(dtype=np.int64))
                + int((a0 * b2).sum(dtype=np.int64))
            )
            c1 = int((a1 * b0).sum(dtype=np.int64)) + int((a0 * b1).sum(dtype=np.int64))
            c0 = int((a0 * b0).sum(dtype=np.int64))
            return (c4 << 84) + (c3 << 63) + (c2 << 42) + (c1 << 21) + c0

        acc: dict = {}

        def bucket(g):
            if g not in acc:
                acc[g] = {k: 0 for k in names}
            return acc[g]

        for b in batches:
            if b.num_rows == 0:
                continue
            for i in range(d + (1 if grouped else 0)):
                if b.column(i).null_count:
                    raise ValueError(
                        "exact_moment_sums: NULL in a kernel column — filter "
                        "upstream (listwise deletion is the caller's contract)"
                    )
            cols = [b.column(i).to_numpy() for i in range(d)]
            gmask = (
                b.column(d).to_numpy(zero_copy_only=False) if grouped else None
            )
            for lo_i in range(0, b.num_rows, _MAX_BATCH_ROWS):
                sl = slice(lo_i, lo_i + _MAX_BATCH_ROWS)
                arrs = [c[sl] for c in cols]
                masks = (
                    {None: None}
                    if not grouped
                    else {True: gmask[sl], False: ~gmask[sl]}
                )
                for gkey, m in masks.items():
                    sub = arrs if m is None else [a[m] for a in arrs]
                    nrows = len(sub[0])
                    if nrows == 0:
                        continue
                    a = bucket(gkey)
                    a["n"] += nrows
                    limbs = []
                    for i, arr in enumerate(sub):
                        a[f"s{i}"] += colsum(arr)
                        limbs.append(
                            (arr >> np.int64(42), (arr >> np.int64(21)) & M21, arr & M21)
                        )
                    for i, j in pairs:
                        a[f"p{i}_{j}"] += prodsum(limbs[i], limbs[j])
        gs, ks, vs = [], [], []
        for gkey, stats in acc.items():
            for k, v in stats.items():
                gs.append(gkey)
                ks.append(k)
                vs.append(str(v))
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(gs, type=pa.bool_()),
                pa.array(ks, type=pa.string()),
                pa.array(vs, type=pa.string()),
            ],
            names=["g", "k", "v"],
        )

    rows = base.mapInArrow(_partials, out_schema).collect()
    tot: dict = {}
    for r in rows:
        g = r["g"] if grouped else None
        bucket = tot.setdefault(g, {k: 0 for k in names})
        bucket[r["k"]] += int(r["v"])
    return tot
