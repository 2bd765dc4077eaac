"""Perceptual image hashing — the multimodal arm of near-dup dedup
(LAION-style pipelines dedup crawled images by perceptual hash before
any training use; the text arms are minhash/simhash in dedup.py).

Input contract: a decoded grayscale image as an ``array<int>`` pixel
column (row-major, one 0-255 value per pixel) plus integer
width/height columns — exactly what a real decode stage emits per
image. The decode itself stays behind the multimodal stub (no codec
in this container); the HASH is real: every operator here is a pure
Column expression — zero Python in the hot path, embarrassingly
parallel, and deterministic bit-for-bit on any engine because dHash
compares integer block sums cross-multiplied (no float means).

  ahash64 — average hash: 8x8 block-mean downscale, bit = cell mean
            above the global mean. Cheap, catches exact/re-encoded
            copies.
  dhash64 — difference hash: 9x8 downscale, bit = horizontal
            gradient sign. Invariant to global brightness/contrast
            shifts (gradients survive), the workhorse in practice.
  phash_near_pairs — banded Hamming join over either hash via
            dedup.hamming_near_pairs (pigeonhole full recall, equi
            join only — the same scale shape as simhash dedup).

Resize invariance is structural, not approximate, for integer
upscales: a k-x pixel-replicated image has proportionally scaled
block sums, and cross-multiplied comparisons are scale-free — the
tests pin hash equality across resolutions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _block_cells(px: Column, w: Column, h: Column, gw: int, gh: int) -> Column:
    """Array of gw*gh (sum, cnt) structs — the block-average downscale
    grid. Cell (tx, ty) covers x in [floor(tx*w/gw), floor((tx+1)*w/gw))
    and the matching y range; blocks tile the image exactly, so every
    pixel contributes to exactly one cell."""

    def bound(t: int, dim: Column, g: int) -> Column:
        return F.floor(F.lit(t) * dim / F.lit(g)).cast("int")

    def cell(tx: int, ty: int) -> Column:
        x0, x1 = bound(tx, w, gw), bound(tx + 1, w, gw)
        y0, y1 = bound(ty, h, gh), bound(ty + 1, h, gh)
        s = F.aggregate(
            F.sequence(y0, y1 - 1),
            F.lit(0).cast("long"),
            lambda acc, y: acc
            + F.aggregate(
                F.sequence(x0, x1 - 1),
                F.lit(0).cast("long"),
                lambda a2, x: a2 + F.element_at(px, (y * w + x + 1).cast("int")).cast("long"),
            ),
        )
        cnt = ((x1 - x0) * (y1 - y0)).cast("long")
        return F.struct(s.alias("s"), cnt.alias("c"))

    return F.array(*[cell(tx, ty) for ty in range(gh) for tx in range(gw)])


def _hashable(px: Column, w: Column, h: Column, gw: int, gh: int) -> Column:
    """True iff the image can hash at all: an image narrower than the
    grid has empty blocks, and a pixel array shorter than w*h is
    corrupt. The guard must wrap the CELL ARRAY itself, not just the
    final hash — ANSI mode makes an out-of-range element_at (or an
    empty descending sequence) a runtime error, and bad rows must
    yield NULL to filter, never kill the job."""
    return (
        w.isNotNull()
        & h.isNotNull()
        & (w >= gw)
        & (h >= gh)
        & px.isNotNull()
        & (F.size(px) >= (w * h).cast("int"))
    )


def _dhash_bits(cells: Column, gw: int, gh: int) -> Column:
    """Bit k = ty*(gw-1)+tx set iff cell(tx,ty) is brighter than
    cell(tx+1,ty). Brightness comparison is integer
    cross-multiplication (sum_a*cnt_b > sum_b*cnt_a) — no division,
    no floats, bit-identical everywhere."""

    def at(tx: int, ty: int) -> Column:
        return F.element_at(cells, ty * gw + tx + 1)

    out = F.lit(0).cast("long")
    for ty in range(gh):
        for tx in range(gw - 1):
            a, b = at(tx, ty), at(tx + 1, ty)
            bit = F.when(a["s"] * b["c"] > b["s"] * a["c"], F.lit(1)).otherwise(F.lit(0))
            out = out + F.shiftleft(bit.cast("long"), ty * (gw - 1) + tx)
    return out


def _ahash_bits(cells: Column, gw: int, gh: int) -> Column:
    """Bit k set iff cell k's mean exceeds the mean of all cell means.
    Means are fixed-shape double expressions (one division per cell,
    one for the global), deterministic for given pixels."""
    means = F.transform(cells, lambda c: c["s"].cast("double") / c["c"])
    gmean = (
        F.aggregate(means, F.lit(0.0), lambda acc, m: acc + m) / F.lit(float(gw * gh))
    )
    out = F.lit(0).cast("long")
    for k in range(gw * gh):
        bit = F.when(F.element_at(means, k + 1) > gmean, F.lit(1)).otherwise(F.lit(0))
        out = out + F.shiftleft(bit.cast("long"), k)
    return out


#: (grid width, grid height, bit builder) per method — dHash reads a
#: 9-wide grid for 8 horizontal gradients per row, aHash an 8x8 grid
_METHODS = {
    "dhash": (9, 8, _dhash_bits),
    "ahash": (8, 8, _ahash_bits),
}


def with_phash(
    df: DataFrame,
    pixels_col: str,
    width_col: str,
    height_col: str,
    method: str = "dhash",
    out_col: str = "phash",
) -> DataFrame:
    """Append the 64-bit perceptual hash column (dhash64/ahash64
    semantics; see module docstring). The cell grid gets its OWN
    projection: the 64 bit expressions reference the materialized
    `__cells` column, not 64 inlined copies of the block-sum
    aggregates — the simhash64 CollapseProject discipline, without
    which analysis/codegen blows up on a hundreds-of-aggregates tree."""
    spec = _METHODS.get(method)
    if spec is None:
        raise ValueError(f"method must be 'dhash' or 'ahash', got {method!r}")
    gw, gh, bits = spec
    px, w, h = F.col(pixels_col), F.col(width_col), F.col(height_col)
    ok = _hashable(px, w, h, gw, gh)
    staged = df.withColumn("__cells", F.when(ok, _block_cells(px, w, h, gw, gh)))
    hashed = staged.withColumn(
        out_col, F.when(F.col("__cells").isNotNull(), bits(F.col("__cells"), gw, gh))
    )
    return hashed.drop("__cells")


def phash_near_pairs(
    df: DataFrame,
    id_col: str,
    pixels_col: str,
    width_col: str,
    height_col: str,
    max_hamming: int = 8,
    method: str = "dhash",
) -> DataFrame:
    """(id_a < id_b, hamming) image near-dup pairs: perceptual hash +
    the shared banded-Hamming equi-join (dedup.hamming_near_pairs).
    Unhashable rows (undersized, corrupt pixel arrays) drop before the
    join. The hash stage persists so the self-join's two sides reuse
    one computation — same policy and cost argument as simhash."""
    from pyspark import StorageLevel

    from d2d_spark.operators.dedup import _spread, hamming_near_pairs

    npart = df.sparkSession.sparkContext.defaultParallelism
    base = _spread(
        df.select(id_col, pixels_col, width_col, height_col), npart, id_col
    )
    from d2d_spark import cache as opcache

    hashed = opcache.register(
        "phash",
        with_phash(base, pixels_col, width_col, height_col, method=method)
        .filter(F.col("phash").isNotNull())
        .select(id_col, "phash")
        .persist(StorageLevel.MEMORY_AND_DISK),
    )
    hashed.count()  # fill before the self-join branches race on it
    return hamming_near_pairs(hashed, "phash", id_col, max_hamming)


def video_near_pairs(
    df: DataFrame,
    id_col: str,
    frames_col: str,
    width_col: str,
    height_col: str,
    threshold_pct: int = 60,
    method: str = "dhash",
    max_df: int = 1000,
) -> DataFrame:
    """Video near-duplicate pairs by FRAME-FINGERPRINT-SET overlap —
    the standard shape for video dedup: perceptually hash every
    sampled frame (``frames_col``: array of pixel grids, one per
    sampled frame — multimodal.sample_frames upstream, or a real
    decoder's output at the same schema), collapse each video to its
    DISTINCT frame-hash set, and join videos whose sets' Jaccard
    reaches ``threshold_pct`` — re-encoded, brightness-shifted or
    trimmed copies share most frame hashes (dhash is brightness- and
    scale-invariant per frame) while unrelated footage shares none.

    Shape: one explode (rows = sampled frames, bounded by the
    sampling rate), the map-only per-frame hash, a distinct, then the
    df-capped hash equi-join — weighted_jaccard_pairs with unit
    weights IS set Jaccard, so the pair stage inherits its sum(df²)
    candidate bound and exact cross-multiplied threshold. ``max_df``
    drops stop-frames (intros, black frames) that appear in more
    than that many videos, the winnow stop-fingerprint dial.
    Returns (id_a, id_b, n_shared, n_a, n_b, jaccard) — exact
    integers and one exact division.

    The frame-hash profile persists before the pair join (the phash /
    simhash policy, but here it is CORRECTNESS-OF-COST, not just
    reuse: the join's branches would each inline the per-frame hash
    expression, and the hundreds-of-aggregates tree recompiles per
    stage — measured minutes of codegen on a toy input). Release per
    corpus via cache.release('video_phash')."""
    from pyspark import StorageLevel

    from d2d_spark import cache as opcache
    from d2d_spark.operators.dedup import weighted_jaccard_pairs

    ex = df.select(
        F.col(id_col).alias("__vid"),
        F.col(width_col).alias("__w"),
        F.col(height_col).alias("__h"),
        F.explode(frames_col).alias("__px"),
    )
    # persist the RAW (vid, hash) projection and put the NULL filter
    # and distinct ABOVE the cache boundary: a filter directly over
    # the hash projection makes the optimizer's predicate-pushdown
    # alias substitution copy the unrolled cell tree into all 64 bit
    # expressions (driver OOM on a vanilla 1 GB session); over the
    # InMemoryRelation leaf it's a plain scan filter
    hashed = opcache.register(
        "video_phash",
        with_phash(ex, "__px", "__w", "__h", method=method, out_col="__fh")
        .select("__vid", "__fh")
        .persist(StorageLevel.MEMORY_AND_DISK),
    )
    hashed.count()  # fill before the join branches race on it
    profile = (
        hashed.filter(F.col("__fh").isNotNull())
        .distinct()
        .withColumn("__one", F.lit(1).cast("long"))
    )
    pairs = weighted_jaccard_pairs(
        profile, "__vid", "__fh", "__one",
        threshold_pct=threshold_pct, max_df=max_df,
        validate=False,  # distinct() owns the key; weights are literal 1
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.col("w_shared").alias("n_shared"),
        F.col("w_a").alias("n_a"),
        F.col("w_b").alias("n_b"),
        (
            F.col("w_shared").cast("double")
            / (F.col("w_a") + F.col("w_b") - F.col("w_shared"))
        ).alias("jaccard"),
    )
