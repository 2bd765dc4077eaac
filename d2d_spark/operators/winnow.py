"""Winnowing — rolling-hash document fingerprinting (Schleimer,
Wilkerson, Aiken, "Winnowing: Local Algorithms for Document
Fingerprinting", SIGMOD 2003; the MOSS algorithm).

Whole-document hashing (operators/dedup.py `exact_dedup`) only finds
byte-identical copies; minhash/simhash measure global similarity.
Winnowing sits between: it selects a sparse, position-aware,
content-defined subset of k-gram hashes per document such that

  * any shared substring of length >= w + k - 1 between two documents
    is GUARANTEED to produce at least one shared fingerprint
    (the winnowing guarantee, Thm 2 of the paper), and
  * no substring shorter than k is ever detected (noise floor).

Selection rule: slide a window of ``w`` consecutive k-gram hashes;
in each window keep the minimum hash, breaking ties by RIGHTMOST
position. (The paper's "robust" variant prefers re-selecting the
previous window's pick on ties; that needs left-to-right state. The
stateless rightmost-min rule used here is deterministic, satisfies
the same detection guarantee — the guarantee needs only SOME minimal
hash per window — and stays a pure Column expression.) Expected
density is 2/(w+1) — the shuffle downstream carries ~2n/(w+1) rows
per n-char document instead of n, which is the whole scale point.

Spark shape (reference parity: the reference has no substring
fingerprinting; this extends its dedup family — d22d's dedup is
whole-row `quchong`):

  1. per-row k-gram hash array — pure Column ``transform`` over a
     char array bound once per row (same lambda trick as
     spans._window_hashes / ngram_lm._char_grams);
  2. per-row window-min selection — ``transform`` over window starts
     with an ``array_min`` over a struct-encoded (hash, -pos) slice:
     O(n * w) element touches, all inside whole-stage codegen, NO
     shuffle;
  3. fingerprints explode to (id, pos, h) rows; near-pair detection
     is the standard LSH-style equi-join on h — id-only payload,
     candidate counts bounded by per-hash document frequency (the
     ``max_df`` knob drops boilerplate "stop fingerprints" exactly
     like df-capped tokens in tfidf).

Hash family is pluggable like dsir/freq/kmv: xxhash64 in production,
`md5_prefix_hasher` for engine-portable oracles.

At 100 TB: step 1-2 are map-only and column-pruned to (id, text);
the fingerprint stream is ~2/(w+1) of the k-gram stream that
spans.duplicate_windows would shuffle, and the near-pair join
shuffles ids+hashes only. Skewed fingerprints (site chrome shared by
millions of docs) MUST be capped with ``max_df`` — the default
refuses unbounded fan-out the same way dedup's quadratic guard does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from d2d_spark.operators.dsir import GramHasher, md5_prefix_hasher, xxhash_hasher

__all__ = [
    "kgram_hashes",
    "winnow_select",
    "winnow_fingerprints",
    "winnow_near_pairs",
    "md5_prefix_hasher",
    "xxhash_hasher",
]

_FP = "array<struct<pos:int,h:bigint>>"


def kgram_hashes(text: Column, k: int, hasher: GramHasher | None = None) -> Column:
    """array<struct<pos:int,h:bigint>> of every CHARACTER k-gram hash,
    pos 0-based, in position order. Empty array when the text is NULL
    or shorter than k.

    Each gram is ONE ``substring(text, i, k)`` (a single UTF8String
    slice) — not k ``element_at`` gathers over a char-split array
    concatenated back together, which costs k array reads plus a
    concat allocation per position and made this map stage the
    engine's most expensive bench leg. Same characters, same hashes;
    the per-byte constant drops from ~k to ~1."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    h = hasher or xxhash_hasher
    t = F.coalesce(text, F.lit(""))
    n = F.length(t)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.struct(
                (i - 1).cast("int").alias("pos"),
                h(F.substring(t, i, F.lit(k))).alias("h"),
            ),
        ),
    ).otherwise(F.array().cast(_FP))


# packed selection key: 42-bit hash fold * 2^21 + reversed position.
# BIGINT ordering then IS the selection rule — (h asc, pos desc) —
# and the per-window min runs on primitive longs instead of building
# a struct per slice element (measured ~4x selection speedup at
# sf0.1). Positions are capped at 2^21-1 ≈ 2M chars; longer documents
# raise rather than silently corrupt the ordering.
_POS_BITS = 21
_MAX_POS = (1 << _POS_BITS) - 1
_H_FOLD = 1 << 42


def _pack(e: Column) -> Column:
    return F.pmod(e["h"], F.lit(_H_FOLD)) * F.lit(1 << _POS_BITS) + (
        F.lit(_MAX_POS) - e["pos"]
    )


def winnow_select(grams: Column, w: int) -> Column:
    """Winnowing selection over a position-ordered k-gram hash array:
    for every window of ``w`` consecutive hashes keep the minimum,
    ties to the RIGHTMOST occurrence; return the distinct selected
    (pos, h) structs. Documents with 1..w-1 grams yield the single
    minimum over all of them (one short window) so short-but-nonempty
    texts still fingerprint.

    Hashes enter the selection (and leave it) folded to 42 bits —
    identity for the 32-bit md5-prefix oracle family, a pmod for
    xxhash64 — so the packed-key comparison above is exact."""
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")

    def _of(keys: Column) -> Column:
        n = F.size(keys)
        n_win = F.greatest(n - (w - 1), F.least(n, F.lit(1)))
        picks = F.transform(
            F.sequence(F.lit(1), n_win),
            lambda s: F.array_min(F.slice(keys, s, w)),
        )
        return F.array_distinct(picks)

    guarded = F.when(
        F.size(grams) > _MAX_POS,
        F.raise_error(
            F.lit(
                f"winnow_select: document exceeds {_MAX_POS} k-grams — "
                "chunk upstream (position packing is 21-bit)"
            )
        ).cast("array<bigint>"),
    ).otherwise(F.transform(grams, _pack))
    selected = F.when(
        F.size(grams) >= 1, F.transform(F.array(guarded), _of).getItem(0)
    ).otherwise(F.array().cast("array<bigint>"))
    return F.transform(
        selected,
        lambda kcol: F.struct(
            (F.lit(_MAX_POS) - kcol.bitwiseAND(F.lit(_MAX_POS))).cast("int").alias("pos"),
            F.shiftright(kcol, _POS_BITS).alias("h"),
        ),
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    w: int = 8,
    hasher: GramHasher | None = None,
) -> DataFrame:
    """(id, pos, h) — the selected fingerprints of every document.
    Map-only: one pure-Column pass, no shuffle; ~2/(w+1) of the k-gram
    count per doc. Docs shorter than k chars emit nothing.

    The gram array materializes in its OWN projection: winnow_select
    references it more than once, and letting CollapseProject inline
    the k-gram transform at each reference would hash every gram
    twice (the multi-ref-alias discipline from simhash64/phash).

    The input spreads to full core width first (`dedup._spread`,
    full=True): hashing + selection are compute-bound at O(chars·w),
    so a one-file local fixture serializing the whole corpus onto one
    task costs far more than one round-robin shuffle of the raw text
    — and on a real many-split table the spread is a no-op."""
    from d2d_spark.operators.dedup import _spread

    g = _spread(
        df.select(F.col(id_col), F.col(text_col)),
        df.sparkSession.sparkContext.defaultParallelism,
        full=True,
    ).select(F.col(id_col), kgram_hashes(F.col(text_col), k, hasher).alias("__g"))
    return (
        g.select(F.col(id_col), F.explode(winnow_select(F.col("__g"), w)).alias("f"))
        .select(F.col(id_col), F.col("f.pos").alias("pos"), F.col("f.h").alias("h"))
    )


def winnow_near_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    w: int = 8,
    threshold_pct: int = 50,
    max_df: int | None = 1000,
    hasher: GramHasher | None = None,
) -> DataFrame:
    """Near-duplicate pairs by fingerprint-set Jaccard:
    (id_a, id_b, n_shared, n_a, n_b) for every pair with
    ``100 * |A∩B| >= threshold_pct * |A∪B|`` over the documents'
    DISTINCT fingerprint hash sets (after the max_df stop-fingerprint
    cut — sizes and overlap are measured on the same filtered sets,
    the standard convention). Integer cross-multiplication, no float
    ratio, so the predicate is exact and engine-portable.

    Shape: distinct (id, h) -> optional df-cap on h -> self equi-join
    on h (id_a < id_b) -> grouped overlap counts -> broadcast-sized
    per-doc set sizes joined back. Everything shuffles on uniform
    hash keys; the join fans out only within a fingerprint's document
    list, which max_df bounds. ``max_df=None`` means unbounded —
    callers must know their corpus has no mega-shared boilerplate.

    Sizing rule: the candidate join materializes ~sum(df^2) rows over
    surviving fingerprints, so max_df should satisfy
    n_hot_fingerprints * max_df^2 << shuffle capacity. On templated
    corpora (site chrome, license headers) tune it DOWN — the dial
    drops only fingerprints shared so widely they carry no
    near-duplicate signal anyway."""
    if not 1 <= threshold_pct <= 100:
        raise ValueError(f"threshold_pct must be in [1, 100], got {threshold_pct}")
    if max_df is not None and max_df < 2:
        raise ValueError(f"max_df must be >= 2 (or None), got {max_df}")
    fp = (
        winnow_fingerprints(df, text_col, id_col, k, w, hasher)
        .select(F.col(id_col).alias("__id"), "h")
        .distinct()
    )
    if max_df is not None:
        fp = (
            fp.withColumn("__df", F.count(F.lit(1)).over(_h_window()))
            .filter(F.col("__df") <= max_df)
            .drop("__df")
        )
    # r11 (guide §2.4/§5): both join sides AND the size lookup consume
    # fp — without a persist the k-gram hashing + winnowing selection
    # (the operator's dominant map cost) and the distinct/df-cap
    # shuffles re-ran THREE times (three parquet scans in the audited
    # plan). Persist once per call under the opcache discipline; the
    # eager count fills the cache before the join's sides race on it.
    from pyspark import StorageLevel

    from d2d_spark import cache as opcache

    fp = opcache.register("winnow", fp.persist(StorageLevel.MEMORY_AND_DISK))
    fp.count()
    sizes = fp.groupBy("__id").agg(F.count(F.lit(1)).alias("__n"))
    a = fp.select(F.col("__id").alias("id_a"), "h")
    b = fp.select(F.col("__id").alias("id_b"), "h")
    shared = (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    out = (
        shared.join(sizes.select(F.col("__id").alias("id_a"), F.col("__n").alias("n_a")), "id_a")
        .join(sizes.select(F.col("__id").alias("id_b"), F.col("__n").alias("n_b")), "id_b")
        .filter(
            F.col("n_shared") * 100
            >= F.lit(threshold_pct) * (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
        )
    )
    return out.select("id_a", "id_b", "n_shared", "n_a", "n_b")


def _h_window():
    from pyspark.sql import Window

    return Window.partitionBy("h")
