"""Substring-level exact dedup — find and strip text SPANS that are
repeated anywhere in the corpus (Lee et al., "Deduplicating Training
Data Makes Language Models Better", 2022). Document- and
paragraph-level dedup (operators/dedup.py) miss boilerplate repeated
INSIDE otherwise-unique documents: licence headers, navigation chrome,
quoted replies. This pass finds every repeated window of ``k``
characters and removes all but the first occurrence.

The reference paper builds a corpus-wide suffix array; that is a
single-machine design. The Spark-first equivalent is fixed-width
window hashing:

  1. every doc emits (pos, xxhash64(text[pos:pos+k])) for all
     positions — a pure Column expression over a per-row char array
     (linear, same lambda-binding trick as ngram_lm's gram explode);
  2. one shuffle groups window hashes: a hash seen >= 2 times is a
     repeated window, its canonical owner is the min (doc_id, pos)
     occurrence;
  3. non-owner occurrences merge into per-document intervals
     ([pos, pos+k) unions) via window-function island detection —
     duplicated-char stats are a grouped sum and the stitched clean
     text is a pure Column fold over the (few) merged intervals.

Any repeated span of length >= k is covered by a run of repeated
windows, so merged intervals reconstruct (a superset of) the maximal
repeats the suffix array would report; spans shorter than ``k`` are
below the dedup threshold by definition (the paper uses 50 BPE
tokens; characters are the unit here).

Scale posture at 100 TB: the window explode is the honest cost —
O(total chars) rows of (id, pos, hash), shuffled once on the uniform
hash key, exactly the profile of the paragraph-dedup pass but per
position instead of per paragraph. For corpora where that constant
matters, ``anchor_mod=s`` keeps only content-defined anchor windows
(hash % s == 0): expected 1/s of the shuffle, alignment-free (both
copies of a repeated span keep the SAME anchors), at the cost of
probabilistic coverage — a repeated span then goes undetected with
probability ~(1-1/s)^(L-k+1) for span length L. Ownership stays
deterministic either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_IV = "array<struct<s:int,e:int>>"


def _window_hashes(col: Column, k: int) -> Column:
    """array<struct<pos:int, h:bigint>> of all k-char window hashes;
    pos is 0-based. Char array bound as a lambda variable so the split
    runs once per row (see ngram_lm._char_grams for the measurements
    behind this shape)."""

    def _of(chars: Column) -> Column:
        length = F.size(chars)
        return F.when(
            length >= k,
            F.transform(
                F.sequence(F.lit(1), length - (k - 1)),
                lambda i: F.struct(
                    (i - 1).cast("int").alias("pos"),
                    F.xxhash64(
                        F.concat(*[F.element_at(chars, i + j) for j in range(k)])
                    ).alias("h"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<pos:int,h:bigint>>"))

    return F.transform(F.array(F.split(col, "")), _of).getItem(0)


def duplicate_windows(
    df: DataFrame, text_col: str, id_col: str, k: int = 25, anchor_mod: int = 1
) -> DataFrame:
    """(__id, pos) of every k-char window whose content appears >= 2
    times corpus-wide and which is NOT the canonical first occurrence
    (min (doc_id, pos) owns the content; ids must be orderable).
    ``anchor_mod > 1`` subsamples windows content-defined (see module
    docstring) — the scale knob.

    The O(total chars) window explode runs ONCE and shuffles ONCE:
    occurrence counts and the canonical owner are window aggregates
    over the hash partition, not a separate aggregate joined back
    (which would explode and shuffle the corpus a second time)."""
    from pyspark.sql import Window

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if anchor_mod < 1:
        raise ValueError(f"anchor_mod must be >= 1, got {anchor_mod}")
    wins = (
        df.select(
            F.col(id_col).alias("__id"),
            F.explode(_window_hashes(F.col(text_col), k)).alias("w"),
        )
        .select("__id", F.col("w.pos").alias("pos"), F.col("w.h").alias("h"))
    )
    if anchor_mod > 1:
        wins = wins.filter(F.pmod("h", F.lit(anchor_mod)) == 0)
    w = Window.partitionBy("h")
    marked = wins.select(
        "__id",
        "pos",
        F.count(F.lit(1)).over(w).alias("__n"),
        F.min(F.struct("__id", "pos")).over(w).alias("__owner"),
    )
    return marked.filter(
        (F.col("__n") >= 2)
        & ~(
            (F.col("__owner.__id") == F.col("__id"))
            & (F.col("__owner.pos") == F.col("pos"))
        )
    ).select("__id", "pos")


def _interval_rows(dup: DataFrame, k: int) -> DataFrame:
    """Merge duplicated positions into disjoint (__id, s, e) interval
    rows with window functions (island detection: a position opens a
    new interval iff it clears the running max end of everything
    before it) — O(n log n) in duplicate positions per document, where
    the previous per-row array fold was quadratic in intervals on
    exactly the boilerplate-heavy documents this operator targets."""
    from pyspark.sql import Window

    wo = Window.partitionBy("__id").orderBy("pos")
    prev_end = F.max(F.col("pos") + k).over(
        wo.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = dup.withColumn(
        "__ng", F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0)
    )
    grp = marked.withColumn(
        "__gid", F.sum("__ng").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    )
    return grp.groupBy("__id", "__gid").agg(
        F.min("pos").cast("int").alias("s"),
        (F.max("pos") + k).cast("int").alias("e"),
    )


def duplicate_span_stats(
    df: DataFrame, text_col: str, id_col: str, k: int = 25, anchor_mod: int = 1
) -> DataFrame:
    """Append ``dup_chars`` (characters covered by corpus-repeated
    non-canonical spans, overlaps merged) and ``dup_frac`` — the
    contamination dashboard before deciding to strip."""
    dup = duplicate_windows(df, text_col, id_col, k, anchor_mod)
    per_doc = _interval_rows(dup, k).groupBy("__id").agg(
        F.sum(F.col("e") - F.col("s")).alias("dup_chars")
    )
    return df.join(per_doc, on=[F.col(id_col) == F.col("__id")], how="left").select(
        *df.columns,
        F.coalesce("dup_chars", F.lit(0)).alias("dup_chars"),
        (
            F.coalesce("dup_chars", F.lit(0))
            / F.nullif(F.length(F.col(text_col)), F.lit(0))
        ).alias("dup_frac"),
    )


def strip_duplicate_spans(
    df: DataFrame, text_col: str, id_col: str, k: int = 25, anchor_mod: int = 1
) -> DataFrame:
    """Remove every corpus-repeated non-canonical span, stitching the
    surviving segments in order (the Lee et al. dedup move: the FIRST
    occurrence of any repeated span survives, every later copy is
    cut). Returns ``df`` with ``text_col`` rewritten plus
    ``n_dropped_chars``; a fully-duplicated document becomes the empty
    string rather than disappearing — dropping rows is the caller's
    policy call."""
    dup = duplicate_windows(df, text_col, id_col, k, anchor_mod)
    iv = _interval_rows(dup, k).groupBy("__id").agg(
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("__iv")
    )
    joined = df.join(iv, on=[F.col(id_col) == F.col("__id")], how="left")
    t = F.col(text_col)
    # fold intervals into (kept-so-far, cursor); finish with the tail.
    # Column.substr takes Column args, so the cursor can be data-driven
    stitched = F.aggregate(
        F.coalesce(F.col("__iv"), F.array().cast(_IV)),
        F.struct(F.lit("").alias("t"), F.lit(0).alias("last")),
        lambda acc, x: F.struct(
            F.concat(acc["t"], t.substr(acc["last"] + 1, x["s"] - acc["last"])).alias("t"),
            x["e"].alias("last"),
        ),
        lambda acc: F.concat(acc["t"], t.substr(acc["last"] + 1, F.length(t) - acc["last"])),
    )
    # the fold expression must appear exactly ONCE in the projection:
    # reusing the same higher-order-function Column twice in one select
    # rebinds its lambda variables and silently corrupts one copy, so
    # the drop count derives from the stitched column in an outer step
    once = joined.select(
        *[F.col(c) for c in df.columns if c != text_col],
        F.length(t).alias("__orig_len"),
        stitched.alias(text_col),
    )
    return once.select(
        *[
            F.col(c) if c != text_col else F.col(text_col)
            for c in df.columns
        ],
        (F.col("__orig_len") - F.length(F.col(text_col))).alias("n_dropped_chars"),
    )
