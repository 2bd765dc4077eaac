"""Isotonic (monotone) probability calibration — pool-adjacent-
violators over a score-collapsed frame.

The quality-classifier stack (nb_classifier / logreg / gpt3 filter,
operators/classifier.py, logreg.py) emits SCORES that rank well (the
binary_auc legs pin that) but are not calibrated probabilities: a
0.9 from the NB sigmoid is not "90% likely seed-quality". Keep/drop
decisions and mixture budgets want calibrated P(label | score);
isotonic regression (Ayer et al. 1955; Zadrozny & Elkan 2002,
"Transforming classifier scores into accurate multiclass probability
estimates") is the standard distribution-free fix: fit the best
monotone step function from score to empirical positive rate.

Spark shape: ONE groupBy collapses rows to score bins (either every
distinct score, or ``num_bins`` fixed-width buckets for unbounded
score alphabets — the documented contract that bounds the driver
pull), then the pool-adjacent-violators stack runs DRIVER-SIDE on
the model-sized bin list — the kmeans/EM precedent: corpus-sized
shuffles stay on executors, the O(bins) sequential fit is a model
fold. All pooling decisions compare exact integer cross-products
(p1 * w2 > p2 * w1 — no float accumulation), and each returned
``prob`` is ONE double division of exact integer sums, so any engine
replaying the same pools matches bit-for-bit. The minimax identity
  fit(i) = max_{j<=i} min_{k>=i} sum(pos[j..k]) / sum(n[j..k])
is test-pinned against an exact-Fraction brute force and is what the
driver oracle replays in SQL (O(bins^3) pairs — fine because bins
are model-sized by construction).

`apply_isotonic` maps a score column through the fitted step
function with a broadcast range join (the model IS model-sized);
out-of-range scores clamp to the edge bins — a score below anything
seen in training calibrates to the lowest pool, not NULL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from d2d_spark.functions.frames import local_frame


def _pav(bins: list[tuple[int, int, int]]) -> list[tuple[int, int, int]]:
    """Pool-adjacent-violators over ascending (bin, w, p) triples:
    returns (pool_w, pool_p, pool_end_index) blocks with p/w strictly
    enforced non-decreasing. Comparisons are exact integer
    cross-products; ties (equal rates) do NOT pool — pooling equal
    rates changes nothing in the fitted values, and keeping the
    blocks separate keeps the step boundaries deterministic."""
    stack: list[list[int]] = []  # [w, p, end_idx]
    for idx, (_, w, p) in enumerate(bins):
        stack.append([w, p, idx])
        # violator: previous pool rate > current pool rate
        while len(stack) > 1 and stack[-2][1] * stack[-1][0] > stack[-1][1] * stack[-2][0]:
            w2, p2, e2 = stack.pop()
            w1, p1, _ = stack.pop()
            stack.append([w1 + w2, p1 + p2, e2])
    return [(w, p, e) for w, p, e in stack]


def isotonic_calibrate(
    df: DataFrame,
    label_col: str,
    score_col: str,
    num_bins: int | None = None,
    lo: float | None = None,
    hi: float | None = None,
    max_points: int = 100_000,
) -> DataFrame:
    """Fit isotonic calibration of ``label_col`` (castable to
    boolean) against ``score_col``; returns the model frame

        (bin, score_lo, score_hi, n, n_pos, prob)

    one row per OBSERVED score bin, ``prob`` non-decreasing in
    ``bin`` — the calibrated P(label | score in bin). NULL labels or
    scores drop.

    ``num_bins=None`` fits on every distinct score (bin = 0-based
    dense index, score_lo == score_hi == the score) and REFUSES when
    the distinct count exceeds ``max_points`` — the driver-pull
    contract; quantize upstream or pass ``num_bins``. With
    ``num_bins`` set, scores bucket into fixed-width bins over
    [lo, hi] (defaults: the observed min/max): bin =
    clamp(floor((s - lo) * scale), 0, B-1) with scale = B/(hi - lo)
    computed ONCE as a double — the profile.histogram arithmetic,
    identical in any engine. Empty bins are absent from the model
    (they carry no evidence; apply clamps into observed bins).

    100 TB shape: one groupBy (map-side combine) to <= num_bins (or
    distinct-score) rows, one model-sized collect, zero row-scale
    driver traffic."""
    lab = F.col(label_col).cast("boolean")
    s = F.col(score_col).cast("double")
    base = df.filter(lab.isNotNull() & s.isNotNull())
    if num_bins is not None:
        if num_bins < 1:
            raise ValueError(f"isotonic_calibrate: num_bins must be >= 1, got {num_bins}")
        if lo is None or hi is None:
            mm = base.agg(F.min(s).alias("lo"), F.max(s).alias("hi")).first()
            lo = float(mm["lo"]) if lo is None else lo
            hi = float(mm["hi"]) if hi is None else hi
        if not hi > lo:
            raise ValueError(
                f"isotonic_calibrate: need hi > lo, got [{lo}, {hi}] — a "
                "constant score has nothing to calibrate against"
            )
        scale = float(num_bins) / (hi - lo)
        b = F.greatest(
            F.least(
                F.floor((s - F.lit(lo)) * F.lit(scale)).cast("long"),
                F.lit(num_bins - 1),
            ),
            F.lit(0),
        )
        collapsed = (
            base.groupBy(b.alias("__b"))
            .agg(
                F.count(F.lit(1)).alias("__w"),
                F.sum(lab.cast("long")).alias("__p"),
            )
            .orderBy("__b")
        )
        rows = collapsed.collect()
        width = (hi - lo) / float(num_bins)
        bins = [(int(r["__b"]), int(r["__w"]), int(r["__p"])) for r in rows]
        bounds = [
            (lo + width * bi, hi if bi == num_bins - 1 else lo + width * (bi + 1))
            for bi, _, _ in bins
        ]
    else:
        collapsed = (
            base.groupBy(s.alias("__v"))
            .agg(
                F.count(F.lit(1)).alias("__w"),
                F.sum(lab.cast("long")).alias("__p"),
            )
        )
        n_distinct = collapsed.count()
        if n_distinct > max_points:
            raise ValueError(
                f"isotonic_calibrate: {n_distinct} distinct scores "
                f"(> max_points={max_points}) — the PAV fold is a driver-side "
                "model fit; pass num_bins to bucket first, or raise the cap "
                "knowingly"
            )
        rows = collapsed.orderBy("__v").collect()
        bins = [(i, int(r["__w"]), int(r["__p"])) for i, r in enumerate(rows)]
        bounds = [(float(r["__v"]), float(r["__v"])) for r in rows]
    spark = df.sparkSession
    schema = (
        "bin long, score_lo double, score_hi double, n long, n_pos long, prob double"
    )
    if not bins:
        return spark.createDataFrame([], schema)
    out = []
    start = 0
    for w, p, end in _pav(bins):
        prob = p / w  # one double division of exact ints per pool
        for i in range(start, end + 1):
            bi, bw, bp = bins[i]
            out.append((bi, bounds[i][0], bounds[i][1], bw, bp, prob))
        start = end + 1
    return local_frame(spark, out, schema)


def apply_isotonic(
    df: DataFrame,
    score_col: str,
    model: DataFrame,
    out_col: str = "calibrated",
) -> DataFrame:
    """Map ``score_col`` through a fitted `isotonic_calibrate` model:
    appends ``out_col`` = the prob of the model bin holding the score
    — the bin with the LARGEST score_lo <= score (floor lookup over
    the sorted step boundaries, so scores below every bin clamp to
    the first, above every bin to the last, and scores in an
    empty-bin gap take the bin below: the monotone-step-extension
    convention). NULL scores — and an empty model — yield NULL.

    Shape: the quantiles boundary-fold pattern — the model collapses
    to ONE row of sorted (score_lo, prob) arrays, broadcast
    crossJoined in, and the lookup is an in-plan F.aggregate
    boundary count + try_element_at: map-only at any corpus scale,
    broadcast payload = the model (bounded by the fit's own
    max_points/num_bins contract)."""
    one = model.agg(
        F.array_sort(
            F.collect_list(F.struct("score_lo", "prob"))
        ).alias("__mb")
    ).select(
        F.col("__mb.score_lo").alias("__los"),
        F.col("__mb.prob").alias("__ps"),
    )
    s = F.col(score_col).cast("double")
    idx = F.greatest(
        F.aggregate("__los", F.lit(0), lambda acc, b: acc + (b <= s).cast("int")),
        F.lit(1),
    )
    prob = F.when(
        s.isNotNull() & (F.size("__los") > 0), F.try_element_at("__ps", idx)
    ).cast("double")
    return df.crossJoin(F.broadcast(one)).withColumn(out_col, prob).drop(
        "__los", "__ps"
    )
