"""Trainable logistic-regression quality classifier over hashed
n-gram features — the supervised step up from the Naive Bayes scorer
(`operators/classifier.py`): NB fits count ratios in one pass; this
fits DISCRIMINATIVE weights by full-batch gradient descent, the
fastText-shaped linear classifier (Joulin et al. 2016,
arXiv:1607.01759) that modern corpus-quality pipelines train on
"gold vs raw" labels (e.g. FineWeb-Edu's educational-quality filter).

Everything is DataFrame algebra; no MLlib, no Python in the loop:

  features   — binary presence of hashed word uni+bigram buckets
               (`operators/dsir.hashed_ngram_features`) plus an
               intercept pseudo-bucket -1 on every document. One
               explode + one DISTINCT; bounded to B+1 columns of
               model, however large the corpus.
  round t    — z_i   = sum_j x_ij * w_j       (broadcast the B+1-row
               weight frame into the feature stream, reduce per doc)
               r_i   = sigmoid(z_i) - y_i
               g_j   = (1/N) sum_i x_ij * r_i (co-partitioned join
               feats⋈resid on id — ZERO exchange — then one
               bucket-bounded aggregate with map-side combine)
               w    <- w * (1 - lr*reg) - lr * g
  scoring    — one broadcast join + per-doc reduce: p = sigmoid(z).

Scale shape: the feature stream is hash-partitioned by doc id ONCE
and persisted; every round reuses that partitioning for both the
per-doc reduce and the residual join, so the only per-round shuffle
is the gradient's B+1-row-per-partition aggregate. The MODEL lives
on the driver between rounds (B+1 floats, the kmeans_refine
posture): each round ships it down as a literal broadcast frame and
collects exactly one gradient back up, so per-round driver traffic
is model-sized and the plan never references prior-round state —
no lineage growth, nothing to checkpoint (the trap graph.py's
iterative loops have to truncate their way out of).

Determinism: full-batch GD from w=0 has no randomness; per-doc and
per-bucket sums accumulate in DECIMAL(28,14) so results are
partitioning-invariant and engine-portable — with the md5 hash
family the entire training run reproduces bit-for-bit in SQL, which
is how the driver oracle replays fit AND scores (unrolled one CTE
chain per round, the PageRank precedent).

Reference parity: none — the reference has no trainable models.
100-TB curation extension (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from d2d_spark.functions.frames import local_frame
from d2d_spark.operators.dsir import GramHasher, hashed_ngram_features

_DEC = "decimal(28,14)"

#: intercept pseudo-bucket — joins like any feature, never collides
#: with pmod output (which is >= 0)
INTERCEPT = -1


def _features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int,
    hasher: GramHasher | None,
) -> DataFrame:
    """(id, bucket, x) — binary presence per (doc, bucket) plus the
    intercept row every document gets (even NULL-text docs, which
    contribute no gram rows but still carry a bias and a label)."""
    grams = (
        hashed_ngram_features(df, text_col, id_col, n_buckets, hasher)
        .distinct()
        .select(id_col, "bucket", F.lit(1.0).alias("x"))
    )
    intercept = df.select(
        id_col, F.lit(INTERCEPT).alias("bucket"), F.lit(1.0).alias("x")
    )
    return grams.unionByName(intercept)


def fit_logreg_hashed(
    df: DataFrame,
    text_col: str,
    label_col: str,
    id_col: str,
    n_buckets: int = 8192,
    rounds: int = 8,
    lr: float = 0.5,
    reg: float = 0.0,
    hasher: GramHasher | None = None,
    feature_partitions: int | None = None,
) -> DataFrame:
    """Train on ``label_col`` (0/1, numeric or boolean) and return the
    weight frame (bucket, w) — n_buckets + 1 rows, bucket -1 the
    intercept. Feed it to `score_logreg_hashed` with the SAME
    (n_buckets, hasher). ``feature_partitions`` pins the cached
    feature stream's width (default: the session's shuffle
    parallelism) — every round's stages inherit it, so a small-corpus
    fit under a wide-default session isn't scheduler-bound."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    if not 0.0 < lr:
        raise ValueError(f"lr must be positive, got {lr}")
    spark = df.sparkSession
    y = F.col(label_col).cast("double")
    labels = df.select(id_col, y.alias("__y"))
    # ONE validation job covers labels, duplicates, and N: duplicate
    # ids would silently double the intercept feature and let
    # max('__y') pick among conflicting labels — corrupt fits must
    # refuse loudly, not converge quietly
    stats = labels.agg(
        F.count(F.lit(1)).alias("__n"),
        F.count_distinct(F.col(id_col)).alias("__nid"),
        F.sum(
            (F.col("__y").isNull() | ~F.col("__y").isin(0.0, 1.0)).cast("int")
        ).alias("__bad"),
    ).collect()[0]
    if stats["__bad"]:
        raise ValueError(
            f"fit_logreg_hashed: {label_col} must be binary 0/1 with no NULLs "
            "— filter or impute labels upstream"
        )
    if stats["__nid"] != stats["__n"]:
        raise ValueError(
            f"fit_logreg_hashed: {id_col} has duplicate (or NULL) values "
            f"({stats['__n']} rows, {stats['__nid']} distinct ids) — each "
            "document must appear once; dedup upstream"
        )
    # MEAN gradient, so lr is corpus-size-free (sum-gradient diverges
    # as N grows); N is a one-scalar driver constant, model-sized
    n_docs = stats["__n"]
    if n_docs == 0:
        raise ValueError("fit_logreg_hashed: empty input — nothing to fit")
    # label rides the feature stream so no per-round label join exists
    joined = _features(df, text_col, id_col, n_buckets, hasher).join(labels, id_col)
    feats = (
        joined.repartition(feature_partitions, F.col(id_col))
        if feature_partitions
        else joined.repartition(F.col(id_col))
    ).persist()
    feats.count()

    # the model lives on the DRIVER between rounds (B+1 floats — the
    # kmeans_refine posture): each round inlines it as a fresh literal
    # frame, so the plan never references prior-round state and there
    # is nothing to checkpoint-truncate. Per-round driver traffic is
    # exactly one model (the gradient collect); z and the gradient
    # stay distributed. IEEE double update arithmetic is identical on
    # the driver, in the JVM, and in the SQL oracle, so moving the
    # update driver-side changes nothing observable.
    decay = 1.0 - lr * reg
    cur = {b: 0.0 for b in range(-1, n_buckets)}
    try:
        for _ in range(rounds):
            w_df = local_frame(
                spark, [(b, wv) for b, wv in cur.items()], "bucket bigint, w double"
            )
            z = (
                feats.join(F.broadcast(w_df), "bucket")
                .groupBy(id_col)
                .agg(
                    F.sum((F.col("x") * F.col("w")).cast(_DEC))
                    .cast("double")
                    .alias("__z"),
                    F.max("__y").alias("__yy"),
                )
            )
            resid = z.select(
                id_col,
                (
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__z"))) - F.col("__yy")
                ).alias("__r"),
            )
            grad = (
                feats.join(resid, id_col)
                .groupBy("bucket")
                .agg(
                    (
                        F.sum((F.col("x") * F.col("__r")).cast(_DEC)).cast("double")
                        / F.lit(float(n_docs))
                    ).alias("__g")
                )
            )
            g = {r["bucket"]: r["__g"] for r in grad.collect()}
            cur = {b: wv * decay - lr * g.get(b, 0.0) for b, wv in cur.items()}
    finally:
        feats.unpersist(blocking=False)
    # r12 (guide §4): model-sized frames through JVM literals — the
    # per-round weight relation never needs a Python worker
    return local_frame(
        spark, [(b, wv) for b, wv in cur.items()], "bucket bigint, w double"
    )


def score_logreg_hashed(
    df: DataFrame,
    text_col: str,
    id_col: str,
    weights: DataFrame,
    n_buckets: int = 8192,
    hasher: GramHasher | None = None,
    out_col: str = "prob",
) -> DataFrame:
    """sigmoid(w . x) per document — one broadcast join + one per-doc
    reduce. Documents with NULL text score on the intercept alone."""
    feats = _features(df, text_col, id_col, n_buckets, hasher)
    return (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum((F.col("x") * F.col("w")).cast(_DEC)).cast("double").alias("__z")
        )
        .select(
            id_col,
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__z")))).alias(out_col),
        )
    )
