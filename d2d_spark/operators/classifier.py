"""Linear bag-of-words text classification as pure DataFrame algebra —
the model-based filter stage of modern pretraining pipelines (GPT-3's
LR quality classifier, CCNet/fastText language ID, RefinedWeb's
document scoring). The reference engine has no model stage; this is a
capability extension in the same spirit as `ngram_lm` (which covers
the perplexity side of CCNet).

fastText is a shallow linear model over bag-of-words features; the
sandbox has no trainer, so the model here is the closest thing that
is exactly expressible as DataFrame ops AND in ANSI SQL for the
oracle: multinomial Naive Bayes with Laplace smoothing. Training is
two grouped aggregates; the fitted model is a (token, label, loglik)
table of at most ``vocab_size * n_labels`` rows — broadcastable BY
CONSTRUCTION, like the char-LM. Scoring is one token explode, one
broadcast hash join, one per-doc aggregate: the identical shuffle
shape as perplexity scoring, proven at scale there.

Scale posture at 100 TB: training shuffles (token, label) pairs once
into a counts table (uniform keys — token frequency skew lands on the
map-side partial aggregation, not the shuffle); the model itself is a
few MB regardless of corpus size; scoring is a map-side broadcast
join plus one per-doc aggregate. No driver-side loop touches row
data — the only collects are the bounded label set and scalar floors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from d2d_spark.functions.frames import local_frame
from pyspark.sql import functions as F

#: special token for the per-label prior / floor rows inside the model
#: table (NULL would be ambiguous with a genuinely missing token)
_META_TOKEN = "\x00meta"


def word_tokens(col: Column) -> Column:
    """Lowercased word tokens (runs of letters/digits) with
    multiplicity — NB features are token COUNTS, so duplicates must
    survive. Pure Column: split on non-alphanumeric runs."""
    return F.filter(
        F.split(F.lower(col), r"[^\p{L}\p{N}]+"),
        lambda t: t != "",
    )


def train_nb_classifier(
    df: DataFrame,
    text_col: str,
    label_col: str,
    vocab_size: int = 100_000,
    min_count: int = 1,
    alpha: float = 1.0,
) -> DataFrame:
    """Fit multinomial Naive Bayes; returns the model as ONE small
    DataFrame with rows of two kinds:

    - ``(token, label, loglik)`` — log P(token | label) with Laplace
      ``alpha`` smoothing over the retained vocabulary:
      ``ln((c_tl + alpha) / (total_l + alpha * V))``;
    - ``(\\x00meta, label, logprior, floor)`` — the label's log prior
      ``ln(n_docs_l / n_docs)`` and its unseen-token log-likelihood
      ``ln(alpha / (total_l + alpha * V))`` (tokens outside the
      vocabulary, or in-vocabulary tokens never seen with the label,
      score the same floor — the standard out-of-vocabulary collapse).

    The vocabulary is the ``vocab_size`` globally most frequent tokens
    with count >= ``min_count`` (ties broken by token text, so the
    model is deterministic on any partitioning); ``total_l`` counts
    only vocabulary tokens, so likelihoods stay a proper distribution
    over V + 1 outcomes (V vocab tokens + the unseen bucket).
    """
    pairs = df.select(
        F.col(label_col).alias("label"),
        F.explode(word_tokens(F.col(text_col))).alias("token"),
    )
    return _fit(pairs, df.select(F.col(label_col).alias("label")),
                vocab_size, min_count, alpha)


def _fit(
    pairs: DataFrame,
    labeled_docs: DataFrame,
    vocab_size: int,
    min_count: int,
    alpha: float,
) -> DataFrame:
    """The shared fit over a (label, token) pair frame: count
    aggregates, bounded vocabulary, smoothed likelihoods, priors and
    floors — used by both `train_nb_classifier` (fresh explode) and
    `classify_self` (cached explode). ``labeled_docs`` is one row per
    training document with a ``label`` column (the priors' numerator).

    The two scalars the math needs — |vocab| and the total document
    count — ride the dataflow (a broadcastable one-row count and a
    window sum over the tiny per-label frame) instead of separate
    count() jobs: the whole fit is ONE job however many labels, which
    matters for scheduler round-trips, not row throughput."""
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    from pyspark.sql import Window

    tl = pairs.groupBy("token", "label").agg(F.count(F.lit(1)).alias("__c"))
    vocab = (
        tl.groupBy("token")
        .agg(F.sum("__c").alias("__g"))
        .filter(F.col("__g") >= min_count)
        .orderBy(F.col("__g").desc(), "token")
        .limit(vocab_size)
        .select("token")
    )
    vcount = vocab.agg(F.count(F.lit(1)).alias("__v"))
    kept = tl.join(F.broadcast(vocab), on="token")
    totals = kept.groupBy("label").agg(F.sum("__c").alias("__tot")).crossJoin(
        F.broadcast(vcount)
    )
    doc_counts = labeled_docs.groupBy("label").agg(
        F.count(F.lit(1)).alias("__docs")
    ).withColumn(
        "__ndocs", F.sum("__docs").over(Window.partitionBy())
    )
    denom = F.col("__tot") + F.lit(alpha) * F.col("__v")
    lik = (
        kept.join(F.broadcast(totals), on="label")
        .select(
            "token",
            "label",
            (F.log(F.col("__c") + F.lit(alpha)) - F.log(denom)).alias("loglik"),
            F.lit(None).cast("double").alias("logprior"),
            F.lit(None).cast("double").alias("floor"),
        )
    )
    meta = (
        totals.join(F.broadcast(doc_counts), on="label")
        .select(
            F.lit(_META_TOKEN).alias("token"),
            "label",
            F.lit(None).cast("double").alias("loglik"),
            (F.log(F.col("__docs").cast("double")) - F.log(F.col("__ndocs").cast("double"))).alias(
                "logprior"
            ),
            (F.log(F.lit(alpha)) - F.log(denom)).alias("floor"),
        )
    )
    return lik.unionByName(meta)


def classify(
    df: DataFrame,
    model: DataFrame,
    text_col: str,
    id_col: str,
    out_col: str = "predicted",
    score_col: str = "logscore",
) -> DataFrame:
    """Score every document under the fitted model and append the
    argmax label plus its total log-probability (prior + token
    likelihood sum). Ties break toward the lexicographically smallest
    label; a document with no tokens scores priors only (so it still
    gets the majority-prior label, never NULL).

    Token sums use exact DECIMAL(28,14) accumulation — the score is
    bit-identical on any partitioning and in the SQL oracle, the same
    determinism contract as `ngram_lm.perplexity_score`."""
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(word_tokens(F.col(text_col))).alias("token"),
    )
    scored, prior_lab, prior_score = _score_token_frame(toks, model, out_col, score_col)
    # documents with zero tokens have no row in the aggregate: they
    # score priors only (majority-prior label), never NULL
    return df.join(scored, on=[F.col(id_col) == F.col("__id")], how="left").select(
        *df.columns,
        F.coalesce(F.col(out_col), F.lit(prior_lab)).alias(out_col),
        F.coalesce(F.col(score_col), F.lit(prior_score)).alias(score_col),
    )


def _collect_model(model: DataFrame, spark) -> tuple[list, dict, dict, DataFrame]:
    """Collect the (bounded-by-construction) model in ONE job and
    build the pivoted broadcast side driver-side: (sorted labels,
    prior, floor, wide frame with one loglik column per label —
    None, not NaN, for absent pairs so coalesce() applies the
    floor). Shared by the argmax scorer and the quality scorer."""
    from pyspark.sql import types as T

    rows = model.collect()
    meta_rows = [r for r in rows if r["token"] == _META_TOKEN]
    if not meta_rows:
        raise ValueError("model has no meta rows — was it built by train_nb_classifier?")
    labels = sorted(r["label"] for r in meta_rows)
    idx = {lab: i for i, lab in enumerate(labels)}
    prior = {r["label"]: float(r["logprior"]) for r in meta_rows}
    floor = {r["label"]: float(r["floor"]) for r in meta_rows}
    ll: dict[str, list] = {}
    for r in rows:
        if r["token"] == _META_TOKEN:
            continue
        ll.setdefault(r["token"], [None] * len(labels))[idx[r["label"]]] = r["loglik"]
    schema = T.StructType(
        [T.StructField("token", T.StringType())]
        + [T.StructField(f"__ll_{i}", T.DoubleType()) for i in range(len(labels))]
    )
    wide = local_frame(spark, [(t, *v) for t, v in ll.items()], schema)
    return labels, prior, floor, wide


def _score_token_frame(
    toks: DataFrame, model: DataFrame, out_col: str, score_col: str
) -> tuple[DataFrame, str, float]:
    """Score a pre-exploded (__id, token) frame. The model is BOUNDED
    by construction (<= vocab_size * n_labels + n_labels rows), so it
    collects in ONE job and the pivoted broadcast side is built
    driver-side — no checkpoint job, no distributed pivot, no separate
    meta collect; the scoring plan is exactly one broadcast join and
    one per-doc aggregate. Shared by `classify` and `classify_self`
    so the self-scoring path can reuse its cached token explode."""
    labels, prior, floor, wide = _collect_model(model, toks.sparkSession)

    joined = toks.select("__id", "token").join(F.broadcast(wide), on="token", how="left")
    sums = joined.groupBy("__id").agg(
        *[
            F.sum(
                F.coalesce(F.col(f"__ll_{i}"), F.lit(floor[lab])).cast("decimal(28,14)")
            )
            .cast("double")
            .alias(f"__s_{i}")
            for i, lab in enumerate(labels)
        ]
    )
    totals = [
        (F.lit(prior[lab]) + F.coalesce(F.col(f"__s_{i}"), F.lit(0.0))).alias(f"__t_{i}")
        for i, lab in enumerate(labels)
    ]
    scored = sums.select("__id", *totals)
    # argmax via one array_sort over (score, label) structs: descending
    # score, ascending label on ties — deterministic and JVM-side
    best = F.element_at(
        F.array_sort(
            F.array(
                *[
                    F.struct(
                        (-F.col(f"__t_{i}")).alias("neg"),
                        F.lit(lab).alias("lab"),
                        F.col(f"__t_{i}").alias("score"),
                    )
                    for i, lab in enumerate(labels)
                ]
            )
        ),
        1,
    )
    prior_lab, prior_score = min(
        ((lab, prior[lab]) for lab in labels), key=lambda t: (-t[1], t[0])
    )
    return (
        scored.select("__id", best["lab"].alias(out_col), best["score"].alias(score_col)),
        prior_lab,
        prior_score,
    )


def classify_self(
    df: DataFrame,
    text_col: str,
    label_col: str,
    id_col: str,
    vocab_size: int = 100_000,
    min_count: int = 1,
    alpha: float = 1.0,
    out_col: str = "predicted",
    score_col: str = "logscore",
) -> DataFrame:
    """Train on the labeled corpus and score that same corpus — the
    shape the registered driver query uses (label recovery / anomaly
    surfacing: documents whose predicted label disagrees with their
    recorded one are the mislabel candidates).

    Identical results to ``train_nb_classifier`` + ``classify`` but
    the corpus tokenizes exactly ONCE: the (id, label, token) explode
    persists and feeds both the count aggregates and the scoring join,
    halving the dominant cost — the same shared-explode optimization
    as `ngram_lm.perplexity_self_score`, including its cache policy:
    the explode stays cached (CacheManager reuses it across repeated
    identical calls; distinct corpora accumulate disk blocks until
    ``spark.catalog.clearCache()``)."""
    from pyspark import StorageLevel

    from d2d_spark import cache as opcache

    toks = opcache.register(
        "nb_classifier",
        df.select(
            F.col(id_col).alias("__id"),
            F.col(label_col).alias("label"),
            F.explode(word_tokens(F.col(text_col))).alias("token"),
        ).persist(StorageLevel.MEMORY_AND_DISK),
    )
    # r12: eager fill — the fit's first job has SEVERAL branches over
    # this frame, and concurrent stages racing on a cold cache each
    # recompute the tokenize (the r11 windowed_aggs cold-race lesson;
    # measured 8 concurrent 2.4 s stages over one 0.5 MB scan).
    # A spread-the-tokenize repartition was ALSO measured and rejected:
    # warm best 3.05 s (fill only) vs 3.21 s (spread+fill) — the
    # compiled single-task tokenize is cheaper than 32 short tasks.
    toks.count()

    # no checkpoint: _score_token_frame collects the bounded model in
    # one job, which IS the materialization point for the fit
    model = _fit(
        toks.select("label", "token"),
        df.select(F.col(label_col).alias("label")),
        vocab_size,
        min_count,
        alpha,
    )

    scored, prior_lab, prior_score = _score_token_frame(toks, model, out_col, score_col)
    scored = scored.localCheckpoint(eager=True)
    return df.join(scored, on=[F.col(id_col) == F.col("__id")], how="left").select(
        *df.columns,
        F.coalesce(F.col(out_col), F.lit(prior_lab)).alias(out_col),
        F.coalesce(F.col(score_col), F.lit(prior_score)).alias(score_col),
    )


def nb_quality_score(
    df: DataFrame,
    good_seed: DataFrame,
    text_col: str,
    id_col: str,
    contrast_fraction: float = 1.0,
    vocab_size: int = 100_000,
    min_count: int = 1,
    alpha: float = 1.0,
    seed: int = 0,
    out_col: str = "quality_prob",
    per_token: bool = True,
) -> DataFrame:
    """GPT-3-style quality scoring: train a binary classifier to tell
    a trusted reference corpus ("good") from the raw corpus itself,
    then score every raw document with the probability it looks like
    the reference (Brown et al. 2020 §A; they used a logistic
    classifier over hashed features — here the NB fit, same
    discriminative use).

    The negative class is a deterministic ``contrast_fraction`` hash
    sample of ``df`` (no labeling needed: raw data IS the background
    class). The appended ``out_col`` is the class log-odds squashed
    through a sigmoid — in (0, 1), monotone in "looks like the seed
    corpus". ``per_token=True`` (default) normalizes the odds by
    token count: length-invariant, right for thresholding and
    analysis. ``per_token=False`` keeps document-level odds — scores
    saturate toward 0/1 like GPT-3's logistic classifier, which is
    what the published Pareto keep rule is calibrated against
    (`nb_quality_filter` uses this form). Documents with no tokens
    score from the priors alone.

    The raw corpus tokenizes exactly ONCE: the (id, token) explode
    persists and feeds both the raw-class training pairs (filtered to
    the contrast sample) and the scoring join — the same
    shared-explode discipline as `classify_self`.
    """
    from pyspark import StorageLevel

    from d2d_spark.operators.sampling import _BUCKETS, hash_bucket

    from d2d_spark import cache as opcache

    toks = opcache.register(
        "nb_classifier",
        df.select(
            F.col(id_col).alias("__id"),
            F.explode(word_tokens(F.col(text_col))).alias("token"),
        ).persist(StorageLevel.MEMORY_AND_DISK),
    )
    threshold = int(round(contrast_fraction * _BUCKETS))
    raw_pairs = toks.filter(hash_bucket(F.col("__id"), seed) < threshold).select(
        F.lit("raw").alias("label"), "token"
    )
    good_pairs = good_seed.select(
        F.lit("good").alias("label"),
        F.explode(word_tokens(F.col(text_col))).alias("token"),
    )
    # per-label DOC counts for the priors: seed docs + sampled raw docs
    label_rows = good_seed.select(F.lit("good").alias("label")).unionByName(
        df.filter(hash_bucket(F.col(id_col), seed) < threshold).select(
            F.lit("raw").alias("label")
        )
    )
    model = _fit(
        good_pairs.unionByName(raw_pairs),
        label_rows,
        vocab_size,
        min_count,
        alpha,
    )
    labels, prior, floor, wide = _collect_model(model, df.sparkSession)
    if labels != ["good", "raw"]:
        raise ValueError(f"expected labels good/raw, got {labels}")
    # labels are sorted, so __ll_0 = good, __ll_1 = raw
    prior_margin = prior["good"] - prior["raw"]

    margins = (
        toks.join(F.broadcast(wide), on="token", how="left")
        .groupBy("__id")
        .agg(
            (
                F.sum(
                    (
                        F.coalesce("__ll_0", F.lit(floor["good"]))
                        - F.coalesce("__ll_1", F.lit(floor["raw"]))
                    ).cast("decimal(28,14)")
                ).cast("double")
                / (F.count(F.lit(1)) if per_token else F.lit(1.0))
            ).alias("__margin")
        )
    )
    # pin the per-doc margins; the token cache stays registered so a
    # repeated identical call reuses it (classify_self's cache policy)
    margins = margins.localCheckpoint(eager=True)
    # sigmoid of (per-token margin + prior margin); zero-token docs
    # fall back to the prior margin alone
    m = F.coalesce(F.col("__margin"), F.lit(0.0)) + F.lit(prior_margin)
    return df.join(margins, on=[F.col(id_col) == F.col("__id")], how="left").select(
        *df.columns, (F.lit(1.0) / (F.lit(1.0) + F.exp(-m))).alias(out_col)
    )


def nb_quality_filter(
    df: DataFrame,
    good_seed: DataFrame,
    text_col: str,
    id_col: str,
    pareto_alpha: float = 9.0,
    contrast_fraction: float = 1.0,
    vocab_size: int = 100_000,
    min_count: int = 1,
    alpha: float = 1.0,
    seed: int = 0,
    out_col: str = "quality_prob",
) -> DataFrame:
    """The GPT-3 keep rule on top of `nb_quality_score`: a document
    survives iff ``pareto(alpha) > 1 - score`` — high scorers almost
    always kept, low scorers kept with tail probability, preserving
    some distributional diversity instead of a hard threshold. The
    score is the DOCUMENT-level (not per-token) class probability:
    like the GPT-3 classifier the rule was published for, it
    saturates toward 0/1, so good documents keep at near-certainty
    and the Pareto tail only governs the rejects. The draw is
    derandomized through the hash-bucket primitive
    (P(keep | score) = (2 - score)^-alpha exactly), so the kept set
    is reproducible per (id, seed)."""
    from d2d_spark.operators.sampling import _BUCKETS, hash_bucket

    if pareto_alpha <= 0:
        raise ValueError(f"pareto_alpha must be positive, got {pareto_alpha}")
    scored = nb_quality_score(
        df,
        good_seed,
        text_col,
        id_col,
        contrast_fraction=contrast_fraction,
        vocab_size=vocab_size,
        min_count=min_count,
        alpha=alpha,
        seed=seed,
        out_col=out_col,
        per_token=False,
    )
    p_keep = F.pow(F.lit(2.0) - F.col(out_col), F.lit(-float(pareto_alpha)))
    return scored.filter(
        hash_bucket(F.col(id_col), seed + 1) < p_keep * F.lit(_BUCKETS)
    ).select(*df.columns, out_col)
