"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick raw-corpus documents that look like a small
trusted target corpus, with principled SAMPLING instead of a hard
classifier cut.

The pipeline the paper describes, re-expressed as DataFrame algebra:

  1. featurize    — hashed n-gram bag: word uni+bigrams bucketed into
                    B hash buckets (their §3.2 "hashed n-gram
                    features"). One explode per document; no vocab.
  2. fit          — bucket unigram distributions for the TARGET and
                    RAW corpora with add-alpha smoothing. Each fit is
                    ONE groupBy over the features bounded to B rows.
  3. log-ratio    — per-document importance weight
                    lw(x) = sum_grams log p_target(b) - log p_raw(b),
                    a broadcast join of the two B-row models into the
                    gram stream + one grouped sum (same shape as the
                    NB scorer in operators/classifier.py).
  4. resample     — sample n docs WITHOUT replacement with
                    probability proportional to exp(lw) via the
                    Gumbel top-k trick: key = lw + Gumbel(seeded),
                    take the n largest keys. Deterministic given the
                    seed — the Gumbel noise derives from a hash of
                    the doc id, not an RNG stream, so the selection
                    is reproducible on any partitioning (and in SQL).

Scale shape: features are a flat explode (no shuffle); each model is
a B-row aggregate (map-side combine); scoring broadcasts 2xB rows
into the gram stream and reduces per doc; resampling is one TakeOrdered
of size n. Nothing quadratic, nothing driver-bound beyond the models.

The hash families are pluggable like freq.py/kmv.py: production uses
xxhash64; `md5_prefix_hasher` (md5 hex prefix as int) reproduces
bit-for-bit in any engine with md5 — which is how the driver oracle
replays the whole pipeline in SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from d2d_spark.functions.text import tokens_ws

#: gram -> int64 hash families
GramHasher = Callable[[Column], Column]


def xxhash_hasher(gram: Column) -> Column:
    """Production default: xxhash64 folded non-negative."""
    return F.abs(F.xxhash64(gram))


def md5_prefix_hasher(gram: Column) -> Column:
    """First 8 md5 hex digits as int — portable to any engine with
    md5 (the oracle family). 32 bits is plenty for bucketing."""
    return F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("bigint")


def _grams(text: Column) -> Column:
    """Word unigrams + bigrams (space-joined), the paper's feature
    set. Pure Column: split once, concat adjacent pairs."""
    toks = tokens_ws(text)
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.slice(toks, 1, F.size(toks) - 1),
            lambda w, i: F.concat_ws(" ", w, F.element_at(toks, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def hashed_ngram_features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 8192,
    hasher: GramHasher | None = None,
) -> DataFrame:
    """(id, bucket) — one row per gram OCCURRENCE (counts matter).
    NULL texts contribute nothing."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    h = hasher or xxhash_hasher
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.explode(_grams(F.col(text_col))).alias("__g"))
        .select(F.col(id_col), F.pmod(h(F.col("__g")), F.lit(n_buckets)).alias("bucket"))
    )


def fit_hashed_ngram_dist(
    features: DataFrame, n_buckets: int, alpha: float = 1.0
) -> DataFrame:
    """(bucket, logp) with add-alpha smoothing over the FULL bucket
    range — untouched buckets get the floor, so the model is total
    and the scorer needs no null fallback. At most n_buckets rows."""
    counts = features.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
    # empty feature stream => NULL SUM, which would silently NULL every
    # logp downstream; coalescing to 0 yields the smoothed UNIFORM
    # model (logp = -log B for all buckets) — defined, and the same
    # thing the SQL oracle's coalesced total computes
    total = counts.agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias("__total")
    )
    full = (
        features.sparkSession.range(n_buckets)
        .select(F.col("id").alias("bucket"))
        .join(counts, "bucket", "left")
        .select("bucket", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    return (
        full.crossJoin(F.broadcast(total))
        .select(
            "bucket",
            (
                F.log(F.col("c") + F.lit(float(alpha)))
                - F.log(F.col("__total") + F.lit(float(alpha) * n_buckets))
            ).alias("logp"),
        )
    )


def dsir_log_ratio(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target_model: DataFrame,
    raw_model: DataFrame,
    n_buckets: int = 8192,
    hasher: GramHasher | None = None,
    out_col: str = "log_weight",
) -> DataFrame:
    """Per-document importance log-weight. Non-NULL texts always
    produce grams (tokens_ws of an empty string is one empty token,
    which still hashes), so every non-NULL-text document gets a
    weight; NULL-text documents contribute no feature rows and are
    ABSENT from the output — filter or impute upstream if they must
    be sampleable. Exact DECIMAL(28,14) accumulation so the sum is
    partitioning-invariant and engine-portable."""
    feats = hashed_ngram_features(df, text_col, id_col, n_buckets, hasher)
    return _log_ratio_from_features(feats, id_col, target_model, raw_model, out_col)


def _log_ratio_from_features(
    feats: DataFrame,
    id_col: str,
    target_model: DataFrame,
    raw_model: DataFrame,
    out_col: str = "log_weight",
) -> DataFrame:
    """`dsir_log_ratio` over an already-built (id, bucket) feature
    stream — lets `dsir_select` featurize the raw corpus ONCE for
    both the raw-model fit and the scoring pass."""
    model = (
        target_model.select("bucket", F.col("logp").alias("__lt"))
        .join(raw_model.select("bucket", F.col("logp").alias("__lr")), "bucket")
    )
    scored = feats.join(F.broadcast(model), "bucket")
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum(
                (F.col("__lt") - F.col("__lr")).cast("decimal(28,14)")
            ).cast("double").alias(out_col)
        )
    )


def gumbel_key(
    id_col: Column, log_weight: Column, seed: int = 0
) -> Column:
    """lw + Gumbel noise, derandomized: u derives from the md5 of
    (id, seed) so the key — and therefore the whole resample — is
    reproducible on any partitioning and in any engine with md5.
    u in (0, 1) strictly, so the double log never hits infinity."""
    u = (
        F.conv(
            F.substring(F.md5(F.concat_ws("#", id_col.cast("string"), F.lit(str(seed)))), 1, 8),
            16, 10,
        ).cast("bigint")
        % F.lit(1 << 20)
        + F.lit(0.5)
    ) / F.lit(float(1 << 20))
    return log_weight + (-F.log(-F.log(u)))


def dsir_resample(
    scored: DataFrame,
    id_col: str,
    n: int,
    seed: int = 0,
    weight_col: str = "log_weight",
    out_key_col: str = "gumbel_key",
) -> DataFrame:
    """Gumbel top-k: the n rows with the largest lw + Gumbel(id, seed)
    are a weighted sample WITHOUT replacement, proportional to
    exp(lw) (Efraimidis & Spirakis 2006 via Gumbel keys). ONE
    TakeOrdered of size n; ties broken by id for determinism."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    from d2d_spark.operators.topk import top_k

    keyed = scored.withColumn(
        out_key_col, gumbel_key(F.col(id_col), F.col(weight_col), seed)
    )
    return top_k(keyed, [F.col(out_key_col).desc(), F.col(id_col)], n)


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    n_buckets: int = 8192,
    alpha: float = 1.0,
    seed: int = 0,
    hasher: GramHasher | None = None,
) -> DataFrame:
    """The whole pipeline in one call: fit both models, weigh every
    raw document, resample n. Returns the selected rows of ``raw``
    plus (log_weight, gumbel_key). The raw corpus is featurized ONCE
    (persisted) — the gram explode is the dominant scan, and both the
    raw-model fit and the scoring pass read the same stream."""
    from d2d_spark import cache

    h = hasher or xxhash_hasher
    t_model = fit_hashed_ngram_dist(
        hashed_ngram_features(target, text_col, id_col, n_buckets, h), n_buckets, alpha
    )
    raw_feats = cache.register(
        "dsir", hashed_ngram_features(raw, text_col, id_col, n_buckets, h).persist()
    )
    r_model = fit_hashed_ngram_dist(raw_feats, n_buckets, alpha)
    lw = _log_ratio_from_features(raw_feats, id_col, t_model, r_model)
    picked = dsir_resample(lw, id_col, n, seed)
    return raw.join(picked, id_col)
