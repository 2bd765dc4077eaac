"""Character-n-gram LM perplexity scoring — the CCNet-style quality
filter (Wenzek et al., "CCNet: Extracting high quality monolingual
datasets from web crawl data", 2020): score each document by how well
a language model trained on a trusted corpus predicts it, then keep
the low-perplexity (head/middle) buckets.

CCNet uses KenLM; the sandbox has no LM runtime, so the model here is
the simplest thing that ranks the same way: an MLE character-n-gram
model with a floor penalty for unseen grams. Everything is DataFrame
ops:

  train — explode char n-grams, count, normalize by (n-1)-gram prefix
          totals; keep the ``vocab_size`` most frequent grams so the
          model is broadcastable BY CONSTRUCTION (a few MB regardless
          of corpus size).
  score — explode the candidate corpus's grams, broadcast-join the
          model, one per-doc aggregate of mean log-prob. The only
          shuffle is the per-doc agg; the model join is a broadcast
          hash join at any corpus scale.

Perplexity here = exp(-mean log P(c_i | prefix)) per document —
monotone in the mean, so bucket thresholds behave like CCNet's.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: fallback unseen-gram log-prob when the model is empty; normally the
#: floor derives from the model itself (min retained logp minus ln 10)
#: so an unseen gram is ALWAYS scored worse than any seen one — a
#: fixed constant could rank an unseen gram above a real-but-rare gram
DEFAULT_FLOOR_LOGP = -16.0


def _normalize(col: Column) -> Column:
    """Lowercase + collapse whitespace runs: the LM unit is content,
    not formatting."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def _char_grams(col: Column, n: int) -> Column:
    """ALL character n-grams (with multiplicity — counts need them),
    as a pure Column expression; shorter-than-n text yields none.

    Built from a per-row char array + O(1) element_at lookups, NOT
    substring(col, i, n): positional substring on UTF-8 must scan to
    the i-th codepoint, making the gram pass O(len^2) per document —
    measured 16s for 1.5M grams at sf0.1 vs ~1s linear.

    The char array is bound as a LAMBDA VARIABLE (transform over a
    one-element array), not referenced as a plain subexpression:
    Catalyst has no common-subexpression elimination inside lambda
    bodies, so a bare ``split(col, '')`` referenced per gram would
    re-split the whole string n times per gram — measured 6x SLOWER
    than even the quadratic substring form. A lambda variable holds
    the evaluated array, so the split runs once per row."""

    def _grams_of(chars: Column) -> Column:
        length = F.size(chars)
        return F.when(
            length >= n,
            F.transform(
                F.sequence(F.lit(1), length - (n - 1)),
                lambda i: F.concat(*[F.element_at(chars, i + j) for j in range(n)]),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.transform(F.array(F.split(col, "")), _grams_of).getItem(0)


def train_char_lm(
    df: DataFrame,
    text_col: str,
    n: int = 3,
    vocab_size: int = 100_000,
    min_count: int = 2,
) -> DataFrame:
    """Train the model: returns a (gram, logp) DataFrame of at most
    ``vocab_size`` rows, logp = log(count(gram) / count(prefix)) with
    prefix totals computed over the FULL gram distribution (so kept
    grams carry true conditionals, not renormalized ones). Ties at the
    vocabulary boundary break deterministically by gram text."""
    grams = df.select(
        F.explode(_char_grams(_normalize(F.col(text_col)), n)).alias("gram")
    )
    counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("__c"))
    prefix = counts.groupBy(F.substring("gram", 1, n - 1).alias("__p")).agg(
        F.sum("__c").alias("__pc")
    )
    return (
        counts.filter(F.col("__c") >= min_count)
        .orderBy(F.col("__c").desc(), F.col("gram"))
        .limit(vocab_size)
        .join(prefix, on=[F.substring("gram", 1, n - 1) == F.col("__p")])
        .select(
            "gram",
            (F.log(F.col("__c").cast("double")) - F.log(F.col("__pc").cast("double"))).alias("logp"),
        )
    )


def perplexity_score(
    df: DataFrame,
    lm: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    floor_logp: float | None = None,
    out_col: str = "ppl",
) -> DataFrame:
    """Append ``out_col`` (per-char perplexity, lower = more fluent)
    and ``mean_logp``. Documents shorter than ``n`` normalized chars
    score NULL — no grams to judge, and NULL never passes a threshold
    filter silently.

    ``floor_logp`` (unseen-gram penalty) defaults to the model's own
    minimum retained log-prob minus ln 10 — one decade less likely
    than the rarest gram the model kept, so unseen always ranks below
    seen regardless of corpus size or vocab setting."""
    import math

    if floor_logp is None:
        lm_min = lm.agg(F.min("logp")).collect()[0][0]
        floor_logp = (lm_min - math.log(10)) if lm_min is not None else DEFAULT_FLOOR_LOGP
    grams = df.select(
        F.col(id_col).alias("__id"),
        F.explode(_char_grams(_normalize(F.col(text_col)), n)).alias("gram"),
    )
    # mean via exact-decimal sum / count, not avg(double): double
    # summation order varies with partitioning (and differs from other
    # engines), while a DECIMAL(28,14) sum is exact — the same mean to
    # the last bit on any partitioning and in the DuckDB oracle. 14
    # decimals keeps per-gram quantization error ~1e-14 (logp ulp is
    # ~1e-16); 14 integer digits bounds sums to 1e14 — far above any
    # real document's gram count times |logp|.
    scored = (
        grams.join(F.broadcast(lm), on="gram", how="left")
        .groupBy("__id")
        .agg(
            (
                F.sum(F.coalesce("logp", F.lit(floor_logp)).cast("decimal(28,14)")).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("mean_logp")
        )
    )
    return df.join(scored, on=[F.col(id_col) == F.col("__id")], how="left").select(
        *df.columns,
        F.col("mean_logp"),
        F.exp(-F.col("mean_logp")).alias(out_col),
    )


def perplexity_self_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    vocab_size: int = 100_000,
    min_count: int = 2,
    floor_logp: float | None = None,
    out_col: str = "ppl",
) -> DataFrame:
    """Train on the corpus ITSELF and score every document — the
    self-referential quality gate (spot statistical outliers against
    the corpus's own distribution), and the shape the registered
    driver query uses.

    Identical results to ``train_char_lm`` + ``perplexity_score``,
    but the corpus explodes into grams exactly ONCE: the (doc, gram)
    frame persists and feeds both the model counts and the scoring
    join, halving the dominant cost (at sf0.1 the gram explode is
    ~1.5M rows; separate train/score plans each pay it).

    Deliberate trade-off (same policy as ``minhash_lsh_pairs``): the
    gram cache is NOT unpersisted — Spark's CacheManager matches the
    plan across repeated identical calls, so re-scoring the same
    corpus reuses the cached explode instead of recomputing it
    (measured ~2x steady-state). Distinct corpora each leave a cache
    entry whose disk half persists until
    ``spark.catalog.clearCache()`` — long-lived sessions cycling many
    corpora should release per-corpus via
    ``d2d_spark.cache.release("ngram_lm")`` after consuming the
    scores (always safe; an early release only costs a recompute) or
    ``spark.catalog.clearCache()``; either way the cost is only a
    gram recompute on the next call."""
    import math

    from pyspark import StorageLevel

    from d2d_spark import cache as opcache

    grams = opcache.register(
        "ngram_lm",
        df.select(
            F.col(id_col).alias("__id"),
            F.explode(_char_grams(_normalize(F.col(text_col)), n)).alias("gram"),
        ).persist(StorageLevel.MEMORY_AND_DISK),
    )
    # no eager fill: the cache's consumers are SEQUENTIAL jobs (the lm
    # checkpoint materializes it, the scoring job reuses it), so the
    # concurrent-first-computation race minhash guards against cannot
    # happen here and an extra count() job would be pure overhead
    counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("__c"))
    prefix = counts.groupBy(F.substring("gram", 1, n - 1).alias("__p")).agg(
        F.sum("__c").alias("__pc")
    )
    lm = (
        counts.filter(F.col("__c") >= min_count)
        .orderBy(F.col("__c").desc(), "gram")
        .limit(vocab_size)
        .join(prefix, on=[F.substring("gram", 1, n - 1) == F.col("__p")])
        .select(
            "gram",
            (F.log(F.col("__c").cast("double")) - F.log(F.col("__pc").cast("double"))).alias("logp"),
        )
    )
    # the model is tiny by construction (<= vocab_size rows): pin it so
    # the scoring join doesn't re-derive the counts branch
    lm = lm.localCheckpoint(eager=True)
    if floor_logp is None:
        lm_min = lm.agg(F.min("logp")).collect()[0][0]
        floor_logp = (lm_min - math.log(10)) if lm_min is not None else DEFAULT_FLOOR_LOGP
    scored = (
        grams.join(F.broadcast(lm), on="gram", how="left")
        .groupBy("__id")
        .agg(
            (
                F.sum(F.coalesce("logp", F.lit(floor_logp)).cast("decimal(28,14)")).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("mean_logp")
        )
    )
    scored = scored.localCheckpoint(eager=True)
    return df.join(scored, on=[F.col(id_col) == F.col("__id")], how="left").select(
        *df.columns,
        F.col("mean_logp"),
        F.exp(-F.col("mean_logp")).alias(out_col),
    )


def perplexity_filter(
    df: DataFrame,
    lm: DataFrame,
    text_col: str,
    id_col: str,
    max_ppl: float,
    n: int = 3,
    floor_logp: float | None = None,
) -> DataFrame:
    """Keep documents whose per-char perplexity under ``lm`` is at
    most ``max_ppl`` (the CCNet head/middle-bucket move). NULL-scored
    (too-short) documents drop — they carry no evidence of fluency."""
    scored = perplexity_score(df, lm, text_col, id_col, n, floor_logp)
    return scored.filter(F.col("ppl") <= max_ppl).select(*df.columns)
