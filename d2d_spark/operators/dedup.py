"""Deduplication operators for training-data pipelines.

Five strategies, all shuffle-based and scale-out (no driver-side
state, no collect):

  exact        — hash-groupBy on a normalized fingerprint
  minhash_lsh  — shingle -> minhash signature -> banded LSH buckets ->
                 candidate pairs -> exact-Jaccard verify
  simhash      — 64-bit sign-aggregated token hashes, near-dup =
                 small Hamming distance within a band bucket
  ngram_jaccard— exact Jaccard over distinct word n-grams (the
                 verifier used standalone for small candidate sets)
  embedding    — cosine-threshold near-dup over embedding vectors

The reference's only dedup is the in-memory `quchong` set
(d22d/task.py:118-122, OOM-unsafe); everything here replaces that with
distributed equivalents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from d2d_spark.functions.text import fingerprint, shingles, tokens_ws
from d2d_spark.functions.vectors import cosine

# Large prime > 2^31 for minhash permutations.
_MERSENNE = (1 << 61) - 1


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one representative (min id) per normalized-text
    fingerprint. One shuffle on the 128-bit key; at 100 TB the
    fingerprint groupBy partitions evenly (md5 is uniform)."""
    return (
        df.withColumn("__fp", fingerprint(F.col(text_col)))
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .drop("__fp")
    )


def minhash_signature(df: DataFrame, text_col: str, num_hashes: int = 32, shingle_n: int = 3) -> DataFrame:
    """Append a `minhash` array column: per permutation j,
    min over shingles of (a_j * xxhash64(shingle) + b_j) mod M.

    Entirely columnar (transform/array_min) — each row is independent,
    so this is an embarrassingly parallel map stage.
    """
    sh = shingles(F.col(text_col), n=shingle_n)
    hashed = F.transform(sh, lambda s: F.xxhash64(s))
    # 31-bit base hash and sub-2^31 multipliers keep every product
    # under 2^62: no long overflow under ANSI mode.
    hashed31 = F.transform(hashed, lambda h: F.pmod(h, F.lit((1 << 31) - 1)))

    def perm(a, b):
        # closure (not lambda defaults): PySpark reads lambda arity
        # including defaulted params, breaking higher-order binding
        return lambda h: F.pmod(h * a + b, F.lit(_MERSENNE))

    perms = []
    for j in range(num_hashes):
        a = 2 * (j * 0x9E3779B9 % (1 << 30)) + 1  # odd, < 2^31
        b = (j * 0x85EBCA6B + 0xC2B2AE35) % (1 << 31)
        perms.append(F.array_min(F.transform(hashed31, perm(a, b))))
    return df.withColumn("minhash", F.array(*perms))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs (id_a < id_b, est. jaccard).

    Pipeline: signature -> split into `bands` bands -> hash each band
    -> explode -> self-join on (band, band_hash) = candidate pairs ->
    verify by exact Jaccard over distinct shingles -> threshold.

    Scale posture: the only shuffles are the band-bucket join (keys
    are uniform hashes) and the final distinct; candidates per bucket
    stay small because a band collision already implies high
    similarity. No O(n^2) stage anywhere.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature(df, text_col, num_hashes, shingle_n).select(
        F.col(id_col).alias("__id"),
        F.col("minhash"),
        F.array_distinct(shingles(F.col(text_col), shingle_n)).alias("__sh"),
    )
    banded = sig.select(
        "__id",
        "__sh",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                F.col("minhash")[i].cast("string")
                                for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                            ],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("__band", "__bh"),
    )
    left = banded.select(
        F.col("__id").alias("id_a"), F.col("__sh").alias("sh_a"), "__band", "__bh"
    )
    right = banded.select(
        F.col("__id").alias("id_b"), F.col("__sh").alias("sh_b"), "__band", "__bh"
    )
    cand = (
        left.join(right, on=["__band", "__bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(df: DataFrame, text_col: str) -> DataFrame:
    """Append a 64-bit `simhash` column: for each bit k, sign of the
    sum over tokens of (+1 if bit k of xxhash64(token) else -1)."""
    toks = F.array_distinct(tokens_ws(F.lower(F.col(text_col))))
    hashed = F.transform(toks, lambda t: F.xxhash64(t))

    def bit_contrib(k):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, k).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    out = F.lit(0).cast("long")
    for k in range(64):
        contrib = F.aggregate(hashed, F.lit(0), bit_contrib(k))
        bit = F.when(contrib > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        out = out + F.shiftleft(bit, k)
    return df.withColumn("simhash", out)


def simhash_near_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 8
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance, banded on 16-bit
    chunks (Pigeonhole: distance<=8 over 64 bits guarantees at least
    one of 4 chunks is exactly equal) so the join is equi, not theta."""
    sh = simhash64(df, text_col).select(F.col(id_col).alias("__id"), "simhash")
    chunks = sh.select(
        "__id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), 16 * c).bitwiseAND(F.lit(0xFFFF))
                    for c in range(4)
                ]
            )
        ).alias("__chunk", "__cv"),
    )
    l = chunks.select(F.col("__id").alias("id_a"), F.col("simhash").alias("sh_a"), "__chunk", "__cv")
    r = chunks.select(F.col("__id").alias("id_b"), F.col("simhash").alias("sh_b"), "__chunk", "__cv")
    cand = (
        l.join(r, on=["__chunk", "__cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard over all pairs — the quadratic baseline
    the LSH paths approximate. Only for bounded candidate sets."""
    sh = df.select(
        F.col(id_col).alias("__id"),
        F.array_distinct(shingles(F.col(text_col), n)).alias("__sh"),
    )
    a = sh.select(F.col("__id").alias("id_a"), F.col("__sh").alias("sh_a"))
    b = sh.select(F.col("__id").alias("id_b"), F.col("__sh").alias("sh_b"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def embedding_near_pairs(
    emb: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs. Quadratic form for
    bounded sets; route through sign_projection_bucket (similarity.py)
    to band it at scale."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    sim = cosine(F.col("v_a"), F.col("v_b"))
    return (
        pairs.withColumn("cos_sim", sim)
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )
