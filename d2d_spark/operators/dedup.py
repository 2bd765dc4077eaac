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
from d2d_spark.functions.vectors import as_double, dot, norm

# Large prime > 2^31 for minhash permutations.
_MERSENNE = (1 << 61) - 1

# Above this input size, an all-pairs crossJoin is a cartesian blowup,
# not a verify step — the quadratic ground-truth operators refuse it
# unless the caller explicitly opts in.
QUADRATIC_CAP = 20_000

#: phonetic_blocked_pairs' deliberate-broadcast bounds (guide §3.1):
#: the hint bypasses Catalyst's size-estimate protection, so it only
#: fires when the probe has MEASURED the build side under both a row
#: and a byte cap (r12 ADVICE — the row bound alone is byte-blind).
_FORCED_BROADCAST_MAX_ROWS = 1_000_000
_FORCED_BROADCAST_MAX_BYTES = 64 << 20


def _spread(df: DataFrame, npart: int, *cols, full: bool = False) -> DataFrame:
    """Repartition to ``npart`` ONLY when the upstream scan is too
    narrow to parallelize the following map/join stage (a one-file
    local fixture: 1-2 input splits). A 100 TB table arrives in
    thousands of splits already — skipping the repartition there
    avoids a full-corpus shuffle whose only purpose is small-scan
    spreading. Partition count never changes results, only layout.

    Two thresholds, chosen per call site:

    ``full=False`` (default) — skip once the scan is at half width.
    Right for shuffle-dominated stages whose payload is the full
    text column (minhash/simhash signatures): re-shuffling the
    corpus costs more than the lost half of the cores (measured:
    minhash 4.47s -> 2.70s when the skip landed).

    ``full=True`` — skip only at FULL width (>= npart). Right for
    compute-bound stages (cosine/dot-product over fixed-width
    vectors): running them at half the cores costs more than one
    round-robin spread of a narrow scan — a 16-split scan on 32
    cores regressed ann_bruteforce_topk 40% under the half rule."""
    floor = npart if full else npart // 2
    if df.rdd.getNumPartitions() >= max(2, floor):
        return df
    return df.repartition(npart, *cols) if cols else df.repartition(npart)


def _guard_quadratic(df: DataFrame, what: str, allow_quadratic: bool, cap: int) -> None:
    """Refuse unbounded inputs to O(n^2) operators. The probe is
    bounded — ``limit(cap+1)`` short-circuits the scan after cap+1
    rows, so guarding a 100 TB input costs ~cap rows, not a full
    count of the very table the guard protects against. Pass
    ``allow_quadratic=True`` only for inputs that are bounded
    candidate sets by construction."""
    if allow_quadratic:
        return
    n = df.limit(cap + 1).count()
    if n > cap:
        raise ValueError(
            f"{what}: input exceeds the all-pairs cap ({cap:,} rows); an "
            "n^2 crossJoin would materialize an unbounded candidate-pair "
            "set. Route candidates through a banded path instead "
            "(minhash_lsh_pairs / simhash_near_pairs / fuzzy_pairs_lsh / "
            "similarity.lsh_topk), or pass allow_quadratic=True if this "
            "input really is a bounded candidate set."
        )


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


def _perm_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs: a odd and < 2^31 so products of
    31-bit hashes stay under 2^62 — no long overflow under ANSI."""
    return [
        (
            2 * (j * 0x9E3779B9 % (1 << 30)) + 1,
            (j * 0x85EBCA6B + 0xC2B2AE35) % (1 << 31),
        )
        for j in range(num_hashes)
    ]


def _hashed_shingles(text: Column, shingle_n: int) -> Column:
    """31-bit hash per distinct shingle — the minhash input domain."""
    return F.transform(
        shingles(text, n=shingle_n),
        lambda s: F.pmod(F.xxhash64(s), F.lit((1 << 31) - 1)),
    )


def minhash_signature(
    df: DataFrame,
    text_col: str,
    num_hashes: int = 32,
    shingle_n: int = 3,
    impl: str = "arrow",
    emit_hashed_shingles: bool = False,
) -> DataFrame:
    """Append a `minhash` array column: per permutation j,
    min over shingles of (a_j * hash(shingle) + b_j) mod M.
    ``emit_hashed_shingles`` adds a `__hset` column (sorted distinct
    shingle hashes) in the same pass, so a downstream exact-Jaccard
    verify needs no second tokenization stage.

    ``impl='arrow'`` (default): Arrow-batched mapInPandas with the
    permutation matrix as one vectorized numpy broadcast per document
    — the justified Pandas-UDF exception: the pure-Column alternative
    runs 32 interpreted higher-order folds (HOFs never enter
    whole-stage codegen) and measures ~10x slower. Deterministic
    crc32-based hashing, so signatures reproduce across runs/engines.

    ``impl='expr'``: pure Column expressions. Two separate projections
    on purpose: the shingle+hash chain lands in its own column — an
    expensive alias referenced ``num_hashes`` times is NOT inlined by
    CollapseProject, pinning one evaluation per row (folding it into
    each permutation expression re-tokenizes the document 32x,
    measured ~30x slowdown).

    Either way each row is independent — an embarrassingly parallel
    map stage.
    """
    if impl == "arrow":
        return _minhash_signature_arrow(df, text_col, num_hashes, shingle_n, emit_hashed_shingles)

    def perm(a, b):
        # closure (not lambda defaults): PySpark reads lambda arity
        # including defaulted params, breaking higher-order binding
        return lambda h: F.pmod(h * a + b, F.lit(_MERSENNE))

    hashed = df.withColumn("__h31", _hashed_shingles(F.col(text_col), shingle_n))
    mins = [F.array_min(F.transform(F.col("__h31"), perm(a, b))) for a, b in _perm_coeffs(num_hashes)]
    out = hashed.withColumn("minhash", F.array(*mins))
    if emit_hashed_shingles:
        return out.withColumn("__hset", F.array_sort(F.array_distinct(F.col("__h31")))).drop("__h31")
    return out.drop("__h31")


#: per-task token-hash cache bound — zipfian corpora fit comfortably;
#: high-cardinality token streams (ids, hashes) reset instead of
#: growing a worker dict without bound. A reset only costs crc32
#: recomputes, never correctness.
TOKEN_CACHE_CAP = 1 << 19


def _minhash_signature_arrow(
    df: DataFrame,
    text_col: str,
    num_hashes: int,
    shingle_n: int,
    emit_hashed_shingles: bool = False,
    token_cache_cap: int = TOKEN_CACHE_CAP,
) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    coeffs = _perm_coeffs(num_hashes)
    a_vec = [c[0] for c in coeffs]
    b_vec = [c[1] for c in coeffs]
    fields = list(df.schema.fields) + [T.StructField("minhash", T.ArrayType(T.LongType()))]
    if emit_hashed_shingles:
        fields.append(T.StructField("__hset", T.ArrayType(T.LongType())))
    out_schema = T.StructType(fields)

    # distinct per-position multipliers + a murmur3 finalizer decorrelate
    # the combined shingle hash from its token hashes (a bare linear
    # combination has structured collisions)
    pos_mult = [0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
                0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63][:shingle_n] or [0x9E3779B185EBCA87]
    while len(pos_mult) < shingle_n:
        pos_mult.append((pos_mult[-1] * 0x9E3779B1) & 0xFFFFFFFFFFFFFFFF)

    def gen(batches):
        import zlib

        a = np.asarray(a_vec, dtype=np.uint64)[:, None]
        b = np.asarray(b_vec, dtype=np.uint64)[:, None]
        m_big = np.uint64(_MERSENNE)
        empty_sig = [int(x) for x in ((b[:, 0]) % m_big)]
        mults = [np.uint64(m) for m in pos_mult]
        mask31 = np.uint64(0x7FFFFFFF)
        # token-hash cache shared across the batch stream: corpus token
        # frequency is zipfian, so most crc32 calls become dict hits;
        # bounded so a 100 TB vocabulary can't OOM the worker
        cache: dict[str, int] = {}
        crc32 = zlib.crc32

        def tok_hashes(toks):
            out = np.empty(len(toks), dtype=np.uint64)
            for i, t in enumerate(toks):
                v = cache.get(t)
                if v is None:
                    v = crc32(t.encode("utf-8")) & 0x7FFFFFFF
                    if len(cache) >= token_cache_cap:
                        cache.clear()
                    cache[t] = v
                out[i] = v
            return out

        with np.errstate(over="ignore"):  # uint64 wrap is the hash mix
            for pdf in batches:
                sigs, hsets = [], []
                for text in pdf[text_col]:
                    toks = (text or "").split()
                    if not toks:
                        sigs.append(empty_sig)
                        hsets.append([])
                        continue
                    th = tok_hashes(toks)
                    width = min(len(th), shingle_n)
                    n_grams = len(th) - width + 1
                    # combined shingle hash, vectorized over positions:
                    # sum_k mult[k] * tok_hash[i+k], then murmur3-mix,
                    # masked to 31 bits (keeps a*g + b under 2^62)
                    g = np.zeros(n_grams, dtype=np.uint64)
                    for k in range(width):
                        g += mults[k] * th[k : n_grams + k]
                    g ^= g >> np.uint64(33)
                    g *= np.uint64(0xFF51AFD7ED558CCD)
                    g ^= g >> np.uint64(33)
                    g = np.unique(g & mask31)
                    sigs.append(
                        [int(x) for x in ((a * g[None, :] + b) % m_big).min(axis=1)]
                    )
                    if emit_hashed_shingles:
                        hsets.append([int(x) for x in g])
                out = pdf.copy()
                out["minhash"] = pd.Series(sigs, index=pdf.index)
                if emit_hashed_shingles:
                    out["__hset"] = pd.Series(hsets, index=pdf.index)
                yield out

    return df.mapInPandas(gen, schema=out_schema)


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

    Scale posture: the band join carries ONLY (id, band, band_hash) —
    never the shingle arrays, which would multiply shuffle volume by
    bands x avg-doc-size. The signature pass emits the hashed shingle
    sets alongside the signature (one tokenization for the whole
    pipeline), and the exchange placed ABOVE that stage is reused by
    the band branch and both verify branches — the Python stage runs
    exactly once. Verification intersects integer hash sets, not
    strings. The only shuffles are the two repartitions, the
    band-bucket join (uniform hash keys), and the pair distinct.
    No O(n^2) stage anywhere.
    """
    if bands < 1 or bands > num_hashes or num_hashes % bands:
        # the same refusal _band_candidates makes, hoisted BEFORE the
        # signature stage runs and persists — a bad call costs nothing
        # and leaks no registered cache entry
        raise ValueError(
            f"bands ({bands}) must be in [1, num_hashes] and divide "
            f"num_hashes ({num_hashes})"
        )
    npart = df.sparkSession.sparkContext.defaultParallelism
    # Exchange below the Python stage spreads the map work off a
    # one-file scan. The signature output feeds THREE branches (bands
    # + both verify sides): persist(MEMORY_AND_DISK) materializes the
    # Python stage once and is strictly better than the previous
    # repartition-for-ReuseExchange trick (~20% on the planted-clone
    # bench) — lineage stays intact, so a lost executor recomputes
    # its blocks instead of failing the job, and blocks spill/evict
    # under pressure rather than OOM.
    # Deliberate trade-off: the cached plan is NOT unpersisted (the
    # result is returned lazily, so there is no safe point inside this
    # function), and plan construction is eager (the fill count runs
    # here — a job runs even if the caller never consumes the
    # result). Spark's CacheManager matches the plan across repeated
    # identical calls — a rerun reuses the blocks instead of
    # recomputing (measured 4.5s -> 1.6s steady state). Distinct
    # inputs each leave a cache entry: MEMORY evicts under pressure,
    # but the DISK halves of MEMORY_AND_DISK blocks persist until
    # unpersist/clearCache and accumulate without bound in a
    # long-lived session cycling many corpora. Callers in that shape
    # release per-corpus via d2d_spark.cache.release("minhash_lsh")
    # after consuming the pairs (always safe — lineage is intact, an
    # early release only costs a recompute), or clearCache() for the
    # blunt version.
    from pyspark import StorageLevel

    from d2d_spark import cache as opcache

    base = _spread(df.select(F.col(id_col).alias("__id"), F.col(text_col)), npart, "__id")
    sig = opcache.register(
        "minhash_lsh",
        minhash_signature(base, text_col, num_hashes, shingle_n, emit_hashed_shingles=True)
        .select("__id", "minhash", "__hset")
        .persist(StorageLevel.MEMORY_AND_DISK),
    )
    # Materialize the cache EAGERLY: the three consumers below all sit
    # inside one job, and Spark's block cache does not dedupe
    # *concurrent* first computations — branches racing on an unfilled
    # cache each rerun the Python signature stage (measured: up to 3x
    # the stage, with high run-to-run variance). One cheap count pins
    # the blocks first; lineage stays intact for fault recovery.
    sig.count()
    cand = _band_candidates(sig, "minhash", num_hashes, bands)
    sh_tbl = sig.select("__id", F.col("__hset").alias("__sh"))
    verified = (
        cand.join(sh_tbl.select(F.col("__id").alias("id_a"), F.col("__sh").alias("sh_a")), "id_a")
        .join(sh_tbl.select(F.col("__id").alias("id_b"), F.col("__sh").alias("sh_b")), "id_b")
        # shingle-less docs (empty/whitespace text) share the empty
        # signature and band together; 0/0 jaccard would throw under
        # ANSI — they are not meaningful near-dups, drop them
        .filter((F.size("sh_a") > 0) & (F.size("sh_b") > 0))
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        verified.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(df: DataFrame, text_col: str) -> DataFrame:
    """Append a 64-bit `simhash` column: for each bit k, sign of the
    sum over tokens of (+1 if bit k of xxhash64(token) else -1).

    The hashed-token array gets its own projection (same
    CollapseProject reasoning as minhash_signature): the 64 per-bit
    aggregates each reference the `__th` column, not the tokenizer
    expression, so tokenization happens once per row."""

    def bit_contrib(k):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, k).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    hashed = df.withColumn(
        "__th",
        F.transform(
            F.array_distinct(tokens_ws(F.lower(F.col(text_col)))),
            lambda t: F.xxhash64(t),
        ),
    )
    out = F.lit(0).cast("long")
    for k in range(64):
        contrib = F.aggregate(F.col("__th"), F.lit(0), bit_contrib(k))
        bit = F.when(contrib > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        out = out + F.shiftleft(bit, k)
    return hashed.withColumn("simhash", out).drop("__th")


def hamming_near_pairs(
    hashed: DataFrame, hash_col: str, id_col: str, max_hamming: int = 8
) -> DataFrame:
    """(id_a < id_b, hamming) pairs whose 64-bit ``hash_col`` values
    differ in at most ``max_hamming`` bits — the banded-equi-join core
    shared by simhash (text) and perceptual-hash (image) dedup.

    Pigeonhole with FULL recall needs max_hamming + 1 chunks: d
    differing bits can dirty at most d chunks, so with d+1 chunks at
    least one chunk matches exactly. Chunk count (and so bucket
    density and candidate volume) therefore scales with the distance
    asked for — small max_hamming is the cheap regime, exactly like
    the published simhash dedup setups (k=3, 4 chunks). The input is
    consumed as-is (callers persist their hash stage when it is
    expensive — see simhash_near_pairs)."""
    n_chunks = min(max_hamming + 1, 64)
    width = 64 // n_chunks
    widths = [width + (1 if c < 64 % n_chunks else 0) for c in range(n_chunks)]
    offsets = [sum(widths[:c]) for c in range(n_chunks)]
    # a 64-bit-wide chunk (max_hamming=0) masks with all-ones, which is
    # -1 as a signed long — (1<<64)-1 overflows the JVM literal
    masks = [(1 << w) - 1 if w < 64 else -1 for w in widths]
    sh = hashed.select(F.col(id_col).alias("__id"), F.col(hash_col).alias("__h"))
    chunks = sh.select(
        "__id",
        "__h",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("__h"), offsets[c]).bitwiseAND(F.lit(masks[c]))
                    for c in range(n_chunks)
                ]
            )
        ).alias("__chunk", "__cv"),
    )
    l = chunks.select(F.col("__id").alias("id_a"), F.col("__h").alias("sh_a"), "__chunk", "__cv")
    r = chunks.select(F.col("__id").alias("id_b"), F.col("__h").alias("sh_b"), "__chunk", "__cv")
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


def simhash_near_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 8
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance — `simhash64` then
    the shared `hamming_near_pairs` banded core."""
    npart = df.sparkSession.sparkContext.defaultParallelism
    base = _spread(df.select(F.col(id_col).alias("__id"), F.col(text_col)), npart, "__id")
    # the simhash expression is 64 aggregates over the token array —
    # persist so the self-join's two sides read it instead of each
    # re-evaluating it (~5x on the planted-clone bench); lineage kept,
    # blocks spill/evict under pressure
    from pyspark import StorageLevel

    from d2d_spark import cache as opcache

    sh = opcache.register(
        "simhash",
        simhash64(base, text_col)
        .select("__id", "simhash")
        .persist(StorageLevel.MEMORY_AND_DISK),
    )
    sh.count()  # fill the cache before the self-join branches race on it
    return hamming_near_pairs(sh, "simhash", "__id", max_hamming)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    allow_quadratic: bool = False,
    cap: int = QUADRATIC_CAP,
) -> DataFrame:
    """Exact n-gram Jaccard over all pairs — the quadratic baseline
    the LSH paths approximate. Guarded: inputs above ``cap`` rows are
    refused unless ``allow_quadratic=True`` (use minhash_lsh_pairs and
    verify on its candidates at scale)."""
    _guard_quadratic(df, "ngram_jaccard_pairs", allow_quadratic, cap)
    npart = df.sparkSession.sparkContext.defaultParallelism
    # shingles hash to int64 BEFORE the pair stage: the O(|a|*|b|)
    # intersect/union folds then compare 8-byte longs instead of
    # ~20-char strings (~1.6x on the verify stage); jaccard values are
    # identical absent a 64-bit collision (~2^-64 per shingle pair)
    from pyspark import StorageLevel

    # persisted: shingling runs once, not once per cross-join side
    sh = df.select(
        F.col(id_col).alias("__id"),
        F.array_distinct(
            F.transform(shingles(F.col(text_col), n), lambda s: F.xxhash64(s))
        ).alias("__sh"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    sh.count()  # fill the cache before the cross-join sides race on it
    # Spread the probe side so the quadratic verify runs on all cores
    # (broadcast-nested-loop parallelism = left-side partitions).
    a = _spread(sh, npart, full=True).select(
        F.col("__id").alias("id_a"), F.col("__sh").alias("sh_a")
    )
    b = sh.select(F.col("__id").alias("id_b"), F.col("__sh").alias("sh_b"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    # size-ratio prefilter: jaccard <= min(|a|,|b|)/max(|a|,|b|), so
    # mismatched sizes can never pass the threshold — prunes pairs
    # before the expensive intersect/union folds
    sa, sb = F.size("sh_a"), F.size("sh_b")
    pairs = pairs.filter((sa >= threshold * sb) & (sb >= threshold * sa))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _weighted_profiles(
    df: DataFrame,
    id_col: str,
    token_col: str,
    weight_col: str,
    what: str,
    validate: bool = True,
) -> DataFrame:
    """Validated long-format weighted profiles as (__id, __t, __w):
    refuses NULL ids/tokens, NULL/non-positive weights, and duplicate
    (id, token) rows — shared contract of the weighted-similarity
    operators. A NULL token would be silently wrong, not loud: it
    passes a weight probe and groups as a duplicate key, inflates the
    profile size sums, but can never match in the token equi-join
    (NULL != NULL), so two exact clones would score below 100%.

    Validation is ONE full aggregate pass (bad-row count + distinct
    (id, token) count in the same job); an example row is fetched
    only on the failure path. Pre-validated pipelines can skip even
    that pass with ``validate=False`` — with garbage input the
    operators then return silently wrong ratios, so only set it when
    the frame provably satisfies the contract (e.g. it came from a
    groupBy that owns the key)."""
    w = F.col(weight_col)
    out = df.select(
        F.col(id_col).alias("__id"), F.col(token_col).alias("__t"), w.alias("__w")
    )
    if validate:
        _validate_profiles(out, what)
    return out


def _validate_profiles(out: DataFrame, what: str, extra_cond=None, extra_msg=None) -> None:
    """The one-pass contract check over a (__id, __t, __w) frame —
    split out so callers that persist the frame first can validate ON
    the cached copy (the first aggregate fills the cache, and the
    failure-path example fetch reads it too, instead of re-running
    the upstream tokenize per probe)."""
    w = F.col("__w")
    bad_cond = w.isNull() | (w <= 0) | F.col("__id").isNull() | F.col("__t").isNull()
    aggs = [
        F.count(F.lit(1)).alias("__n"),
        F.sum(bad_cond.cast("long")).alias("__nbad"),
        # count_distinct skips rows with a NULL id/token, but those
        # are already counted in __nbad and raise first — so with
        # __nbad == 0, __n != __nkey iff duplicate (id, token) keys
        F.count_distinct(F.col("__id"), F.col("__t")).alias("__nkey"),
    ]
    if extra_cond is not None:
        # caller-specific refusal rides the SAME pass (the one-scan
        # discipline): e.g. the weighted-minhash replica bomb
        aggs.append(F.sum(extra_cond.cast("long")).alias("__nextra"))
    stats = out.agg(*aggs).collect()[0]

    def _example(cond):
        # re-running a NONDETERMINISTIC upstream may not reproduce the
        # counted bad row — fall back to a no-example message instead
        # of masking the contract error with an IndexError
        got = out.filter(cond).limit(1).collect()
        return got[0] if got else None

    if stats["__nbad"]:
        bad = _example(bad_cond)
        detail = (
            f"row (id={bad['__id']!r}, token={bad['__t']!r}, weight={bad['__w']!r})"
            if bad is not None
            else f"{stats['__nbad']} row(s) (no example reproducible — "
            "nondeterministic upstream?)"
        )
        raise ValueError(
            f"{what}: {detail} has a NULL id/token or a "
            "NULL/non-positive weight — drop or fix upstream"
        )
    if stats["__n"] != stats["__nkey"]:
        raise ValueError(
            f"{what}: duplicate (id, token) rows — a token's "
            "weight per document must be a single number; aggregate upstream"
        )
    if extra_cond is not None and stats["__nextra"]:
        raise ValueError(f"{what}: {extra_msg(_example(extra_cond))}")


def _df_capped(wt: DataFrame, max_df: int | None) -> DataFrame:
    """Drop tokens whose document frequency exceeds ``max_df`` — the
    stop-token dial shared by the weighted-pair operators (overlaps
    AND sizes are both measured on the filtered profiles, the
    standard convention). One window over the token key."""
    if max_df is None:
        return wt
    from pyspark.sql import Window

    return (
        wt.withColumn("__df", F.count(F.lit(1)).over(Window.partitionBy("__t")))
        .filter(F.col("__df") <= max_df)
        .drop("__df")
    )


def _weighted_pairs_output(
    shared: DataFrame, sizes: DataFrame, threshold_pct: int
) -> DataFrame:
    """Shared tail of the weighted-pair operators: join per-id sizes
    onto per-pair overlaps and apply the cross-multiplied threshold
    (max = a+b-min identity), emitting the common
    (id_a, id_b, w_shared, w_a, w_b) contract."""
    out = (
        shared.join(
            sizes.select(F.col("__id").alias("id_a"), F.col("__wt").alias("w_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col("__id").alias("id_b"), F.col("__wt").alias("w_b")),
            "id_b",
        )
        .filter(
            F.col("w_shared") * 100
            >= F.lit(threshold_pct)
            * (F.col("w_a") + F.col("w_b") - F.col("w_shared"))
        )
    )
    return out.select("id_a", "id_b", "w_shared", "w_a", "w_b")


def _band_candidates(sig: DataFrame, sig_col: str, num_hashes: int, bands: int) -> DataFrame:
    """Distinct (id_a, id_b) pairs whose ``sig_col`` signature array
    agrees on at least one of ``bands`` equal slices — the shared LSH
    bucket join (ids only on the wire). Refuses band counts that would
    silently truncate the signature (num_hashes // bands dropping
    permutations) or silently emit nothing (bands < 1)."""
    if bands < 1 or bands > num_hashes or num_hashes % bands:
        raise ValueError(
            f"bands ({bands}) must be in [1, num_hashes] and divide "
            f"num_hashes ({num_hashes}) — anything else silently drops "
            "permutations or emits no candidates"
        )
    rows_per_band = num_hashes // bands
    band_hashes = F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.col(sig_col)[i].cast("string")
                        for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                    ],
                )
            )
            for b in range(bands)
        ]
    )
    banded = sig.select("__id", F.posexplode(band_hashes).alias("__band", "__bh"))
    return (
        banded.select(F.col("__id").alias("id_a"), "__band", "__bh")
        .join(
            banded.select(F.col("__id").alias("id_b"), "__band", "__bh"),
            ["__band", "__bh"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def weighted_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    token_col: str,
    weight_col: str,
    threshold_pct: int = 50,
    max_df: int | None = 1000,
    validate: bool = True,
) -> DataFrame:
    """EXACT weighted-Jaccard near-pairs over a long-format
    (id, token, weight) frame:

        J_w(A, B) = sum_t min(w_A(t), w_B(t)) / sum_t max(w_A(t), w_B(t))

    — the weighted sibling of `ngram_jaccard_pairs` for the cases
    where token IMPORTANCE matters, not membership: tf or tf-idf
    weighted document similarity (a doc repeating a rare term 40x is
    nearer its source than one mentioning it once), weighted user/
    item profiles, histogram overlap. Returns
    (id_a, id_b, w_shared, w_a, w_b) for every pair with
    ``100 * w_shared >= threshold_pct * (w_a + w_b - w_shared)`` —
    the identity max(a,b) = a + b - min(a,b) means ONE sum-of-min
    per pair recovers the whole measure, so no per-pair union
    materializes. With integral weights every sum is a long and the
    cross-multiplied predicate is exact and engine-portable;
    fractional weights sum as double (last-ulp partition drift
    possible — discretize upstream when exactness matters).

    Shape: one duplicate/positivity probe (a single aggregate pass;
    ``validate=False`` skips it for pre-validated pipelines), optional
    df cap on the token (the stop-token dial winnow/tfidf use —
    overlap and sizes are BOTH measured on the filtered sets, the
    standard convention), per-id size aggregate, then a token
    equi-join whose fan-out is bounded by per-token document
    frequency: sum(df^2) candidate rows, never |corpus|^2. The scale
    posture is identical to winnow_near_pairs' join stage."""
    if not 1 <= threshold_pct <= 100:
        raise ValueError(f"threshold_pct must be in [1, 100], got {threshold_pct}")
    if max_df is not None and max_df < 2:
        raise ValueError(f"max_df must be >= 2 (or None), got {max_df}")
    wt = _weighted_profiles(
        df, id_col, token_col, weight_col, "weighted_jaccard_pairs", validate=validate
    )
    wt = _df_capped(wt, max_df)
    sizes = wt.groupBy("__id").agg(F.sum("__w").alias("__wt"))
    a = wt.select(F.col("__id").alias("id_a"), "__t", F.col("__w").alias("__wa"))
    b = wt.select(F.col("__id").alias("id_b"), "__t", F.col("__w").alias("__wb"))
    shared = (
        a.join(b, "__t")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.least("__wa", "__wb")).alias("w_shared"))
    )
    return _weighted_pairs_output(shared, sizes, threshold_pct)


def phonetic_blocked_pairs(
    df: DataFrame,
    name_col: str,
    id_col: str,
    max_dist: int = 2,
    max_block: int = 100_000,
) -> DataFrame:
    """Entity-resolution blocking by PHONETIC key: names are bucketed
    by their American Soundex code (JVM-side `F.soundex` — 'Robert'
    and 'Rupert' share R163), pairs form only WITHIN a block, and an
    exact Levenshtein verify (the early-exit threshold form) keeps
    precision 1.0. The classic cheap blocking strategy for
    person/organization-name matching: unlike `fuzzy_pairs_deletion`
    (FastSS — guaranteed recall, cost grows with the deletion
    neighborhood), soundex blocking TRADES recall (typos in the first
    letter, or ones that change the code, escape the block) for one
    equi-join — pick it when names are long and sounds-alike recall is
    the goal. Returns (id_a, id_b, dist, code).

    Shape: one groupBy probe (block-bomb refusal: within-block work is
    block², so a block above ``max_block`` refuses loudly — common
    surnames at planet scale need a second blocking key), then one
    code equi-join with id ordering and the thresholded Levenshtein
    residual. NULL names/codes never pair (equi-join semantics)."""
    if max_dist < 0:
        raise ValueError(f"phonetic_blocked_pairs: max_dist must be >= 0, got {max_dist}")
    if max_block < 2:
        raise ValueError(f"phonetic_blocked_pairs: max_block must be >= 2, got {max_block}")
    coded = df.select(
        F.col(id_col).alias("__id"),
        F.col(name_col).alias("__name"),
        F.soundex(F.col(name_col)).alias("__code"),
    )
    # r12 (ADVICE): rows with a NULL soundex code can never pair (equi-
    # join semantics), so they are dropped HERE — the probe below and
    # the frame the forced broadcast ships must measure the SAME rows,
    # or a frame of mostly-NULL names passes the row bound while the
    # broadcast carries the unmeasured bulk.
    coded = coded.filter(F.col("__code").isNotNull())
    stats = (
        # NULL codes never pair (equi-join semantics), so a pile of
        # NULL names is zero quadratic work — not a bomb. r11: the
        # same single probe job also measures the coded-side total so
        # the join strategy below is picked deliberately (guide §3.1)
        # instead of from Catalyst's size estimate. NOTE the probe is
        # a full two-level aggregate even on a refusing input (it no
        # longer short-circuits at the first offending block); the
        # total measurement needs the complete pass, and the refusal
        # path paying one extra aggregate is the accepted trade.
        coded.groupBy("__code")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.octet_length("__name")).alias("__b"),
        )
        .agg(
            F.max("__n").alias("mx"),
            F.max_by("__code", "__n").alias("mxc"),
            F.sum("__n").alias("tot"),
            F.sum("__b").alias("totb"),
        )
        .collect()[0]
    )
    if stats["mx"] is not None and stats["mx"] > max_block:
        raise ValueError(
            f"phonetic_blocked_pairs: soundex block {stats['mxc']!r} holds "
            f"{stats['mx']} names (> max_block={max_block}) — within-block "
            "work is quadratic; add a second blocking key (e.g. url_host, "
            "country) or use fuzzy_pairs_deletion"
        )
    total = stats["tot"] or 0
    a = coded.select(
        F.col("__id").alias("id_a"), F.col("__name").alias("__na"), "__code"
    )
    b = coded.select(
        F.col("__id").alias("id_b"), F.col("__name").alias("__nb"), "__code"
    )
    # r11 (guide §2.5 skew + §3.1): when the planner broadcasts the
    # block side of this equi-join, the O(block²) Levenshtein verify
    # inherits the STREAM side's partitioning — for a small or compact
    # source that is one or two scan partitions, i.e. ONE task does
    # all the quadratic work while the rest of the cluster idles. The
    # probe just measured the coded side exactly, so pick the strategy
    # deliberately: a provably-small block side is broadcast by hint
    # (not by Catalyst's estimate) and the probe side is spread by
    # (code, id) — relocating rows only, the pair set is invariant
    # under a's partitioning — with an explicit partition count so AQE
    # cannot coalesce the tiny-by-bytes exchange whose per-row cost (a
    # block-sized verify fan-out) is what matters. Past the broadcast
    # bound the plain equi-join stands (sort-merge regime: verify
    # parallelism is per-code and max_block bounds the skew).
    # r12 (ADVICE): the forced broadcast is gated on BYTES as well as
    # rows — the row bound alone is byte-blind (a million wide names is
    # a multi-hundred-MB forced relation, bypassing Catalyst's own
    # size protection). Estimated relation size = measured name bytes
    # plus ~48 B/row of id/code/hash-entry overhead; past either bound
    # the plain equi-join stands and Catalyst picks the strategy.
    est_bytes = int(stats["totb"] or 0) + total * 48
    if total <= _FORCED_BROADCAST_MAX_ROWS and est_bytes <= _FORCED_BROADCAST_MAX_BYTES:
        n_spread = df.sparkSession.sparkContext.defaultParallelism
        a = a.repartition(n_spread, "__code", "id_a")
        b = F.broadcast(b)
    # 3-arg levenshtein early-exits past the threshold (returns -1)
    dist = F.levenshtein(F.col("__na"), F.col("__nb"), max_dist)
    return (
        a.join(b, "__code")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", dist)
        .filter(F.col("dist") >= 0)
        .select("id_a", "id_b", F.col("dist").cast("long").alias("dist"),
                F.col("__code").alias("code"))
    )


def weighted_cosine_pairs(
    df: DataFrame,
    id_col: str,
    token_col: str,
    weight_col: str,
    threshold_pct: int = 60,
    max_df: int | None = 1000,
    validate: bool = True,
) -> DataFrame:
    """EXACT sparse-cosine near-pairs over a long-format
    (id, token, weight) frame:

        cos(A, B) = sum_t w_A(t)·w_B(t) / (||A|| · ||B||)

    — the third weighted-similarity measure next to weighted Jaccard
    (min/max overlap) and embedding cosine (dense vectors): the
    classic tf / tf-idf document-similarity join (Bayardo et al. 2007
    target the same measure), scale-INVARIANT where weighted Jaccard
    is scale-sensitive (a doc and its double-length concatenation
    score 1.0 here). Returns (id_a, id_b, dot, nsq_a, nsq_b, cos_sim)
    for every pair with cos >= threshold_pct/100. With INTEGRAL
    weight types the cut is decided EXACTLY: since weights are
    positive, cos >= t iff

        10000 · dot² >= threshold_pct² · nsq_a · nsq_b

    — all integer products, evaluated in DECIMAL(38,0) (HUGEINT-class
    exactness; a pathological profile overflowing 38 digits fails
    LOUDLY under ANSI instead of corrupting the cut), and the emitted
    cos_sim is one multiply + sqrt + divide over exact longs —
    bit-identical across engines with NO rounding. FRACTIONAL weight
    types (tf-idf doubles) use the same inequality as plain float
    arithmetic instead — casting a fractional sum to scale-0 decimal
    would quantize it and corrupt the cut — with the
    weighted_jaccard_pairs caveat (last-ulp drift possible at the
    exact boundary; discretize upstream when the cut must be exact).

    Shape: identical to weighted_jaccard_pairs — one validation
    aggregate (skippable), the df cap (dot and norms BOTH measured on
    the filtered profiles), per-id norm aggregate, one token equi-join
    bounded by sum(df²) candidates. The same 100-TB posture."""
    if not 1 <= threshold_pct <= 100:
        raise ValueError(f"threshold_pct must be in [1, 100], got {threshold_pct}")
    if max_df is not None and max_df < 2:
        raise ValueError(f"max_df must be >= 2 (or None), got {max_df}")
    wt = _weighted_profiles(
        df, id_col, token_col, weight_col, "weighted_cosine_pairs", validate=validate
    )
    wt = _df_capped(wt, max_df)
    sizes = wt.groupBy("__id").agg(F.sum(F.col("__w") * F.col("__w")).alias("__nsq"))
    a = wt.select(F.col("__id").alias("id_a"), "__t", F.col("__w").alias("__wa"))
    b = wt.select(F.col("__id").alias("id_b"), "__t", F.col("__w").alias("__wb"))
    shared = (
        a.join(b, "__t")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("__wa") * F.col("__wb")).alias("dot"))
    )
    out = shared.join(
        sizes.select(F.col("__id").alias("id_a"), F.col("__nsq").alias("nsq_a")),
        "id_a",
    ).join(
        sizes.select(F.col("__id").alias("id_b"), F.col("__nsq").alias("nsq_b")),
        "id_b",
    )
    # the exact DECIMAL(38,0) cross-product predicate only makes sense
    # when dot/nsq are integers — casting a FRACTIONAL sum to scale-0
    # decimal would quantize it (nsq 0.3 -> 0, rhs = 0, every
    # token-sharing pair passes any threshold). Integral weight types
    # keep the advertised engine-exact cut; fractional weights (tf-idf
    # doubles) fall back to the plain float comparison with the same
    # last-ulp caveat weighted_jaccard_pairs documents — discretize
    # upstream when the cut must be exact.
    integral = df.schema[weight_col].dataType.simpleString() in (
        "tinyint", "smallint", "int", "bigint",
    )
    if integral:
        # the exact-cut guarantee rides ANSI overflow semantics: with
        # ANSI off, a 38-digit DECIMAL overflow yields NULL and
        # filter(keep) silently DROPS the pathological pair instead of
        # failing loudly as documented — refuse up front rather than
        # degrade the contract
        if (
            df.sparkSession.conf.get("spark.sql.ansi.enabled", "true").lower()
            != "true"
        ):
            raise ValueError(
                "weighted_cosine_pairs: the exact integer cut needs "
                "spark.sql.ansi.enabled=true — with ANSI off a DECIMAL(38,0) "
                "overflow becomes NULL and overflowing pairs would be "
                "silently dropped; enable ANSI or discretize to smaller "
                "weights"
            )
        dec = "decimal(38,0)"
        lhs = F.lit(10_000).cast(dec) * F.col("dot").cast(dec) * F.col("dot").cast(dec)
        rhs = (
            F.lit(threshold_pct * threshold_pct).cast(dec)
            * F.col("nsq_a").cast(dec)
            * F.col("nsq_b").cast(dec)
        )
        keep = lhs >= rhs
    else:
        keep = (F.col("dot") * F.col("dot") * F.lit(10_000.0)) >= (
            F.lit(float(threshold_pct * threshold_pct))
            * F.col("nsq_a")
            * F.col("nsq_b")
        )
    return (
        out.filter(keep)
        .withColumn(
            "cos_sim",
            F.col("dot") / F.sqrt(F.col("nsq_a").cast("double") * F.col("nsq_b")),
        )
        .select("id_a", "id_b", "dot", "nsq_a", "nsq_b", "cos_sim")
    )


def weighted_minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    token_col: str,
    weight_col: str,
    threshold_pct: int = 50,
    num_hashes: int = 32,
    bands: int = 16,
    resolution: float = 1.0,
    max_replicas_per_token: int = 1024,
    validate: bool = True,
) -> DataFrame:
    """The APPROXIMATE arm of `weighted_jaccard_pairs` — for the
    corpora where a df cap is not acceptable (the heavy shared tokens
    ARE the signal) and an exact token join would fan out on them.

    Candidates come from minhash over DISCRETIZED-REPLICATED items
    (the classic weighted->unweighted reduction: token t with weight w
    becomes ceil(w * resolution) items (t, 1..q), so plain set Jaccard
    of the item sets IS the weighted Jaccard of the discretized
    weights); banding then gives the standard 1-(1-J^r)^b candidate
    recall curve with NO dependence on token document frequency.
    Every candidate pair is verified EXACTLY on the true (undiscretized)
    weights — same sum-min/sizes math and the same
    (id_a, id_b, w_shared, w_a, w_b) contract as the exact join, so
    reported pairs are never approximate; only recall is.

    Integer weights at resolution 1 replicate exactly (q = w).
    ``max_replicas_per_token`` refuses weight bombs loudly (one
    million-weight token would explode the item stream) — rescale or
    cap weights upstream.

    Shape: items explode (sum-of-replicas rows), one (id, k) partial-
    aggregated min shuffle for the K permutations, band-bucket join on
    (band, hash) carrying ids only, candidate distinct, then the
    verify joins restricted to candidate pairs. No quadratic stage,
    no df-sensitive fan-out."""
    if not 1 <= threshold_pct <= 100:
        raise ValueError(f"threshold_pct must be in [1, 100], got {threshold_pct}")
    if bands < 1 or bands > num_hashes or num_hashes % bands:
        raise ValueError(
            f"bands ({bands}) must be in [1, num_hashes] and divide "
            f"num_hashes ({num_hashes})"
        )
    if resolution <= 0:
        raise ValueError(f"resolution must be > 0, got {resolution}")
    from pyspark import StorageLevel

    from d2d_spark import cache as opcache

    # persist AND register FIRST, probe ON the cached copy,
    # deregister on failure: the profile frame feeds several scans
    # (validation agg, item explode, sizes, both verify joins) and
    # its upstream is typically a whole tokenize pipeline — probing
    # unpersisted re-ran that pipeline once per probe. Registering
    # before the (potentially long) probe jobs keeps the blocks
    # reclaimable by cache.release() at ALL times — an interrupt
    # mid-probe must not strand untracked disk blocks — while
    # deregister drops ONLY this call's frame on failure, so earlier
    # successful calls' pending consumers keep their cache. Release
    # per corpus via cache.release("weighted_minhash").
    wt = opcache.register(
        "weighted_minhash",
        _weighted_profiles(
            df, id_col, token_col, weight_col, "weighted_minhash_lsh_pairs",
            validate=False,
        ).persist(StorageLevel.MEMORY_AND_DISK),
    )
    q = F.ceil(F.col("__w") * F.lit(float(resolution))).cast("long")
    bomb_cond = q > max_replicas_per_token

    def bomb_msg(row):
        where = (
            f"token {row['__t']!r} of id {row['__id']!r}"
            if row is not None
            else "a token"
        )
        return (
            f"{where} discretizes to more than {max_replicas_per_token} "
            "replicas — rescale weights or lower resolution; a weight "
            "bomb would explode the item stream"
        )

    try:
        if validate:
            # ONE pass checks the contract AND the bomb, filling the
            # cache as it scans
            _validate_profiles(
                wt, "weighted_minhash_lsh_pairs",
                extra_cond=bomb_cond, extra_msg=bomb_msg,
            )
        else:
            # the exhausted no-match limit(1) scan fills every cached
            # partition, so no separate count() is needed
            bomb = wt.filter(bomb_cond).limit(1).collect()
            if bomb:
                raise ValueError(f"weighted_minhash_lsh_pairs: {bomb_msg(bomb[0])}")
    except Exception:
        opcache.deregister("weighted_minhash", [wt])
        raise
    # (lineage intact — the minhash_lsh_pairs persist discipline)
    items = wt.select(
        "__id", "__t", F.explode(F.sequence(F.lit(1), q)).alias("__i")
    ).select(
        "__id",
        # 31-bit item domain (the _hashed_shingles discipline): 31-bit
        # hash x 31-bit coefficient stays under 2^62 — no ANSI overflow
        F.pmod(F.xxhash64(F.col("__t"), F.col("__i")), F.lit((1 << 31) - 1)).alias(
            "__h31"
        ),
    )

    def perm(a, b):
        return F.pmod(F.col("__h31") * a + b, F.lit(_MERSENNE))

    coeffs = _perm_coeffs(num_hashes)
    perk = items.select(
        "__id",
        F.posexplode(F.array(*[perm(a, b) for a, b in coeffs])).alias("__k", "__v"),
    )
    # map-side partial min on (id, k): the shuffle carries one row per
    # (id, permutation) per partition, not per item
    mins = perk.groupBy("__id", "__k").agg(F.min("__v").alias("__m"))
    # persist the signature: the band-candidate self-join consumes it
    # on both sides, and its upstream (item explode over sum-of-
    # replicas rows x K permutations) is the expensive stage — the
    # sibling minhash_lsh_pairs measured branches racing on an
    # unfilled plan re-running it up to 3x
    sig = opcache.register(
        "weighted_minhash",
        mins.groupBy("__id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__k", "__m"))), lambda s: s["__m"]
            ).alias("__sig")
        )
        .persist(StorageLevel.MEMORY_AND_DISK),
    )
    sig.count()
    cand = _band_candidates(sig, "__sig", num_hashes, bands)
    sizes = wt.groupBy("__id").agg(F.sum("__w").alias("__wt"))
    pa = cand.join(
        wt.select(F.col("__id").alias("id_a"), "__t", F.col("__w").alias("__wa")),
        "id_a",
    )
    shared = (
        pa.join(
            wt.select(F.col("__id").alias("id_b"), "__t", F.col("__w").alias("__wb")),
            ["id_b", "__t"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.least("__wa", "__wb")).alias("w_shared"))
    )
    return _weighted_pairs_output(shared, sizes, threshold_pct)


def _ordered_shingle_sets(
    df: DataFrame, text_col: str, id_col: str, n: int, order: str, tag: str
) -> DataFrame:
    """Persisted (__id, __sh, __sz) with each record's distinct
    word-n-gram hashes sorted by a GLOBAL total order — the shared
    first stage of the prefix-filter joins (jaccard_prefix_pairs,
    containment_prefix_pairs).

    'freq' order: ascending document frequency (rare-first), the
    published choice — prefixes hold the rarest tokens, so frequent
    tokens (stop-words, boilerplate) never become join keys; costs one
    token-frequency aggregate + one rebuild shuffle. (df, token) is
    unique within a record (tokens are distinct), so the sort is a
    deterministic total order regardless of collect_list ordering.
    'hash' order: ascending 64-bit token hash — zero extra shuffles,
    but corpus-wide common tokens can become hot join keys.

    Records whose text yields zero shingles drop out of the explode;
    they can never pair (empty intersection), matching the quadratic
    baseline's null drop."""
    if order not in ("freq", "hash"):
        raise ValueError(f"order must be 'freq' or 'hash', got {order!r}")
    from pyspark import StorageLevel

    from d2d_spark import cache as opcache

    npart = df.sparkSession.sparkContext.defaultParallelism
    base = _spread(df.select(F.col(id_col).alias("__id"), F.col(text_col)), npart, "__id")
    sets = base.select(
        "__id",
        F.array_distinct(
            F.transform(shingles(F.col(text_col), n), lambda s: F.xxhash64(s))
        ).alias("__sh"),
    )
    if order == "freq":
        tok = sets.select("__id", F.explode("__sh").alias("__tok"))
        freq = tok.groupBy("__tok").agg(F.count(F.lit(1)).alias("__df"))
        ordered = (
            tok.join(freq, "__tok")
            .groupBy("__id")
            .agg(F.array_sort(F.collect_list(F.struct("__df", "__tok"))).alias("__o"))
            .withColumn("__sh", F.transform("__o", lambda x: x["__tok"]))
            .drop("__o")
        )
    else:
        ordered = sets.withColumn("__sh", F.array_sort("__sh"))
    # one persisted frame feeds the prefix explode AND the verify
    # sides (same policy and release tag discipline as minhash_lsh)
    ordered = opcache.register(
        tag,
        ordered.withColumn("__sz", F.size("__sh")).persist(StorageLevel.MEMORY_AND_DISK),
    )
    ordered.count()  # fill before the join branches race on it
    return ordered


def jaccard_prefix_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    order: str = "freq",
    ordered: DataFrame | None = None,
) -> DataFrame:
    """Exact-threshold n-gram Jaccard pairs WITHOUT the quadratic —
    prefix-filtering set-similarity join (AllPairs / PPJoin family:
    Bayardo et al., WWW 2007; Chaudhuri et al., ICDE 2006).

    Identical output to ``ngram_jaccard_pairs`` (id_a < id_b, exact
    jaccard >= threshold) but candidate generation is an EQUI-JOIN on
    prefix tokens, so it needs no ``allow_quadratic`` cap: this is the
    exact scale path, where MinHash+LSH is the approximate one.

    Prefix lemma: fix any global total order on tokens and sort each
    record's distinct token set by it. Jaccard(a,b) >= t implies
    |a&b| >= ceil(t*|a|) and >= ceil(t*|b|); sets with overlap >= alpha
    must share a token within their first |s| - alpha + 1 tokens. So
    emitting only the first |s| - ceil(t*|s|) + 1 tokens of each record
    as join keys loses NO qualifying pair — completeness holds for any
    fixed order, and every candidate is then verified exactly.

    ``order`` picks that global order:
      'freq' (default) — ascending document frequency (rare-first), the
        published choice: prefixes hold the rarest tokens, so frequent
        tokens (stop-words, boilerplate) never become join keys —
        candidate count AND join-key skew both collapse. Costs one
        token-frequency aggregate + one rebuild shuffle.
      'hash' — ascending 64-bit token hash: zero extra shuffles, but a
        corpus-wide common token that lands in many prefixes becomes a
        hot key; fine for corpora without heavy boilerplate.

    Scale posture: shuffles are the frequency agg + per-doc rebuild
    ('freq' only), the prefix equi-join (ids + sizes only — the token
    arrays never ride the join), the candidate distinct, and two
    id-keyed verify joins. Nothing is O(n^2) in corpus size; per-token
    fan-out is bounded by the prefix length, which shrinks as the
    threshold rises (t=1.0 -> 1 token per record)."""
    t = float(threshold)
    if not 0.0 < t <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if ordered is None:
        ordered = _ordered_shingle_sets(df, text_col, id_col, n, order, "jaccard_prefix")
    # prefix length |s| - ceil(t*|s|) + 1 — always >= 1 for t <= 1
    plen = (F.col("__sz") - F.ceil(F.lit(t) * F.col("__sz")) + F.lit(1)).cast("int")
    pref = ordered.select(
        "__id",
        "__sz",
        F.posexplode(F.slice("__sh", F.lit(1), plen)).alias("__pos", "__tok"),
    )
    a = pref.select(
        F.col("__id").alias("id_a"),
        F.col("__sz").alias("sz_a"),
        F.col("__pos").alias("pos_a"),
        "__tok",
    )
    b = pref.select(
        F.col("__id").alias("id_b"),
        F.col("__sz").alias("sz_b"),
        F.col("__pos").alias("pos_b"),
        "__tok",
    )
    # pair-level overlap requirement for jaccard >= t:
    #   alpha = ceil(t/(1+t) * (|a| + |b|))
    alpha = F.ceil(F.lit(t / (1.0 + t)) * (F.col("sz_a") + F.col("sz_b")))
    # positional filter (PPJoin, Xiao et al. 2008): tokens at or after
    # this shared one number min(|a|-pos_a, |b|-pos_b) (0-based pos) —
    # an upper bound on the overlap. A true pair always survives at
    # its FIRST shared token (every overlap token sits at or after
    # it), so pruning pairs whose bound misses alpha loses nothing;
    # it only drops join hits that could never reach the threshold.
    ub = F.least(F.col("sz_a") - F.col("pos_a"), F.col("sz_b") - F.col("pos_b"))
    cand = (
        a.join(b, "__tok")
        .filter(F.col("id_a") < F.col("id_b"))
        # size filter: jaccard <= min/max of the sizes, so mismatched
        # sizes prune BEFORE the distinct shuffle
        .filter((F.col("sz_a") >= t * F.col("sz_b")) & (F.col("sz_b") >= t * F.col("sz_a")))
        .filter(ub >= alpha)
        .select("id_a", "id_b")
        .distinct()
    )
    sh_tbl = ordered.select("__id", "__sh")
    verified = cand.join(
        sh_tbl.select(F.col("__id").alias("id_a"), F.col("__sh").alias("sh_a")), "id_a"
    ).join(sh_tbl.select(F.col("__id").alias("id_b"), F.col("__sh").alias("sh_b")), "id_b")
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        verified.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= t)
        .select("id_a", "id_b", "jaccard")
    )


def containment_prefix_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
    order: str = "freq",
    ordered: DataFrame | None = None,
) -> DataFrame:
    """DIRECTED containment pairs (id_a, id_b, containment) with
    |A ∩ B| / |A| >= threshold, a != b — "A's shingles are mostly
    inside B": quote detection, subsumption dedup, version-of
    relationships. Jaccard misses these when |B| >> |A|; containment
    is the asymmetric measure (both directions of a pair are reported
    when both qualify).

    Prefix filtering adapts asymmetrically (SSJoin family, Chaudhuri
    et al. 2006): overlap >= ceil(t*|A|) forces a shared token inside
    A's first |A| - ceil(t*|A|) + 1 GLOBALLY-ORDERED tokens, but B's
    matching token can sit anywhere — so only the CONTAINED side
    prefix-explodes; the container side contributes its full ordered
    token stream. Rare-first ordering matters even more than for
    jaccard: every A-prefix key is a rare token, so the full B stream
    fans out only where document frequency is already small. Filters
    before the candidate distinct: size (|B| >= t*|A| — overlap can't
    exceed |B|; nothing bounds |B| above, that's the asymmetry) and
    the positional bound min(|A|-pos_a, |B|-pos_b) >= t*|A|, valid at
    the first shared ordered token for the same reason as PPJoin's.
    Exact verify on the candidate ids only.

    Thresholding is double-math `ov >= t * |A|` on both the candidate
    bound and the final verify — the same IEEE expression an oracle
    engine computes, no epsilon.

    ``ordered`` accepts the persisted frame from a sibling
    jaccard/containment call on the SAME (corpus, n, order) so one
    pipeline running both joins builds the shingle stage once."""
    t = float(threshold)
    if not 0.0 < t <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if ordered is None:
        ordered = _ordered_shingle_sets(
            df, text_col, id_col, n, order, "containment_prefix"
        )
    plen = (F.col("__sz") - F.ceil(F.lit(t) * F.col("__sz")) + F.lit(1)).cast("int")
    a = ordered.select(
        F.col("__id").alias("id_a"),
        F.col("__sz").alias("sz_a"),
        F.posexplode(F.slice("__sh", F.lit(1), plen)).alias("pos_a", "__tok"),
    )
    b = ordered.select(
        F.col("__id").alias("id_b"),
        F.col("__sz").alias("sz_b"),
        F.posexplode("__sh").alias("pos_b", "__tok"),
    )
    need = F.lit(t) * F.col("sz_a")
    ub = F.least(F.col("sz_a") - F.col("pos_a"), F.col("sz_b") - F.col("pos_b"))
    cand = (
        a.join(b, "__tok")
        .filter(F.col("id_a") != F.col("id_b"))
        .filter(F.col("sz_b") >= need)
        .filter(ub >= need)
        .select("id_a", "id_b")
        .distinct()
    )
    sh_tbl = ordered.select("__id", "__sh")
    verified = cand.join(
        sh_tbl.select(F.col("__id").alias("id_a"), F.col("__sh").alias("sh_a")), "id_a"
    ).join(sh_tbl.select(F.col("__id").alias("id_b"), F.col("__sh").alias("sh_b")), "id_b")
    ov = F.size(F.array_intersect("sh_a", "sh_b"))
    sz_a = F.size("sh_a")
    return (
        verified.filter(ov >= F.lit(t) * sz_a)
        .withColumn("containment", ov / sz_a)
        .select("id_a", "id_b", "containment")
    )


def embedding_near_pairs(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    allow_quadratic: bool = False,
    cap: int = QUADRATIC_CAP,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs. Quadratic form for
    bounded sets — guarded above ``cap`` rows; route through
    sign_projection_bucket (similarity.py) to band it at scale."""
    _guard_quadratic(emb, "embedding_near_pairs", allow_quadratic, cap)
    npart = emb.sparkSession.sparkContext.defaultParallelism
    a = (
        _spread(emb, npart, full=True)
        .select(F.col(id_col).alias("id_a"), as_double(F.col(vec_col)).alias("v_a"))
        .withColumn("__na", norm(F.col("v_a")))
    )
    b = emb.select(
        F.col(id_col).alias("id_b"), as_double(F.col(vec_col)).alias("v_b")
    ).withColumn("__nb", norm(F.col("v_b")))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    # norms precomputed per side: per-pair work is one dot fold
    sim = dot(F.col("v_a"), F.col("v_b")) / F.nullif(F.col("__na") * F.col("__nb"), F.lit(0.0))
    return (
        pairs.withColumn("cos_sim", sim)
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def levenshtein_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 2,
    allow_quadratic: bool = False,
    cap: int = QUADRATIC_CAP,
) -> DataFrame:
    """Exact edit-distance pairs (id_a < id_b, dist <= max_dist) —
    the quadratic fuzzy-match ground truth, guarded above ``cap``
    rows. At scale use fuzzy_pairs_lsh, which generates candidates
    with character-shingle LSH and runs THIS verify only on them."""
    _guard_quadratic(df, "levenshtein_pairs", allow_quadratic, cap)
    npart = df.sparkSession.sparkContext.defaultParallelism
    base = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t"))
    a = _spread(base, npart, full=True).select(
        F.col("__id").alias("id_a"), F.col("__t").alias("t_a")
    )
    b = base.select(F.col("__id").alias("id_b"), F.col("__t").alias("t_b"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    # length prefilter: |len(a)-len(b)| > d implies dist > d — prunes
    # before the O(len^2) edit-distance kernel; Spark's 3-arg
    # levenshtein also early-exits above the bound
    pairs = pairs.filter(
        F.abs(F.length("t_a") - F.length("t_b")) <= max_dist
    )
    dist = F.levenshtein("t_a", "t_b", max_dist)
    return (
        pairs.withColumn("dist", dist.cast("long"))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .select("id_a", "id_b", "dist")
    )


def fuzzy_pairs_lsh(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 2,
    shingle_jaccard: float = 0.4,
) -> DataFrame:
    """Fuzzy string matching at scale: character-3-shingle MinHash+LSH
    candidate generation, exact Levenshtein verify on candidates only
    — never an all-pairs join.

    Character shingles ride the existing word-shingle machinery by
    space-separating the characters (so word-3-grams of the spaced
    text ARE char-3-grams of the original; whitespace itself carries
    no signal for edit distance). A single edit dirties at most 3
    shingles, so strings within ``max_dist`` edits of typical key
    length share most shingles; ``shingle_jaccard`` is the recall
    dial (lower = more candidates, higher recall)."""
    spaced = df.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__t"),
        F.regexp_replace(F.col(text_col), "(.)", "$1 ").alias("__chars"),
    )
    cand = minhash_lsh_pairs(
        spaced, "__chars", "__id", jaccard_threshold=shingle_jaccard
    ).select("id_a", "id_b")
    txt = spaced.select("__id", "__t")
    joined = (
        cand.join(txt.select(F.col("__id").alias("id_a"), F.col("__t").alias("t_a")), "id_a")
        .join(txt.select(F.col("__id").alias("id_b"), F.col("__t").alias("t_b")), "id_b")
    )
    dist = F.levenshtein("t_a", "t_b", max_dist)
    return (
        joined.withColumn("dist", dist.cast("long"))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .select("id_a", "id_b", "dist")
    )


def _delete_one_char(s: Column) -> Column:
    """Array of all strings formed by deleting one character of ``s``
    (the empty string maps to [""]) — pure Column expression."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(s), F.lit(1))),
        lambda i: F.concat(
            F.substr(s, F.lit(1), i - 1), F.substr(s, i + 1, F.length(s))
        ),
    )


def fuzzy_pairs_deletion(
    df: DataFrame, text_col: str, id_col: str, max_dist: int = 2
) -> DataFrame:
    """Edit-distance pairs with GUARANTEED recall and no quadratic
    stage: deletion-neighborhood candidate generation (the FastSS
    construction — Bocek et al., "Fast Similarity Search in Large
    Dictionaries", 2007) + exact Levenshtein verify on candidates.

    If ed(a, b) <= d, then deleting the unmatched characters of an
    optimal alignment (at most d per side) yields a COMMON string in
    both deletion neighborhoods of depth d — so the equi-join on
    variant hashes surfaces every true pair, and the exact verify
    makes precision 1.0. Candidate volume is O(rows * L^d) variant
    keys (L = string length), linear in the table — the right shape
    for fuzzy joins over short keys (names, codes) at 100 TB. For
    long free text use fuzzy_pairs_lsh (probabilistic) or the
    shingle-Jaccard dedup family instead."""
    base = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t"))
    npart = df.sparkSession.sparkContext.defaultParallelism
    base = _spread(base, npart, "__id")
    variants = base.select("__id", F.col("__t").alias("__v"))
    frontier = variants
    for _ in range(max_dist):
        frontier = frontier.select(
            "__id", F.explode(_delete_one_char(F.col("__v"))).alias("__v")
        )
        variants = variants.union(frontier)
    # variant strings -> 64-bit hashes: the join shuffles fixed-width
    # keys instead of strings (collisions only add candidates, which
    # the exact verify removes). Persisted: the deletion-neighborhood
    # explode is O(L^d) work per row and feeds BOTH sides of the
    # self-join — materialize once, not twice
    from pyspark import StorageLevel

    sigs = (
        variants.select("__id", F.xxhash64("__v").alias("__h"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sigs.count()  # fill the cache before the self-join sides race on it
    cand = (
        sigs.select(F.col("__id").alias("id_a"), "__h")
        .join(sigs.select(F.col("__id").alias("id_b"), "__h"), "__h")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    txt = base.select("__id", "__t")
    joined = (
        cand.join(txt.select(F.col("__id").alias("id_a"), F.col("__t").alias("t_a")), "id_a")
        .join(txt.select(F.col("__id").alias("id_b"), F.col("__t").alias("t_b")), "id_b")
    )
    dist = F.levenshtein("t_a", "t_b", max_dist)
    return (
        joined.withColumn("dist", dist.cast("long"))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .select("id_a", "id_b", "dist")
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Group near-duplicate pairs into clusters: returns
    (id, component) where component = min id reachable through the
    pair graph — the step that turns pairwise LSH output into
    keep-one-per-cluster dedup decisions.

    Iterative min-label propagation (alternating large-star/small-star
    contraction, the MapReduce-CC construction from Kiveris et al.,
    "Connected Components in MapReduce and Beyond"): each round every
    node adopts the smallest label in its neighborhood, labels hop
    across the graph in doubling strides, and convergence is checked
    with a count of changed labels. All joins are equi-joins on id;
    rounds = O(log diameter), and near-dup graphs are
    shallow (diameter 2-3 for clustered duplicates) so 3-4 rounds
    close most real inputs.

    The loop materializes each round via localCheckpoint: iterative
    lineage otherwise grows exponentially and re-executes every prior
    round on each action.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    # undirected: keep both directions so min-label can flow both ways
    edges = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # materialize ONCE: edges join into every iteration, and without a
    # checkpoint the (possibly expensive) pair-generation upstream
    # re-executes per round
    edges = edges.localCheckpoint(eager=True)

    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    prev_sum = None
    for _ in range(max_iterations):
        # neighbor labels: for each node, the min of its neighbors' labels
        neighbor_min = (
            edges.join(labels.withColumnRenamed("id", "dst"), on="dst")
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
            .withColumnRenamed("src", "id")
        )
        stepped = labels.join(neighbor_min, on="id", how="left").select(
            "id",
            F.least(
                F.col("component"), F.coalesce("nbr_component", F.col("component"))
            ).alias("component"),
        )
        # pointer-doubling hop fused into the same round (one
        # materialization + one convergence count per iteration —
        # driver-side job launches, not shuffle volume, dominate this
        # loop on shallow dup graphs)
        new_labels = (
            stepped.alias("l")
            .join(
                stepped.select(
                    F.col("id").alias("component"), F.col("component").alias("root")
                ).alias("r"),
                on="component",
                how="left",
            )
            .select("id", F.coalesce("root", "component").alias("component"))
            .localCheckpoint(eager=True)
        )
        # convergence via one aggregate over the checkpointed labels:
        # min-label propagation only ever DECREASES a component id, so
        # the label sum strictly decreases until the fixpoint — no
        # old-vs-new join needed. Summed as DECIMAL(38,0): a long sum
        # of xxhash64-scale ids overflows (and crashes under ANSI)
        cur_sum = new_labels.agg(
            F.sum(F.col("component").cast("decimal(38,0)"))
        ).collect()[0][0]
        labels = new_labels
        if prev_sum is not None and cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def dedup_representatives(
    df: DataFrame, pairs: DataFrame, id_col: str, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """End-to-end near-dup dedup: rows whose id is NOT a non-minimal
    member of any duplicate cluster. Keeps exactly one representative
    (the min id) per cluster plus every unpaired row."""
    comp = connected_components(pairs, id_a, id_b)
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")


def paragraph_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    sep: str = "\n\n",
    keep_first: bool = True,
) -> DataFrame:
    """Paragraph-level exact dedup across the corpus (the CCNet /
    RefinedWeb pass that document-level dedup misses): every repeated
    paragraph keeps its first occurrence — ordered by (doc id,
    position) — and later copies are cut out of their documents; each
    document's surviving paragraphs are stitched back in order.
    ``keep_first=False`` removes EVERY copy of any repeated paragraph
    (boilerplate stripping).

    Scale shape: explode to (id, pos, paragraph) — row count = corpus
    paragraph count; one groupBy on the paragraph fingerprint (md5 —
    uniform keys) picks winners; one groupBy on the doc id rebuilds
    text. Both shuffles carry the paragraph payload once. Whitespace
    -only paragraphs are dropped (they carry no content and would all
    collide on one hot key).

    Returns the input frame with ``text_col`` rewritten and an
    ``n_dropped_paragraphs`` count; documents losing every paragraph
    keep an empty string.
    """
    # split() takes a Java regex but the rebuild joins with the
    # LITERAL separator — quote it so metachar separators ('||', '.')
    # split where they should instead of on every character
    sep_rx = "\\Q" + sep + "\\E"
    paras = (
        df.select(
            F.col(id_col).alias("__id"),
            F.posexplode(F.split(F.col(text_col), sep_rx)).alias("__pos", "__p"),
        )
        .filter(F.trim(F.col("__p")) != "")
        .withColumn("__fp", fingerprint(F.col("__p")))
    )
    winners = paras.groupBy("__fp").agg(
        F.min(F.struct("__id", "__pos")).alias("__w"), F.count(F.lit(1)).alias("__n")
    )
    tagged = paras.join(winners, "__fp")
    if keep_first:
        kept = tagged.filter(
            (F.col("__n") == 1)
            | ((F.col("__id") == F.col("__w.__id")) & (F.col("__pos") == F.col("__w.__pos")))
        )
    else:
        kept = tagged.filter(F.col("__n") == 1)
    rebuilt = kept.groupBy("__id").agg(
        F.concat_ws(
            sep, F.transform(F.array_sort(F.collect_list(F.struct("__pos", "__p"))), lambda s: s["__p"])
        ).alias("__text"),
        F.count(F.lit(1)).alias("__kept"),
    )
    # per-doc totals come from the already-exploded frame — no second
    # scan/split of the source text, and one id join instead of two
    totals = paras.groupBy("__id").agg(F.count(F.lit(1)).alias("__total"))
    stats = totals.join(rebuilt, "__id", "left")
    out_cols = [c for c in df.columns if c != text_col]
    return df.join(stats, on=[df[id_col] == stats["__id"]], how="left").select(
        *out_cols,
        F.coalesce(F.col("__text"), F.lit("")).alias(text_col),
        (
            F.coalesce(F.col("__total"), F.lit(0)) - F.coalesce(F.col("__kept"), F.lit(0))
        ).alias("n_dropped_paragraphs"),
    )


class SignatureStore:
    """Persistent MinHash signature store for INCREMENTAL corpus
    dedup — the 100 TB workflow where re-running LSH over the whole
    corpus per crawl is off the table: each new batch dedups against
    the store (banded candidate join + exact-Jaccard verify), and only
    the surviving rows' signatures append to the store.

    Layout: one parquet table of (``__id``, ``minhash``, ``__hset``),
    exactly the persisted stage of ``minhash_lsh_pairs`` — the batch
    and incremental paths share hashing, banding, and verification, so
    incremental results match what a full re-run would keep (pinned in
    tests). The band join still carries (id, band, hash) only; the
    store is read via a normal parquet scan, so at warehouse scale it
    partitions/prunes like any other table.
    """

    def __init__(
        self,
        path: str,
        num_hashes: int = 32,
        bands: int = 8,
        shingle_n: int = 3,
        jaccard_threshold: float = 0.5,
    ):
        if num_hashes % bands:
            raise ValueError(f"bands ({bands}) must divide num_hashes ({num_hashes})")
        self.path = path
        self.num_hashes = num_hashes
        self.bands = bands
        self.shingle_n = shingle_n
        self.jaccard_threshold = jaccard_threshold

    def _band_hashes(self):
        rows_per_band = self.num_hashes // self.bands
        return F.array(
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
                for b in range(self.bands)
            ]
        )

    def _signatures(self, df: DataFrame, text_col: str, id_col: str) -> DataFrame:
        base = df.select(F.col(id_col).alias("__id"), F.col(text_col))
        npart = df.sparkSession.sparkContext.defaultParallelism
        return minhash_signature(
            _spread(base, npart, "__id"),
            text_col,
            self.num_hashes,
            self.shingle_n,
            emit_hashed_shingles=True,
        ).select("__id", "minhash", "__hset")

    def _read_store(self, spark) -> DataFrame | None:
        from pyspark.errors import AnalysisException

        try:
            return spark.read.parquet(self.path)
        except AnalysisException:
            return None  # first batch: empty store

    def dedup_batch(self, df: DataFrame, text_col: str, id_col: str) -> DataFrame:
        """Return the rows of ``df`` that are NOT near-duplicates of
        anything already in the store, then append the survivors'
        signatures (in-batch duplicates resolve min-id-wins first, so
        a batch of mutual clones keeps exactly one).

        Replay-safe: the store join excludes SAME-id matches, so a
        replayed batch whose signatures already landed (crash between
        the append and the caller's downstream write / checkpoint
        commit) re-derives exactly the original survivor set instead
        of dropping every row as "a duplicate of the store" — pinned
        by test_signature_store_replay_idempotent. Duplicate signature
        rows from a replayed append are harmless: candidate pairs are
        id-distinct, and self-pairs are excluded.
        """
        from pyspark import StorageLevel

        spark = df.sparkSession
        sig = self._signatures(df, text_col, id_col).persist(StorageLevel.MEMORY_AND_DISK)
        sig.count()  # fill the cache before the band/verify branches race on it
        bands = sig.select("__id", F.posexplode(self._band_hashes()).alias("__band", "__bh"))

        # 1) in-batch dedup: min id per colliding pair survives
        in_pairs = (
            bands.select(F.col("__id").alias("id_a"), "__band", "__bh")
            .join(bands.select(F.col("__id").alias("id_b"), "__band", "__bh"), ["__band", "__bh"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        in_dups = self._verified(in_pairs, sig, sig).select(F.col("id_b").alias("__dup"))

        # 2) store dedup: batch ids matching ANY stored doc drop
        store = self._read_store(spark)
        if store is not None:
            store_bands = store.select(
                F.col("__id").alias("id_b"), F.posexplode(self._band_hashes()).alias("__band", "__bh")
            )
            x_pairs = (
                bands.select(F.col("__id").alias("id_a"), "__band", "__bh")
                .join(store_bands, ["__band", "__bh"])
                # a replayed batch meets its OWN stored signatures —
                # a self-id match is not a duplicate, it's the same row
                .filter(F.col("id_a") != F.col("id_b"))
                .select("id_a", "id_b")
                .distinct()
            )
            x_dups = self._verified(
                x_pairs, sig, store.select("__id", "__hset")
            ).select(F.col("id_a").alias("__dup"))
            dups = in_dups.unionByName(x_dups).distinct()
        else:
            dups = in_dups.distinct()

        # pin the (small) dup-id set eagerly: after it, neither the
        # returned survivors nor anything downstream depends on the
        # persisted sig frame — so unpersisting here doesn't force the
        # caller's first action to recompute the whole signature stage.
        # A configured checkpoint dir gets a RELIABLE checkpoint (an
        # executor loss replays from storage). The fallback is
        # persist + eager count, NOT localCheckpoint: persisted blocks
        # keep their lineage, so losing an executor between here and
        # consumption recomputes the lost partitions instead of
        # failing the job (localCheckpoint truncates lineage into
        # executor-local, non-replicated blocks — fine on local[n],
        # unrecoverable on a cluster). The dup-id blocks are tiny
        # (ids only) and releasable per-corpus via
        # d2d_spark.cache.release("signature_store").
        if spark.sparkContext.getCheckpointDir() is not None:
            dups = dups.checkpoint(eager=True)
        else:
            from pyspark import StorageLevel as _SL

            from d2d_spark import cache as opcache

            dups = opcache.register("signature_store", dups.persist(_SL.MEMORY_AND_DISK))
            dups.count()
        survivors = df.join(dups, on=[F.col(id_col) == F.col("__dup")], how="left_anti")
        new_sigs = sig.join(dups, on=[F.col("__id") == F.col("__dup")], how="left_anti")
        new_sigs.write.mode("append").parquet(self.path)
        sig.unpersist()
        return survivors

    def _verified(self, pairs: DataFrame, left_sig: DataFrame, right_sig: DataFrame) -> DataFrame:
        sh_a = left_sig.select(F.col("__id").alias("id_a"), F.col("__hset").alias("sh_a"))
        sh_b = right_sig.select(F.col("__id").alias("id_b"), F.col("__hset").alias("sh_b"))
        jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
        return (
            pairs.join(sh_a, "id_a")
            .join(sh_b, "id_b")
            .filter((F.size("sh_a") > 0) & (F.size("sh_b") > 0))
            .filter(jac >= self.jaccard_threshold)
            .select("id_a", "id_b")
        )
