"""Deterministic sampling, splitting, and corpus mixing — the
data-mixture toolkit of a training pipeline.

Everything here derives from ONE primitive: a per-row bucket in
[0, 1e6) computed as ``xxhash64(key, seed) mod 1e6``. Because the
bucket is a pure function of (key, seed):

- results are reproducible run-to-run and engine-to-engine (no RNG
  state, unlike ``df.sample``);
- the same key always lands in the same split — joins across derived
  tables stay consistent, and re-running a mixing job is idempotent;
- it is a pure filter: NO shuffle, no driver collect, codegen-side —
  at 100 TB each of these ops is a map over the scan.

Disjointness/coverage guarantee: ``hash_split`` carves [0, 1e6) into
contiguous ranges, so splits are provably disjoint and exhaustive.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bucket resolution: fractions are honored to 1e-6
_BUCKETS = 1_000_000


def hash_bucket(key: Column, seed: int = 0) -> Column:
    """Deterministic bucket in [0, 1e6) for a key column."""
    return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(_BUCKETS))


def hash_sample(df: DataFrame, key_col: str, fraction: float, seed: int = 0) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash. Deterministic:
    the same (key, seed) is kept or dropped identically on every run,
    so downstream tables derived from the sample stay join-consistent."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(hash_bucket(F.col(key_col), seed) < int(round(fraction * _BUCKETS)))


def hash_split(
    df: DataFrame, key_col: str, weights: Sequence[float], seed: int = 0
) -> list[DataFrame]:
    """Split into len(weights) disjoint, exhaustive parts (weights
    normalized). The canonical train/val/test split: every row lands
    in exactly one part, keys are stable across runs, and adding rows
    later never moves an existing key between parts."""
    if not weights or any(w < 0 for w in weights) or sum(weights) <= 0:
        raise ValueError(f"weights must be non-negative with a positive sum, got {weights}")
    total = float(sum(weights))
    bounds = [0]
    acc = 0.0
    for w in weights[:-1]:
        acc += w / total
        bounds.append(int(round(acc * _BUCKETS)))
    bounds.append(_BUCKETS)
    b = hash_bucket(F.col(key_col), seed)
    return [
        df.filter((b >= bounds[i]) & (b < bounds[i + 1])) for i in range(len(weights))
    ]


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key_col: str,
    seed: int = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum hash sampling — exact-intent downsampling for
    data-mixture reweighting (e.g. keep 100% of books, 10% of
    common-crawl). Strata absent from ``fractions`` keep
    ``default_fraction``. Pure filter: the mixture applies at scan
    time with no shuffle, unlike ``df.sampleBy`` it is deterministic
    per key."""
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for stratum {k!r} must be in [0, 1], got {v}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1], got {default_fraction}")
    pairs: list[Column] = []
    for k, v in fractions.items():
        pairs += [F.lit(k), F.lit(int(round(v * _BUCKETS)))]
    threshold = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(strata_col)) if pairs else F.lit(None),
        F.lit(int(round(default_fraction * _BUCKETS))),
    )
    return df.filter(hash_bucket(F.col(key_col), seed) < threshold)


def mix_corpora(
    sources: Mapping[str, tuple[DataFrame, float]],
    key_col: str,
    seed: int = 0,
    source_col: str = "source",
) -> DataFrame:
    """Weighted union of corpora: hash-sample each source to its
    fraction, tag rows with the source name, union by name. The
    deterministic analog of mixture sampling at data-prep time; a
    re-run (or an incremental re-run over a grown source) reproduces
    and extends the same mixture instead of redrawing it."""
    out: DataFrame | None = None
    for name, (df, fraction) in sources.items():
        part = hash_sample(df, key_col, fraction, seed).withColumn(source_col, F.lit(name))
        out = part if out is None else out.unionByName(part)
    if out is None:
        raise ValueError("mix_corpora needs at least one source")
    return out


def temperature_weights(
    sizes: Mapping[str, float], alpha: float = 0.3, scale_to_largest: bool = True
) -> dict[str, float]:
    """Sampling fractions that flatten a size-skewed corpus mixture:
    each source's probability is proportional to ``size**alpha`` (the
    multilingual-LM convention — alpha=1 keeps natural proportions,
    alpha=0 makes every source equal; XLM-R/mT5 use ~0.3). Returned as
    per-source KEEP FRACTIONS for `mix_corpora`: with
    ``scale_to_largest`` the most-upweighted source keeps fraction
    1.0 (no source is upsampled — pair with `mix_to_token_budget`'s
    epoch upsampling when over-representation is wanted) and the rest
    scale down proportionally."""
    if not sizes:
        raise ValueError("temperature_weights needs at least one source size")
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if any(n <= 0 for n in sizes.values()):
        raise ValueError("source sizes must be positive")
    total = sum(n**alpha for n in sizes.values())
    # target share p_i ~ n_i^alpha; keep fraction f_i = p_i * C / n_i,
    # C chosen so max f_i = 1 (nothing upsamples)
    raw = {k: (n**alpha / total) / n for k, n in sizes.items()}
    if scale_to_largest:
        c = 1.0 / max(raw.values())
        return {k: min(1.0, v * c) for k, v in raw.items()}
    return raw


def mix_to_token_budget(
    sources: Mapping[str, tuple[DataFrame, float]],
    key_col: str,
    token_col: str,
    total_tokens: int,
    seed: int = 0,
    source_col: str = "source",
    epoch_col: str = "epoch",
    max_epochs: float = 10.0,
) -> DataFrame:
    """Mix corpora to target TOKEN shares, not row fractions — the
    form mixture specs are actually written in (e.g. "30% web, 50%
    books, 20% code of a 1T-token budget"). Each source is scaled to
    ``share / sum(shares) * total_tokens`` tokens:

    - sources above their target downsample via ``hash_sample``
      (deterministic, pure filter);
    - sources below their target UPSAMPLE: every row repeats
      ``floor(ratio)`` times and the fractional remainder is a
      hash-selected extra copy — the standard low-resource-corpus
      move. Copies are distinguished by ``epoch_col`` (0-based), so
      downstream shuffles/packing treat them as distinct rows and a
      deterministic global shuffle spreads epochs apart.

    Token inventory is ONE Spark job for any number of sources: the
    sources union on a (tag, tokens) projection and a single grouped
    sum returns every per-source total (map-side partials, N scalars
    to the driver) — a 20-source mixture pays one scheduler
    round-trip, not 20 sequential count jobs. The mix itself is a
    pure per-row filter/explode — no shuffle at any corpus size.
    Ratios above ``max_epochs`` raise: needing 10+ epochs of a source
    is almost always a mis-specified mixture, and silently looping a
    tiny corpus degrades training more than failing loudly.

    Expected (not exact) token totals: hash sampling honors fractions
    to 1e-6 in probability; at corpus scale the realized share
    concentrates tightly around the target.
    """
    if total_tokens <= 0:
        raise ValueError(f"total_tokens must be positive, got {total_tokens}")
    share_sum = float(sum(share for _, share in sources.values()))
    if not sources or share_sum <= 0:
        raise ValueError("mix_to_token_budget needs sources with positive shares")

    tagged: DataFrame | None = None
    for name, (df, _share) in sources.items():
        part = df.select(
            F.lit(name).alias("__src"), F.col(token_col).cast("double").alias("__tok")
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    have_by_source = {
        r["__src"]: float(r["__have"] or 0.0)
        for r in tagged.groupBy("__src").agg(F.sum("__tok").alias("__have")).collect()
    }

    out: DataFrame | None = None
    for name, (df, share) in sources.items():
        have = have_by_source.get(name, 0.0)
        if have <= 0:
            raise ValueError(f"source {name!r} has no tokens in {token_col!r}")
        target = share / share_sum * total_tokens
        ratio = target / have
        if ratio > max_epochs:
            raise ValueError(
                f"source {name!r} needs {ratio:.1f} epochs to reach its "
                f"{target:,.0f}-token target (> max_epochs={max_epochs}); "
                "shrink its share or raise max_epochs explicitly"
            )
        if ratio <= 1.0:
            part = hash_sample(df, key_col, ratio, seed).withColumn(epoch_col, F.lit(0))
        else:
            n_full = int(ratio)
            frac = ratio - n_full
            extra = (hash_bucket(F.col(key_col), seed) < int(round(frac * _BUCKETS))).cast("int")
            part = df.withColumn(
                epoch_col,
                F.explode(F.sequence(F.lit(0), F.lit(n_full - 1) + extra)),
            )
        out_part = part.withColumn(source_col, F.lit(name))
        out = out_part if out is None else out.unionByName(out_part)
    return out


def pack_documents(
    df: DataFrame,
    tokens_col: str,
    budget: int,
    sort_col: str | None = None,
) -> DataFrame:
    """Greedy sequence packing: assign each row a ``bin_id`` such that
    the rows sharing a bin total at most ``budget`` tokens — the
    standard pre-training step that concatenates documents into fixed
    context windows with minimal padding. A single document over
    budget gets a bin of its own (truncation is the trainer's call).

    Packing is PER PARTITION (first-fit on the partition's row
    stream): bins never span executors, there is no shuffle and no
    global coordination, and bin ids are unique across partitions
    (partition_id << 32 | local bin). Pass ``sort_col`` to make the
    within-partition stream — and therefore the packing — fully
    deterministic for a given partitioning.

    Greedy approximation bound: at most 64 bins stay open per
    partition; opening a 65th CLOSES the fullest open bin (least
    remaining capacity — the cheapest bin to give up), and a closed
    bin can never receive another row. On adversarial length streams
    this raises padding waste versus unbounded first-fit, but keeps
    the per-row scan O(64) regardless of stream length; the
    packing-efficiency test pins total bins <= ~2x the ideal
    ceil(sum(tokens)/budget) on skewed streams.
    """
    import pandas as pd
    from pyspark import TaskContext
    from pyspark.sql import types as T

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    base = df.sortWithinPartitions(sort_col) if sort_col else df
    schema = T.StructType(list(df.schema.fields) + [T.StructField("bin_id", T.LongType())])

    def pack(batches):
        pid = TaskContext.get().partitionId()
        next_bin = 0
        open_bins: list[tuple[int, int]] = []  # (bin local id, used tokens)
        for pdf in batches:
            ids = []
            for n in pdf[tokens_col]:
                n = int(n) if n is not None and n == n else 0
                placed = None
                for i, (b, used) in enumerate(open_bins):
                    if used + n <= budget:
                        open_bins[i] = (b, used + n)
                        placed = b
                        break
                if placed is None:
                    placed = next_bin
                    open_bins.append((next_bin, n))
                    next_bin += 1
                    # bounded open list keeps the scan O(64) per row;
                    # close the FULLEST bin — it has the least room
                    # left, so giving it up wastes the fewest tokens
                    if len(open_bins) > 64:
                        open_bins.pop(max(range(len(open_bins)), key=lambda i: open_bins[i][1]))
                ids.append((pid << 32) | placed)
            out = pdf.copy()
            out["bin_id"] = pd.Series(ids, index=pdf.index, dtype="int64")
            yield out

    return base.mapInPandas(pack, schema=schema)


def shuffle_and_shard(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic global shuffle into ``n_shards`` near-equal
    shards — the final step before training consumes a corpus. The
    shard is ``xxhash64(key, seed) mod n_shards`` (a pure function of
    the key: reproducible run-to-run, a new seed is a new
    permutation), and rows land physically grouped by shard and
    ordered by the same hash, so re-reading any shard yields a stable
    document order.

    One exchange on the shard id — same cost as any global
    re-bucketing; no driver involvement, no RNG state, no sampled
    range bounds (``repartitionByRange`` draws bounds from a random
    sample, which would make shard assignment run-dependent). Write
    with ``.write.partitionBy("shard")`` for one directory per shard.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    h = F.xxhash64(F.col(key_col), F.lit(seed))
    return (
        df.withColumn("__h", h)
        .withColumn("shard", F.pmod(F.col("__h"), F.lit(n_shards)))
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "__h")
        .drop("__h")
    )


def quality_weighted_sample(
    df: DataFrame,
    key_col: str,
    score_col: str,
    temperature: float = 1.0,
    seed: int = 0,
) -> DataFrame:
    """Deterministic quality-weighted sampling: keep probability =
    ``clamp(score, 0, 1) ** temperature`` per row, decided by the same
    hash-bucket primitive as ``hash_sample`` — so draws are
    reproducible per key and nested in temperature (lowering the
    exponent only ever ADDS rows for scores in [0,1]). The standard
    quality-curriculum move: temperature 0 keeps everything, higher
    temperatures concentrate the corpus on high-scoring documents.
    Pure filter, no shuffle; NULL scores drop."""
    if temperature < 0:
        raise ValueError(f"temperature must be >= 0, got {temperature}")
    p = F.pow(F.least(F.greatest(F.col(score_col), F.lit(0.0)), F.lit(1.0)), F.lit(float(temperature)))
    return df.filter(hash_bucket(F.col(key_col), seed) < p * _BUCKETS)


def cap_per_key(
    df: DataFrame,
    key_col: str,
    max_rows: int,
    order_col: str | None = None,
    seed: int = 0,
) -> DataFrame:
    """Keep at most ``max_rows`` rows per key — the per-domain quota of
    crawl pipelines (one mega-site must not dominate the corpus; pair
    ``key_col`` with functions/urls.url_host). Which rows survive is
    deterministic: ranked by ``order_col`` when given, else by the
    same xxhash64 primitive as `hash_sample` (a stable pseudo-random
    draw per key, reproducible run-to-run).

    One shuffle on the key. A pathological key (one host = half the
    corpus) is exactly what AQE skew-join/partition splitting handles;
    the rank itself is a running top-N per key, not a sort of the
    whole corpus.
    """
    from pyspark.sql import Window

    if max_rows <= 0:
        raise ValueError(f"max_rows must be positive, got {max_rows}")
    tiebreak = F.xxhash64(*[F.col(c) for c in df.columns if c != key_col], F.lit(seed))
    order = [F.col(order_col), tiebreak] if order_col else [tiebreak]
    w = Window.partitionBy(key_col).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_rows)
        .drop("__rn")
    )


def concat_bins(
    df: DataFrame,
    bin_col: str = "bin_id",
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    sep: str = "\n\n",
) -> DataFrame:
    """Materialize ``pack_documents`` bins into training sequences:
    one row per bin with documents concatenated in stable (id) order,
    the member id list, and the token total. One groupBy on the bin id
    (uniform: ids embed the partition); the text payload shuffles once
    — the unavoidable cost of physically building sequences.

    Skew bound: the packing budget IS the per-group size bound. A bin
    from `pack_documents` totals at most ``budget`` tokens — except a
    single over-budget document, which sits ALONE in its bin — so the
    `collect_list` state for any group is O(budget-worth of text) or
    O(one document), never "half the corpus under one key". One giant
    document among millions of small ones therefore concentrates
    exactly its own row, and a hot reduce task processes one document
    — the same cost any operator pays to read it
    (test_concat_bins_skewed_bin pins this adversarially)."""
    aggs = [
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct(id_col, text_col))), lambda s: s[text_col]
            ),
        ).alias(text_col),
        F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        F.count(F.lit(1)).alias("n_docs"),
    ]
    if tokens_col is not None:
        aggs.append(F.sum(tokens_col).alias("n_tokens"))
    return df.groupBy(bin_col).agg(*aggs)


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_chars: int,
    overlap: int = 0,
) -> DataFrame:
    """Split long documents into fixed-size windows with ``overlap``
    carried between consecutive chunks — the other half of sequence
    prep: `pack_documents` joins short documents up to the context
    budget, this cuts long ones down to it. One row per chunk with
    ``chunk_index`` (0-based) and the original columns; empty/NULL
    text yields a single chunk so no document silently disappears.

    Pure Column explode: chunk starts are a `sequence`, the cut is
    `substr`. Chunk count per document is ceil(len / stride), so the
    explode is linear in corpus size; positional substr re-scans the
    row's string per chunk, quadratic only in CHUNKS per document
    (len/stride of them), which for real context budgets (thousands
    of chars) is a handful per document.
    """
    if max_chars <= 0:
        raise ValueError(f"max_chars must be positive, got {max_chars}")
    if not 0 <= overlap < max_chars:
        raise ValueError(f"overlap must be in [0, max_chars), got {overlap}")
    stride = max_chars - overlap
    t = F.col(text_col)
    n = F.coalesce(F.length(t), F.lit(0))
    # last start must introduce at least one NEW char (not just replay
    # the previous chunk's overlap), hence the n - overlap - 1 bound
    starts = F.sequence(F.lit(0), F.greatest(n - overlap - 1, F.lit(0)), F.lit(stride))
    chunk = F.explode(
        F.transform(
            starts,
            lambda s, i: F.struct(
                i.alias("chunk_index"),
                t.substr(s + 1, F.lit(max_chars)).alias("__chunk"),
            ),
        )
    )
    out_cols = [c for c in df.columns if c != text_col]
    return df.select(*out_cols, chunk.alias("__c")).select(
        *out_cols,
        F.col("__c.chunk_index").alias("chunk_index"),
        F.col("__c.__chunk").alias(text_col),
    )


def chunk_by_sentences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_chars: int,
    joiner: str = " ",
) -> DataFrame:
    """Sentence-aware chunking: greedy-fill whole sentences into
    chunks of at most ``max_chars`` — the RAG-friendly variant of
    `chunk_documents`, which cuts mid-sentence. A single sentence
    longer than the budget becomes its own (oversized) chunk rather
    than being split — compose with `chunk_documents` afterwards to
    hard-cap those. Same output convention: one row per chunk,
    ``chunk_index`` 0-based, chunk text under ``text_col``; empty/NULL
    text yields one empty chunk so no document disappears.

    Pure Column pipeline: `split_sentences` (JVM regex) then ONE
    `aggregate` fold over the sentence array building the chunk list
    — linear in document length, zero Python, zero shuffle."""
    if max_chars <= 0:
        raise ValueError(f"max_chars must be positive, got {max_chars}")
    from d2d_spark.functions.text import split_sentences

    sents = split_sentences(F.col(text_col))
    init = F.struct(
        F.array().cast("array<string>").alias("chunks"), F.lit("").alias("cur")
    )

    def step(acc, s):
        cur = acc["cur"]
        joined = F.concat(cur, F.lit(joiner), s)
        return (
            F.when(cur == "", F.struct(acc["chunks"].alias("chunks"), s.alias("cur")))
            .when(
                F.length(joined) <= max_chars,
                F.struct(acc["chunks"].alias("chunks"), joined.alias("cur")),
            )
            .otherwise(
                F.struct(
                    F.array_append(acc["chunks"], cur).alias("chunks"), s.alias("cur")
                )
            )
        )

    agg = F.aggregate(
        sents,
        init,
        step,
        lambda acc: F.when(acc["cur"] == "", acc["chunks"]).otherwise(
            F.array_append(acc["chunks"], acc["cur"])
        ),
    )
    chunks = F.when(F.size(agg) > 0, agg).otherwise(F.array(F.lit("")))
    out_cols = [c for c in df.columns if c != text_col]
    return df.select(*out_cols, F.posexplode(chunks).alias("chunk_index", "__chunk")).select(
        *out_cols, "chunk_index", F.col("__chunk").alias(text_col)
    )
