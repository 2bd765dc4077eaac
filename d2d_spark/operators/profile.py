"""Table profiling and schema-drift preflight.

The reference exposes per-table counts (``get_count``) and infers
target DDL from the first row; a migration at 100 TB wants more before
it moves anything: per-column null rates, cardinality estimates, and
ranges (to pick partition/watermark columns), and a schema diff
against the target (to catch drift before a write fails mid-job).

``profile_table`` computes everything in ONE aggregation pass — a
single shuffle-free partial-agg job regardless of column count — and
reshapes the one-row result to a per-column report entirely plan-side
(array-of-structs explode; no driver collect). Cardinality is
HyperLogLog++ (``approx_count_distinct``), mergeable and bounded-error
at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from d2d_spark.functions.frames import local_frame
from pyspark.sql import functions as F

#: types min/max/mean make no sense for (or Spark refuses to order)
_UNORDERED = ("array", "map", "struct", "binary")


def profile_table(df: DataFrame, columns: list[str] | None = None, rsd: float = 0.05) -> DataFrame:
    """One row per column: ``column, dtype, n_rows, n_nulls,
    null_frac, approx_distinct, min, max, mean, stddev``.

    min/max are stringified for a uniform report schema; mean/stddev
    are NULL for non-numeric columns, min/max NULL for unorderable
    ones. ``rsd`` is the HLL relative standard deviation."""
    dtypes = dict(df.dtypes)
    cols = columns or df.columns
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"profile_table: no such columns {missing}")

    def numeric(c: str) -> bool:
        t = dtypes[c]
        return t in ("tinyint", "smallint", "int", "bigint", "float", "double") or t.startswith(
            "decimal"
        )

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        orderable = not dtypes[c].startswith(_UNORDERED)
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nn"),
            F.approx_count_distinct(c, rsd).alias(f"{c}__nd"),
            (F.min(c).cast("string") if orderable else F.lit(None).cast("string")).alias(
                f"{c}__min"
            ),
            (F.max(c).cast("string") if orderable else F.lit(None).cast("string")).alias(
                f"{c}__max"
            ),
            (F.avg(c) if numeric(c) else F.lit(None).cast("double")).alias(f"{c}__mean"),
            (F.stddev(c) if numeric(c) else F.lit(None).cast("double")).alias(f"{c}__sd"),
        ]
    one = df.agg(*aggs)

    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.lit(dtypes[c]).alias("dtype"),
                (F.col("__n") - F.col(f"{c}__nn")).alias("n_nulls"),
                ((F.col("__n") - F.col(f"{c}__nn")) / F.nullif(F.col("__n"), F.lit(0)))
                .cast("double")
                .alias("null_frac"),
                F.col(f"{c}__nd").alias("approx_distinct"),
                F.col(f"{c}__min").alias("min"),
                F.col(f"{c}__max").alias("max"),
                F.col(f"{c}__mean").alias("mean"),
                F.col(f"{c}__sd").alias("stddev"),
            )
            for c in cols
        ]
    )
    return (
        one.select(F.col("__n").alias("n_rows"), F.explode(entries).alias("e"))
        .select("e.column", "e.dtype", "n_rows", "e.n_nulls", "e.null_frac",
                "e.approx_distinct", "e.min", "e.max", "e.mean", "e.stddev")
    )


def schema_drift(source: DataFrame, target: DataFrame) -> DataFrame:
    """Column-level diff of two schemas: ``(column, change,
    source_type, target_type)`` with change in ``added`` (source-only),
    ``removed`` (target-only), ``type_changed``. Empty result =
    schemas agree (order-insensitive). Plan-side metadata only — no
    data is read."""
    spark = source.sparkSession
    src, tgt = dict(source.dtypes), dict(target.dtypes)
    rows = []
    for c, t in src.items():
        if c not in tgt:
            rows.append((c, "added", t, None))
        elif tgt[c] != t:
            rows.append((c, "type_changed", t, tgt[c]))
    rows += [(c, "removed", None, t) for c, t in tgt.items() if c not in src]
    return local_frame(
        spark, rows, "column string, change string, source_type string, target_type string"
    )


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str | None = None,
    source_col: str | None = None,
    deciles: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """Document-corpus data card: one long-format frame of
    ``(section, key, value)`` doubles covering size totals, an
    approximate (HLL-derived, clamped to [0, 1]) duplicate
    rate, token-length and quality-score quantiles, and (optional)
    per-language / per-source composition.

    Shape at scale: ONE global aggregation pass (map-side partials;
    percentile_approx and HLL are mergeable sketches) plus one small
    groupBy per composition column — nothing collects to the driver,
    and each section's cost is a partial-agg shuffle of at most
    |distinct keys| rows.
    """
    from d2d_spark.functions.text import fingerprint, quality_score, token_count_ws

    base = df.select(
        F.col(text_col).alias("__t"),
        fingerprint(F.col(text_col)).alias("__fp"),
        token_count_ws(F.col(text_col)).cast("double").alias("__tok"),
        quality_score(F.col(text_col)).alias("__q"),
        *([F.col(lang_col).alias("__lang")] if lang_col else []),
        *([F.col(source_col).alias("__src")] if source_col else []),
    )
    qs = list(deciles)
    one = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum(F.length("__t")).cast("double").alias("n_chars"),
        F.sum("__tok").alias("n_tokens"),
        F.approx_count_distinct("__fp").cast("double").alias("n_distinct_fp"),
        F.percentile_approx("__tok", qs).alias("tok_q"),
        F.percentile_approx("__q", qs).alias("qual_q"),
    )
    entries = F.array(
        F.struct(F.lit("totals").alias("section"), F.lit("n_docs").alias("key"), F.col("n_docs").alias("value")),
        F.struct(F.lit("totals").alias("section"), F.lit("n_chars").alias("key"), F.col("n_chars").alias("value")),
        F.struct(F.lit("totals").alias("section"), F.lit("n_tokens").alias("key"), F.col("n_tokens").alias("value")),
        F.struct(
            F.lit("totals").alias("section"),
            F.lit("approx_dup_frac").alias("key"),
            # HLL cardinality carries ~rsd relative error, so the raw
            # ratio can dip slightly negative (or over 1) on a
            # dup-free corpus — clamp to the meaningful range
            F.least(
                F.greatest(
                    (F.col("n_docs") - F.col("n_distinct_fp"))
                    / F.nullif(F.col("n_docs"), F.lit(0.0)),
                    F.lit(0.0),
                ),
                F.lit(1.0),
            ).alias("value"),
        ),
        *[
            F.struct(
                F.lit("token_quantiles").alias("section"),
                F.lit(f"p{int(q * 100)}").alias("key"),
                F.col("tok_q")[i].cast("double").alias("value"),
            )
            for i, q in enumerate(qs)
        ],
        *[
            F.struct(
                F.lit("quality_quantiles").alias("section"),
                F.lit(f"p{int(q * 100)}").alias("key"),
                F.col("qual_q")[i].cast("double").alias("value"),
            )
            for i, q in enumerate(qs)
        ],
    )
    out = one.select(F.explode(entries).alias("e")).select("e.section", "e.key", "e.value")
    if lang_col:
        out = out.unionByName(
            base.groupBy("__lang").agg(F.count(F.lit(1)).cast("double").alias("value")).select(
                F.lit("lang").alias("section"), F.col("__lang").alias("key"), "value"
            )
        )
    if source_col:
        out = out.unionByName(
            base.groupBy("__src").agg(F.count(F.lit(1)).cast("double").alias("value")).select(
                F.lit("source").alias("section"), F.col("__src").alias("key"), "value"
            )
        )
    return out


def key_skew_report(
    df: DataFrame,
    key_cols: list[str],
    top_k: int = 10,
    max_keys: int = 10_000_000,
) -> DataFrame:
    """Key-distribution skew diagnostics — the numbers that decide
    whether a join/groupBy on these keys needs salting, AQE skew
    handling, or a whale-key refusal (the operational companion to
    operators/skew.salted_join). Returns (stat, key, n, value) rows:

      rows / keys       — total rows, distinct keys (n)
      top               — the ``top_k`` heaviest keys with exact row
                          counts and share = n/rows (ties: largest n,
                          then smallest key — deterministic)
      max_over_avg      — max key count / mean key count: ~1 uniform,
                          >> 1 skewed (the salting trigger)
      entropy / entropy_norm — Shannon entropy of the key histogram
                          in nats, and normalized by ln(keys) (1.0 =
                          uniform; near 0 = one whale). Per-key terms
                          round to 12 decimals and sum in DECIMAL, so
                          the fold is partition-order-invariant.
      gini              — Gini coefficient of the count distribution
                          (0 uniform, -> 1 concentrated), from the
                          exact integer rank-sum formula
                          2*sum(r*n_r)/(K*N) - (K+1)/K over counts
                          sorted (n asc, key asc).

    Shape: ONE groupBy builds the per-key counts frame (bounded by
    key cardinality, not row count); the top slice is
    orderBy+limit (TakeOrderedAndProject); the scalar stats are one
    aggregate over that counts frame. The Gini rank runs a GLOBAL
    window over the counts frame — fine for a diagnostic up to
    ``max_keys`` distinct keys (refused loudly above; sample keys or
    raise the cap explicitly for wider spaces)."""
    from pyspark.sql import Window

    if top_k < 1:
        raise ValueError(f"key_skew_report: top_k must be >= 1, got {top_k}")
    if not key_cols:
        raise ValueError("key_skew_report: need at least one key column")
    # multi-column keys serialize via to_json with NULLs KEPT —
    # concat_ws silently skips NULL components, which would merge
    # distinct dirty keys like ('x', NULL) and (NULL, 'x') into one
    # count on exactly the data this diagnostic exists for
    key = (
        F.to_json(
            F.struct(*[F.col(c) for c in key_cols]),
            {"ignoreNullFields": "false"},
        )
        if len(key_cols) > 1
        else F.col(key_cols[0]).cast("string")
    )
    counts = df.groupBy(key.alias("__k")).agg(F.count(F.lit(1)).alias("__n"))
    # three jobs read the counts frame (totals, scalar stats, top
    # slice) — persist so the source groupBy runs once, and since
    # every output row is collected the frame releases before return
    counts = counts.persist()
    try:
        tot = counts.agg(
            F.sum("__n").alias("N"), F.count(F.lit(1)).alias("K"), F.max("__n").alias("mx")
        ).first()
        spark = df.sparkSession
        schema = "stat string, key string, n long, value double"
        if tot["N"] is None:
            return local_frame(
                spark, [("rows", None, 0, None), ("keys", None, 0, None)], schema
            )
        n_total, n_keys, mx = int(tot["N"]), int(tot["K"]), int(tot["mx"])
        if n_keys > max_keys:
            raise ValueError(
                f"key_skew_report: {n_keys} distinct keys (> max_keys={max_keys}) "
                "— the gini rank sorts the counts frame on one node; sample keys "
                "or raise the cap explicitly"
            )
        p = F.col("__n").cast("double") / F.lit(float(n_total))
        term = F.round(p * F.log(p), 12).cast("decimal(28,12)")
        rnk = F.row_number().over(Window.orderBy("__n", "__k"))
        scalars = counts.withColumn("__r", rnk).agg(
            (-F.sum(term)).cast("double").alias("H"),
            F.sum(F.col("__r").cast("decimal(28,0)") * F.col("__n")).alias("RS"),
        ).first()
        h = float(scalars["H"])
        rs = int(scalars["RS"])
        import math

        gini = 2.0 * rs / (float(n_keys) * n_total) - (n_keys + 1.0) / n_keys
        top_rows = [
            ("top", r["__k"], r["__n"], r["__n"] / float(n_total))
            for r in counts.orderBy(F.col("__n").desc(), "__k").limit(top_k).collect()
        ]
    finally:
        counts.unpersist(blocking=False)
    metric_rows = [
        ("rows", None, n_total, None),
        ("keys", None, n_keys, None),
        ("max_over_avg", None, mx, mx * float(n_keys) / n_total),
        ("entropy", None, None, h),
        ("entropy_norm", None, None, h / math.log(n_keys) if n_keys > 1 else None),
        ("gini", None, None, gini),
    ]
    return local_frame(spark, metric_rows + top_rows, schema)


def histogram(
    df: DataFrame,
    value_col: str,
    bins: int = 20,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equi-width histogram of a numeric column: (bucket, lo_edge,
    hi_edge, n), EVERY bucket present (zero-filled grid), NULLs
    excluded. Bounds come from one min/max pass unless given
    explicitly — with explicit bounds, out-of-range rows land in
    honest sentinel buckets (-1 = underflow, ``bins`` = overflow)
    instead of silently clamping; x == hi belongs to the last real
    bucket (the closed-right convention).

    Shape: one optional min/max aggregate, one groupBy on the bucket
    id (map-side combine — at most bins+2 groups), one bins-row grid
    join. Bucket arithmetic is floor((x-lo)/w) with w=(hi-lo)/bins —
    three float ops identical in any engine, so counts are
    hash-comparable."""
    if bins < 1:
        raise ValueError(f"histogram: bins must be >= 1, got {bins}")
    if (lo is None) != (hi is None):
        raise ValueError("histogram: pass BOTH lo and hi, or neither")
    v = F.col(value_col).cast("double")
    spark = df.sparkSession
    explicit = lo is not None
    if not explicit:
        mm = df.agg(F.min(v).alias("lo"), F.max(v).alias("hi")).first()
        if mm["lo"] is None:
            return spark.createDataFrame(
                [], "bucket int, lo_edge double, hi_edge double, n long"
            )
        lo, hi = float(mm["lo"]), float(mm["hi"])
        import math as _math

        if _math.isnan(lo) or _math.isnan(hi) or _math.isinf(lo) or _math.isinf(hi):
            # Spark's min/max order NaN as the largest double — auto
            # bounds would silently produce all-NULL buckets
            raise ValueError(
                f"histogram: {value_col!r} contains NaN/Inf (bounds "
                f"[{lo}, {hi}]) — filter them or pass explicit lo/hi "
                "(out-of-range rows then land in the sentinel buckets)"
            )
    else:
        lo, hi = float(lo), float(hi)
        if hi <= lo:
            raise ValueError(f"histogram: hi ({hi}) must be > lo ({lo})")
    if hi == lo:
        # single-valued column: everything in bucket 0
        n = df.filter(v.isNotNull()).count()
        return local_frame(
            spark, [(0, lo, hi, n)], "bucket int, lo_edge double, hi_edge double, n long"
        )
    w = (hi - lo) / bins
    raw = F.floor((v - F.lit(lo)) / F.lit(w)).cast("int")
    bucket = (
        F.when(v < lo, F.lit(-1))
        .when(v > hi, F.lit(bins))
        .when(v == hi, F.lit(bins - 1))
        .otherwise(F.least(raw, F.lit(bins - 1)))
    )
    counts = (
        df.filter(v.isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    grid = spark.range(bins).select(F.col("id").cast("int").alias("bucket"))
    out = grid.join(counts, "bucket", "full").select(
        "bucket", F.coalesce("n", F.lit(0)).alias("n")
    )
    return out.select(
        "bucket",
        F.when(F.col("bucket").between(0, bins - 1), F.lit(lo) + F.col("bucket") * F.lit(w)).alias("lo_edge"),
        F.when(
            F.col("bucket").between(0, bins - 1), F.lit(lo) + (F.col("bucket") + 1) * F.lit(w)
        ).alias("hi_edge"),
        "n",
    )


def mutual_information(
    df: DataFrame,
    col_a: str,
    col_b: str,
    max_cells: int = 10_000_000,
) -> dict:
    """Mutual information between two categorical columns (nats) plus
    the entropies and the min-entropy-normalized NMI — the
    column-DEPENDENCE diagnostic next to key_skew_report's
    single-column skew numbers (is `domain` informative about
    `language`? is a proposed partition key independent of the
    filter column?):

        MI = sum_ab p(ab) * ln( p(ab) / (p(a) p(b)) )

    NULL rows drop (a missing value is not a category; count them
    upstream if NULL-ness itself is the signal). Returns
    {"mi", "h_a", "h_b", "nmi", "n_rows", "n_cells"} — model-sized.

    Shape: ONE joint groupBy (bounded by |A|x|B|, refused above
    ``max_cells``) with the marginals derived from the SAME counts
    frame; every summand follows the skew-report discipline — round
    to 12 decimals, sum in DECIMAL — so the numbers are
    partition-order-invariant and bit-reproducible cluster-to-laptop.
    MI of independent columns is ~0 (exactly 0 only up to the 12-dp
    quantization); NMI = MI / min(H_a, H_b) in [0, ~1]."""
    if max_cells < 1:
        raise ValueError(f"mutual_information: max_cells must be >= 1, got {max_cells}")
    base = df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
    joint = (
        base.groupBy(F.col(col_a).alias("__a"), F.col(col_b).alias("__b"))
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    from pyspark.sql import Window

    # total as a driver-side literal: an empty-partition global window
    # would funnel every joint cell through ONE task
    n_rows = base.count()
    if n_rows == 0:
        return {"mi": 0.0, "h_a": 0.0, "h_b": 0.0, "nmi": 0.0, "n_rows": 0, "n_cells": 0}
    wa = Window.partitionBy("__a")
    wb = Window.partitionBy("__b")
    n = F.lit(float(n_rows))
    pa = F.sum("__n").over(wa).cast("double") / n
    pb = F.sum("__n").over(wb).cast("double") / n
    pab = F.col("__n").cast("double") / n
    terms = joint.select(
        "__n",
        F.round(pab * F.log(pab / (pa * pb)), 12).cast("decimal(28,12)").alias("__mi"),
        F.round(pab * F.log(pa), 12).cast("decimal(28,12)").alias("__ha"),
        F.round(pab * F.log(pb), 12).cast("decimal(28,12)").alias("__hb"),
    )
    stats = terms.agg(
        F.count(F.lit(1)).alias("cells"),
        F.sum("__n").alias("rows"),
        F.sum("__mi").alias("mi"),
        (-F.sum("__ha")).alias("ha"),
        (-F.sum("__hb")).alias("hb"),
    ).first()
    if stats["cells"] > max_cells:
        raise ValueError(
            f"mutual_information: {stats['cells']} joint cells "
            f"(> max_cells={max_cells}) — these are ID-like columns, not "
            "categories; bucket or hash them first"
        )
    mi = float(stats["mi"])
    ha, hb = float(stats["ha"]), float(stats["hb"])
    hmin = min(ha, hb)
    return {
        "mi": mi,
        "h_a": ha,
        "h_b": hb,
        "nmi": (mi / hmin) if hmin > 0 else 0.0,
        "n_rows": int(stats["rows"]),
        "n_cells": int(stats["cells"]),
    }


def _two_side_counts(ref, new, key_expr, key_name: str):
    """One tagged union + ONE groupBy collect for both drift sides
    (r11, guide §1.2 'fewer passes'): the ref/new bucket histograms
    used to be two separate collect jobs run back-to-back; unioning
    the sides under a 0/1 tag computes both in a single job (and the
    two scans run concurrently inside it). Counts are exact longs, so
    PSI/JSD outputs are bit-identical to the two-job form."""
    tagged = ref.select(key_expr, F.lit(0).alias("__side")).unionAll(
        new.select(key_expr, F.lit(1).alias("__side"))
    )
    rows = (
        tagged.groupBy("__side", key_name)
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    rc = {r[key_name]: r["c"] for r in rows if r["__side"] == 0}
    nc = {r[key_name]: r["c"] for r in rows if r["__side"] == 1}
    return rc, nc


def population_stability_index(
    df_ref: DataFrame,
    df_new: DataFrame,
    col: str,
    bins: int = 10,
    breakpoints: list | None = None,
    categorical: bool = False,
    smoothing: float = 1e-6,
) -> dict:
    """PSI — the production drift number (industry folklore: < 0.1
    stable, 0.1-0.25 drifting, > 0.25 shifted) between a reference
    snapshot and a new batch of the same column:

        PSI = sum_i (p_i - q_i) * ln(p_i / q_i)

    over equal-frequency bins FIT ON THE REFERENCE (numeric mode;
    pass explicit ``breakpoints`` to pin them across runs — refit
    breakpoints move with the drift and understate it) or over the
    union of observed categories (``categorical=True``). Empty-bin
    shares floor at ``smoothing`` so a vanished/new bucket scores
    loudly but finitely. NULLs drop (profile NULL-rate separately).
    Returns {"psi", "n_ref", "n_new", "bins": [(label, p, q)]} —
    model-sized.

    Shape: numeric breakpoints = one percentile_approx over the ref
    (deterministic for a given dataset); each side then takes ONE
    bucket-assignment groupBy; the PSI fold follows the 12-dp DECIMAL
    discipline driver-side (bin counts are exact longs, the fold runs
    over <= bins+1 numbers in Python — order pinned by bin index)."""
    import math

    if smoothing <= 0.0:
        raise ValueError(f"population_stability_index: smoothing must be > 0, got {smoothing}")
    ref = df_ref.filter(F.col(col).isNotNull())
    new = df_new.filter(F.col(col).isNotNull())
    if categorical:
        if breakpoints is not None:
            raise ValueError(
                "population_stability_index: breakpoints only apply to "
                "numeric mode; categorical bins are the values themselves"
            )
        rc, nc = _two_side_counts(ref, new, F.col(col).alias("k"), "k")
        labels = sorted(set(rc) | set(nc), key=str)
        counts = [(str(lb), rc.get(lb, 0), nc.get(lb, 0)) for lb in labels]
    else:
        if breakpoints is None:
            if bins < 2:
                raise ValueError(f"population_stability_index: bins must be >= 2, got {bins}")
            bps = ref.agg(
                F.percentile_approx(
                    col,
                    F.array(*[F.lit((i + 1) / bins) for i in range(bins - 1)]),
                    10_000,
                ).alias("b")
            ).first()["b"]
            if bps is None:
                raise ValueError("population_stability_index: reference has no non-NULL values")
            breakpoints = [float(b) for b in bps]
        else:
            breakpoints = sorted(float(b) for b in breakpoints)
            if not breakpoints:
                raise ValueError("population_stability_index: breakpoints must be non-empty")
        arr = F.array(*[F.lit(b) for b in breakpoints])
        bucket = F.aggregate(
            arr, F.lit(0), lambda acc, b: acc + (F.col(col) > b).cast("int")
        )
        rc, nc = _two_side_counts(ref, new, bucket.alias("b"), "b")
        nb = len(breakpoints) + 1
        def lbl(i):
            lo = "-inf" if i == 0 else repr(breakpoints[i - 1])
            hi = "+inf" if i == nb - 1 else repr(breakpoints[i])
            return f"({lo}, {hi}]"
        counts = [(lbl(i), rc.get(i, 0), nc.get(i, 0)) for i in range(nb)]
    n_ref = sum(c for _, c, _ in counts)
    n_new = sum(c for _, _, c in counts)
    if n_ref == 0 or n_new == 0:
        raise ValueError(
            "population_stability_index: both frames need at least one "
            "non-NULL value in the column"
        )
    psi = 0.0
    out_bins = []
    for lb, cr, cn in counts:
        p = max(cr / n_ref, smoothing)
        q = max(cn / n_new, smoothing)
        psi += (p - q) * math.log(p / q)
        out_bins.append((lb, cr / n_ref, cn / n_new))
    return {"psi": psi, "n_ref": n_ref, "n_new": n_new, "bins": out_bins}


def js_divergence(
    df_ref: DataFrame,
    df_new: DataFrame,
    col: str,
    bins: int = 10,
    breakpoints: list | None = None,
    categorical: bool = False,
) -> dict:
    """Jensen–Shannon divergence (Lin 1991, "Divergence measures
    based on the Shannon entropy"; base 2, so in [0, 1]) between a
    reference snapshot and a new batch of the same column — the
    SYMMETRIC, smoothing-free companion to
    `population_stability_index`: PSI blows up on vanished/new buckets
    and needs a smoothing floor; JSD is finite by construction
    (0*log 0 = 0), bounded, and its square root is a metric — the
    right number for comparing MANY corpus slices pairwise.

        JSD = 0.5*KL(P || M) + 0.5*KL(Q || M),  M = (P + Q)/2
        term_i = 0.5*(p_i*log2(2p_i/(p_i+q_i)) + q_i*log2(2q_i/(p_i+q_i)))

    Same binning contract as PSI: equal-frequency bins fit on the
    reference, explicit pinned ``breakpoints``, or observed-category
    union (``categorical=True``). NULLs drop. Returns {"jsd", "n_ref",
    "n_new", "bins": [(label, p, q, term)]} — model-sized.

    Shape: one bucket-assignment groupBy per side (numeric breakpoints
    = one percentile_approx over the ref); the JSD fold runs
    driver-side over <= bins+1 terms in bin order — each term one
    pinned float chain (exact count/total divisions, one log2), so
    the per-bin vector is SQL-replayable at 9 dp."""
    import math

    ref = df_ref.filter(F.col(col).isNotNull())
    new = df_new.filter(F.col(col).isNotNull())
    if categorical:
        if breakpoints is not None:
            raise ValueError(
                "js_divergence: breakpoints only apply to numeric mode; "
                "categorical bins are the values themselves"
            )
        rc, nc = _two_side_counts(ref, new, F.col(col).alias("k"), "k")
        labels = sorted(set(rc) | set(nc), key=str)
        counts = [(str(lb), rc.get(lb, 0), nc.get(lb, 0)) for lb in labels]
    else:
        if breakpoints is None:
            if bins < 2:
                raise ValueError(f"js_divergence: bins must be >= 2, got {bins}")
            bps = ref.agg(
                F.percentile_approx(
                    col,
                    F.array(*[F.lit((i + 1) / bins) for i in range(bins - 1)]),
                    10_000,
                ).alias("b")
            ).first()["b"]
            if bps is None:
                raise ValueError("js_divergence: reference has no non-NULL values")
            breakpoints = [float(b) for b in bps]
        else:
            breakpoints = sorted(float(b) for b in breakpoints)
            if not breakpoints:
                raise ValueError("js_divergence: breakpoints must be non-empty")
        arr = F.array(*[F.lit(b) for b in breakpoints])
        bucket = F.aggregate(
            arr, F.lit(0), lambda acc, b: acc + (F.col(col) > b).cast("int")
        )
        rc, nc = _two_side_counts(ref, new, bucket.alias("b"), "b")
        nb = len(breakpoints) + 1

        def lbl(i):
            lo = "-inf" if i == 0 else repr(breakpoints[i - 1])
            hi = "+inf" if i == nb - 1 else repr(breakpoints[i])
            return f"({lo}, {hi}]"

        counts = [(lbl(i), rc.get(i, 0), nc.get(i, 0)) for i in range(nb)]
    n_ref = sum(c for _, c, _ in counts)
    n_new = sum(c for _, _, c in counts)
    if n_ref == 0 or n_new == 0:
        raise ValueError(
            "js_divergence: both frames need at least one non-NULL value "
            "in the column"
        )
    jsd = 0.0
    out_bins = []
    for lb, cr, cn in counts:
        p = cr / n_ref
        q = cn / n_new
        pterm = p * math.log2(2.0 * p / (p + q)) if p > 0.0 else 0.0
        qterm = q * math.log2(2.0 * q / (p + q)) if q > 0.0 else 0.0
        term = 0.5 * (pterm + qterm)
        jsd += term
        out_bins.append((lb, p, q, term))
    return {"jsd": jsd, "n_ref": n_ref, "n_new": n_new, "bins": out_bins}


def benford_deviation(
    df: DataFrame,
    col: str,
) -> dict:
    """First-digit Benford's-law screen — the classic fabricated-data
    / unit-mixing tripwire for positive numeric columns (amounts,
    populations, file sizes): compares the observed leading-digit
    distribution against P(d) = log10(1 + 1/d) and reports

      {"mad": mean |obs - exp| over digits 1-9 (Nigrini's statistic:
              < 0.006 close conformity, > 0.015 nonconformity),
       "chi2": Pearson chi-square vs the Benford expectation (dof 8),
       "digits": [(d, observed_share, expected_share)], "n": rows}

    Zero/NULL/NaN/infinite values drop (no leading digit); negatives
    screen by magnitude. Shape: the leading digit comes from the
    CORRECTLY-ROUNDED scientific rendering (format '%.15E', first
    char) — the arithmetic route floor(x / 10^floor(log10 x)) is a
    float trap: 0.3/0.1 is 2.9999999999999996 in IEEE and would
    misfile digit 3 as 2. One format + substring per row, then ONE
    9-bucket groupBy."""
    import math

    v = F.abs(F.col(col).cast("double"))
    finite = F.col(col).isNotNull() & ~F.isnan(v) & (v > 0) & (v != float("inf"))
    lead = F.substring(F.format_string("%.15E", v), 1, 1).cast("int")
    counts = {
        int(r["d"]): int(r["c"])
        for r in df.filter(finite)
        .select(lead.alias("d"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    n = sum(counts.values())
    if n == 0:
        raise ValueError(
            f"benford_deviation: no positive non-NULL values in {col!r}"
        )
    digits = []
    mad = 0.0
    chi2 = 0.0
    for d in range(1, 10):
        exp = math.log10(1.0 + 1.0 / d)
        obs = counts.get(d, 0) / n
        digits.append((d, obs, exp))
        mad += abs(obs - exp)
        e = exp * n
        o = counts.get(d, 0)
        chi2 += (o - e) * (o - e) / e
    return {"mad": mad / 9.0, "chi2": chi2, "digits": digits, "n": n}
