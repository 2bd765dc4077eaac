"""Hypothesis-test statistics — the A/B-test / dependence-check
toolkit next to the profiler's descriptive numbers (profile.py says
WHAT the distributions look like; this module scores WHETHER two
columns / two groups differ beyond chance):

  chi2_independence — Pearson chi-square of independence between two
      categorical columns, plus Cramér's V (the [0,1] effect size).
  ttest_welch       — Welch's unequal-variance two-sample t statistic
                      with the Welch–Satterthwaite degrees of freedom.

Both return MODEL-SIZED dicts (statistics, not row sets). P-values
need distribution CDFs (incomplete beta/gamma) that neither Spark nor
the stdlib expose vectorized — callers threshold on the statistic
with their own critical values, or feed the returned (stat, dof) to
scipy driver-side. Emitting the statistic keeps every number exactly
replayable by any engine.

Determinism: chi-square works entirely on exact integer counts — the
per-cell term is (o·n − r·c)² / (n·r·c), integer arithmetic until one
final division — and the sum follows the profiler's 12-dp DECIMAL
discipline, so the statistic is partition-order-invariant. Welch's t
quantizes values to DECIMAL(18,6) before summing (exact decimal sums;
the quantization is the documented contract — a float sum would be
partition-order-dependent in the last ulp), then runs one fixed
double expression per moment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from d2d_spark.functions.frames import local_frame
from pyspark.sql import functions as F


def chi2_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
    max_cells: int = 1_000_000,
) -> dict:
    """{"chi2", "dof", "n", "cramers_v", "n_a", "n_b"} — Pearson's
    chi-square over the |A|x|B| contingency grid (ZERO cells included:
    the grid is the cross of the observed marginals, left-joined with
    the joint counts — dropping empty cells understates the statistic)
    and Cramér's V = sqrt(chi2 / (n * (min(|A|,|B|) - 1))). NULL rows
    drop. Counts above ~2^53/n would lose exactness in the double
    term; fixture-scale data is far below.

    Shape: one joint groupBy, two marginal aggregates derived from it,
    a marginal cross-join bounded by |A|x|B| (refused above
    ``max_cells``), 12-dp DECIMAL term sum."""
    if max_cells < 1:
        raise ValueError(f"chi2_independence: max_cells must be >= 1, got {max_cells}")
    base = df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
    joint = base.groupBy(
        F.col(col_a).alias("__a"), F.col(col_b).alias("__b")
    ).agg(F.count(F.lit(1)).alias("__o"))
    from pyspark import StorageLevel

    joint = joint.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        tot = joint.agg(
            F.sum("__o").alias("n"),
            F.countDistinct("__a").alias("na"),
            F.countDistinct("__b").alias("nb"),
        ).first()
        if tot["n"] is None:
            return {"chi2": 0.0, "dof": 0, "n": 0, "cramers_v": 0.0, "n_a": 0, "n_b": 0}
        n, na, nb = int(tot["n"]), int(tot["na"]), int(tot["nb"])
        if na * nb > max_cells:
            raise ValueError(
                f"chi2_independence: {na}x{nb} contingency cells "
                f"(> max_cells={max_cells}) — these are ID-like columns, "
                "not categories; bucket or hash them first"
            )
        ma = joint.groupBy("__a").agg(F.sum("__o").alias("__r"))
        mb = joint.groupBy("__b").agg(F.sum("__o").alias("__c"))
        grid = ma.crossJoin(mb).join(joint, ["__a", "__b"], "left").select(
            F.coalesce("__o", F.lit(0)).alias("o"), "__r", "__c"
        )
        # (o*n - r*c)^2 / (n*r*c): integer products stay exact in the
        # double domain below 2^53; one division per cell, 12-dp
        # DECIMAL sum -> partition-order-invariant
        num = (
            F.col("o").cast("double") * F.lit(float(n))
            - F.col("__r").cast("double") * F.col("__c")
        )
        term = F.round(
            num * num / (F.lit(float(n)) * F.col("__r") * F.col("__c")), 12
        ).cast("decimal(28,12)")
        chi2 = float(grid.agg(F.sum(term)).first()[0])
    finally:
        joint.unpersist()
    kmin = min(na, nb)
    import math

    v = math.sqrt(chi2 / (n * (kmin - 1))) if kmin > 1 and n > 0 else 0.0
    return {
        "chi2": chi2,
        "dof": (na - 1) * (nb - 1),
        "n": n,
        "cramers_v": v,
        "n_a": na,
        "n_b": nb,
    }


def ttest_welch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> dict:
    """{"t", "dof", "cohen_d", "mean_a", "mean_b", "var_a", "var_b",
    "n_a", "n_b"} — Welch's unequal-variance two-sample t statistic between
    the ``group_a`` and ``group_b`` slices of ``group_col`` with the
    Welch–Satterthwaite degrees of freedom. NULL values drop. Each
    group needs >= 2 values (refused otherwise: a variance needs a
    denominator). Values quantize to DECIMAL(18,6) before the exact
    decimal sum/sum-of-squares (the partition-order-invariance
    contract); the final moments run one pinned double expression, so
    any engine replaying the same chain matches bit-for-bit."""
    dec = "decimal(18,6)"
    # r12: the exact decimal (n, sum, sum-of-squares) per group now
    # runs through the Arrow limb-product kernel (same integers the
    # JVM decimal aggregate produced — operators/moments docstring has
    # the exactness audit); quantization cast and the pinned double
    # chain below are unchanged.
    from decimal import Decimal

    from d2d_spark.operators.moments import exact_moment_sums

    base = df.filter(
        F.col(group_col).isin([group_a, group_b]) & F.col(value_col).isNotNull()
    ).select(
        (F.col(value_col).cast(dec) * F.lit(1_000_000)).cast("long").alias("__v0"),
        (F.col(group_col) == F.lit(group_a)).alias("__g"),
    )
    rows = exact_moment_sums(base, 1, grouped=True)
    if (
        True not in rows
        or False not in rows
        or rows[True]["n"] < 2
        or rows[False]["n"] < 2
    ):
        raise ValueError(
            "ttest_welch: both groups need >= 2 non-NULL values — a variance "
            "needs a denominator; check the group labels and filters"
        )

    def moments(r):
        n = int(r["n"])
        s = float(Decimal(f"{r['s0']}E-6"))
        sq = float(Decimal(f"{r['p0_0']}E-12"))
        mean = s / n
        var = (sq - n * mean * mean) / (n - 1)
        return n, mean, var

    na, ma, va = moments(rows[True])
    nb, mb, vb = moments(rows[False])
    if va < 0.0:
        va = 0.0
    if vb < 0.0:
        vb = 0.0
    se2 = va / na + vb / nb
    if se2 <= 0.0:
        raise ValueError(
            "ttest_welch: both groups have zero variance — the t statistic "
            "is undefined (all values identical); nothing to test"
        )
    import math

    # explicit multiplies + math.sqrt, never **: the whole chain must
    # be replayable as the identical IEEE ops in plain SQL
    t = (ma - mb) / math.sqrt(se2)
    dof = se2 * se2 / (
        (va / na) * (va / na) / (na - 1) + (vb / nb) * (vb / nb) / (nb - 1)
    )
    # Cohen's d on the pooled SD (Cohen 1988) — the EFFECT SIZE next
    # to the test statistic (a huge n makes a trivial difference
    # "significant"; d says whether it matters: ~0.2 small / 0.5
    # medium / 0.8 large).
    # Same replayable chain discipline. pooled > 0 is an invariant
    # here: the se2 refusal above already guarantees va > 0 or vb > 0.
    pooled = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
    d = (ma - mb) / math.sqrt(pooled)
    return {
        "t": t,
        "dof": dof,
        "cohen_d": d,
        "mean_a": ma,
        "mean_b": mb,
        "var_a": va,
        "var_b": vb,
        "n_a": na,
        "n_b": nb,
    }


def linear_fit(
    df: DataFrame,
    key_cols: list[str] | None,
    x_col: str,
    y_col: str,
    min_points: int = 2,
) -> DataFrame:
    """Per-key ordinary-least-squares line y = slope*x + intercept
    with r2 — the per-entity trend fit (spend drift per customer,
    volume trend per domain) as ONE closed-form groupBy, no iteration:

        slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx*Sx)

    Returns (keys..., n, slope, intercept, r2). Rows with NULL x or y
    drop; keys with fewer than ``min_points`` points, or zero x
    variance (a vertical line), emit NULL slope/intercept/r2 — honest
    "can't fit" instead of a division blow-up. ``key_cols=None`` fits
    one global line.

    Determinism: x and y quantize to DECIMAL(18,6) and the five
    moments are EXACT decimal sums (partition-order-invariant); the
    closed forms then run one pinned double chain per key, so any
    engine replaying the same expressions matches bit-for-bit. Shape:
    one groupBy with map-side partials — the cheapest possible fit at
    100 TB."""
    if min_points < 2:
        raise ValueError(f"linear_fit: min_points must be >= 2, got {min_points}")
    keys = list(key_cols or [])
    dec = "decimal(18,6)"
    base = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()).select(
        *keys,
        # (18,6) operands are load-bearing: Spark's (18,6)x(18,6)
        # product is DECIMAL(37,12) — EXACT. Wider operands overflow
        # precision 38 and Spark silently REDUCES the product scale
        # (rounding every term); int64-backed replay engines instead
        # widen their operands to reach int128 (see the oracle SQL) —
        # both roads land on the same exact scale-12 values
        F.col(x_col).cast(dec).alias("__x"),
        F.col(y_col).cast(dec).alias("__y"),
    )
    agg = base.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("__sx").cast("double"), F.col("__sy").cast("double")
    sxx = F.col("__sxx").cast("double")
    sxy = F.col("__sxy").cast("double")
    syy = F.col("__syy").cast("double")
    det = n * sxx - sx * sx
    num = n * sxy - sx * sy
    ok = (F.col("n") >= min_points) & (det > 0.0)
    slope = F.when(ok, num / det)
    intercept = F.when(ok, (sy - (num / det) * sx) / n)
    denom_y = n * syy - sy * sy
    r2 = F.when(
        ok & (denom_y > 0.0), (num * num) / (det * denom_y)
    )
    return agg.select(
        *keys,
        "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def spearman_corr(
    df: DataFrame,
    key_cols: list[str] | None,
    x_col: str,
    y_col: str,
    min_points: int = 2,
) -> DataFrame:
    """Per-key Spearman rank correlation rho (Spearman 1904, average
    ranks for ties) — the robust companion to
    the Pearson `corr_matrix`/`linear_fit` family: monotone
    association on RANKS, immune to outliers and monotone rescaling
    (the drift question "does spend still rise with tenure" where one
    whale order wrecks Pearson r). Returns (keys..., n, rho).

    Ties take AVERAGE ranks (the classical convention):
    avg_rank = RANK() + (|tie group| - 1)/2 — rank is an exact
    integer, the tie offset an exact half, so every rank is an exact
    multiple of 0.5 and the DECIMAL(18,6) cast is lossless. rho is
    then Pearson over the rank pairs with `linear_fit`'s exact-moment
    discipline: five DECIMAL sums in ONE groupBy (the (18,6)x(18,6)
    product is exact DECIMAL(37,12)), a pinned double chain at the
    end — partition-order-invariant and SQL-replayable. Rows with a
    NULL in either column drop (listwise, like corr_matrix); keys
    with < min_points rows or zero rank variance in either variable
    (all-tied) emit NULL rho.

    Shape, per-key: two rank windows + one groupBy on the SAME key
    partitioning (one shuffle wide). Per-key ranking serializes a
    key's rows on one task — the group_quantiles caveat: fine for
    per-entity series; route whale keys through the global mode on a
    filtered frame. Shape, GLOBAL (``key_cols=None``): the
    `ranks.ranked_values` distributed prefix sum — value-collapse
    groupBy per column, bucket-offset cumsum, within-bucket window,
    then two equi-joins of the per-value average ranks back onto the
    rows — NO unpartitioned window anywhere in the plan
    (partitioning-invariance test-pinned at 1/7/32 partitions), so
    global rho costs two uniform-key shuffles at any scale."""
    if min_points < 2:
        raise ValueError(f"spearman_corr: min_points must be >= 2, got {min_points}")
    keys = list(key_cols or [])
    dec = "decimal(18,6)"
    from pyspark.sql import Window

    base = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())

    if not keys:
        # the avg-rank frames are distinct-valued; the (18,6) recast
        # is lossless while ranks stay below 1e12 (exact halves) and
        # keeps the moment products inside linear_fit's exact
        # DECIMAL(37,12) envelope
        from d2d_spark.operators.ranks import ranked_values

        rx = ranked_values(base, x_col).select(
            F.col("__v").alias("__vx"),
            F.col("__avg_rank").cast(dec).alias("__rx"),
        )
        ry = ranked_values(base, y_col).select(
            F.col("__v").alias("__vy"),
            F.col("__avg_rank").cast(dec).alias("__ry"),
        )
        ranked = (
            base.select(F.col(x_col).alias("__vx"), F.col(y_col).alias("__vy"))
            .join(rx, "__vx")
            .join(ry, "__vy")
            .select("__rx", "__ry")
        )
    else:

        def avg_rank(col: str):
            w = Window.partitionBy(*keys).orderBy(col)
            ties = Window.partitionBy(*keys, col)
            return (
                F.rank().over(w) + (F.count(F.lit(1)).over(ties) - F.lit(1)) / F.lit(2)
            ).cast(dec)

        ranked = base.select(
            *keys, avg_rank(x_col).alias("__rx"), avg_rank(y_col).alias("__ry")
        )
    agg = ranked.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__rx").alias("__sx"),
        F.sum("__ry").alias("__sy"),
        F.sum(F.col("__rx") * F.col("__rx")).alias("__sxx"),
        F.sum(F.col("__rx") * F.col("__ry")).alias("__sxy"),
        F.sum(F.col("__ry") * F.col("__ry")).alias("__syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("__sx").cast("double"), F.col("__sy").cast("double")
    sxx = F.col("__sxx").cast("double")
    sxy = F.col("__sxy").cast("double")
    syy = F.col("__syy").cast("double")
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    ok = (F.col("n") >= min_points) & (dx > 0.0) & (dy > 0.0)
    rho = F.when(ok, (n * sxy - sx * sy) / F.sqrt(dx * dy))
    return agg.select(*keys, "n", rho.alias("rho"))


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    num_partitions: int | None = None,
) -> dict:
    """{"d", "n_a", "n_b", "at_value"} — the exact two-sample
    Kolmogorov–Smirnov statistic D = max_x |F_a(x) - F_b(x)|, the
    NONPARAMETRIC companion to ttest_welch (no normality assumption;
    catches shape/scale differences a mean test misses). ``at_value``
    is the smallest value where the supremum is attained
    (deterministic tie-break). NULL values drop; each group needs at
    least one value.

    Exactness: everything until the final division is integer — the
    per-value cumulative counts are exact, and the ECDF gap
    |ca/n_a - cb/n_b| is two exact-long divisions — so D is
    engine-portable with no float-fold sensitivity.

    Shape (the quantiles_exact distributed prefix-sum): collapse to
    (value, count_a, count_b) — one groupBy — then approx-quantile
    bucket boundaries over DISTINCT values, per-bucket offset sums
    (<= #buckets rows, one tiny window) and a WITHIN-bucket cumulative
    window: no global single-partition sort anywhere. 100 TB cost =
    the value-collapse groupBy."""
    from pyspark import StorageLevel

    from d2d_spark import cache as opcache

    # r11 (guide §2.4): the collapse feeds four consumers (totals,
    # boundary sketch, offsets, the bucketed scan) — persist it once
    # per call and drop it before returning (the result is an eager
    # dict, so every action has run by then; the binary_auc pattern)
    counts = opcache.register(
        "ks_two_sample",
        df.filter(
            F.col(group_col).isin([group_a, group_b]) & F.col(value_col).isNotNull()
        )
        .groupBy(F.col(value_col).alias("__v"))
        .agg(
            F.sum((F.col(group_col) == F.lit(group_a)).cast("long")).alias("__ca"),
            F.sum((F.col(group_col) == F.lit(group_b)).cast("long")).alias("__cb"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK),
    )
    try:
        return _ks_two_sample_body(df, counts, group_a, group_b, num_partitions)
    finally:
        opcache.deregister("ks_two_sample", [counts])


def _ks_two_sample_body(
    df: DataFrame,
    counts: DataFrame,
    group_a,
    group_b,
    num_partitions: int | None,
) -> dict:
    tot = counts.agg(
        F.sum("__ca").alias("na"), F.sum("__cb").alias("nb")
    ).first()
    n_a = int(tot["na"] or 0)
    n_b = int(tot["nb"] or 0)
    if n_a == 0 or n_b == 0:
        raise ValueError(
            "ks_two_sample: both groups need at least one non-NULL value — "
            "check the group labels and filters"
        )
    spark = df.sparkSession
    nb_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    from pyspark.sql import Window

    bnds = counts.agg(
        F.percentile_approx(
            "__v",
            F.array(*[F.lit((i + 1) / nb_parts) for i in range(max(nb_parts - 1, 1))]),
            10_000,
        ).alias("__b")
    )
    bucketed = counts.crossJoin(F.broadcast(bnds)).select(
        "__v",
        "__ca",
        "__cb",
        F.coalesce(
            F.aggregate(
                "__b", F.lit(0), lambda acc, b: acc + (b < F.col("__v")).cast("int")
            ),
            F.lit(0),
        ).alias("__pid"),
    )
    offs = (
        bucketed.groupBy("__pid")
        .agg(F.sum("__ca").alias("__pa"), F.sum("__cb").alias("__pb"))
        .select(
            "__pid",
            F.coalesce(
                F.sum("__pa").over(
                    Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("__offa"),
            F.coalesce(
                F.sum("__pb").over(
                    Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("__offb"),
        )
    )
    w_in = (
        Window.partitionBy("__pid")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    gap = F.abs(
        (F.col("__offa") + F.sum("__ca").over(w_in)).cast("double") / F.lit(float(n_a))
        - (F.col("__offb") + F.sum("__cb").over(w_in)).cast("double") / F.lit(float(n_b))
    )
    best = (
        bucketed.join(F.broadcast(offs), "__pid")
        .select("__v", gap.alias("__g"))
        .orderBy(F.col("__g").desc(), F.col("__v").asc())
        .limit(1)
        .first()
    )
    return {"d": float(best["__g"]), "n_a": n_a, "n_b": n_b, "at_value": best["__v"]}


def corr_matrix(
    df: DataFrame,
    value_cols: list[str],
) -> DataFrame:
    """Pairwise Pearson correlations over up to ~16 numeric columns in
    ONE moment aggregate — the feature-redundancy screen before model
    prep (and the input to "drop one of every r > 0.95 pair"):

        r = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2))

    Returns (col_a, col_b, n, r) for every unordered pair
    (col_a < col_b by the given order), plus each column against
    itself (r = 1.0 when defined). Rows with ANY NULL among the
    columns drop — listwise deletion, so every pair is computed over
    the SAME row set and the matrix is positive semi-definite
    (pairwise deletion can produce an inconsistent matrix). A
    zero-variance column yields NULL r against everything (including
    itself).

    Determinism: the linear_fit discipline — DECIMAL(18,6)-quantized
    values, exact decimal moment sums, one pinned double chain. r12:
    the moment sums run through operators/moments.exact_moment_sums
    (the Arrow limb-product kernel) — the SAME integers the JVM
    decimal aggregate produced, 5-8x cheaper per row (guide §4.2);
    the float conversions and the double chain are unchanged."""
    import math
    from decimal import Decimal

    from d2d_spark.operators.moments import exact_moment_sums

    d = len(value_cols)
    if d < 2:
        raise ValueError(f"corr_matrix: need >= 2 columns, got {value_cols}")
    if d > 16:
        raise ValueError(
            f"corr_matrix: {d} columns is {d * (d + 1) // 2} moment sums in "
            "one pass — reduce dimensions first"
        )
    dec = "decimal(18,6)"
    ok = F.lit(True)
    for c in value_cols:
        ok = ok & F.col(c).isNotNull()
    # scaled int64: quantize with the SAME decimal cast as before, then
    # shift the scale out — exact (decimal(25,6) * 1e6 has no fraction,
    # |v| < 1e18 fits a long, ANSI raises on NaN/Inf exactly as the
    # decimal aggregate input cast did)
    base = df.filter(ok).select(
        *[
            (F.col(c).cast(dec) * F.lit(1_000_000)).cast("long").alias(f"__v{i}")
            for i in range(d)
            for c in [value_cols[i]]
        ]
    )
    tot = exact_moment_sums(base, d).get(None, {"n": 0})
    n = int(tot["n"])
    spark = df.sparkSession
    schema = "col_a string, col_b string, n long, r double"
    if n < 2:
        return local_frame(
            spark,
            [(value_cols[i], value_cols[j], n, None) for i in range(d) for j in range(i, d)],
            schema,
        )
    # float(Decimal) is correctly rounded — identical to float() of the
    # decimal the JVM aggregate would have returned
    s = [float(Decimal(f"{tot[f's{i}']}E-6")) for i in range(d)]
    p = {k: float(Decimal(f"{v}E-12")) for k, v in tot.items() if k.startswith("p")}
    out = []
    for i in range(d):
        for j in range(i, d):
            pij = p[f"p{i}_{j}"]
            num = n * pij - s[i] * s[j]
            di = n * p[f"p{i}_{i}"] - s[i] * s[i]
            dj = n * p[f"p{j}_{j}"] - s[j] * s[j]
            r = num / math.sqrt(di * dj) if di > 0.0 and dj > 0.0 else None
            out.append((value_cols[i], value_cols[j], n, r))
    # r12 (guide §4): model-sized result through JVM literals, not a
    # parallelized Python RDD — same rows, no Python workers
    return local_frame(spark, out, schema)


def binary_auc(
    df: DataFrame,
    label_col: str,
    score_col: str,
    num_partitions: int | None = None,
) -> dict:
    """{"auc", "gini", "n_pos", "n_neg"} — the exact ROC-AUC of a
    score against a binary label (tie-aware, via the Mann–Whitney U
    identity), the evaluation companion to the quality classifiers
    (nb_classifier / logreg / gpt3 filter): AUC = P(score_pos >
    score_neg) + 0.5 * P(tie). ``gini`` = 2*AUC - 1.

    Exactness: with per-score counts (cp, cn) and C = cumulative
    total INCLUSIVE of the score, the tied-rank sum over positives is

        2 * sum_ranks_pos = sum_v cp * (2*(C - c) + c + 1)

    — integers throughout, summed in DECIMAL(38,0) so 1e9+ rows
    cannot overflow a long product chain; AUC is ONE division of
    exact integers, engine-portable bit-for-bit. NULL labels/scores
    drop (profile NULL-ness separately); labels must cast to boolean.

    Shape: the ks_two_sample distributed prefix-sum — one
    value-collapse groupBy, approx bucket boundaries over DISTINCT
    scores, per-bucket offsets, a within-bucket cumulative window.
    No global single-partition sort; 100 TB cost = the score-collapse
    groupBy."""
    lab = F.col(label_col).cast("boolean")
    base = df.filter(lab.isNotNull() & F.col(score_col).isNotNull())
    from pyspark import StorageLevel

    from d2d_spark import cache as opcache

    # the score-collapse groupBy is the dominant cost at scale and
    # feeds THREE actions (totals, bucket boundaries, bucketed scan) —
    # persist it once under the standing opcache discipline.
    # r12: the cache is EXPLICITLY partitioned by score — its bytes
    # are small but its per-row consumer cost (DECIMAL(38,0) rank
    # products) is not, and AQE's byte-based coalescing of cached
    # plans would otherwise serialize that work onto one task
    # (measured: 11 tasks / 1.99 s wall vs 200 tasks / 1.61 s).
    # An explicit partition count is exempt from AQE coalescing; it
    # derives from the session's shuffle-partitions conf, so it is
    # cluster-sized, not tuned to this box.
    nb = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    counts = opcache.register(
        "binary_auc",
        base.groupBy(F.col(score_col).alias("__v"))
        .agg(
            F.sum(lab.cast("long")).alias("__cp"),
            F.sum((~lab).cast("long")).alias("__cn"),
        )
        .repartition(nb, "__v")
        .persist(StorageLevel.MEMORY_AND_DISK),
    )
    try:
        return _binary_auc_body(df, counts, num_partitions)
    finally:
        # the result is an eager dict — every action has run by now,
        # so the persist can be dropped here (unlike the lazy-result
        # operators this registry usually serves)
        opcache.deregister("binary_auc", [counts])


def _binary_auc_body(
    df: DataFrame, counts: DataFrame, num_partitions: int | None
) -> dict:
    tot = counts.agg(F.sum("__cp").alias("p"), F.sum("__cn").alias("n")).first()
    n_pos = int(tot["p"] or 0)
    n_neg = int(tot["n"] or 0)
    if n_pos == 0 or n_neg == 0:
        raise ValueError(
            f"binary_auc: need both classes present, got {n_pos} positive / "
            f"{n_neg} negative non-NULL rows"
        )
    spark = df.sparkSession
    nb_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    from pyspark.sql import Window

    bnds = counts.agg(
        F.percentile_approx(
            "__v",
            F.array(*[F.lit((i + 1) / nb_parts) for i in range(max(nb_parts - 1, 1))]),
            10_000,
        ).alias("__b")
    )
    bucketed = counts.crossJoin(F.broadcast(bnds)).select(
        "__v",
        "__cp",
        "__cn",
        F.coalesce(
            F.aggregate(
                "__b", F.lit(0), lambda acc, b: acc + (b < F.col("__v")).cast("int")
            ),
            F.lit(0),
        ).alias("__pid"),
    )
    offs = (
        bucketed.groupBy("__pid")
        .agg(F.sum(F.col("__cp") + F.col("__cn")).alias("__pc"))
        .select(
            "__pid",
            F.coalesce(
                F.sum("__pc").over(
                    Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("__off"),
        )
    )
    w_in = (
        Window.partitionBy("__pid")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = F.col("__cp") + F.col("__cn")
    cum_incl = F.col("__off") + F.sum(c).over(w_in)
    term = (
        F.col("__cp").cast("decimal(38,0)")
        * (F.lit(2) * (cum_incl - c) + c + F.lit(1)).cast("decimal(38,0)")
    )
    s2 = (
        bucketed.join(F.broadcast(offs), "__pid")
        .select(term.alias("__t"))  # window first; sum in a sub-plan
        .agg(F.sum("__t").alias("__s2"))
        .first()["__s2"]
    )
    u2 = int(s2) - n_pos * (n_pos + 1)  # 2*U, exact
    auc = u2 / (2 * n_pos * n_neg)
    return {"auc": auc, "gini": 2.0 * auc - 1.0, "n_pos": n_pos, "n_neg": n_neg}
