"""Probabilistic record linkage — the Fellegi–Sunter model (Fellegi &
Sunter 1969; the Splink shape at Spark scale), the SCORING layer on
top of the blocking/distance family (dedup.phonetic_blocked_pairs,
fuzzy_pairs_*, join.golden_record downstream):

  linkage_em    — fit the model's parameters (lambda, m_i, u_i) from
                  UNLABELED candidate pairs by expectation-
                  maximization over binary field-agreement vectors.
  linkage_score — per-pair Fellegi–Sunter match weight (the sum of
                  per-field log2 Bayes factors) and posterior match
                  probability under fitted/given parameters.

Model: each candidate pair carries an agreement vector gamma (one 0/1
column per compared field). Matches agree with probability m_i per
field, non-matches with u_i; lambda is the match prevalence. EM:

  E: p = lambda*prod(m_i^g (1-m_i)^(1-g))
         / (that + (1-lambda)*prod(u_i^g (1-u_i)^(1-g)))
  M: lambda = sum(p)/n;  m_i = sum(p*g_i)/sum(p);
     u_i = (sum(g_i) - sum(p*g_i)) / (n - sum(p))

Spark shape: each EM round is ONE aggregate over the pairs frame —
the per-pair responsibility p is a pure Column expression over the
round's scalar parameters (broadcast in the plan as literals), and
only the model-sized sums return to the driver (the page_rank /
logreg loop discipline). No pair-scale collect anywhere.

Determinism (the skew-entropy DECIMAL discipline): float sums over a
shuffled frame are partition-order-dependent in the last ulp, so each
pair's p is rounded to 12 decimals and summed as DECIMAL(38,18) —
exact, order-invariant, and replayable bit-for-bit by any engine (or
a Python twin using Decimal(repr(p)) half-up quantization, which
reproduces Spark's BigDecimal.valueOf(double) rounding exactly
because both read the shortest decimal representation).

Degeneracy guards: parameters are clamped to [eps, 1-eps] after every
M-step (a field that always/never agrees in one class would push a
log to +-inf and poison every weight); EM runs a FIXED iteration
count by default so distributed runs are reproducible.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,18)"


def _clamp(x: float, eps: float) -> float:
    return min(max(x, eps), 1.0 - eps)


def _resp(gamma_cols: list[str], lam: float, m: list[float], u: list[float]) -> Column:
    """Per-pair match responsibility p as a Column over the current
    scalar parameters — the exact float-op chain the Python twin
    replays (per-field factor product left-to-right, then the ratio)."""
    pm = F.lit(float(lam))
    pu = F.lit(float(1.0 - lam))
    for g, mi, ui in zip(gamma_cols, m, u):
        gi = F.col(g).cast("int")  # boolean gammas compare cleanly too
        pm = pm * F.when(gi == 1, F.lit(float(mi))).otherwise(F.lit(float(1.0 - mi)))
        pu = pu * F.when(gi == 1, F.lit(float(ui))).otherwise(F.lit(float(1.0 - ui)))
    return pm / (pm + pu)


def linkage_em(
    pairs: DataFrame,
    gamma_cols: Sequence[str],
    max_iters: int = 10,
    init_lambda: float = 0.3,
    init_m: float = 0.9,
    init_u: float = 0.1,
    eps: float = 1e-6,
    validate: bool = True,
) -> dict:
    """Fit (lambda, m, u) by EM over binary agreement columns; returns
    {"lambda": float, "m": [..], "u": [..], "n_pairs": int,
    "gamma_cols": [...]} — a model-sized dict, ready for
    linkage_score. ``init_m > init_u`` orients the two latent classes
    (matches = the agreeing class); fixed ``max_iters`` rounds keep
    the fit reproducible across cluster sizes.

    Validation (one aggregate): gamma columns must be 0/1 and
    non-NULL — a NULL agreement is an upstream decision (treat
    missing as disagree, or drop the pair), not something EM can
    average over."""
    gcols = list(gamma_cols)
    if not gcols:
        raise ValueError("linkage_em: need at least one gamma column")
    missing = [c for c in gcols if c not in pairs.columns]
    if missing:
        raise ValueError(f"linkage_em: pairs frame lacks columns {missing}")
    if max_iters < 1:
        raise ValueError(f"linkage_em: max_iters must be >= 1, got {max_iters}")
    if not (0.0 < eps < 0.5):
        raise ValueError(f"linkage_em: eps must be in (0, 0.5), got {eps}")
    for name, v in (("init_lambda", init_lambda), ("init_m", init_m), ("init_u", init_u)):
        if not (0.0 < v < 1.0):
            raise ValueError(f"linkage_em: {name} must be in (0, 1), got {v}")
    if init_m <= init_u:
        raise ValueError(
            "linkage_em: init_m must exceed init_u — equal class profiles "
            "leave EM at a saddle point and the match class unoriented"
        )
    # r11 (guide §2.3/§5, the logreg-fit discipline): every EM round
    # re-aggregates the pair frame — without a persist each round
    # re-executed the caller's whole candidate-generation subtree
    # (scan + blocking join), max_iters times. Project to the gamma
    # columns (all the fit reads) and persist for the fit's duration;
    # the validation aggregate (or round 1) fills the cache.
    pairs = pairs.select(*gcols).persist()
    try:
        if validate:
            any_bad = F.lit(False)
            for c in gcols:
                any_bad = any_bad | F.col(c).isNull() | ~F.col(c).cast("int").isin(0, 1)
            bad = pairs.agg(
                F.max(any_bad).alias("bad"),
                F.count(F.lit(1)).alias("n"),
            ).first()
            if bad["n"] == 0:
                raise ValueError("linkage_em: no candidate pairs to fit on")
            if bad["bad"]:
                raise ValueError(
                    "linkage_em: gamma columns must be non-NULL 0/1 — decide "
                    "missing-field policy upstream (disagree or drop)"
                )
            n_pairs = bad["n"]
        else:
            n_pairs = None

        lam = float(init_lambda)
        m = [float(init_m)] * len(gcols)
        u = [float(init_u)] * len(gcols)
        for _ in range(max_iters):
            p = _resp(gcols, lam, m, u)
            pr = F.round(p, 12).cast(_DEC)
            aggs = [F.sum(pr).alias("S"), F.count(F.lit(1)).alias("n")]
            for i, g in enumerate(gcols):
                aggs.append(
                    F.sum(F.when(F.col(g).cast("int") == 1, pr)).alias(f"Sg{i}")
                )
                aggs.append(F.sum(F.col(g).cast("long")).alias(f"G{i}"))
            row = pairs.agg(*aggs).first()
            S, n = row["S"], row["n"]
            if n == 0:  # validate=False path: still refuse loudly
                raise ValueError("linkage_em: no candidate pairs to fit on")
            if n_pairs is None:
                n_pairs = n
            s = float(S)
            lam = _clamp(s / n, eps)
            new_m, new_u = [], []
            for i in range(len(gcols)):
                sg = float(row[f"Sg{i}"] or 0)
                gi = int(row[f"G{i}"] or 0)
                new_m.append(_clamp(sg / s if s > 0 else 0.0, eps))
                rest = float(n) - s
                new_u.append(_clamp((gi - sg) / rest if rest > 0 else 0.0, eps))
            m, u = new_m, new_u
    finally:
        pairs.unpersist(blocking=False)
    return {"lambda": lam, "m": m, "u": u, "n_pairs": n_pairs, "gamma_cols": gcols}


def linkage_score(
    pairs: DataFrame,
    model: dict,
    weight_col: str = "match_weight",
    prob_col: str = "match_prob",
) -> DataFrame:
    """Append the Fellegi–Sunter match weight and posterior match
    probability under ``model`` (a linkage_em result, or hand-set
    {"lambda", "m", "u", "gamma_cols"}):

        weight = log2(lambda/(1-lambda))
               + sum_i [ g_i*log2(m_i/u_i) + (1-g_i)*log2((1-m_i)/(1-u_i)) ]
        prob   = 2^weight / (1 + 2^weight)   (the sigmoid in base 2)

    Pure Columns, map-only — the 100 TB path is score-then-threshold,
    with review bands chosen on the weight scale (the Fellegi–Sunter
    decision rule)."""
    gcols = list(model["gamma_cols"])
    lam, m, u = float(model["lambda"]), model["m"], model["u"]
    missing = [c for c in gcols if c not in pairs.columns]
    if missing:
        raise ValueError(f"linkage_score: pairs frame lacks columns {missing}")
    if not (0.0 < lam < 1.0):
        raise ValueError(f"linkage_score: lambda must be in (0, 1), got {lam}")
    import math

    w: Column = F.lit(float(math.log2(lam / (1.0 - lam))))
    for g, mi, ui in zip(gcols, m, u):
        if not (0.0 < mi < 1.0 and 0.0 < ui < 1.0):
            raise ValueError(
                "linkage_score: m/u must lie strictly inside (0, 1) — refit "
                "with clamping (linkage_em does) before scoring"
            )
        agree = float(math.log2(mi / ui))
        disagree = float(math.log2((1.0 - mi) / (1.0 - ui)))
        w = w + F.when(F.col(g).cast("int") == 1, F.lit(agree)).otherwise(
            F.lit(disagree)
        )
    out = pairs.withColumn(weight_col, w)
    two_w = F.pow(F.lit(2.0), F.col(weight_col))
    return out.withColumn(prob_col, two_w / (F.lit(1.0) + two_w))
