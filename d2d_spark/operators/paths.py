"""Event-sequence path analytics — the Markov-chain / user-journey
toolkit next to funnels (operators/funnel.py answers "did users
complete THIS ordered chain"; this module answers "which chains do
users actually walk"):

  transition_counts — per-key adjacent (from_state, to_state) counts
                      over the time-ordered event stream, optionally
                      with virtual __START__/__END__ endpoints (entry
                      and exit distributions).
  transition_probs  — row-stochastic normalization: the first-order
                      Markov transition matrix.
  top_paths         — most-walked length-n state sequences (sliding
                      n-grams per key), deterministic top-k.

Spark shape: transition extraction is ONE key-partitioned window
(lag/lead — the scd2_history move) followed by one bounded groupBy;
nothing holds per-key state beyond the window frame. top_paths ends
in orderBy+limit, which Catalyst compiles to TakeOrderedAndProject —
a per-partition top-k plus a k-row driver merge, NO single-partition
shuffle. transition_probs is one partial-agg window over the COUNTS
frame (bounded by the state alphabet squared, not the event count).

Determinism: events are ordered by (ts, *tiebreak_cols) per key; the
validation probe refuses NULL timestamps/states and duplicate
ordering tuples (a tie makes lag/lead partitioning-dependent) — pass
``tiebreak_cols`` (an event id) when timestamps can collide, or
``validate=False`` for pre-validated pipelines. Ties in top_paths
break on the lexicographically smallest path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

START = "__START__"
END = "__END__"


def _probe_events(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_cols: Sequence[str],
    what: str,
    state_sep: str | None = None,
) -> None:
    """ONE aggregate pass (the single-probe discipline): refuses NULL
    key/order/state values and duplicate ordering tuples. NULL keys
    are refused alongside NULL times/states: they would collapse into
    ONE window partition, chaining unrelated events into fabricated
    transitions and paths."""
    order = [ts_col, *tiebreak_cols]
    bad = (
        df.groupBy(key_col, *order)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.max(
                F.col(key_col).isNull()
                | F.col(ts_col).isNull()
                | F.col(state_col).isNull()
            ).alias("__null"),
            F.max(
                F.col(state_col).cast("string").contains(F.lit(state_sep))
                if state_sep is not None
                else F.lit(False)
            ).alias("__sep"),
        )
        .agg(
            F.max("__n").alias("dup"),
            F.max("__null").alias("has_null"),
            F.max("__sep").alias("has_sep"),
        )
        .first()
    )
    if bad["dup"] is None:
        return  # empty input
    if bad["has_null"]:
        raise ValueError(
            f"{what}: NULL {key_col!r}, {ts_col!r} or {state_col!r} values — "
            "an event without a key, a time or a state has no place in a "
            "sequence (NULL keys would collapse into one partition); filter "
            "or impute first"
        )
    if bad["dup"] > 1:
        raise ValueError(
            f"{what}: duplicate (key, {', '.join(order)}) ordering tuples — "
            "ties make lag/lead partitioning-dependent; add tiebreak_cols "
            "(an event id) or deduplicate first"
        )
    if bad["has_sep"]:
        raise ValueError(
            f"{what}: a {state_col!r} value contains the path separator "
            f"{state_sep!r} — distinct sequences would collide into one "
            "path string (['a>b','c'] vs ['a','b>c']); pick a sep absent "
            "from the state alphabet"
        )


def transition_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_cols: Sequence[str] = (),
    include_endpoints: bool = False,
    start_marker: str = START,
    end_marker: str = END,
    validate: bool = True,
    order: int = 1,
    sep: str = ">",
) -> DataFrame:
    """(from_state, to_state, n) — adjacent-transition counts over each
    key's time-ordered stream. With ``include_endpoints``, a virtual
    (start_marker -> first state) row per key and (last state ->
    end_marker) complete the chain, so entry/exit distributions and
    row-stochasticity are exact (every state's outflows sum to its
    occurrences).

    ``order`` > 1 gives the higher-order Markov matrix: from_state is
    the ``sep``-joined context of the last ``order`` states and
    to_state the next single state — P(next | last k), the model that
    distinguishes "view>cart" from "search>cart" journeys where a
    first-order chain cannot. Cost is the SAME one window (order-many
    lags are one shuffle); the output is bounded by alphabet^(order+1).
    Endpoints apply to order 1 only (a virtual start has no k-context;
    refused rather than fabricated). With order > 1 the probe also
    refuses states containing ``sep`` (context strings would
    collide — the top_paths rule)."""
    if order < 1:
        raise ValueError(f"transition_counts: order must be >= 1, got {order}")
    if order > 1 and include_endpoints:
        raise ValueError(
            "transition_counts: include_endpoints only applies to order=1 — "
            "a virtual __START__ has no k-state context to join"
        )
    ties = list(tiebreak_cols)
    if validate:
        _probe_events(
            df, key_col, ts_col, state_col, ties, "transition_counts",
            state_sep=sep if order > 1 else None,
        )
    w = Window.partitionBy(key_col).orderBy(ts_col, *ties)
    if order > 1:
        st = F.col(state_col).cast("string")
        ctx = [F.lag(st, order - 1 - i).over(w) for i in range(order)]
        seq = df.select(
            F.concat_ws(sep, *ctx).alias("__from"),
            F.lead(st).over(w).alias("__to"),
            # a full context needs order-1 predecessors: the oldest
            # lag must be non-NULL
            ctx[0].isNotNull().alias("__full"),
        )
        pairs = seq.filter(F.col("__full") & F.col("__to").isNotNull())
        return (
            pairs.groupBy(
                F.col("__from").alias("from_state"), F.col("__to").alias("to_state")
            )
            .agg(F.count(F.lit(1)).alias("n"))
        )
    seq = df.select(
        F.col(state_col).cast("string").alias("__from"),
        F.lead(F.col(state_col).cast("string")).over(w).alias("__to"),
        F.row_number().over(w).alias("__rn"),
    )
    if include_endpoints:
        # explode, not union: a union would evaluate the window
        # subtree (and its shuffle) twice
        base = F.struct(
            F.col("__from").alias("f"),
            F.coalesce("__to", F.lit(end_marker)).alias("t"),
        )
        first = F.struct(F.lit(start_marker).alias("f"), F.col("__from").alias("t"))
        pairs = seq.select(
            F.explode(
                F.when(F.col("__rn") == 1, F.array(first, base)).otherwise(
                    F.array(base)
                )
            ).alias("__p")
        ).select(F.col("__p.f").alias("__from"), F.col("__p.t").alias("__to"))
    else:
        pairs = seq.filter(F.col("__to").isNotNull())
    return (
        pairs.groupBy(
            F.col("__from").alias("from_state"), F.col("__to").alias("to_state")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def transition_probs(
    counts: DataFrame,
    from_col: str = "from_state",
    to_col: str = "to_state",
    n_col: str = "n",
    out_col: str = "p",
) -> DataFrame:
    """Append the row-stochastic probability: n / sum(n per from
    state) — ONE exact-long division per row (engine-exact, no float
    folds), so the matrix is hash-comparable across engines."""
    missing = [c for c in (from_col, to_col, n_col) if c not in counts.columns]
    if missing:
        raise ValueError(f"transition_probs: input lacks columns {missing}")
    w = Window.partitionBy(from_col)
    return counts.withColumn(
        out_col, F.col(n_col).cast("double") / F.sum(n_col).over(w).cast("double")
    )


def top_paths(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    n_steps: int = 3,
    k: int = 10,
    sep: str = ">",
    tiebreak_cols: Sequence[str] = (),
    validate: bool = True,
) -> DataFrame:
    """(path, n, rnk) — the ``k`` most-walked length-``n_steps`` state
    sequences (every sliding window of ``n_steps`` consecutive events
    per key counts once). Ties rank by the lexicographically smallest
    path; rnk is dense 1..k. The final top-k is orderBy+limit
    (TakeOrderedAndProject), then a rank window over k rows only.

    The validation probe also refuses any state value CONTAINING
    ``sep`` — otherwise distinct sequences collide into one path
    string and the top-k miscounts; with ``validate=False`` the
    caller owns that guarantee too."""
    if n_steps < 2:
        raise ValueError(f"top_paths: n_steps must be >= 2, got {n_steps}")
    if k < 1:
        raise ValueError(f"top_paths: k must be >= 1, got {k}")
    if sep == "":
        raise ValueError("top_paths: sep must be non-empty (paths would be ambiguous)")
    ties = list(tiebreak_cols)
    if validate:
        _probe_events(df, key_col, ts_col, state_col, ties, "top_paths", state_sep=sep)
    w = Window.partitionBy(key_col).orderBy(ts_col, *ties)
    s = F.col(state_col).cast("string")
    steps = [s] + [F.lead(s, i).over(w) for i in range(1, n_steps)]
    grams = df.select(
        F.concat_ws(sep, *steps).alias("path"), steps[-1].isNotNull().alias("__full")
    ).filter("__full")
    counted = grams.groupBy("path").agg(F.count(F.lit(1)).alias("n"))
    topk = counted.orderBy(F.col("n").desc(), "path").limit(k)
    rw = Window.orderBy(F.col("n").desc(), "path")
    return topk.withColumn("rnk", F.row_number().over(rw))


def cooccurrence_pmi(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_count: int = 2,
    max_items_per_group: int = 10_000,
    *,
    assume_distinct: bool = False,
) -> DataFrame:
    """Market-basket co-occurrence with pointwise mutual information:
    which items appear in the SAME group (session, basket, user,
    document) more often than chance — the association-mining
    companion to transition_counts (which only sees ADJACENT events).
    Presence-based (an item counts once per group, the standard basket
    convention; NULL groups/items drop). Returns
    (item_a < item_b, n_ab, n_a, n_b, pmi) for pairs co-occurring in
    at least ``min_count`` groups, with

        pmi = ln( n_ab * N / (n_a * n_b) ),   N = number of groups

    — positive = attract, negative = repel; all counts exact longs,
    the score one multiply/divide chain + ln.

    ``assume_distinct=True`` skips the presence distinct (one whole
    shuffle, guide §2.4 "a distinct on data that is already unique")
    for callers that GUARANTEE (group, item) is already distinct after
    NULL filtering — e.g. a shared basket frame built with
    ``.distinct()`` and reused across operators. On non-distinct input
    the flag silently turns counts into multiplicity-weighted garbage:
    it is a caller-proven contract, not an optimizer hint.

    Shape: one distinct on (group, item), one groupBy collapsing each
    group to its SORTED item array (this aggregate also serves the
    group-bomb probe and the group count — one validation job, not
    two), then ordered pairs generate JVM-SIDE per group as an
    array-comprehension explode — a map-side fan-out AQE can split,
    carrying each pair ONCE instead of shipping both join sides of
    the old within-group self-join (half the pair-stage shuffle) —
    into one bounded groupBy (output is item-vocabulary², not
    row-scale), and broadcast-sized joins for the marginals. Pair
    fan-out is still sum over groups of items²/2, so a group above
    ``max_items_per_group`` refuses loudly — cap or sample whale
    baskets."""
    if min_count < 1:
        raise ValueError(f"cooccurrence_pmi: min_count must be >= 1, got {min_count}")
    if max_items_per_group < 2:
        raise ValueError(
            f"cooccurrence_pmi: max_items_per_group must be >= 2, got {max_items_per_group}"
        )
    from pyspark import StorageLevel

    from d2d_spark import cache as opcache

    # r11 (guide §2.4): base feeds the marginals AND the group lists;
    # lists feeds the bomb/count probe and the pair fan-out. Persist
    # both once per call (group- and presence-bounded frames) so the
    # input scan + distinct shuffle run once — the eager stats probe
    # below fills both caches in one job.
    proj = df.filter(
        F.col(group_col).isNotNull() & F.col(item_col).isNotNull()
    ).select(F.col(group_col).alias("__g"), F.col(item_col).alias("__i"))
    if not assume_distinct:
        proj = proj.distinct()
    base = opcache.register(
        "pmi",
        proj.persist(StorageLevel.MEMORY_AND_DISK),
    )
    lists = opcache.register(
        "pmi",
        base.groupBy("__g")
        .agg(F.sort_array(F.collect_list("__i")).alias("__items"))
        .persist(StorageLevel.MEMORY_AND_DISK),
    )
    stats = lists.agg(
        F.max(F.size("__items")).alias("mx"), F.count(F.lit(1)).alias("ng")
    ).first()
    n_groups = stats["ng"]
    if n_groups == 0:
        return df.sparkSession.createDataFrame(
            [], "item_a string, item_b string, n_ab long, n_a long, n_b long, pmi double"
        )
    if stats["mx"] > max_items_per_group:
        bomb = (
            lists.filter(F.size("__items") > max_items_per_group)
            .select("__g", F.size("__items").alias("__n"))
            .limit(1)
            .collect()
        )
        raise ValueError(
            f"cooccurrence_pmi: group {bomb[0]['__g']!r} holds {bomb[0]['__n']} "
            f"distinct items (> max_items_per_group={max_items_per_group}) — "
            "within-group pair work is quadratic; cap or sample whale groups"
        )
    marg = base.groupBy("__i").agg(F.count(F.lit(1)).alias("__m"))
    # ordered pairs from the sorted array: distinct items sort strictly
    # increasing, so pairing each element with its suffix IS the
    # item_a < item_b set, generated once per pair with no join
    items = F.col("__items")
    pair_arr = F.flatten(
        F.transform(
            items,
            lambda x, i: F.transform(
                F.slice(items, i + F.lit(2), F.size(items)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pairs = (
        lists.select(F.explode(pair_arr).alias("__p"))
        .select(F.col("__p.a").alias("item_a"), F.col("__p.b").alias("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_count)
    )
    out = pairs.join(
        marg.select(F.col("__i").alias("item_a"), F.col("__m").alias("n_a")), "item_a"
    ).join(
        marg.select(F.col("__i").alias("item_b"), F.col("__m").alias("n_b")), "item_b"
    )
    pmi = F.log(
        F.col("n_ab").cast("double")
        * F.lit(float(n_groups))
        / (F.col("n_a").cast("double") * F.col("n_b"))
    )
    return out.select("item_a", "item_b", "n_ab", "n_a", "n_b", pmi.alias("pmi"))


def frequent_itemsets(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_support: int = 2,
    max_size: int = 3,
    max_items_per_group: int = 10_000,
    *,
    assume_distinct: bool = False,
) -> DataFrame:
    """A-priori frequent itemsets up to size 3 (Agrawal & Srikant
    1994) — the support-mining companion to cooccurrence_pmi (PMI
    scores ALL pairs against independence; this finds the sets above
    an absolute support floor, the market-basket / template-detection
    primitive). Presence-based like the PMI operator (an item counts
    once per group; NULLs drop). Returns
    (size, item_a, item_b, item_c, support) with items sorted
    ascending inside each set and NULL padding for sizes 1-2; every
    count is an exact long.

    ``assume_distinct=True`` skips the presence distinct for callers
    that GUARANTEE (group, item) is already distinct after NULL
    filtering AND ``item_col`` is already a string — same contract
    (and same misuse hazard) as cooccurrence_pmi's flag.

    Shape (the downward-closure ladder, each rung a bounded groupBy):
    one distinct + per-group sorted item arrays (bomb probe rides the
    same aggregate), L1 = supported items; arrays are then PRUNED to
    L1 survivors by one explode + semi-join before PAIRS generate
    (JVM-side array comprehension, the cooccurrence_pmi move), and
    pruned again to L2-member items before TRIPLES generate — an item
    outside every frequent pair cannot join a frequent triple, so the
    prune is lossless; the final support filter on exact counts
    decides membership either way. Fan-out is sum over groups of
    (frequent items)^2 / (L2-member items)^3 — the honest a-priori
    cost, refused loudly above ``max_items_per_group``."""
    if min_support < 1:
        raise ValueError(f"frequent_itemsets: min_support must be >= 1, got {min_support}")
    if max_size not in (1, 2, 3):
        raise ValueError(f"frequent_itemsets: max_size must be 1..3, got {max_size}")
    if max_items_per_group < 2:
        raise ValueError(
            f"frequent_itemsets: max_items_per_group must be >= 2, got {max_items_per_group}"
        )
    from pyspark import StorageLevel

    from d2d_spark import cache as opcache

    # r11 (guide §2.4): base feeds the bomb probe, L1, and the
    # L1/L2-pruned semi-joins — persist once per call so the input
    # scan + distinct shuffle run once instead of once per rung.
    proj = df.filter(
        F.col(group_col).isNotNull() & F.col(item_col).isNotNull()
    ).select(
        F.col(group_col).alias("__g"), F.col(item_col).cast("string").alias("__i")
    )
    if not assume_distinct:
        proj = proj.distinct()
    base = opcache.register(
        "itemsets",
        proj.persist(StorageLevel.MEMORY_AND_DISK),
    )
    spark = df.sparkSession
    schema = (
        "size int, item_a string, item_b string, item_c string, support long"
    )
    stats = base.groupBy("__g").agg(F.count(F.lit(1)).alias("__n")).agg(
        F.max("__n").alias("mx"), F.count(F.lit(1)).alias("ng")
    ).first()
    if stats["ng"] == 0 or stats["ng"] is None:
        return spark.createDataFrame([], schema)
    if stats["mx"] > max_items_per_group:
        raise ValueError(
            f"frequent_itemsets: a group holds {stats['mx']} distinct items "
            f"(> max_items_per_group={max_items_per_group}) — a-priori pair/"
            "triple work is polynomial in basket size; cap or sample whales"
        )
    ns = F.lit(None).cast("string")
    l1 = (
        base.groupBy("__i")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )
    out = l1.select(
        F.lit(1).alias("size"),
        F.col("__i").alias("item_a"),
        ns.alias("item_b"),
        ns.alias("item_c"),
        "support",
    )
    if max_size == 1:
        return out
    # prune to L1 survivors, re-collect sorted arrays
    pruned = base.join(l1.select("__i"), "__i", "semi")
    lists = pruned.groupBy("__g").agg(F.sort_array(F.collect_list("__i")).alias("__a"))
    arr = F.col("__a")
    pair_arr = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + F.lit(2), F.size(arr)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    l2 = (
        lists.select(F.explode(pair_arr).alias("__p"))
        .groupBy(F.col("__p.a").alias("item_a"), F.col("__p.b").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )
    out = out.unionByName(
        l2.select(F.lit(2).alias("size"), "item_a", "item_b", ns.alias("item_c"), "support")
    )
    if max_size == 2:
        return out
    # items inside at least one frequent pair can reach a frequent triple
    l2_items = (
        l2.select(F.col("item_a").alias("__i"))
        .unionAll(l2.select(F.col("item_b").alias("__i")))
        .distinct()
    )
    pruned3 = pruned.join(l2_items, "__i", "semi")
    lists3 = pruned3.groupBy("__g").agg(F.sort_array(F.collect_list("__i")).alias("__a"))
    arr3 = F.col("__a")
    triple_arr = F.flatten(
        F.transform(
            arr3,
            lambda x, i: F.flatten(
                F.transform(
                    F.slice(arr3, i + F.lit(2), F.size(arr3)),
                    lambda y, j: F.transform(
                        F.slice(arr3, i + j + F.lit(3), F.size(arr3)),
                        lambda z: F.struct(x.alias("a"), y.alias("b"), z.alias("c")),
                    ),
                )
            ),
        )
    )
    l3 = (
        lists3.select(F.explode(triple_arr).alias("__t"))
        .groupBy(
            F.col("__t.a").alias("item_a"),
            F.col("__t.b").alias("item_b"),
            F.col("__t.c").alias("item_c"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )
    return out.unionByName(
        l3.select(F.lit(3).alias("size"), "item_a", "item_b", "item_c", "support")
    )


def association_rules(
    itemsets: DataFrame,
    n_groups: int,
    min_confidence: float = 0.5,
) -> DataFrame:
    """Association rules from a `frequent_itemsets` result (the
    classic second a-priori stage): for every frequent set, each
    antecedent => consequent split with

        confidence = support(set) / support(antecedent)
        lift       = confidence / (support(consequent) / n_groups)

    (lift > 1: the consequent is MORE likely given the antecedent
    than baseline). Size-2 sets yield {a}=>{b} and {b}=>{a}; size-3
    sets yield the three {x,y}=>{z} and the three {x}=>{y,z} splits.
    Returns (antecedent, consequent, support, confidence, lift) with
    items '|'-joined in sorted order; only rules whose ANTECEDENT and
    CONSEQUENT are both in the frame can price a lift, and a-priori
    closure guarantees they are. ``n_groups`` is the basket count the
    supports were counted over (frequent_itemsets' input `distinct
    groups` — pass it explicitly; deriving it from supports is
    impossible).

    Shape: ONE map-only split explode (a size-2 row emits its 2
    splits, a size-3 row its 6) + TWO support-lookup equi-joins
    against the '|'-keyed itemset frame — a-priori closure guarantees
    every antecedent/consequent key resolves, so the joins are inner
    and lossless. The first cut of this operator unioned 14 separate
    join branches; that plan re-derived the whole itemset ladder per
    branch and its physical plan ran to ~1 MB of operators — the
    explode+lookup shape is the vocabulary-bounded, broadcast-sized
    formulation. Confidence/lift are single exact-long-over-double
    divisions, engine-portable; the input frame is persisted (tag
    'association_rules', release via d2d_spark.cache) because the
    lookup side is consumed twice."""
    if n_groups < 1:
        raise ValueError(f"association_rules: n_groups must be >= 1, got {n_groups}")
    if not (0.0 < min_confidence <= 1.0):
        raise ValueError(
            f"association_rules: min_confidence must be in (0, 1], got {min_confidence}"
        )
    need = {"size", "item_a", "item_b", "item_c", "support"}
    missing = sorted(need - set(itemsets.columns))
    if missing:
        raise ValueError(f"association_rules: input lacks columns {missing}")
    from pyspark import StorageLevel

    from d2d_spark import cache as opcache

    itemsets = opcache.register(
        "association_rules",
        itemsets.persist(StorageLevel.MEMORY_AND_DISK),
    )
    # sep-collision probe (one aggregate, the _probe_events rule): the
    # support lookup keys on '|'-joined sorted items, so an item that
    # itself contains '|' collides across itemset sizes (item 'a|b' vs
    # the pair {a,b}) and silently prices wrong support/confidence/lift.
    # Runs AFTER the persist so its action fills the cache instead of
    # executing the whole mining pipeline a second time.
    sep_hit = itemsets.agg(
        F.max(
            F.coalesce(F.col("item_a").contains("|"), F.lit(False))
            | F.coalesce(F.col("item_b").contains("|"), F.lit(False))
            | F.coalesce(F.col("item_c").contains("|"), F.lit(False))
        ).alias("__sep")
    ).first()
    if sep_hit["__sep"]:
        # error-path cleanup: this FAILED call's persist must not wait
        # for a global release (and releasing the whole tag could drop
        # earlier successful calls' frames)
        opcache.deregister("association_rules", [itemsets])
        raise ValueError(
            "association_rules: an item contains the key separator '|' — "
            "the support lookup joins on '|'-joined itemset strings, so "
            "such items collide across sizes (item 'a|b' vs pair {a,b}); "
            "re-encode items without '|' first"
        )
    # support lookup: '|'-joined sorted items -> support (concat_ws
    # skips the NULL padding, so size-1/2/3 keys all come out right)
    sup = itemsets.select(
        F.concat_ws("|", "item_a", "item_b", "item_c").alias("__k"),
        F.col("support").alias("__sup"),
    )
    a, b, c = F.col("item_a"), F.col("item_b"), F.col("item_c")

    def split(ante: Column, cons: Column) -> Column:
        return F.struct(ante.alias("antecedent"), cons.alias("consequent"))

    two = itemsets.filter(F.col("size") == 2).select(
        F.explode(F.array(split(a, b), split(b, a))).alias("__r"), "support"
    )
    three = itemsets.filter(F.col("size") == 3).select(
        F.explode(
            F.array(
                split(F.concat_ws("|", a, b), c),
                split(F.concat_ws("|", a, c), b),
                split(F.concat_ws("|", b, c), a),
                split(c, F.concat_ws("|", a, b)),
                split(b, F.concat_ws("|", a, c)),
                split(a, F.concat_ws("|", b, c)),
            )
        ).alias("__r"),
        "support",
    )
    raw = two.unionByName(three).select(
        F.col("__r.antecedent").alias("antecedent"),
        F.col("__r.consequent").alias("consequent"),
        "support",
    )
    sa = sup.select(F.col("__k").alias("antecedent"), F.col("__sup").alias("__sa"))
    sc = sup.select(F.col("__k").alias("consequent"), F.col("__sup").alias("__sc"))
    out = (
        raw.join(sa, "antecedent")
        .join(sc, "consequent")
        .select(
            "antecedent",
            "consequent",
            "support",
            (F.col("support").cast("double") / F.col("__sa")).alias("confidence"),
            (
                F.col("support").cast("double")
                * F.lit(float(n_groups))
                / (F.col("__sa") * F.col("__sc").cast("double"))
            ).alias("lift"),
        )
    )
    return out.filter(F.col("confidence") >= F.lit(float(min_confidence)))
