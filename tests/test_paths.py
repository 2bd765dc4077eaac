"""Event-path analytics (operators/paths.py): transition counts vs a
plain-Python replay, endpoint rows, row-stochastic normalization,
sliding n-gram top-k with deterministic ties, validation probes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from d2d_spark.operators.paths import (
    END,
    START,
    top_paths,
    transition_counts,
    transition_probs,
)

ROWS = [
    # (user, ts, state)
    ("u1", 1, "view"), ("u1", 2, "view"), ("u1", 3, "cart"), ("u1", 4, "buy"),
    ("u2", 1, "view"), ("u2", 5, "cart"), ("u2", 6, "view"),
    ("u3", 2, "buy"),
]


def _df(spark, rows=ROWS):
    return spark.createDataFrame(rows, "u string, t int, s string")


def _py_transitions(rows, endpoints=False):
    from collections import Counter, defaultdict

    per = defaultdict(list)
    for u, t, s in rows:
        per[u].append((t, s))
    c = Counter()
    for u, evs in per.items():
        evs.sort()
        states = [s for _, s in evs]
        if endpoints:
            states = [START, *states, END]
        for a, b in zip(states, states[1:]):
            c[(a, b)] += 1
    return dict(c)


def test_transition_counts_matches_python(spark):
    df = _df(spark)
    for endpoints in (False, True):
        got = {
            (r["from_state"], r["to_state"]): r["n"]
            for r in transition_counts(
                df, "u", "t", "s", include_endpoints=endpoints
            ).collect()
        }
        assert got == _py_transitions(ROWS, endpoints)
    # single-event keys contribute only endpoint rows (u3's lone
    # 'buy' adds a START edge; u1 ALSO ends in buy, hence buy->END 2)
    got = _py_transitions(ROWS, True)
    assert got[(START, "buy")] == 1 and got[("buy", END)] == 2


def test_transition_counts_partitioning_invariant(spark):
    df = _df(spark)
    a = sorted(map(tuple, transition_counts(df.repartition(1), "u", "t", "s").collect()))
    b = sorted(map(tuple, transition_counts(df.repartition(7), "u", "t", "s").collect()))
    assert a == b


def test_transition_probs_row_stochastic(spark):
    counts = transition_counts(_df(spark), "u", "t", "s", include_endpoints=True)
    probs = transition_probs(counts)
    rows = probs.collect()
    # outflows per from_state sum to exactly 1 (exact-long divisions)
    from collections import defaultdict

    sums = defaultdict(float)
    for r in rows:
        sums[r["from_state"]] += r["p"]
    for s, tot in sums.items():
        assert tot == pytest.approx(1.0, abs=1e-12), s
    by = {(r["from_state"], r["to_state"]): r["p"] for r in rows}
    # view -> {view:1, cart:2, END:1}: p(view->cart) = 2/4
    assert by[("view", "cart")] == 2.0 / 4.0
    with pytest.raises(ValueError, match="lacks columns"):
        transition_probs(counts.drop("n"))


def test_top_paths_counts_and_ties(spark):
    df = _df(spark)
    got = top_paths(df, "u", "t", "s", n_steps=2, k=3).collect()
    # bigram counts: view>view 1, view>cart 2, cart>buy 1, cart>view 1
    assert [(r["path"], r["n"], r["rnk"]) for r in got] == [
        ("view>cart", 2, 1),
        ("cart>buy", 1, 2),  # ties at n=1 rank lexicographically
        ("cart>view", 1, 3),
    ]
    tri = top_paths(df, "u", "t", "s", n_steps=3, k=10).collect()
    assert {(r["path"], r["n"]) for r in tri} == {
        ("view>view>cart", 1), ("view>cart>buy", 1), ("view>cart>view", 1),
    }
    # n_steps longer than any key's stream -> empty, not an error
    assert top_paths(df, "u", "t", "s", n_steps=5, k=10).count() == 0


def test_validation_probes(spark):
    df = _df(spark)
    dup = _df(spark, ROWS + [("u1", 1, "cart")])
    with pytest.raises(ValueError, match="duplicate"):
        transition_counts(dup, "u", "t", "s")
    # a tiebreak column resolves the collision
    df2 = spark.createDataFrame(
        [("u1", 1, 0, "a"), ("u1", 1, 1, "b")], "u string, t int, e int, s string"
    )
    got = transition_counts(df2, "u", "t", "s", tiebreak_cols=["e"]).collect()
    assert [(r["from_state"], r["to_state"], r["n"]) for r in got] == [("a", "b", 1)]
    nul = _df(spark, ROWS + [("u9", None, "x")])
    with pytest.raises(ValueError, match="NULL"):
        transition_counts(nul, "u", "t", "s")
    with pytest.raises(ValueError, match="NULL"):
        top_paths(_df(spark, ROWS + [("u9", 9, None)]), "u", "t", "s")
    # validate=False skips the probe (caller's contract)
    transition_counts(dup, "u", "t", "s", validate=False).collect()
    with pytest.raises(ValueError, match="n_steps"):
        top_paths(df, "u", "t", "s", n_steps=1)
    with pytest.raises(ValueError, match="k must"):
        top_paths(df, "u", "t", "s", k=0)
    with pytest.raises(ValueError, match="sep"):
        top_paths(df, "u", "t", "s", sep="")
    assert transition_counts(df.limit(0), "u", "t", "s").count() == 0
    # NULL keys are refused too: they'd collapse into one window
    # partition and chain unrelated events into fabricated paths
    with pytest.raises(ValueError, match="NULL"):
        transition_counts(_df(spark, ROWS + [(None, 9, "x")]), "u", "t", "s")
    # a state CONTAINING the separator would make distinct sequences
    # collide into one path string — probed, loud
    sep_df = _df(spark, ROWS + [("u9", 1, "a>b"), ("u9", 2, "c")])
    with pytest.raises(ValueError, match="separator"):
        top_paths(sep_df, "u", "t", "s")
    # a different sep sails through on the same frame
    assert top_paths(sep_df, "u", "t", "s", n_steps=2, sep="|").count() > 0


def test_fixture_events_conservation(spark, sf_dir):
    """On the real events table: with endpoints, each state's outflow
    count equals its occurrence count (chain conservation)."""
    from d2d_spark.session import read_table

    ev = read_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    tc = transition_counts(
        ev, "user_id", "ts", "event_type",
        tiebreak_cols=["event_id"], include_endpoints=True,
    )
    outflow = {
        r["from_state"]: r["tot"]
        for r in tc.groupBy("from_state").agg(F.sum("n").alias("tot")).collect()
        if r["from_state"] != START
    }
    occur = {
        r["event_type"]: r["c"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert outflow == occur


def test_stream_transition_sink_equals_batch(spark, tmp_path):
    """Stream-maintained transition counts EXACTLY equal the batch
    operator over everything seen, at EVERY drop prefix — including
    the cross-batch stitch through the per-key carry; late (out of
    per-key order) data is refused loudly."""
    import pytest as pt
    from pyspark.sql import types as T

    from d2d_spark.streaming.filestream import (
        file_stream,
        latest_transition_state,
        stream_transition_sink,
    )

    src = tmp_path / "src"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType(
        [
            T.StructField("u", T.StringType()),
            T.StructField("t", T.IntegerType()),
            T.StructField("s", T.StringType()),
        ]
    )
    drops = [
        ("d1", [("u1", 1, "view"), ("u1", 2, "cart"), ("u2", 1, "view")]),
        # u1 continues across the batch boundary (cart -> view), u3 new
        ("d2", [("u1", 5, "view"), ("u3", 1, "buy"), ("u2", 4, "cart")]),
        ("d3", [("u1", 6, "buy"), ("u2", 9, "view"), ("u3", 2, "buy")]),
    ]
    seen = []
    for name, rows in drops:
        spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
            str(src / name)
        )
        seen.extend(rows)
        stream = file_stream(spark, str(src) + "/*", schema)
        stream_transition_sink(stream, "u", "t", "s", state, ckpt)
        counts, carry = latest_transition_state(spark, state)
        got = {(r["from_state"], r["to_state"]): r["n"] for r in counts.collect()}
        want = {
            (r["from_state"], r["to_state"]): r["n"]
            for r in transition_counts(
                spark.createDataFrame(seen, schema), "u", "t", "s"
            ).collect()
        }
        assert got == want, name
        carried = {r["key"]: (r["last_ts"], r["last_state"]) for r in carry.collect()}
        last = {}
        for u, t, s in sorted(seen, key=lambda r: (r[0], r[1])):
            last[u] = (t, s)
        assert carried == last, name
    # composes with transition_probs
    probs = transition_probs(counts)
    assert {r["p"] for r in probs.collect()} <= {x / 10 for x in range(11)} | {
        1 / 3, 2 / 3, 0.5, 1.0
    }
    # late data (at or before the carry) is refused
    spark.createDataFrame([("u1", 6, "view")], schema).write.mode(
        "overwrite"
    ).parquet(str(src / "d4"))
    stream = file_stream(spark, str(src) + "/*", schema)
    with pt.raises(Exception, match="per-key time order"):
        stream_transition_sink(stream, "u", "t", "s", state, ckpt)
    # fresh checkpoint over surviving state is refused
    stream = file_stream(spark, str(src) + "/*", schema)
    with pt.raises(ValueError, match="fresh"):
        stream_transition_sink(
            stream, "u", "t", "s", state, str(tmp_path / "ckpt2")
        )


def test_cooccurrence_pmi_matches_python(spark):
    import math

    from d2d_spark.operators.paths import cooccurrence_pmi

    rows = [
        # milk+bread together in 3 of 5 baskets; beer alone twice
        (1, "milk"), (1, "bread"),
        (2, "milk"), (2, "bread"), (2, "eggs"),
        (3, "milk"), (3, "bread"), (3, "milk"),   # dup item counts once
        (4, "beer"),
        (5, "beer"), (5, "eggs"),
        (6, None), (None, "ghost"),               # NULLs drop
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {
        (r["item_a"], r["item_b"]): (r["n_ab"], r["n_a"], r["n_b"], r["pmi"])
        for r in cooccurrence_pmi(df, "basket", "item", min_count=2).collect()
    }
    # only milk+bread clears min_count=2: n_ab=3, n_milk=3, n_bread=3, N=5
    assert set(got) == {("bread", "milk")}
    n_ab, n_a, n_b, pmi = got[("bread", "milk")]
    assert (n_ab, n_a, n_b) == (3, 3, 3)
    assert pmi == pytest.approx(math.log(3 * 5.0 / (3 * 3)), abs=1e-12)
    # min_count=1 surfaces the rest with exact marginals
    all_pairs = {
        (r["item_a"], r["item_b"]): r["n_ab"]
        for r in cooccurrence_pmi(df, "basket", "item", min_count=1).collect()
    }
    assert all_pairs == {
        ("bread", "milk"): 3, ("bread", "eggs"): 1, ("eggs", "milk"): 1,
        ("beer", "eggs"): 1,
    }
    # negative PMI for the repelled pair (beer co-occurs below chance)
    be = [r for r in cooccurrence_pmi(df, "basket", "item", min_count=1).collect()
          if (r["item_a"], r["item_b"]) == ("beer", "eggs")][0]
    assert be["pmi"] == pytest.approx(math.log(1 * 5.0 / (2 * 2)), abs=1e-12)
    # guards: whale basket, bad params, empty input
    import pytest as pt

    whale = spark.createDataFrame(
        [(1, f"i{j}") for j in range(30)], "basket long, item string"
    )
    with pt.raises(ValueError, match="max_items_per_group"):
        cooccurrence_pmi(whale, "basket", "item", max_items_per_group=10)
    with pt.raises(ValueError, match="min_count"):
        cooccurrence_pmi(df, "basket", "item", min_count=0)
    empty = spark.createDataFrame([], "basket long, item string")
    assert cooccurrence_pmi(empty, "basket", "item").count() == 0
    # partitioning invariance
    outs = [
        sorted(map(tuple, cooccurrence_pmi(
            df.repartition(n), "basket", "item", min_count=1
        ).collect()))
        for n in (1, 7)
    ]
    assert outs[0] == outs[1]


# ---------- frequent itemsets (a-priori) ----------


def _py_itemsets(baskets, min_support, max_size=3):
    from itertools import combinations

    sets = [sorted(set(b)) for b in baskets]
    out = {}
    for size in range(1, max_size + 1):
        counts = {}
        for b in sets:
            for c in combinations(b, size):
                counts[c] = counts.get(c, 0) + 1
        for c, n in counts.items():
            if n >= min_support:
                out[c] = n
    return out


def test_frequent_itemsets_matches_python(spark):
    from d2d_spark.operators.paths import frequent_itemsets

    baskets = [
        ["milk", "bread", "butter"],
        ["milk", "bread"],
        ["milk", "beer"],
        ["bread", "butter", "beer"],
        ["milk", "bread", "butter", "beer"],
        ["milk"],
        ["jam"],
    ]
    rows = [(g, i) for g, b in enumerate(baskets) for i in b]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {}
    for r in frequent_itemsets(df, "basket", "item", min_support=2).collect():
        items = tuple(x for x in (r["item_a"], r["item_b"], r["item_c"]) if x is not None)
        assert len(items) == r["size"] and list(items) == sorted(items)
        got[items] = r["support"]
    assert got == _py_itemsets(baskets, 2)
    # presence-based: duplicate items in a basket count once
    dup = spark.createDataFrame(rows + [(0, "milk")], "basket long, item string")
    got2 = {
        tuple(x for x in (r["item_a"], r["item_b"], r["item_c"]) if x): r["support"]
        for r in frequent_itemsets(dup, "basket", "item", min_support=2).collect()
    }
    assert got2 == got


def test_frequent_itemsets_sizes_and_guards(spark):
    from d2d_spark.operators.paths import frequent_itemsets

    rows = [(g, i) for g, b in enumerate([["a", "b", "c"], ["a", "b", "c"], ["a"]]) for i in b]
    df = spark.createDataFrame(rows, "basket long, item string")
    only1 = frequent_itemsets(df, "basket", "item", min_support=2, max_size=1)
    assert {r["size"] for r in only1.collect()} == {1}
    upto2 = frequent_itemsets(df, "basket", "item", min_support=2, max_size=2)
    assert {r["size"] for r in upto2.collect()} == {1, 2}
    full = {
        (r["item_a"], r["item_b"], r["item_c"]): r["support"]
        for r in frequent_itemsets(df, "basket", "item", min_support=2).collect()
        if r["size"] == 3
    }
    assert full == {("a", "b", "c"): 2}
    with pytest.raises(ValueError, match="min_support"):
        frequent_itemsets(df, "basket", "item", min_support=0)
    with pytest.raises(ValueError, match="max_size"):
        frequent_itemsets(df, "basket", "item", max_size=4)
    whale = spark.createDataFrame(
        [(1, f"i{j}") for j in range(40)], "basket long, item string"
    )
    with pytest.raises(ValueError, match="distinct items"):
        frequent_itemsets(whale, "basket", "item", max_items_per_group=30)
    empty = spark.createDataFrame([], "basket long, item string")
    assert frequent_itemsets(empty, "basket", "item").count() == 0


def _py_rules(baskets, min_support, min_conf):
    from itertools import combinations

    sets = [sorted(set(b)) for b in baskets]
    n = len(sets)
    supp = {}
    for size in (1, 2, 3):
        for b in sets:
            for c in combinations(b, size):
                supp[c] = supp.get(c, 0) + 1
    supp = {c: s for c, s in supp.items() if s >= min_support}
    rules = {}
    for c, s in supp.items():
        if len(c) == 1:
            continue
        items = set(c)
        for r in range(1, len(c)):
            for ante in combinations(sorted(items), r):
                cons = tuple(sorted(items - set(ante)))
                if ante not in supp or cons not in supp:
                    continue
                conf = s / supp[ante]
                if conf >= min_conf:
                    lift = s * float(n) / (supp[ante] * float(supp[cons]))
                    rules[("|".join(ante), "|".join(cons))] = (s, conf, lift)
    return rules


def test_association_rules_match_python(spark):
    from d2d_spark.operators.paths import association_rules, frequent_itemsets

    baskets = [
        ["milk", "bread", "butter"],
        ["milk", "bread"],
        ["milk", "beer"],
        ["bread", "butter", "beer"],
        ["milk", "bread", "butter", "beer"],
        ["milk"],
        ["bread", "butter"],
    ]
    rows = [(g, i) for g, b in enumerate(baskets) for i in b]
    df = spark.createDataFrame(rows, "basket long, item string")
    fi = frequent_itemsets(df, "basket", "item", min_support=2)
    got = {
        (r["antecedent"], r["consequent"]): (r["support"], r["confidence"], r["lift"])
        for r in association_rules(fi, n_groups=len(baskets), min_confidence=0.4).collect()
    }
    want = _py_rules(baskets, 2, 0.4)
    assert got.keys() == want.keys()
    for k in got:
        assert got[k][0] == want[k][0]
        assert got[k][1] == want[k][1]  # exact long divisions
        assert abs(got[k][2] - want[k][2]) < 1e-12
    # a high-confidence sanity rule: butter -> bread in every basket
    assert got[("butter", "bread")][1] == 1.0
    # guards
    import pytest as pt

    with pt.raises(ValueError, match="n_groups"):
        association_rules(fi, 0)
    with pt.raises(ValueError, match="min_confidence"):
        association_rules(fi, 7, min_confidence=0.0)
    with pt.raises(ValueError, match="lacks columns"):
        association_rules(fi.drop("item_c"), 7)
    # sep-collision guard (r10): an item containing '|' would collide
    # with a pair key in the '|'-joined support lookup — refused loudly
    bad = spark.createDataFrame(
        [(g, i) for g, b in enumerate([["a|b", "c"], ["a|b"]]) for i in b],
        "basket long, item string",
    )
    with pt.raises(ValueError, match="separator"):
        association_rules(frequent_itemsets(bad, "basket", "item", 1), 2)


def test_higher_order_transitions(spark):
    """order=2 Markov: contexts are joined state pairs, counts match a
    Python replay, row-stochasticity holds per context, and the
    endpoint/sep guards fire."""
    rows = [
        ("u1", 1, "a"), ("u1", 2, "b"), ("u1", 3, "c"), ("u1", 4, "b"), ("u1", 5, "c"),
        ("u2", 1, "a"), ("u2", 2, "b"), ("u2", 3, "b"),
    ]
    df = _df(spark, rows)
    got = {
        (r["from_state"], r["to_state"]): r["n"]
        for r in transition_counts(df, "u", "t", "s", order=2).collect()
    }
    from collections import Counter, defaultdict

    per = defaultdict(list)
    for u, t, s in rows:
        per[u].append((t, s))
    want = Counter()
    for u, evs in per.items():
        st = [s for _, s in sorted(evs)]
        for i in range(len(st) - 2):
            want[(f"{st[i]}>{st[i+1]}", st[i + 2])] += 1
    assert got == dict(want)
    assert got[("a>b", "c")] == 1 and got[("a>b", "b")] == 1  # u1 vs u2 diverge
    # row-stochastic per CONTEXT after transition_probs
    probs = transition_probs(transition_counts(df, "u", "t", "s", order=2))
    sums = defaultdict(float)
    for r in probs.collect():
        sums[r["from_state"]] += r["p"]
    assert all(abs(v - 1.0) < 1e-12 for v in sums.values())
    # guards
    with pytest.raises(ValueError, match="order"):
        transition_counts(df, "u", "t", "s", order=0)
    with pytest.raises(ValueError, match="include_endpoints"):
        transition_counts(df, "u", "t", "s", order=2, include_endpoints=True)
    with pytest.raises(ValueError, match="separator"):
        transition_counts(_df(spark, rows + [("u9", 1, "x>y"), ("u9", 2, "z"), ("u9", 3, "w")]),
                          "u", "t", "s", order=2)
    # order=1 path unchanged (the oracled legs ride it)
    base = transition_counts(df, "u", "t", "s")
    assert base.count() > 0


def test_assume_distinct_equals_default_on_distinct_input(spark):
    """The assume_distinct contract: on a frame that is already
    distinct (after NULL filtering, string item), skipping the
    presence distinct must be result-invariant for both basket
    operators — it removes one shuffle, nothing else."""
    from d2d_spark.operators.paths import cooccurrence_pmi, frequent_itemsets

    rows = [
        (1, "milk"), (1, "bread"),
        (2, "milk"), (2, "bread"), (2, "eggs"),
        (3, "milk"), (3, "bread"), (3, "milk"),  # dup -> distinct collapses
        (4, "beer"),
        (5, "beer"), (5, "eggs"),
        (6, None), (None, "ghost"),
    ]
    raw = spark.createDataFrame(rows, "basket long, item string")
    pre = raw.filter("basket IS NOT NULL AND item IS NOT NULL").distinct()

    want_pmi = sorted(
        map(tuple, cooccurrence_pmi(raw, "basket", "item", min_count=1).collect())
    )
    got_pmi = sorted(
        map(
            tuple,
            cooccurrence_pmi(
                pre, "basket", "item", min_count=1, assume_distinct=True
            ).collect(),
        )
    )
    assert got_pmi == want_pmi and len(got_pmi) > 0

    want_fi = sorted(
        map(tuple, frequent_itemsets(raw, "basket", "item", min_support=2).collect())
    )
    got_fi = sorted(
        map(
            tuple,
            frequent_itemsets(
                pre, "basket", "item", min_support=2, assume_distinct=True
            ).collect(),
        )
    )
    assert got_fi == want_fi and len(got_fi) > 0
