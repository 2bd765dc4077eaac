"""modularity_communities / modularity_score (operators/graph.py):
exact equality with a pure-Python twin of the synchronous local-move
algorithm, classic community structure recovered (ring of cliques,
barbell), the determinism/partitioning contract, weighted edges, and
the LPA-contrast case (bipartite-ish flip-flopping)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _py_local_move(pairs, max_rounds=10, weighted=False):
    """Pure-Python twin of modularity_communities: same symmetric
    collapse, same synchronous argmax-gain move with stay-preferred /
    smallest-id ties, same first-best-Q selection. Float expressions
    mirror the Spark column chain operation-for-operation."""
    w = {}
    nodes = set()
    for p in pairs:
        a, b = p[0], p[1]
        wt = float(p[2]) if weighted else 1.0
        if a is None or b is None or (weighted and wt <= 0):
            continue
        nodes.add(a)
        nodes.add(b)
        if a == b:
            continue
        w[(a, b)] = w.get((a, b), 0.0) + wt
        w[(b, a)] = w.get((b, a), 0.0) + wt
    k = {n: 0.0 for n in nodes}
    adj = {n: {} for n in nodes}
    for (a, b), wt in w.items():
        k[a] += wt
        adj[a][b] = wt
    two_m = sum(k.values())
    labels = {n: n for n in nodes}
    if not nodes or two_m == 0.0:
        return labels

    def q_of(lab):
        tot = {}
        inw = {}
        for n in nodes:
            tot[lab[n]] = tot.get(lab[n], 0.0) + k[n]
        for (a, b), wt in w.items():
            if lab[a] == lab[b]:
                inw[lab[a]] = inw.get(lab[a], 0.0) + wt
        return sum(
            inw.get(c, 0.0) / two_m - (t / two_m) * (t / two_m)
            for c, t in tot.items()
        )

    best, best_q = dict(labels), q_of(labels)
    for _ in range(max_rounds):
        tot = {}
        for n in nodes:
            tot[labels[n]] = tot.get(labels[n], 0.0) + k[n]
        nxt = {}
        for n in nodes:
            own = labels[n]
            kic = {}
            for b, wt in adj[n].items():
                c = labels[b]
                kic[c] = kic.get(c, 0.0) + wt
            kic.setdefault(own, 0.0)
            cands = []
            for c, kc in kic.items():
                t = tot[c] - (k[n] if c == own else 0.0)
                gain = kc - k[n] * t / two_m
                cands.append((-gain, 0 if c == own else 1, c))
            cands.sort()
            nxt[n] = cands[0][2]
        changed = nxt != labels
        labels = nxt
        q = q_of(labels)
        if q > best_q + 1e-12:
            best, best_q = dict(labels), q
        if not changed:
            break
    return best


def _spark_labels(spark, pairs, schema, **kw):
    from d2d_spark.operators.graph import modularity_communities

    df = spark.createDataFrame(pairs, schema)
    return {
        r["node"]: r["community"]
        for r in modularity_communities(df, **kw).collect()
    }


def test_ring_of_cliques_and_twin(spark):
    """Four K4 cliques in a ring joined by single bridges — the
    canonical modularity fixture: each clique is one community."""
    pairs = []
    for c in range(4):
        base = 10 * c
        nodes = [base + i for i in range(4)]
        pairs += [(a, b) for i, a in enumerate(nodes) for b in nodes[i + 1 :]]
    for c in range(4):
        pairs.append((10 * c + 3, 10 * ((c + 1) % 4)))  # bridges
    got = _spark_labels(spark, pairs, "src long, dst long")
    want = _py_local_move(pairs)
    assert got == want
    # each clique collapses to a single community, cliques distinct
    comm = {c: {got[10 * c + i] for i in range(4)} for c in range(4)}
    assert all(len(s) == 1 for s in comm.values())
    assert len({next(iter(s)) for s in comm.values()}) == 4
    # partitioning invariance (the determinism contract)
    got7 = _spark_labels(
        spark, pairs, "src long, dst long"
    )
    df7 = spark.createDataFrame(pairs, "src long, dst long").repartition(7)
    from d2d_spark.operators.graph import modularity_communities

    got7 = {
        r["node"]: r["community"] for r in modularity_communities(df7).collect()
    }
    assert got7 == got


def test_barbell_beats_singletons_and_matches_twin(spark):
    from d2d_spark.operators.graph import modularity_communities, modularity_score

    k5a = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    k5b = [(10 + i, 10 + j) for i in range(5) for j in range(i + 1, 5)]
    pairs = k5a + k5b + [(4, 10)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    labels = modularity_communities(df)
    got = {r["node"]: r["community"] for r in labels.collect()}
    assert got == _py_local_move(pairs)
    assert len({got[i] for i in range(5)}) == 1
    assert len({got[10 + i] for i in range(5)}) == 1
    assert got[0] != got[10]
    q = modularity_score(df, labels)
    singletons = df.select(F.col("src").alias("node")).union(
        df.select("dst")
    ).distinct().select("node", F.col("node").alias("community"))
    assert q > modularity_score(df, singletons) + 0.2
    # the known analytic value: two communities, in=2*10+... Q = 2*(21/41*... just pin > 0.4
    assert q > 0.4


def test_bipartite_star_stability_vs_lpa_shape(spark):
    """The LPA-contrast case: a complete bipartite K3,3 plus pendant
    tails — synchronous LPA is flip-prone here; the modularity pass
    must converge to SOME stable labeling identical to the twin's."""
    left = [0, 1, 2]
    right = [10, 11, 12]
    pairs = [(a, b) for a in left for b in right]
    pairs += [(0, 100), (10, 200)]
    got = _spark_labels(spark, pairs, "src long, dst long")
    want = _py_local_move(pairs)
    assert got == want


def test_weighted_edges_and_duplicates(spark):
    """Duplicate edges sum their weights, the weighted labeling
    matches its twin exactly (including the documented synchronous
    two-node swap on a symmetric heavy bridge — the oscillation case
    the best-Q selection bounds), and weights genuinely change the
    answer vs the unweighted graph."""
    from d2d_spark.operators.graph import modularity_communities, modularity_score

    k4a = [(i, j, 1.0) for i in range(4) for j in range(i + 1, 4)]
    k4b = [(5 + i, 5 + j, 1.0) for i in range(4) for j in range(i + 1, 4)]
    bridge = [(3, 5, 10.0), (3, 5, 10.0)]  # dup -> w=20
    pairs = k4a + k4b + bridge
    got_w = _spark_labels(
        spark, pairs, "src long, dst long, w double", weight_col="w"
    )
    assert got_w == _py_local_move(pairs, weighted=True)
    unweighted = [(a, b) for a, b, _ in pairs]
    got_u = _spark_labels(spark, unweighted, "src long, dst long")
    assert got_u == _py_local_move(unweighted)
    # unweighted: the cliques hold together against the unit bridge
    assert len({got_u[i] for i in range(4)}) == 1
    assert len({got_u[5 + i] for i in range(4)}) == 1
    assert got_u[0] != got_u[5]
    # the heavy bridge changes the labeling (2/5 get pulled by the
    # 20x edge), and the returned labeling is never worse than the
    # singleton start (the best-Q floor)
    assert got_w != got_u
    df = spark.createDataFrame(pairs, "src long, dst long, w double")
    labs = modularity_communities(df, weight_col="w")
    singles = df.select(F.col("src").alias("node")).union(
        df.select("dst")
    ).distinct().select("node", F.col("node").alias("community"))
    assert modularity_score(df, labs, weight_col="w") >= modularity_score(
        df, singles, weight_col="w"
    )


def test_modularity_edge_cases(spark):
    from d2d_spark.operators.graph import modularity_communities, modularity_score

    empty = spark.createDataFrame([], "src long, dst long")
    assert modularity_communities(empty).count() == 0
    # self-loop-only nodes: singleton communities, Q = 0 convention
    loops = spark.createDataFrame([(3, 3), (4, 4)], "src long, dst long")
    got = {
        r["node"]: r["community"] for r in modularity_communities(loops).collect()
    }
    assert got == {3: 3, 4: 4}
    assert modularity_score(loops, modularity_communities(loops)) == 0.0
    with pytest.raises(ValueError, match="max_rounds"):
        modularity_communities(loops, max_rounds=0)
