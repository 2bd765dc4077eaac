"""Link-graph ops (operators/graph.py): PageRank vs driver-side power
iteration, stochasticity, dangling handling, degree stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from d2d_spark.operators.graph import degree_stats, page_rank


def _reference_pagerank(edges, damping=0.85, iters=30):
    """Pure-Python power iteration with uniform dangling spread —
    independent of any Spark code path."""
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    uniq = sorted(set(edges))
    out = {v: 0 for v in nodes}
    for a, _ in uniq:
        out[a] += 1
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dangling = sum(rank[v] for v in nodes if out[v] == 0)
        inflow = {v: 0.0 for v in nodes}
        for a, b in uniq:
            inflow[b] += rank[a] / out[a]
        rank = {
            v: (1 - damping) / n + damping * (inflow[v] + dangling / n)
            for v in nodes
        }
    return rank


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"), ("d", "a"), ("e", "d"),
    # f is dangling (no out-links), linked from a hub
    ("c", "f"), ("a", "f"),
    # duplicate edge must count once
    ("a", "b"),
]


def test_page_rank_matches_power_iteration(spark):
    got = {
        r.node: r.rank
        for r in page_rank(
            spark.createDataFrame(EDGES, "src string, dst string"),
            max_iters=30,
            tol=None,
        ).collect()
    }
    want = _reference_pagerank(EDGES, iters=30)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # the hub 'c' (3 in-links incl. from hubs) outranks the leaf 'e'
    assert got["c"] > got["e"]


def test_page_rank_tol_early_stop_close_to_converged(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r.node: r.rank for r in page_rank(df, max_iters=100, tol=1e-9).collect()}
    want = _reference_pagerank(EDGES, iters=300)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-7), v


def test_page_rank_validation_empty_and_release(spark):
    from d2d_spark import cache as opcache

    df = spark.createDataFrame(EDGES, "src string, dst string")
    with pytest.raises(ValueError, match="damping"):
        page_rank(df, damping=1.0)
    with pytest.raises(ValueError, match="max_iters"):
        page_rank(df, max_iters=0)
    empty = spark.createDataFrame([], "src string, dst string")
    assert page_rank(empty).count() == 0
    page_rank(df, max_iters=2, tol=None).count()
    assert "page_rank" in opcache.tags()
    assert opcache.release("page_rank") >= 1


def test_degree_stats(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r.node: (r.out_degree, r.in_degree) for r in degree_stats(df).collect()}
    # duplicate a->b counts twice here: degree_stats reports raw edges
    assert got["a"] == (4, 2)
    assert got["f"] == (0, 2)
    assert got["e"] == (1, 0)


def test_page_rank_composes_with_wat_links(spark, tmp_path):
    """The crawl story end-to-end: WAT metadata -> link edges ->
    PageRank scores."""
    import json

    from d2d_spark.sources.warc import read_wat, wat_links

    def rec(uri, links):
        env = {
            "Envelope": {
                "Payload-Metadata": {
                    "HTTP-Response-Metadata": {
                        "HTML-Metadata": {
                            "Links": [{"path": "A@/href", "url": u} for u in links]
                        }
                    }
                }
            }
        }
        payload = json.dumps(env).encode()
        head = (
            f"WARC/1.0\r\nWARC-Type: metadata\r\nWARC-Record-ID: <urn:uuid:x>\r\n"
            f"WARC-Date: 2024-01-01T00:00:00Z\r\nWARC-Target-URI: {uri}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode()
        return head + payload + b"\r\n\r\n"

    data = rec("http://a.com/", ["http://b.com/", "http://c.com/"]) + rec(
        "http://b.com/", ["http://c.com/"]
    )
    (tmp_path / "links.warc.wat").write_bytes(data)
    wat = read_wat(spark, str(tmp_path / "links.warc.wat"))
    ranks = page_rank(wat_links(wat), src="src", dst="url", max_iters=20)
    got = {r.node: r.rank for r in ranks.collect()}
    assert got["http://c.com/"] == max(got.values())


def test_personalized_page_rank_teleports_to_seeds(spark):
    """PPR with seed {a}: teleport and dangling mass land on the seed
    only — exact match to an independent power iteration, and ranks
    concentrate near the seed."""
    def ref_ppr(edges, seeds, damping=0.85, iters=40):
        nodes = sorted({a for a, _ in edges} | {b for _, b in edges} | set(seeds))
        uniq = sorted(set(edges))
        out = {v: 0 for v in nodes}
        for a, _ in uniq:
            out[a] += 1
        v = {x: (1.0 / len(seeds) if x in seeds else 0.0) for x in nodes}
        rank = dict(v)
        for _ in range(iters):
            dangling = sum(rank[x] for x in nodes if out[x] == 0)
            inflow = {x: 0.0 for x in nodes}
            for a, b in uniq:
                inflow[b] += rank[a] / out[a]
            rank = {
                x: (1 - damping) * v[x] + damping * (inflow[x] + dangling * v[x])
                for x in nodes
            }
        return rank

    df = spark.createDataFrame(EDGES, "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {
        r.node: r.rank
        for r in page_rank(df, seeds=seeds, max_iters=40, tol=None).collect()
    }
    want = ref_ppr(EDGES, {"a"})
    assert set(got) == set(want)
    for x in want:
        assert got[x] == pytest.approx(want[x], abs=1e-9), x
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # proximity: the seed's direct targets outrank the far leaf 'e'
    assert got["b"] > got["e"] and got["f"] > got["e"]
    # a seed OUTSIDE the graph still receives teleport mass
    seeds2 = spark.createDataFrame([("zzz",)], "node string")
    got2 = {
        r.node: r.rank
        for r in page_rank(df, seeds=seeds2, max_iters=5, tol=None).collect()
    }
    assert got2["zzz"] > 0
    import pytest as pt

    with pt.raises(ValueError, match="seeds"):
        page_rank(df, seeds=spark.createDataFrame([], "node string"))


def test_weighted_page_rank(spark):
    """weight=1 equals the classic result exactly; a weighted graph
    matches an independent weighted power iteration, and shifting
    weight toward a target raises its rank."""
    wedges = [
        ("a", "b", 3.0), ("a", "c", 1.0), ("b", "c", 1.0),
        ("c", "a", 2.0), ("d", "a", 1.0),
        ("a", "b", 1.0),  # duplicate edge: weights sum (-> 4.0)
    ]

    def ref_weighted(edges, damping=0.85, iters=30):
        from collections import defaultdict

        w = defaultdict(float)
        for a, b, x in edges:
            w[(a, b)] += x
        nodes = sorted({a for a, _ in w} | {b for _, b in w})
        out = defaultdict(float)
        for (a, _), x in w.items():
            out[a] += x
        n = len(nodes)
        rank = {v: 1.0 / n for v in nodes}
        for _ in range(iters):
            dang = sum(rank[v] for v in nodes if out[v] == 0)
            inflow = defaultdict(float)
            for (a, b), x in w.items():
                inflow[b] += rank[a] * x / out[a]
            rank = {
                v: (1 - damping) / n + damping * (inflow[v] + dang / n)
                for v in nodes
            }
        return rank

    df = spark.createDataFrame(wedges, "src string, dst string, w double")
    got = {
        r.node: r.rank
        for r in page_rank(df, weight_col="w", max_iters=30, tol=None).collect()
    }
    want = ref_weighted(wedges)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v
    # all-ones weights reproduce the unweighted result exactly (on a
    # duplicate-free edge list: the unweighted path collapses dups to
    # one vote, the weighted path deliberately sums them)
    uniq_edges = sorted(set(EDGES))
    ones = spark.createDataFrame(
        [(a, b, 1.0) for a, b in uniq_edges], "src string, dst string, w double"
    )
    un = {r.node: r.rank for r in page_rank(
        spark.createDataFrame(uniq_edges, "src string, dst string"), max_iters=10, tol=None
    ).collect()}
    wt = {r.node: r.rank for r in page_rank(
        ones, weight_col="w", max_iters=10, tol=None
    ).collect()}
    for v in un:
        assert wt[v] == pytest.approx(un[v], abs=1e-12), v
    # b receives 4/5 of a's vote under weights vs 1/2 unweighted
    got_un = {r.node: r.rank for r in page_rank(
        spark.createDataFrame([(a, b) for a, b, _ in wedges], "src string, dst string"),
        max_iters=30, tol=None,
    ).collect()}
    assert got["b"] > got_un["b"]


def test_hits_matches_numpy_power_iteration(spark):
    """HITS must equal the numpy power iteration on the adjacency
    matrix (same iteration count, same normalization), and identify
    the planted hub/authority structure."""
    import numpy as np

    from d2d_spark.operators.graph import hits

    # hub h0 points at authorities x, y, z; h1 points at x, y
    hedges = [
        ("h0", "x"), ("h0", "y"), ("h0", "z"),
        ("h1", "x"), ("h1", "y"),
        ("x", "y"),
    ]
    nodes = sorted({a for a, _ in hedges} | {b for _, b in hedges})
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for a, b in set(hedges):
        A[idx[a], idx[b]] = 1.0
    h = np.full(len(nodes), 1 / np.sqrt(len(nodes)))
    a = h.copy()
    for _ in range(15):
        a = A.T @ h
        a /= np.linalg.norm(a)
        h = A @ a
        h /= np.linalg.norm(h)

    df = spark.createDataFrame(hedges, "src string, dst string")
    got = {
        r.node: (r.hub, r.authority)
        for r in hits(df, max_iters=15, tol=None).collect()
    }
    for v in nodes:
        assert got[v][0] == pytest.approx(h[idx[v]], abs=1e-9), ("hub", v)
        assert got[v][1] == pytest.approx(a[idx[v]], abs=1e-9), ("auth", v)
    # structure: h0 is the top hub, x/y the top authorities
    assert max(got, key=lambda v: got[v][0]) == "h0"
    assert sorted(got, key=lambda v: -got[v][1])[:2] == ["y", "x"] or sorted(
        got, key=lambda v: -got[v][1]
    )[:2] == ["x", "y"]


def test_hits_tol_and_empty(spark):
    from d2d_spark.operators.graph import hits

    empty = spark.createDataFrame([], "src string, dst string")
    assert hits(empty).count() == 0
    df = spark.createDataFrame(EDGES, "src string, dst string")
    out = hits(df, max_iters=60, tol=1e-10)
    rows = out.collect()
    import math

    assert math.isclose(sum(r.hub**2 for r in rows), 1.0, abs_tol=1e-9)
    assert math.isclose(sum(r.authority**2 for r in rows), 1.0, abs_tol=1e-9)


def test_label_propagation_separates_bridged_cliques(spark):
    """Two 5-cliques joined by one bridge edge: LPA must settle on two
    communities (where connected_components would merge them), match a
    pure-Python replay of the same rule, and be deterministic."""
    import itertools

    from d2d_spark.operators.graph import label_propagation

    c1 = [f"a{i}" for i in range(5)]
    c2 = [f"b{i}" for i in range(5)]
    ledges = (
        [(x, y) for x, y in itertools.combinations(c1, 2)]
        + [(x, y) for x, y in itertools.combinations(c2, 2)]
        + [("a0", "b0")]
    )

    def ref_lpa(edges, iters=10):
        und = set()
        for a, b in edges:
            if a != b:
                und |= {(a, b), (b, a)}
        nodes = sorted({a for a, _ in und})
        lab = {v: v for v in nodes}
        for _ in range(iters):
            new = {}
            for v in nodes:
                votes = {}
                votes[lab[v]] = votes.get(lab[v], 0) + 1  # self-vote
                for a, b in und:
                    if a == v:
                        votes[lab[b]] = votes.get(lab[b], 0) + 1
                new[v] = min(
                    (l for l in votes), key=lambda l: (-votes[l], l)
                )
            if new == lab:
                break
            lab = new
        return lab

    df = spark.createDataFrame(ledges, "src string, dst string")
    got = {
        r.node: r.community
        for r in label_propagation(df, max_iters=10).collect()
    }
    want = ref_lpa(ledges)
    assert got == want
    # exactly two communities, split at the bridge
    assert len(set(got.values())) == 2
    assert len({got[v] for v in c1}) == 1
    assert len({got[v] for v in c2}) == 1
    assert got["a0"] != got["b0"]
    # deterministic across a different partitioning
    again = {
        r.node: r.community
        for r in label_propagation(df.repartition(7), max_iters=10).collect()
    }
    assert again == got


def test_label_propagation_empty_and_validation(spark):
    import pytest as pt

    from d2d_spark.operators.graph import label_propagation

    empty = spark.createDataFrame([], "src string, dst string")
    assert label_propagation(empty).count() == 0
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pt.raises(ValueError, match="max_iters"):
        label_propagation(df, max_iters=0)


def test_review_fixes_ppr_nulls_empty_graph_and_lpa_self_loops(spark):
    """r5 review regressions: NULL seeds are dropped before the
    teleport denominator; an edgeless graph WITH seeds returns the
    seed distribution (not an empty frame); empty seeds always raise;
    hits() leaves no per-round blocks behind; LPA keeps
    self-loop-only nodes as singleton communities."""
    from d2d_spark.operators.graph import hits, label_propagation, page_rank

    cyc = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    seeds = spark.createDataFrame([("a",), (None,)], "node string")
    got = {r.node: r.rank for r in page_rank(cyc, seeds=seeds, max_iters=10, tol=None).collect()}
    assert None not in got
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)

    empty = spark.createDataFrame([], "src string, dst string")
    only_seeds = {
        r.node: r.rank
        for r in page_rank(
            empty, seeds=spark.createDataFrame([("s1",), ("s2",)], "node string")
        ).collect()
    }
    assert only_seeds == {"s1": pytest.approx(0.5), "s2": pytest.approx(0.5)}
    with pytest.raises(ValueError, match="seeds"):
        page_rank(empty, seeds=spark.createDataFrame([], "node string"))

    sc = spark.sparkContext
    before = sc._jsc.sc().getPersistentRDDs().size()
    hits(cyc, max_iters=6, tol=None).count()
    after = sc._jsc.sc().getPersistentRDDs().size()
    # only the final truncated state may remain, not 2 frames/round
    assert after - before <= 2, (before, after)

    lpa = {
        r.node: r.community
        for r in label_propagation(
            spark.createDataFrame([("a", "a"), ("b", "c")], "src string, dst string")
        ).collect()
    }
    assert lpa["a"] == "a"  # self-loop-only node keeps a singleton community
    assert set(lpa) == {"a", "b", "c"}


def test_iterative_loops_validate_and_flush_pending_on_early_break(spark, tmp_path):
    """r5 review round 2: checkpoint_every is validated; tol
    convergence on a non-truncation round must not strand pending
    truncated frames; with a checkpoint dir configured, dead reliable
    checkpoints are deleted from disk."""
    import os

    from d2d_spark.operators.graph import label_propagation, page_rank

    df = spark.createDataFrame(EDGES, "src string, dst string")
    with pytest.raises(ValueError, match="checkpoint_every"):
        page_rank(df, checkpoint_every=0)
    with pytest.raises(ValueError, match="checkpoint_every"):
        label_propagation(df, checkpoint_every=0)

    sc = spark.sparkContext
    before = sc._jsc.sc().getPersistentRDDs().size()
    # loose tol with checkpoint_every=3: convergence fires on a
    # plain-persisted round, exercising the exit flush
    got = {
        r.node: r.rank
        for r in page_rank(df, max_iters=50, tol=1e-4, checkpoint_every=3).collect()
    }
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)
    after = sc._jsc.sc().getPersistentRDDs().size()
    # loop-invariant frames release; at most the final truncated state
    # plus the registered base may remain
    assert after - before <= 3, (before, after)

    # reliable-checkpoint mode: dead round checkpoints are deleted
    ckdir = str(tmp_path / "ck")
    sc.setCheckpointDir(ckdir)
    try:
        page_rank(df, max_iters=9, tol=None, checkpoint_every=3).count()
        remaining = [
            os.path.join(r, f)
            for r, _, fs_ in os.walk(ckdir)
            for f in fs_
        ]
        # 3 truncations happened (rounds 3, 6, 9); the two dead ones
        # are deleted, only the final state's files may remain
        rdd_dirs = {
            d for d, subs, _ in os.walk(ckdir) if os.path.basename(d).startswith("rdd-")
        }
        assert len(rdd_dirs) <= 1, sorted(rdd_dirs)
    finally:
        # restore "no checkpoint dir" (tmp_path dies with this test —
        # later graph calls must fall back to localCheckpoint)
        none = getattr(getattr(sc._jvm.scala, "None$"), "MODULE$")
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(none)


# ---------------------------------------------------------------------------
# triangle counting
# ---------------------------------------------------------------------------
def _py_triangles(edge_list):
    """Independent reference: adjacency sets, ordered triple scan."""
    adj = {}
    for a, b in edge_list:
        if a is None or b is None or a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    per = {n: 0 for n in nodes}
    for i, x in enumerate(nodes):
        for y in adj[x]:
            if y <= x:
                continue
            for z in adj[x] & adj[y]:
                if z > y:
                    for n in (x, y, z):
                        per[n] += 1
    return {n: c for n, c in per.items() if c}


def test_triangles_match_python_reference(spark):
    import random

    rng = random.Random(11)
    edge_list = list({(rng.randint(0, 60), rng.randint(0, 60)) for _ in range(500)})
    df = spark.createDataFrame(edge_list, "src long, dst long")
    from d2d_spark.operators.graph import triangle_count

    got = {r["node"]: r["triangles"] for r in triangle_count(df).collect()}
    assert got == _py_triangles(edge_list)
    # global count: each triangle contributes exactly 3 corners
    assert sum(got.values()) % 3 == 0


def test_triangles_direction_dup_selfloop_invariant(spark):
    base = [(1, 2), (2, 3), (1, 3), (3, 4)]
    noisy = base + [(2, 1), (3, 2), (1, 2), (4, 4), (3, 1)]
    from d2d_spark.operators.graph import triangle_count

    for edges in (base, noisy):
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["triangles"] for r in triangle_count(df).collect()}
        assert got == {1: 1, 2: 1, 3: 1}


def test_triangles_skew_star_plus_clique(spark):
    """A hub with many leaf edges (zero triangles) plus one clique:
    the degree orientation must not blow the hub's wedge set, and
    counts stay exact."""
    hub = [(0, i) for i in range(100, 180)]
    clique_nodes = [1, 2, 3, 4, 5]
    clique = [(a, b) for a in clique_nodes for b in clique_nodes if a < b]
    df = spark.createDataFrame(hub + clique + [(0, 1)], "src long, dst long")
    from d2d_spark.operators.graph import triangle_count

    got = {r["node"]: r["triangles"] for r in triangle_count(df).collect()}
    # C(5,3)=10 triangles, each clique node in C(4,2)=6 of them
    assert got == {n: 6 for n in clique_nodes}
    assert triangle_count(spark.createDataFrame(hub, "src long, dst long")).count() == 0


def test_triangles_empty_and_triangle_free(spark):
    from d2d_spark.operators.graph import triangle_count

    empty = spark.createDataFrame([], "src long, dst long")
    assert triangle_count(empty).count() == 0
    path = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    assert triangle_count(path).count() == 0


def test_topo_layers(spark):
    """DAG layering: diamond + chain resolve to the expected layers,
    same-layer nodes are genuinely independent, cycles refuse loudly
    with the stuck nodes named, disconnected sinks layer at 0."""
    import pytest

    from d2d_spark.operators.graph import topo_layers

    #   a -> b -> d;  a -> c -> d;  d -> e;   x -> y (separate chain)
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e"), ("x", "y")],
        "src string, dst string",
    )
    got = {r["node"]: r["layer"] for r in topo_layers(edges).collect()}
    assert got == {"a": 0, "x": 0, "b": 1, "c": 1, "y": 1, "d": 2, "e": 3}
    # every edge goes strictly forward in layers
    for s, d in [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e"), ("x", "y")]:
        assert got[s] < got[d]
    # cycle refusal
    cyc = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")], "src string, dst string"
    )
    with pytest.raises(ValueError, match="cycle"):
        topo_layers(cyc)
    # empty edge set -> empty result
    assert topo_layers(edges.limit(0)).count() == 0


def _py_core_numbers(pairs):
    """Textbook sequential min-degree peel — core numbers are
    removal-order-independent, so this pins the staged parallel peel."""
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {n: len(s) for n, s in adj.items()}
    core = {}
    remaining = set(adj)
    k = 0
    while remaining:
        low = [n for n in remaining if deg[n] <= k]
        if not low:
            k += 1
            continue
        for n in low:
            core[n] = k
            remaining.discard(n)
            for m in adj[n]:
                if m in remaining:
                    deg[m] -= 1
        # re-scan at the same k: peeling can drag neighbors below it
    return core


def test_core_numbers_known_graphs_and_twin(spark):
    from d2d_spark.operators.graph import core_numbers

    # K4 clique + a pendant off node 0 + a 2-chain island
    pairs = (
        [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]  # K4 -> core 3
        + [(0, 9)]                                        # pendant -> core 1
        + [(20, 21), (21, 22)]                            # chain -> core 1
        + [(5, 5)]                                        # self-loop dropped
    )
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = {r["node"]: r["core"] for r in core_numbers(df).collect()}
    want = _py_core_numbers(pairs)
    assert got == want
    assert got[0] == got[1] == got[2] == got[3] == 3
    assert got[9] == 1 and got[20] == got[21] == got[22] == 1
    assert 5 not in got  # self-loop-only node leaves the simple graph
    # duplicate + reversed edges collapse; partitioning invariance
    noisy = spark.createDataFrame(
        pairs + [(1, 0), (2, 0), (0, 1)], "src long, dst long"
    ).repartition(7)
    got2 = {r["node"]: r["core"] for r in core_numbers(noisy).collect()}
    assert got2 == want
    # two triangles sharing one node: all core 2
    tri2 = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3)]
    got3 = {
        r["node"]: r["core"]
        for r in core_numbers(
            spark.createDataFrame(tri2, "src long, dst long")
        ).collect()
    }
    assert got3 == _py_core_numbers(tri2)
    assert set(got3.values()) == {2}
    # empty input
    empty = core_numbers(
        spark.createDataFrame([], "src long, dst long")
    )
    assert empty.count() == 0
    # the cap refuses loudly
    import pytest as pt

    with pt.raises(ValueError, match="max_iters"):
        core_numbers(df, max_iters=1)


def test_core_numbers_deep_chain_bounded_plan(spark):
    """The r10 VERDICT #2 stress: a long path graph peels only its
    endpoints each pass (~n/2 passes, all inside stage 2), which must
    (a) NOT be refused — max_iters bounds STAGES, not fixpoint passes
    (r10 ADVICE) — and (b) keep the returned plan bounded: the
    accumulator truncates every truncate_out_every passes, so compile
    cost stays flat however deep the peel ran."""
    from d2d_spark.operators.graph import core_numbers

    n = 60  # ~30 fixpoint passes, 1 stage
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    out = core_numbers(chain, max_iters=5, truncate_out_every=4)
    plan = out._jdf.queryExecution().analyzed().toString()
    # bounded: at most truncate_out_every union branches survive; an
    # untruncated accumulator would hold ~30 branches and blow this
    assert plan.count("Union") <= 4, plan.count("Union")
    got = {r["node"]: r["core"] for r in out.collect()}
    assert got == {i: 1 for i in range(n)}


def test_core_numbers_degeneracy_ladder_stages(spark):
    """Nested-clique ladder (K2 .. K6 sharing nothing): cores 1..5,
    five stage advances, still inside a tight stage cap."""
    from d2d_spark.operators.graph import core_numbers

    pairs = []
    base = 0
    for k in range(2, 7):
        nodes = list(range(base, base + k))
        pairs += [(a, b) for i, a in enumerate(nodes) for b in nodes[i + 1 :]]
        base += k
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = {r["node"]: r["core"] for r in core_numbers(df, max_iters=10).collect()}
    assert got == _py_core_numbers(pairs)
    assert sorted(set(got.values())) == [1, 2, 3, 4, 5]


def test_core_topo_empty_schema_keeps_node_type(spark):
    """r10 ADVICE: the empty-result schema derives the node type from
    the input (long here), so an empty-input union with a typed
    downstream frame type-checks exactly like the non-empty path."""
    from pyspark.sql.types import IntegerType, LongType

    from d2d_spark.operators.graph import core_numbers, topo_layers

    empty_edges = spark.createDataFrame([], "src long, dst long")
    for fn, val_col in ((core_numbers, "core"), (topo_layers, "layer")):
        out = fn(empty_edges)
        assert out.schema["node"].dataType == LongType(), fn.__name__
        assert out.schema[val_col].dataType == IntegerType(), fn.__name__
        typed = spark.createDataFrame([(7, 1)], f"node long, {val_col} int")
        assert out.unionByName(typed).count() == 1
    # self-loop-only input filters to an empty simple graph -> same
    loops = spark.createDataFrame([(3, 3), (4, 4)], "src long, dst long")
    out = core_numbers(loops)
    assert out.count() == 0 and out.schema["node"].dataType == LongType()


def test_topo_layers_deep_dag_bounded_plan(spark):
    """Deep-DAG twin of the core_numbers stress: an 80-layer chain
    (plus a parallel strand to keep layers 2-wide) truncates its
    accumulator every 8 layers — bounded union count in the returned
    plan, layers still exact."""
    from d2d_spark.operators.graph import topo_layers

    depth = 80
    edges = [(f"a{i}", f"a{i+1}") for i in range(depth - 1)]
    edges += [(f"b{i}", f"b{i+1}") for i in range(depth - 1)]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = topo_layers(df, truncate_out_every=8)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert plan.count("Union") <= 8, plan.count("Union")
    got = {r["node"]: r["layer"] for r in out.collect()}
    assert len(got) == 2 * depth
    for i in range(depth):
        assert got[f"a{i}"] == i and got[f"b{i}"] == i
