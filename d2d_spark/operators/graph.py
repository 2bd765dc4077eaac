"""Link-graph analytics over edge lists — the ranking layer on top of
the crawl link graph (``sources/warc.py:wat_links`` → ``normalize_url``
→ edges). Crawl pipelines use PageRank-family scores to prioritize
fetch frontiers and as a document-quality prior (a page linked from
many well-linked pages is rarely spam); the reference has no graph
capability, so this is part of the LLM-pipeline extension surface.

Spark shape: pure DataFrame power iteration. Each round is ONE
edge⋈rank equi-join plus ONE groupBy(dst) sum — both shuffle on the
node key, and AQE coalesces/broadcasts as sizes allow. Rank state is
(node, rank): O(nodes), persisted per round with lineage truncated
every few rounds (the iterative-plan blowup discipline
connected_components already uses). Dangling mass (nodes with no
out-links — most of any real crawl frontier) is redistributed
uniformly each round via one scalar aggregate, keeping the rank
vector a true probability distribution (sums to 1, test-pinned).

At 100 TB: edges dominate and stream through each round's join;
nothing driver-side ever holds a node or edge collection — the only
driver values are the node count and per-round scalar sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _release_truncated(df: DataFrame) -> None:
    """Free a DEAD checkpoint-truncated frame. DataFrame.unpersist is
    a no-op for localCheckpoint state (it lives on the RDD, not in
    the CacheManager), so the LogicalRDD leaves release directly.
    Destroys the frame's data unrecoverably (truncation cut the
    lineage) — call ONLY once every downstream consumer has been
    materialized into its own truncated storage."""
    try:
        df.unpersist(blocking=False)
        sess = df.sparkSession
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            if leaf.getClass().getSimpleName() == "LogicalRDD":
                rdd = leaf.rdd()
                rdd.unpersist(False)
                # reliable checkpoints live as FILES (cleaner does not
                # collect them by default) — a dead frame's checkpoint
                # dir is deletable on the same terms as its blocks
                copt = rdd.getCheckpointFile()
                if copt.isDefined():
                    jvm = sess._jvm
                    cp = jvm.org.apache.hadoop.fs.Path(copt.get())
                    cp.getFileSystem(sess._jsc.hadoopConfiguration()).delete(cp, True)
    except Exception:
        pass  # cleanup must never fail the computation


def _truncate_frame(df: DataFrame, can_checkpoint: bool) -> DataFrame:
    """Materialize and CUT the plan: reliable checkpoint when a dir is
    configured (durable — survives executor loss), localCheckpoint
    otherwise (executor-local, the connected_components trade-off)."""
    return df.checkpoint(eager=True) if can_checkpoint else df.localCheckpoint(eager=True)


def page_rank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iters: int = 20,
    tol: float | None = 1.0e-6,
    checkpoint_every: int = 4,
    seeds: DataFrame | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """PageRank over a directed edge list: returns (node, rank) with
    ranks summing to 1. Duplicate edges are collapsed (a page linking
    twice still casts one vote — the convention of the original
    formulation); self-loops count like any other edge.

    ``weight_col`` makes votes proportional to an edge weight (e.g.
    anchor count or link quality): duplicate (src, dst) edges sum
    their weights, a node's vote splits by weight share instead of
    evenly, and non-positive-weight edges are dropped. Unweighted is
    the weight=1 special case (test-pinned).

    ``seeds`` (a one-column frame of node ids) switches to
    PERSONALIZED PageRank: teleportation — and dangling mass — lands
    only on the seed set, so ranks measure proximity to the seeds
    (the crawl-frontier prioritization form: seed with known-good
    domains, rank the frontier by closeness). Seeds not present in
    the graph still receive teleport mass; an empty seed frame is
    refused.

    Stops after ``max_iters`` rounds or when the L1 delta between
    consecutive rank vectors drops below ``tol`` (one scalar aggregate
    per round; pass ``tol=None`` to always run ``max_iters``).
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if max_iters < 1:
        raise ValueError(f"max_iters must be >= 1, got {max_iters}")
    if checkpoint_every < 1:
        raise ValueError(f"checkpoint_every must be >= 1, got {checkpoint_every}")
    from pyspark import StorageLevel

    if weight_col is not None:
        e = (
            edges.select(
                F.col(src).alias("src"),
                F.col(dst).alias("dst"),
                F.col(weight_col).cast("double").alias("w"),
            )
            .filter(
                F.col("src").isNotNull()
                & F.col("dst").isNotNull()
                & (F.col("w") > 0)
            )
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    else:
        e = (
            edges.select(
                F.col(src).alias("src"), F.col(dst).alias("dst"), F.lit(1.0).alias("w")
            )
            .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
            .distinct()
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select("dst"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = None
    if seeds is not None:
        # NULL seeds would inflate the teleport denominator while the
        # node join never matches them — total rank mass silently
        # deflates; filter them out BEFORE counting
        sd = (
            seeds.select(F.col(seeds.columns[0]).alias("node"))
            .filter(F.col("node").isNotNull())
            .distinct()
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        ns = sd.count()
        if ns == 0:
            raise ValueError("page_rank: seeds frame is empty")
        # seeds outside the edge list still teleport: they join the
        # node universe (with outdeg 0) — and an edgeless graph with
        # seeds is just the seed set at rank 1/ns, not an empty result
        nodes2 = nodes.union(sd.select("node")).distinct()
    else:
        sd = None
        nodes2 = nodes
        n = nodes.count()
        if n == 0:
            e.unpersist(blocking=False)
            nodes.unpersist(blocking=False)
            return edges.sparkSession.createDataFrame([], "node string, rank double")
    outdeg = e.groupBy("src").agg(F.sum("w").alias("outdeg"))
    # out-link structure is loop-invariant: join it to the node set
    # once; the personalization vector v (uniform on seeds, else
    # uniform everywhere) is loop-invariant too and rides the same
    # frame
    base = nodes2.join(outdeg, nodes2.node == outdeg.src, "left").select(
        "node", F.coalesce("outdeg", F.lit(0)).alias("outdeg")
    )
    if sd is not None:
        base = base.join(
            sd.select("node", F.lit(1.0 / ns).alias("__v")), "node", "left"
        ).select("node", "outdeg", F.coalesce("__v", F.lit(0.0)).alias("__v"))
    else:
        base = base.select("node", "outdeg", F.lit(1.0 / n).alias("__v"))
    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    base.count()
    # The iterative plan MUST be truncated, not just cached: each
    # round's frame references the previous round's plan, and a cached
    # block does not stop the analyzer/optimizer from walking the
    # whole growing tree — by round ~30 compilation dominates wall
    # time (measured; the same blowup connected_components guards
    # against). Reliable checkpoint when a dir is configured (the
    # durable choice on a real cluster — survives executor loss);
    # localCheckpoint otherwise, accepting its executor-local blocks
    # on the same documented terms as connected_components.
    sc = edges.sparkSession.sparkContext
    can_checkpoint = sc.getCheckpointDir() is not None
    ranks = base.select("node", "outdeg", "__v", F.col("__v").alias("rank")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    ranks.count()
    ranks_is_trunc = False
    pending = []
    for it in range(max_iters):
        # mass leaving dangling nodes has nowhere to go — spread it
        # uniformly so the vector stays stochastic. The sum stays IN
        # the plan (one-row aggregate, broadcast crossJoin) — no
        # driver round-trip per iteration.
        dang = ranks.filter(F.col("outdeg") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dang")
        )
        contribs = (
            e.join(ranks, e.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") * F.col("w") / F.col("outdeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        nxt = (
            base.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                "outdeg",
                "__v",
                (
                    F.lit(1.0 - damping) * F.col("__v")
                    + F.lit(damping)
                    * (
                        F.coalesce("inflow", F.lit(0.0))
                        + F.col("__dang") * F.col("__v")
                    )
                ).alias("rank"),
            )
        )
        truncate_now = (it + 1) % checkpoint_every == 0 or it == max_iters - 1
        if truncate_now:
            nxt = _truncate_frame(nxt, can_checkpoint)
        else:
            nxt = nxt.persist(StorageLevel.MEMORY_AND_DISK)
            nxt.count()  # materialize BEFORE dropping the previous round
        if tol is not None:
            delta = (
                nxt.join(ranks.select("node", F.col("rank").alias("prev_rank")), "node")
                .agg(F.sum(F.abs(F.col("rank") - F.col("prev_rank"))))
                .first()[0]
            )
        else:
            delta = None
        # release discipline: a plain-persisted round unpersists
        # normally; a truncated round's RDD blocks are only safe to
        # destroy once a NEWER truncation has no lineage back to it
        if ranks_is_trunc:
            pending.append(ranks)
        else:
            ranks.unpersist(blocking=False)
        if truncate_now:
            for f in pending:
                _release_truncated(f)
            pending = []
        ranks, ranks_is_trunc = nxt, truncate_now
        if delta is not None and delta < tol:
            break
    if pending:
        # tol convergence can break on a plain-persisted round whose
        # lineage still reaches the pending truncated frame: truncate
        # the final state first, THEN the pending blocks are dead
        old = ranks
        ranks = _truncate_frame(ranks, can_checkpoint)
        old.unpersist(blocking=False)
        for f in pending:
            _release_truncated(f)
        pending = []
    from d2d_spark import cache as opcache

    # the survivors (loop-invariant structure + final vector) register
    # for per-corpus release; everything per-round is already dropped
    opcache.register("page_rank", base)
    if ranks.is_cached:
        opcache.register("page_rank", ranks)
    out = ranks.select("node", "rank")
    e.unpersist(blocking=False)
    nodes.unpersist(blocking=False)
    if sd is not None:
        sd.unpersist(blocking=False)
    return out


def degree_stats(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, out_degree, in_degree) for every node in the edge list —
    the cheap crawl-frontier diagnostic (two aggs + one outer join)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    outd = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    ind = e.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    return (
        outd.join(ind, "node", "full")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 20,
    tol: float | None = 1.0e-6,
) -> DataFrame:
    """HITS hubs-and-authorities over a directed edge list: returns
    (node, hub, authority), both vectors L2-normalized (Kleinberg's
    convention — the principal singular pair of the adjacency
    matrix). Good hubs point at good authorities — the complementary
    signal to PageRank for crawl link graphs: a directory/index page
    is a strong hub long before it accumulates in-links of its own.

    Per round: authority = one edge⋈hub join + groupBy(dst) sum, hub
    = one edge⋈authority join + groupBy(src) sum. The raw scores are
    TRUNCATED every round (checkpoint/localCheckpoint — unlike
    page_rank's additive update, each normalization here would embed
    multiple copies of the previous round's plan, so per-round
    truncation is what keeps the tree linear), then both columns
    L2-normalize in-plan off the truncated scan via one-row broadcast
    aggregates. Normalizing authority after computing hub from its
    raw values is exact: the scale cancels in hub's own
    normalization (test-pinned against the normalize-then-multiply
    reference at 1e-9). State is O(nodes)."""
    if max_iters < 1:
        raise ValueError(f"max_iters must be >= 1, got {max_iters}")
    from pyspark import StorageLevel

    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes = (
        e.select(F.col("src").alias("node")).union(e.select("dst")).distinct()
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n = nodes.count()
    if n == 0:
        e.unpersist(blocking=False)
        nodes.unpersist(blocking=False)
        return edges.sparkSession.createDataFrame(
            [], "node string, hub double, authority double"
        )
    sc = edges.sparkSession.sparkContext
    can_checkpoint = sc.getCheckpointDir() is not None

    import math

    state = _truncate_frame(
        nodes.select(
            "node",
            F.lit(1.0 / math.sqrt(n)).alias("hub"),
            F.lit(1.0 / math.sqrt(n)).alias("authority"),
        ),
        can_checkpoint,
    )
    for _ in range(max_iters):
        az = (
            e.join(state.select(F.col("node").alias("src"), "hub"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("a_raw"))
        )
        a_full = nodes.join(az, "node", "left").select(
            "node", F.coalesce("a_raw", F.lit(0.0)).alias("a_raw")
        )
        hz = (
            e.join(a_full.select(F.col("node").alias("dst"), "a_raw"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("a_raw").alias("h_raw"))
        )
        raw = _truncate_frame(
            a_full.join(hz, "node", "left").select(
                "node",
                F.coalesce("h_raw", F.lit(0.0)).alias("h_raw"),
                "a_raw",
            ),
            can_checkpoint,
        )
        norms = raw.agg(
            F.sqrt(F.coalesce(F.sum(F.col("h_raw") * F.col("h_raw")), F.lit(0.0))).alias("__hn"),
            F.sqrt(F.coalesce(F.sum(F.col("a_raw") * F.col("a_raw")), F.lit(0.0))).alias("__an"),
        )
        nxt = (
            raw.crossJoin(F.broadcast(norms))
            .select(
                "node",
                (F.col("h_raw") / F.nullif(F.col("__hn"), F.lit(0.0))).alias("hub"),
                (F.col("a_raw") / F.nullif(F.col("__an"), F.lit(0.0))).alias("authority"),
            )
        )
        nxt = _truncate_frame(nxt, can_checkpoint)
        if tol is not None:
            delta = (
                nxt.join(
                    state.select(
                        "node",
                        F.col("hub").alias("ph"),
                        F.col("authority").alias("pa"),
                    ),
                    "node",
                )
                .agg(
                    F.sum(
                        F.abs(F.col("hub") - F.col("ph"))
                        + F.abs(F.col("authority") - F.col("pa"))
                    )
                )
                .first()[0]
            )
        else:
            delta = None
        # nxt is truncated (own storage, no lineage back): the
        # previous state and this round's raw intermediate are dead —
        # destroy their checkpoint blocks, or a long run leaks two
        # O(nodes) frames per round
        _release_truncated(state)
        _release_truncated(raw)
        state = nxt
        if delta is not None and delta < tol:
            break
    out = state.select("node", "hub", "authority")
    e.unpersist(blocking=False)
    nodes.unpersist(blocking=False)
    return out


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 10,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Community detection by synchronous label propagation over the
    UNDIRECTED version of the edge list: every node starts as its own
    community, then each round adopts the most frequent label among
    itself and its neighbors (self-vote included — the standard
    damping that keeps synchronous updates from flip-flopping on
    bipartite structure), ties broken by smallest label so the whole
    process is deterministic on any partitioning. Returns
    (node, community). Communities are denser-than-chance groups —
    unlike ``dedup.connected_components``, which merges everything
    reachable, label propagation keeps two cliques joined by one
    bridge edge apart.

    Per round: one labels⋈edges join + one (node, label) count + one
    deterministic top-1 per node — all key-partitioned; state is
    O(nodes), truncated every ``checkpoint_every`` rounds (the update
    references the prior labels twice: neighbor votes + self vote).
    Stops early when no label changed (one scalar aggregate per
    round). max_iters caps the documented synchronous-LPA oscillation
    risk; near-dup/community graphs settle in a handful of rounds."""
    if max_iters < 1:
        raise ValueError(f"max_iters must be >= 1, got {max_iters}")
    if checkpoint_every < 1:
        raise ValueError(f"checkpoint_every must be >= 1, got {checkpoint_every}")
    from pyspark import StorageLevel

    named = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a").isNotNull() & F.col("b").isNotNull()
    )
    # votes ignore self-loops (the self-vote is built in), but the
    # node UNIVERSE must include self-loop-only nodes — they form
    # singleton communities rather than silently vanishing
    und = named.filter(F.col("a") != F.col("b"))
    e = (
        und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes = (
        named.select(F.col("a").alias("node"))
        .union(named.select(F.col("b").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = nodes.count()
    if n == 0:
        e.unpersist(blocking=False)
        nodes.unpersist(blocking=False)
        return edges.sparkSession.createDataFrame([], "node string, community string")
    sc = edges.sparkSession.sparkContext
    can_checkpoint = sc.getCheckpointDir() is not None
    labels = nodes.select("node", F.col("node").alias("community")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    labels.count()
    labels_is_trunc = False
    pending = []
    for it in range(max_iters):
        votes = (
            e.join(labels.select(F.col("node").alias("b"), "community"), "b")
            .select(F.col("a").alias("node"), "community")
            .unionByName(labels)  # self-vote
            .groupBy("node", "community")
            .agg(F.count(F.lit(1)).alias("__votes"))
        )
        from pyspark.sql.window import Window

        w = Window.partitionBy("node").orderBy(
            F.desc("__votes"), F.asc("community")
        )
        nxt = (
            votes.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") == 1)
            .select("node", "community")
        )
        truncate_now = (it + 1) % checkpoint_every == 0 or it == max_iters - 1
        if truncate_now:
            nxt = _truncate_frame(nxt, can_checkpoint)
        else:
            nxt = nxt.persist(StorageLevel.MEMORY_AND_DISK)
            nxt.count()
        changed = (
            nxt.join(
                labels.select("node", F.col("community").alias("__prev")), "node"
            )
            .filter(F.col("community") != F.col("__prev"))
            .limit(1)
            .count()
        )
        # same release discipline as page_rank: truncated rounds wait
        # for a newer truncation before their blocks are destroyed
        if labels_is_trunc:
            pending.append(labels)
        else:
            labels.unpersist(blocking=False)
        if truncate_now:
            for f in pending:
                _release_truncated(f)
            pending = []
        labels, labels_is_trunc = nxt, truncate_now
        if changed == 0:
            break
    if pending:
        # same early-break shape as page_rank: convergence commonly
        # fires one round after a truncation — truncate the final
        # state before destroying what its lineage still reaches
        old = labels
        labels = _truncate_frame(labels, can_checkpoint)
        old.unpersist(blocking=False)
        for f in pending:
            _release_truncated(f)
        pending = []
    out = labels.select("node", "community")
    e.unpersist(blocking=False)
    nodes.unpersist(blocking=False)
    return out


def modularity_score(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
) -> float:
    """Newman modularity Q of a (node, community) labeling over the
    undirected graph induced by the edge list (duplicate edges
    collapse by weight sum; self-loops drop — the label_propagation
    graph contract): Q = sum_C [ in_C/(2m) - (tot_C/(2m))^2 ], the
    fraction of edge weight inside communities minus the expectation
    under the degree-preserving null model (Newman & Girvan 2004).
    Nodes absent from ``labels`` count as singleton communities.
    Shape: two equi-joins + two groupBys; one scalar collect."""
    e2 = _sym_edges(edges, src, dst, weight_col)
    lab = labels.select(F.col("node"), F.col("community"))
    deg = e2.groupBy(F.col("a").alias("node")).agg(F.sum("w").alias("k"))
    two_m = deg.agg(F.coalesce(F.sum("k"), F.lit(0.0))).first()[0]
    if not two_m:
        return 0.0
    labd = deg.join(lab, "node", "left").select(
        "node", F.coalesce("community", F.col("node")).alias("community"), "k"
    )
    tots = labd.groupBy("community").agg(F.sum("k").alias("tot"))
    intra = (
        e2.join(labd.select(F.col("node").alias("a"), F.col("community").alias("__ca")), "a")
        .join(labd.select(F.col("node").alias("b"), F.col("community").alias("__cb")), "b")
        .filter(F.col("__ca") == F.col("__cb"))
        .groupBy(F.col("__ca").alias("community"))
        .agg(F.sum("w").alias("inw"))
    )
    row = (
        tots.join(intra, "community", "left")
        .agg(
            F.sum(
                F.coalesce("inw", F.lit(0.0)) / F.lit(two_m)
                - (F.col("tot") / F.lit(two_m)) * (F.col("tot") / F.lit(two_m))
            )
        )
        .first()
    )
    return float(row[0] or 0.0)


def _sym_edges(
    edges: DataFrame, src: str, dst: str, weight_col: str | None
) -> DataFrame:
    """(a, b, w) with every undirected edge in BOTH directions,
    duplicates collapsed by weight sum, self-loops dropped."""
    if weight_col is not None:
        named = edges.select(
            F.col(src).alias("a"),
            F.col(dst).alias("b"),
            F.col(weight_col).cast("double").alias("w"),
        ).filter(
            F.col("a").isNotNull() & F.col("b").isNotNull() & (F.col("w") > 0)
        )
    else:
        named = edges.select(
            F.col(src).alias("a"), F.col(dst).alias("b"), F.lit(1.0).alias("w")
        ).filter(F.col("a").isNotNull() & F.col("b").isNotNull())
    und = named.filter(F.col("a") != F.col("b"))
    return (
        und.unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b"), "w"))
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
    )


def modularity_communities(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    max_rounds: int = 10,
) -> DataFrame:
    """Community detection by synchronous MODULARITY local moving
    (the Louvain first phase — Blondel et al. 2008, "Fast unfolding
    of communities in large networks"; the Leiden paper's "local
    moving" kernel) over the undirected graph induced by the edge
    list: every node starts as its own community, then each round
    every node simultaneously moves to the neighbor community with
    the best modularity gain

        gain(i -> C) = k_iC - k_i * tot(C \\ i) / (2m)

    (k_iC = weight from i into C, tot = community degree mass, 2m =
    total degree). The standard upgrade over `label_propagation` for
    link-farm / crawl-graph clustering: LPA is resolution-limited and
    flip-prone on bipartite-ish structure, while the modularity
    objective penalizes grouping by sheer degree mass. Returns
    (node, community); community ids are node ids (the id a pool
    converged on), self-loop-only nodes stay singletons (the LPA
    universe contract), duplicate edges collapse by weight SUM — in
    the unweighted mode multiplicity IS the weight (a pair linked 5
    times is a 5x tie; pre-`distinct()` the edges for one-vote
    semantics — the deliberate contrast with page_rank's
    one-vote-per-pair collapse).

    DETERMINISM CONTRACT: rounds are exactly synchronous and the move
    rule is total — argmax gain, ties prefer STAYING, remaining ties
    take the smallest community id — so the labeling is a pure
    function of the graph, identical on any partitioning (no
    vertex-order dependence, the documented difference from classical
    sequential Louvain). Synchronous moves can oscillate (two nodes
    swapping communities forever); the loop therefore scores Q every
    round and RETURNS THE FIRST BEST-Q LABELING seen, stopping early
    when no node moves. ``max_rounds`` bounds the walk.

    Shape per round: one degree-mass groupBy(community), one
    edge⋈labels join + groupBy(node, community) for the k_iC votes,
    one per-node top-1 window, one Q aggregate — all key-partitioned
    shuffles on node/community-sized frames; labels truncate EVERY
    round (the hits discipline — the update reads the prior labels
    four times, so per-round truncation is what keeps the tree
    linear), and a non-best non-current round's storage is destroyed
    immediately. One-level local moving only: the classical
    continuation (contract communities, repeat) multiplies depth,
    and for curation-scale near-dup/link graphs the first level is
    where ~all of Q lives."""
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    from pyspark import StorageLevel

    if weight_col is not None:
        named = edges.select(
            F.col(src).alias("a"), F.col(dst).alias("b"),
            F.col(weight_col).cast("double").alias("w"),
        ).filter(F.col("a").isNotNull() & F.col("b").isNotNull() & (F.col("w") > 0))
    else:
        named = edges.select(
            F.col(src).alias("a"), F.col(dst).alias("b"), F.lit(1.0).alias("w")
        ).filter(F.col("a").isNotNull() & F.col("b").isNotNull())
    und = named.filter(F.col("a") != F.col("b"))
    e2 = (
        und.unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b"), "w"))
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # node universe from RAW endpoints: self-loop-only nodes are
    # singleton communities, not absent (the LPA contract)
    nodes = (
        named.select(F.col("a").alias("node"))
        .union(named.select(F.col("b").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = nodes.count()
    spark = edges.sparkSession
    if n == 0:
        e2.unpersist(blocking=False)
        nodes.unpersist(blocking=False)
        return spark.createDataFrame([], "node string, community string")
    deg = (
        nodes.join(
            e2.groupBy(F.col("a").alias("node")).agg(F.sum("w").alias("k")),
            "node",
            "left",
        )
        .select("node", F.coalesce("k", F.lit(0.0)).alias("k"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    two_m = deg.agg(F.coalesce(F.sum("k"), F.lit(0.0))).first()[0]
    if not two_m:
        # no simple edges at all: everyone is a singleton
        out = nodes.select("node", F.col("node").alias("community"))
        e2.unpersist(blocking=False)
        return out
    sc = spark.sparkContext
    can_checkpoint = sc.getCheckpointDir() is not None
    from pyspark.sql.window import Window

    def q_of(lab: DataFrame) -> float:
        tots = (
            deg.join(lab, "node")
            .groupBy("community")
            .agg(F.sum("k").alias("tot"))
        )
        intra = (
            e2.join(lab.select(F.col("node").alias("a"), F.col("community").alias("__ca")), "a")
            .join(lab.select(F.col("node").alias("b"), F.col("community").alias("__cb")), "b")
            .filter(F.col("__ca") == F.col("__cb"))
            .groupBy(F.col("__ca").alias("community"))
            .agg(F.sum("w").alias("inw"))
        )
        row = (
            tots.join(intra, "community", "left")
            .agg(
                F.sum(
                    F.coalesce("inw", F.lit(0.0)) / F.lit(two_m)
                    - (F.col("tot") / F.lit(two_m)) * (F.col("tot") / F.lit(two_m))
                )
            )
            .first()
        )
        return float(row[0] or 0.0)

    labels = _truncate_frame(
        nodes.select("node", F.col("node").alias("community")), can_checkpoint
    )
    # singleton start: Q = -sum (k_i/2m)^2; any improvement beats it
    best_q = q_of(labels)
    best = labels
    for _ in range(max_rounds):
        ki_c = (
            e2.join(
                labels.select(F.col("node").alias("b"), F.col("community").alias("__c")),
                "b",
            )
            .groupBy(F.col("a").alias("node"), F.col("__c").alias("community"))
            .agg(F.sum("w").alias("__kic"))
        )
        tots = (
            deg.join(labels, "node").groupBy("community").agg(F.sum("k").alias("__tot"))
        )
        own = labels.select("node", F.col("community").alias("__own"))
        # candidates: every neighbor community, plus the own community
        # (k_iC = 0 when no neighbor is in it — an isolated-in-own
        # node may still be best off staying)
        cand = (
            ki_c.unionByName(
                own.select("node", F.col("__own").alias("community"),
                           F.lit(0.0).alias("__kic"))
            )
            .groupBy("node", "community")
            .agg(F.max("__kic").alias("__kic"))
        )
        scored = (
            cand.join(own, "node")
            .join(tots, "community")
            .join(deg, "node")
            .select(
                "node",
                "community",
                "__own",
                (
                    F.col("__kic")
                    - F.col("k")
                    * (
                        F.col("__tot")
                        - F.when(F.col("community") == F.col("__own"), F.col("k"))
                        .otherwise(F.lit(0.0))
                    )
                    / F.lit(two_m)
                ).alias("__gain"),
            )
        )
        w = Window.partitionBy("node").orderBy(
            F.desc("__gain"),
            F.desc(F.col("community") == F.col("__own")),
            F.asc("community"),
        )
        nxt = _truncate_frame(
            scored.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") == 1)
            .select("node", "community"),
            can_checkpoint,
        )
        changed = (
            nxt.join(labels.select("node", F.col("community").alias("__prev")), "node")
            .filter(F.col("community") != F.col("__prev"))
            .limit(1)
            .count()
        )
        q = q_of(nxt)
        prev = labels
        labels = nxt
        if q > best_q + 1e-12:
            old_best = best
            best, best_q = labels, q
            if old_best is not prev:
                _release_truncated(old_best)
        # every round is truncated (own storage, no lineage back): a
        # frame that is neither the current state nor the best-Q
        # winner is dead the moment the next state exists
        if prev is not best:
            _release_truncated(prev)
        if changed == 0:
            break
    out = best.select("node", "community")
    if labels is not best:
        _release_truncated(labels)
    e2.unpersist(blocking=False)
    nodes.unpersist(blocking=False)
    deg.unpersist(blocking=False)
    return out


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, triangles) — exact triangle participation count per node
    over the UNDIRECTED simple graph induced by the edge list
    (direction, duplicate edges and self-loops are discarded; each
    triangle counts once per corner). Global triangle count =
    sum(triangles) / 3.

    Degree-ordered orientation (the classic compact-forward /
    node-iterator++ bound): every undirected edge points from the
    (degree, node)-smaller endpoint to the larger, so each triangle
    has exactly ONE node with two out-edges and is enumerated exactly
    once as a wedge at that node closed by one equi-join probe. Wedge
    work is sum(out_degree^2) which the orientation bounds by
    O(m^1.5) regardless of raw degree skew — a celebrity node with
    10M followers gets out-degree O(sqrt(m)), not 10M, because almost
    all its edges point INTO it. All equi-join/agg shuffles on edge-
    or node-sized frames (canonical dedup, degree agg + two key
    joins, wedge self-join, close probe, corner count); nothing
    iterative, nothing on the driver."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull() & (F.col("a") != F.col("b")))
        .select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient by (degree, node): total order, no ties possible
    keyed = (
        e.join(deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
        .select(
            F.when(
                F.struct(F.col("du"), F.col("u")) < F.struct(F.col("dv"), F.col("v")),
                F.struct(
                    F.col("u").alias("s"),
                    F.col("v").alias("t"),
                    F.struct(
                        F.col("dv").alias("kd"), F.col("v").alias("kn")
                    ).alias("tkey"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("v").alias("s"),
                    F.col("u").alias("t"),
                    F.struct(
                        F.col("du").alias("kd"), F.col("u").alias("kn")
                    ).alias("tkey"),
                )
            )
            .alias("o")
        )
        .select("o.s", "o.t", "o.tkey")
    )
    wedges = (
        keyed.select(F.col("s"), F.col("t").alias("y"), F.col("tkey").alias("ykey"))
        .join(
            keyed.select(F.col("s"), F.col("t").alias("z"), F.col("tkey").alias("zkey")),
            "s",
        )
        .filter(F.col("ykey") < F.col("zkey"))
        .select("s", "y", "z")
    )
    tri = wedges.join(
        keyed.select(F.col("s").alias("y"), F.col("t").alias("z")), ["y", "z"]
    ).select("s", "y", "z")
    corners = (
        tri.select(F.explode(F.array("s", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return corners


def core_numbers(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 1000,
    truncate_out_every: int = 32,
) -> DataFrame:
    """(node, core) — exact k-core decomposition of the undirected
    simple graph induced by the edge list (direction, duplicates and
    self-loops discarded, the triangle_count contract): core = the
    largest k such that the node survives in a subgraph where every
    node has degree >= k. The classic link-farm / bot-ring signal for
    graph curation: spam clusters are dense (high core) while organic
    long-tail nodes peel out at core 1-2; the degeneracy max(core)
    also bounds triangle/clique work.

    Algorithm: the Matula–Beck staged peel (Seidman 1983, "Network
    structure and minimum degree"; Matula & Beck 1983), distributed —
    for
    k = 1, 2, ...: repeatedly remove nodes whose CURRENT degree is
    < k until a fixpoint; nodes removed during stage k have core
    k - 1. Core numbers are removal-order-independent, so the staged
    parallel peel and the sequential textbook peel agree exactly.

    Shape: each peel pass is one degree groupBy + two anti-joins on
    the live edge list, lineage truncated per pass (the page_rank
    discipline). ``max_iters`` bounds STAGES (distinct k values —
    <= degeneracy + 1, single digits on real sparse graphs), NOT the
    inner fixpoint passes: a 2k-node chain legitimately needs ~1k
    passes inside stage 2 and must not be refused for it (r10 ADVICE).
    Inner passes terminate unconditionally — each one peels >= 1 node
    or advances the stage — and a 2x-node-count invariant cap turns
    any violation of that into a loud RuntimeError, not a hang.

    The result accumulator coalesces through a localCheckpoint every
    ``truncate_out_every`` passes, so the returned plan holds at most
    that many union branches however deep the peel ran — the
    association-rules branch-count lesson (SCALE.md) applied here;
    compile cost stays flat across rounds (stress-test-pinned)."""
    if truncate_out_every < 1:
        raise ValueError(
            f"core_numbers: truncate_out_every must be >= 1, got {truncate_out_every}"
        )
    e = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(
            F.col("a").isNotNull() & F.col("b").isNotNull() & (F.col("a") != F.col("b"))
        )
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
    )
    live = (
        e.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .unionAll(e.select(F.col("v").alias("a"), F.col("u").alias("b")))
        .localCheckpoint(eager=True)
    )
    # the node set rides separately: a node whose last edges vanish
    # mid-peel (both endpoints of its edges peeled) has degree 0 but
    # must still receive a core number at the current stage
    nodes = live.select(F.col("a").alias("node")).distinct().localCheckpoint(eager=True)
    spark = edges.sparkSession
    n_total = nodes.count()
    out_parts = max(nodes.rdd.getNumPartitions(), 1)
    out = None
    k = 1
    stages = 0
    passes = 0
    since_trunc = 0
    # every pass peels >= 1 node or advances the stage, and stages are
    # themselves bounded — so this cap is unreachable unless the peel
    # invariant itself is broken (a bug, not an input property)
    pass_cap = 2 * n_total + 16
    while True:
        deg = nodes.join(
            live.groupBy(F.col("a").alias("node")).agg(F.count(F.lit(1)).alias("__d")),
            "node",
            "left",
        ).select("node", F.coalesce("__d", F.lit(0)).alias("__d"))
        stats = deg.agg(
            F.min("__d").alias("mn"), F.count(F.lit(1)).alias("n")
        ).first()
        if not stats["n"]:
            break
        if stats["mn"] >= k:
            # fixpoint for this stage AND stages k..mn are provably
            # empty (nothing has degree < mn+1 except the min-degree
            # nodes themselves at stage mn+1): jump straight there —
            # one tiny aggregate replaces one empty round per skipped
            # stage, which on a degeneracy-d graph halves the round
            # count
            k = int(stats["mn"]) + 1
            stages += 1
            if stages > max_iters:
                raise ValueError(
                    f"core_numbers: exceeded max_iters={max_iters} peel STAGES "
                    "— degeneracy beyond the cap is a pathologically dense "
                    "graph (or a bug upstream); raise the cap knowingly"
                )
        passes += 1
        if passes > pass_cap:
            raise RuntimeError(
                f"core_numbers: {passes} peel passes on {n_total} nodes — the "
                "peel-progress invariant is broken; this is a bug, report it"
            )
        low = deg.filter(F.col("__d") < k).select("node").localCheckpoint(eager=True)
        peeled = low.select("node", F.lit(k - 1).alias("core"))
        out = peeled if out is None else out.unionAll(peeled)
        since_trunc += 1
        if since_trunc >= truncate_out_every:
            # bound the union tree: the accumulator's PLAN (not its
            # data) grows one branch per pass otherwise, and deep
            # peels pay compile time quadratic in rounds
            out = out.coalesce(out_parts).localCheckpoint(eager=True)
            since_trunc = 0
        nodes = nodes.join(low, "node", "left_anti").localCheckpoint(eager=True)
        live = (
            live.join(low.select(F.col("node").alias("a")), "a", "left_anti")
            .join(low.select(F.col("node").alias("b")), "b", "left_anti")
            .localCheckpoint(eager=True)
        )
    if out is None:
        # typed like the non-empty path: node keeps the input type
        # (an empty string-typed frame would break a union with typed
        # downstream frames only in the empty case — r10 ADVICE)
        from pyspark.sql.types import IntegerType, StructField, StructType

        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("node", nodes.schema["node"].dataType),
                    StructField("core", IntegerType()),
                ]
            ),
        )
    return out


def topo_layers(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 1000,
    truncate_out_every: int = 32,
) -> DataFrame:
    """(node, layer) — topological layering of a dependency DAG
    (src must run BEFORE dst): layer 0 = nodes with no prerequisites,
    layer k = nodes whose prerequisites all sit in layers < k. The
    migration-scheduling primitive the reference's table-to-table
    pipelines imply but never formalize: tables in the same layer can
    load in parallel; layers run in order. A CYCLE is refused loudly
    with the stuck nodes named — a silent partial order would schedule
    a deadlock.

    Shape: iterative peel — each round one anti-join (nodes whose
    every in-edge source is already layered) + one edge filter;
    rounds = DAG depth, each a small shuffle; every frame is
    node/edge-bounded. localCheckpoint per round truncates the
    iterative lineage (the page_rank discipline), and the result
    accumulator itself truncates every ``truncate_out_every`` layers
    so a deep DAG cannot grow the returned plan one union branch per
    layer (the core_numbers / association-rules branch-count lesson;
    stress-test-pinned flat compile time)."""
    from pyspark.sql import functions as F

    if truncate_out_every < 1:
        raise ValueError(
            f"topo_layers: truncate_out_every must be >= 1, got {truncate_out_every}"
        )
    e = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .filter(F.col("s").isNotNull() & F.col("d").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionAll(e.select(F.col("d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    out_parts = max(nodes.rdd.getNumPartitions(), 1)
    out = None
    since_trunc = 0
    remaining = nodes
    layer = 0
    while layer < max_iters:
        if remaining.limit(1).count() == 0:
            break
        blocked = e.join(remaining.select(F.col("node").alias("s")), "s", "semi").select(
            F.col("d").alias("node")
        ).distinct()
        ready = remaining.join(blocked, "node", "left_anti").select(
            "node", F.lit(layer).alias("layer")
        ).localCheckpoint(eager=True)
        if ready.limit(1).count() == 0:
            stuck = [r["node"] for r in remaining.limit(5).collect()]
            raise ValueError(
                f"topo_layers: cycle detected — no node in the remaining set "
                f"is prerequisite-free (sample: {stuck}); a dependency cycle "
                "cannot be scheduled"
            )
        out = ready if out is None else out.unionAll(ready)
        since_trunc += 1
        if since_trunc >= truncate_out_every:
            out = out.coalesce(out_parts).localCheckpoint(eager=True)
            since_trunc = 0
        remaining = remaining.join(ready.select("node"), "node", "left_anti").localCheckpoint(
            eager=True
        )
        e = e.join(ready.select(F.col("node").alias("s")), "s", "left_anti").localCheckpoint(
            eager=True
        )
        layer += 1
    else:
        raise ValueError(
            f"topo_layers: exceeded max_iters={max_iters} layers — either a "
            "pathologically deep chain or a bug upstream; raise the cap "
            "knowingly"
        )
    if out is None:
        # typed like the non-empty path (the core_numbers empty-case
        # contract): node keeps the input type
        from pyspark.sql.types import IntegerType, StructField, StructType

        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("node", nodes.schema["node"].dataType),
                    StructField("layer", IntegerType()),
                ]
            ),
        )
    return out
