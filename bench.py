"""Benchmark driver: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line the round driver records as BENCH_r{N}.json.

Headline set = one query per operator family that dominates cost at
scale: scan+agg (Q1), shuffle join, broadcast join, window/top-hits,
dedup (exact + minhash), similarity search, event-time windows. Each
query is forced with a count() so the full plan executes; wall time
is per-query, metric is total seconds across the set.

Measurement discipline (r8): every leg runs under its own Spark job
group, and after each leg's best-of-5 loop ALL operator-registered
cache tags are released — operators that persist per CALL (the
prefix joins' ordered-shingle stage, winnow's fingerprint stage, the
wjac _term_counts stage, the ann fold) would otherwise stack five
persisted copies per leg and squeeze every later leg's memory, which
is exactly the cross-round noise that made a 4x wall-time move
unattributable in r7. Alongside wall time each leg reports shuffle
bytes and executor task time from the UI REST API — shuffle volume
is deterministic for a fixed plan (unlike wall time on a shared
box), so it is the number that flags a REAL plan regression.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# One query per cost-dominant family (names from d2d_spark.plans.*).
HEADLINE = [
    "q1_pricing_summary",
    "join_revenue_by_nation",
    "top_hits_latest_event_per_user",
    "dedup_exact_events",
    "minhash_simhash_pairs",  # r4's minhash_lsh_pairs + simhash legs in one query
    "ann_exact_topk",  # r4's ann_bruteforce_topk + ann_gemm_topk in one query
    "text_stats_lang_quality",
    "windowed_aggs_events",
    "session_windows_per_user",
    "asof_join_click_purchase",
    "rollup_cube_grouping",
    # curation legs: the newest (and most shuffle-heavy) operator
    # families, timed so regressions there are visible per-round
    "paragraph_dedup_documents",
    "semantic_dedup_embeddings",
    "perplexity_filter_documents",
    "duplicate_span_strip_documents",
    "nb_langid_documents",
    # r5: the two newest Python-stage/regex-heavy paths
    "bpe_pack_mix_pipeline",
    "html_clean_gopher_chunk",
]


class _RestMetrics:
    """Per-leg shuffle bytes + executor task time from the UI REST
    API, keyed by Spark job group. Best-effort: any failure (UI off,
    endpoint shape drift) degrades to wall-time-only output rather
    than failing the bench."""

    def __init__(self, spark) -> None:
        self.base = None
        try:
            ui = spark.sparkContext.uiWebUrl
            if not ui:
                return
            apps = self._get(f"{ui}/api/v1/applications")
            self.base = f"{ui}/api/v1/applications/{apps[0]['id']}"
        except Exception:
            self.base = None

    @staticmethod
    def _get(url: str):
        import urllib.request

        with urllib.request.urlopen(url, timeout=10) as r:
            return json.loads(r.read())

    def for_group(self, group: str) -> dict | None:
        if self.base is None:
            return None
        try:
            jobs = self._get(f"{self.base}/jobs")
            stage_ids = set()
            for j in jobs:
                if j.get("jobGroup") == group:
                    stage_ids.update(j.get("stageIds", ()))
            out = {"shuffle_write_bytes": 0, "shuffle_read_bytes": 0,
                   "task_time_ms": 0, "tasks": 0}
            # one attempt per stage, chosen by (COMPLETE first, then
            # highest attempt id) — the listing's attempt order is not
            # guaranteed, and counting a failed attempt's partial
            # bytes would corrupt the one metric meant to be
            # deterministic
            best: dict[int, dict] = {}
            for s in self._get(f"{self.base}/stages"):
                sid = s.get("stageId")
                if sid not in stage_ids:
                    continue
                rank = (s.get("status") == "COMPLETE", s.get("attemptId", 0))
                prev = best.get(sid)
                if prev is None or rank > (
                    prev.get("status") == "COMPLETE", prev.get("attemptId", 0)
                ):
                    best[sid] = s
            for s in best.values():
                out["shuffle_write_bytes"] += s.get("shuffleWriteBytes", 0)
                out["shuffle_read_bytes"] += s.get("shuffleReadBytes", 0)
                out["task_time_ms"] += s.get("executorRunTime", 0)
                out["tasks"] += s.get("numCompleteTasks", 0)
            return out
        except Exception:
            return None


def main() -> int:
    from d2d_spark import cache as opcache
    from d2d_spark.plans.registry import load_all
    from d2d_spark.session import get_spark

    # UI on, bench-only: the REST status API is the shuffle-bytes
    # source; everything else matches the library session exactly
    spark = get_spark(
        "d2d_spark_bench",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4055"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = load_all()
    rest = _RestMetrics(spark)

    # warmup: JVM/codegen/parquet-footer costs land here, not on the
    # first measured query
    from d2d_spark.session import read_table as _rt

    for t in ("lineitem", "events", "documents", "embeddings"):
        _rt(spark, SF_DIR, t).count()
    # warm the Python/Arrow worker pool (mapInPandas forks once per core)
    spark.range(0, spark.sparkContext.defaultParallelism * 4, 1).mapInPandas(
        lambda it: it, "id long"
    ).count()

    timings: dict[str, float] = {}
    leg_metrics: dict[str, dict] = {}
    sc = spark.sparkContext

    trials_default = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "5"))

    def timed_leg(name: str, run, trials: int | None = None) -> None:
        """best-of-N: later runs measure steady state (plans, caches
        and code paths warm); min filters GC/scheduler/host noise,
        which on this box swings single runs up to 3x. After the loop
        EVERY operator-registered cache tag is released so no leg's
        per-call persists (up to N copies) survive into later legs'
        memory budget — the attributability discipline.
        $SPARK_GRAFT_BENCH_TRIALS overrides N for quick local loops;
        per-leg progress goes to stderr (the driver parses stdout)."""
        trials = trials_default if trials is None else trials
        sc.setJobGroup(name, name)
        t_leg = time.perf_counter()
        try:
            best = float("inf")
            done = 0
            # honor SPARK_GRAFT_BENCH_TRIALS=1 exactly (r9 advice):
            # never run more warm-ups than the requested trial count
            for _ in range(min(2, trials)):
                t0 = time.perf_counter()
                run()
                best = min(best, time.perf_counter() - t0)
                done += 1
            # adaptive budget, decided on the WARM trial (the cold
            # one only measures cache/codegen fill and several legs
            # warm 40x): a leg still past 10 s when warm is one of
            # the big composite suites — cap it at 4 trials so the
            # whole bench stays inside the round driver's budget as
            # suites grow legs; everything else keeps best-of-N
            if best > 10.0:
                trials = min(trials, 4)
            for _ in range(max(trials - done, 0)):
                t0 = time.perf_counter()
                run()
                best = min(best, time.perf_counter() - t0)
                done += 1
            timings[name] = round(best, 3)
        finally:
            sc.setJobGroup("bench_idle", "between legs")
            opcache.release()
            # blunt hygiene on top of the tag release: drop ANY stray
            # cache entry and nudge a full GC, so a heavy leg's heap
            # residue (old-gen cache/broadcast remnants) can't tax the
            # NEXT leg — the r9 session measured quiet-box legs 3-8x
            # their isolated warm times purely from this accumulation
            try:
                spark.catalog.clearCache()
                sc._jvm.System.gc()
            except Exception:
                pass
        print(
            f"[bench] {name}: best {timings.get(name)}s, "
            f"{done} trials in {time.perf_counter() - t_leg:.1f}s",
            file=sys.stderr,
        )
        m = rest.for_group(name)
        if m is not None:
            # task/shuffle totals cover ALL N trials (cache effects
            # make trial 1 dominate); deterministic for a fixed plan
            leg_metrics[name] = m

    for name in HEADLINE:
        q = queries.get(name)
        if q is None:
            continue
        timed_leg(name, lambda q=q: q.fn(spark, SF_DIR).count())

    # r5: the exact-threshold dedup scale path (prefix-filter
    # set-similarity join) — timed directly (its registry home,
    # jaccard_pairs_clusters, also carries the quadratic ground truth
    # and the DuckDB-recursion comparison, which would swamp the
    # operator's own cost)
    from pyspark.sql import functions as _F

    from d2d_spark.operators.dedup import (
        containment_prefix_pairs,
        jaccard_prefix_pairs,
        weighted_jaccard_pairs,
    )
    from d2d_spark.operators.graph import triangle_count
    from d2d_spark.operators.quantiles import quantiles_exact
    from d2d_spark.operators.tfidf import _term_counts
    from d2d_spark.operators.winnow import winnow_near_pairs
    from d2d_spark.session import read_table as _rt2

    docs = _rt2(spark, SF_DIR, "documents")
    li = _rt2(spark, SF_DIR, "lineitem")
    orders_df = _rt2(spark, SF_DIR, "orders")
    tri_edges = orders_df.select(
        (_F.col("o_custkey") % 5000).alias("src"),
        (_F.col("o_orderkey") % 5000).alias("dst"),
    )

    timed_leg(
        "jaccard_prefix_pairs",
        lambda: jaccard_prefix_pairs(docs, "text", "doc_id", threshold=0.5).count(),
    )

    # r6/r7 operator legs, timed directly for the same reason: their
    # registry homes carry oracle-replay scaffolding (literal-VALUES
    # subsets, quadratic ground truths) that would swamp operator cost
    r6 = {
        # the fixture corpus is heavily templated (max fingerprint df
        # 2660 over 5000 docs) — max_df=20 is the documented
        # stop-fingerprint dial; the loose default leaves sum(df^2) ~
        # 85M candidate rows on this corpus shape
        "winnow_near_pairs": lambda: winnow_near_pairs(
            docs, "text", "doc_id", k=16, w=8, threshold_pct=50, max_df=20
        ).count(),
        "containment_prefix_pairs": lambda: containment_prefix_pairs(
            docs, "text", "doc_id", threshold=0.8
        ).count(),
        "triangle_count": lambda: triangle_count(tri_edges).count(),
        "quantiles_exact_lineitem": lambda: quantiles_exact(
            li, "l_extendedprice", [0.01, 0.25, 0.5, 0.75, 0.99]
        ).count(),
        # r7: exact weighted Jaccard over tf profiles — same %3 slice
        # + df dial as the driver leg (the cap is corpus-relative: on
        # the FULL 5000-doc corpus df>100 drops the very tokens the
        # planted pairs share and the result is empty)
        "weighted_jaccard_pairs": lambda: weighted_jaccard_pairs(
            _term_counts(docs.filter(_F.col("doc_id") % 3 == 0), "text", "doc_id"),
            "__id", "tok", "tf", threshold_pct=30, max_df=100,
        ).count(),
    }
    for name, run in r6.items():
        timed_leg(name, run)

    # r9: the two heavy r8 operator families' shuffle shapes, timed at
    # full bench SF (their registry homes run literal-oracle slices)
    from d2d_spark.operators.dedup import phonetic_blocked_pairs
    from d2d_spark.operators.join import golden_record

    part_df = _rt2(spark, SF_DIR, "part")
    r9 = {
        # survivorship merge: every rule is an aggregate over ONE
        # groupBy on o_custkey — the golden-record shuffle shape
        "golden_record_orders": lambda: golden_record(
            orders_df,
            ["o_custkey"],
            "o_orderdate",
            {
                "o_totalprice": "max",
                "o_orderstatus": "latest",
                "o_orderpriority": "longest",
                "o_orderkey": "count",
            },
            tiebreak_cols=("o_orderkey",),
        ).count(),
        # phonetic blocking: soundex-code equi-join + thresholded
        # Levenshtein over the full part-name column
        "soundex_fuzzy_part": lambda: phonetic_blocked_pairs(
            part_df.select("p_partkey", "p_name"), "p_name", "p_partkey", max_dist=2
        ).count(),
    }
    # the attribution pair join (conversions x touches-in-lookback per
    # key) and the EM loop (one aggregate per round) are the r9
    # shuffle shapes worth a per-round number
    from d2d_spark.operators.attribution import attribution as _attr
    from d2d_spark.operators.linkage import linkage_em as _lem

    events_df = _rt2(spark, SF_DIR, "events")
    cust_df = _rt2(spark, SF_DIR, "customer")

    def _linkage_run():
        gam = cust_df.select(
            (_F.col("c_custkey") % 2 == 0).cast("int").alias("g0"),
            (_F.col("c_nationkey") % 3 == 0).cast("int").alias("g1"),
            (_F.col("c_acctbal") > 0).cast("int").alias("g2"),
        )
        _lem(gam, ["g0", "g1", "g2"], max_iters=6, validate=False)

    r9["attribution_linear_events"] = lambda: _attr(
        events_df, "user_id", "ts", "event_type", ["purchase"], ["click", "view"],
        model="linear", lookback="48 hours", validate=False,
    ).count()
    r9["linkage_em_customer"] = _linkage_run
    for name, run in r9.items():
        timed_leg(name, run)

    # r10: the stats/eval families timed DIRECTLY so a regression in
    # one of them moves a number that names it (r9 VERDICT #5 — the
    # rollup bench leg's 7-13s swing was many eager stats collects
    # sharing one timer; the suite rebalance moved corr/psi/mi off
    # rollup entirely, and these legs give each family its own timer
    # at full bench SF)
    from d2d_spark.operators.profile import (
        mutual_information as _mi,
        population_stability_index as _psi,
    )
    from d2d_spark.operators.quantiles import weighted_quantiles_exact as _wq
    from d2d_spark.operators.stats import (
        binary_auc as _auc,
        chi2_independence as _chi2,
        corr_matrix as _corr,
        ks_two_sample as _ks,
        ttest_welch as _tt,
    )

    def _stats_tests_run():
        _chi2(orders_df, "o_orderpriority", "o_orderstatus")
        _tt(orders_df, "o_orderstatus", "o_totalprice", "F", "O")
        _ks(orders_df, "o_orderstatus", "o_totalprice", "F", "O")

    def _psi_mi_run():
        bps = [50_000.0, 100_000.0, 150_000.0, 200_000.0, 250_000.0]
        _psi(
            orders_df.filter(_F.col("o_orderkey") % 2 == 0),
            orders_df.filter(_F.col("o_orderkey") % 2 == 1),
            "o_totalprice",
            breakpoints=bps,
        )
        _mi(orders_df, "o_orderpriority", "o_orderstatus")

    r10 = {
        "stats_corr_lineitem": lambda: _corr(
            li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
        ).count(),
        "stats_tests_orders": _stats_tests_run,
        "psi_mi_orders": _psi_mi_run,
        # the newly rotated evaluation ops at full SF: AUC's
        # score-collapse groupBy over a tie-rich integer-cent surface,
        # and the weighted inverse-CDF on the distributed prefix-sum
        "binary_auc_orders": lambda: _auc(
            orders_df.select(
                (_F.col("o_orderkey") % 3 == 0).alias("y"),
                _F.col("o_totalprice").alias("s"),
            ),
            "y",
            "s",
        ),
        "weighted_quantiles_lineitem": lambda: _wq(
            li.filter(_F.col("l_quantity") > 0),
            "l_extendedprice",
            "l_quantity",
            [0.25, 0.5, 0.9, 0.99],
        ).count(),
    }
    for name, run in r10.items():
        timed_leg(name, run)

    # r11: the distributed global-rank primitive at full SF — the
    # value-collapse prefix sum over lineitem prices plus the join
    # back to every row (the plan spearman's global mode and any
    # rank-derived column rides); .count() forces the full join
    from d2d_spark.operators.ranks import rank_global as _rg

    timed_leg(
        "rank_global_lineitem",
        lambda: _rg(li, "l_extendedprice", "avg", "r").count(),
    )

    # End-to-end Migration throughput (rows/s), comparable to the
    # reference's best batched write path (~15.6k rows/s,
    # BASELINE.md): lineitem through read -> transform -> sink.
    import shutil
    import tempfile

    from d2d_spark.migrate import Migration
    from d2d_spark.session import read_table
    from d2d_spark.sources import ParquetConnector

    out_dir = tempfile.mkdtemp(prefix="d2d_bench_mig_")
    try:
        class _Src:
            def read(self, index, **kw):
                return read_table(spark, SF_DIR, index)

            def get_indexes(self):
                return ["lineitem"]

        from pyspark.sql import functions as F

        n_rows = read_table(spark, SF_DIR, "lineitem").count()

        def run_migration():
            Migration(
                _Src(),
                ParquetConnector(out_dir, spark),
                table_from="lineitem",
                mode="overwrite",
                format_data={
                    "net_price": F.col("l_extendedprice") * (1 - F.col("l_discount"))
                },
            ).run()

        # the write leg is the noisiest query on this host
        timed_leg("migration_lineitem", run_migration)
        migration_rows_per_s = round(n_rows / timings["migration_lineitem"])
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "migration_rows_per_s": migration_rows_per_s,
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
    }
    # leg_metrics go on their OWN earlier line: the round driver keeps
    # only the tail of stdout and parses the FINAL line as the bench
    # JSON — inlining the per-leg shuffle/task numbers pushed the r8
    # summary past that window (BENCH_r08 recorded parsed: null)
    if leg_metrics:
        print(json.dumps({"metric": "leg_metrics", "legs": leg_metrics}))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
