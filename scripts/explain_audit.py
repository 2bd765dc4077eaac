"""Plan audit: dump formatted plans for the headline queries and flag
scale anti-patterns. Run after adding or changing any operator.

Usage: python scripts/explain_audit.py [query ...]   (default: bench headline set)

Red flags checked:
  - parquet scan with no PushedFilters under a filter-bearing query
  - CartesianProduct / BroadcastNestedLoopJoin where an equi-join was
    intended (allowed only for the documented quadratic baselines)
  - BatchEvalPython (row-at-a-time Python UDF) anywhere
  - missing partial aggregation (single HashAggregate around Exchange)
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF = "/root/testdata/sf0.01"
# quadratic-by-design baselines, exempt from the cross-join flag
ALLOW_NLJ = {
    "jaccard_pairs_clusters",
    "embedding_near_pairs",
    "ann_exact_topk",
    "range_interval_join_suite",  # band/interval joins: non-equi by definition
}

# queries whose plan legitimately carries BroadcastNestedLoopJoin of
# ONE-ROW frames (scalar fold-ins: KMV theta, band dimensions) but
# must still never produce a CartesianProduct. The one-row claim is
# ENFORCED, not trusted: _one_row_bnlj_flags checks every
# IdentityBroadcastMode subtree really is aggregate-bounded.
ALLOW_ONE_ROW_BNLJ = {
    "countmin_freq_estimates",  # kmv theta one-row crossJoins
    "gpt3_quality_score",  # dsir model-total one-row crossJoins
    "token_histogram_documents",  # bm25 N/avgdl one-row crossJoins
}

_EMPTY_KEYS_AGG = re.compile(r"(Hash|Sort|ObjectHash)Aggregate.*\bkeys=\[\]")
_SCAN = re.compile(r"\b(FileScan|LocalTableScan|Scan \w)")


def _indent(line: str) -> int:
    return len(line) - len(line.lstrip(" :+-*("))


def _subtree_end(lines: list[str], i: int) -> int:
    ind = _indent(lines[i])
    j = i + 1
    while j < len(lines) and _indent(lines[j]) > ind:
        j += 1
    return j


def _one_row_bnlj_flags(plan_simple: str) -> list[str]:
    """For a query allowed BNLJ on the one-row-broadcast theory, verify
    the theory: inside every ``BroadcastExchange IdentityBroadcastMode``
    subtree, every scan must sit BELOW an aggregate with empty grouping
    keys (exactly-one-row output) — so the broadcast relation is
    provably scalar-sized, and a future edit that sneaks a real table
    into a nested-loop broadcast gets flagged instead of exempted."""
    lines = [ln for ln in plan_simple.splitlines() if ln.strip()]
    flags = []
    for i, ln in enumerate(lines):
        if "BroadcastExchange IdentityBroadcastMode" not in ln:
            continue
        end = _subtree_end(lines, i)
        aggs = [
            (a, _subtree_end(lines, a))
            for a in range(i + 1, end)
            if _EMPTY_KEYS_AGG.search(lines[a])
        ]
        for s in range(i + 1, end):
            if not _SCAN.search(lines[s]):
                continue
            if not any(a < s < a_end for a, a_end in aggs):
                flags.append(
                    "BNLJ broadcast side scans a real relation with no "
                    f"one-row aggregate above it: {lines[s].strip()[:90]}"
                )
    return flags


def main() -> int:
    from d2d_spark.plans.registry import load_all
    from d2d_spark.session import get_spark

    spark = get_spark("explain-audit", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = load_all()
    names = sys.argv[1:] or [
        "q1_pricing_summary",
        "join_revenue_by_nation",
        "top_hits_latest_event_per_user",
        "dedup_exact_events",
        "windowed_aggs_events",  # incl. funnel fold + retention: user-keyed shuffles only
        "rollup_cube_grouping",
        "partitioned_write_prune",
        "asof_join_click_purchase",
        "semi_anti_exists_customers",  # incl. the decorrelated EXISTS legs
        "fuzzy_name_pairs",      # FastSS deletion path: must be equi-join only
        "ann_lsh_ivf_topk",      # bucket/cell equi-joins, no cartesian
        "minhash_simhash_pairs",  # band equi-joins, ArrowEval only
        "scan_filter_project",
        "semantic_dedup_embeddings",     # within-cell pairs ride the cell equi-join
        "paragraph_dedup_documents",     # fingerprint/doc-id equi-joins only
        "perplexity_filter_documents",   # LM must broadcast into the gram probe
        "token_budget_mix",      # pure filter/explode mix: no join at all
        "pack_and_concat",       # mapInPandas packing: ArrowEval, no Python UDF
        "nb_langid_documents",   # model must broadcast into the token probe
        "duplicate_span_strip_documents",  # one window-hash shuffle, id equi-join back
        "url_normalize_documents",         # codegen scan + one quota-rank shuffle
        "html_clean_gopher_chunk",  # pure Column pipeline: regex/explode over the scan
        "countmin_freq_estimates",  # bounded sketch must BROADCAST into the probe
        "embedding_reduce_project",  # map-only Arrow GEMM: no shuffle at all
        "bloom_seen_filter",     # bitmap probe is map-side: no join, no shuffle
        "gpt3_quality_score",    # model broadcast + one per-doc aggregate
        "fingerprint_dedup_documents",  # winnow pairs: h equi-join only, map-only selection
        "token_histogram_documents",  # bm25 search: term equi-joins, one-row scalar folds
    ]
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    problems = []
    for name in names:
        df = qs[name].fn(spark, SF)
        plan = df._jdf.queryExecution().explainString(mode)
        flags = []
        if "BatchEvalPython" in plan:
            flags.append("row-at-a-time Python UDF")
        if name not in ALLOW_NLJ and (
            "CartesianProduct" in plan
            or ("BroadcastNestedLoopJoin" in plan and name not in ALLOW_ONE_ROW_BNLJ)
        ):
            flags.append("non-equi join")
        if name in ALLOW_ONE_ROW_BNLJ and "BroadcastNestedLoopJoin" in plan:
            simple = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
            )
            flags.extend(_one_row_bnlj_flags(simple))
        print(f"== {name}: {'FLAGS: ' + ', '.join(flags) if flags else 'clean'}")
        for line in plan.splitlines():
            if "PushedFilters" in line or "PartitionFilters" in line:
                print("   ", line.strip()[:140])
        if flags:
            problems.append((name, flags))

    # Curation extension plans (pytest-verified, outside the registry
    # window) — each with a positive shape assertion, not just the
    # absence of red flags.
    from d2d_spark.operators.decontam import decontaminate
    from d2d_spark.operators.sampling import stratified_sample
    from d2d_spark.session import read_table

    docs = read_table(spark, SF, "documents")
    bench_set = docs.filter("doc_id % 7 = 0").select("text")
    extras = {
        # benchmark gram set must BROADCAST into the corpus probe —
        # a sort-merge join here would shuffle the whole corpus
        "decontaminate": (
            decontaminate(docs, bench_set, n=5),
            lambda p: [] if "BroadcastHashJoin" in p and "SortMergeJoin" not in p
            else ["benchmark probe not broadcast"],
        ),
        # sampling/mixing are pure filters: ANY exchange is a bug
        "stratified_sample": (
            stratified_sample(docs, "source", {"web": 0.5}, key_col="doc_id", default_fraction=0.1),
            lambda p: [] if "Exchange" not in p else ["sampling shuffled"],
        ),
        # equi-joins only: a cartesian in the paragraph rebuild would
        # be quadratic in corpus paragraphs
        "paragraph_dedup": (
            __import__("d2d_spark.operators.dedup", fromlist=["paragraph_dedup"]).paragraph_dedup(
                docs, "text", "doc_id", sep="\n"
            ),
            lambda p: [] if "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
            else ["non-equi join in paragraph dedup"],
        ),
        # image near-dups must ride the pigeonhole chunk equi-join —
        # and the hash must be pure Columns (no Python stage at all)
        "phash_near_pairs": (
            __import__("d2d_spark.operators.phash", fromlist=["phash_near_pairs"]).phash_near_pairs(
                docs.selectExpr(
                    "doc_id AS img_id",
                    "transform(sequence(1, 192), i -> CAST(ascii(substr(text, ((i - 1) % length(text)) + 1, 1)) AS INT)) AS px",
                    "CAST(16 AS INT) AS w",
                    "CAST(12 AS INT) AS h",
                ),
                "img_id", "px", "w", "h", max_hamming=4,
            ),
            lambda p: [] if "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
            and "ArrowEvalPython" not in p
            else ["image near-dup join not a pure-Column equi-join"],
        ),
        # within-cell pairs must ride the cell equi-join — a cartesian
        # here is the exact corpus-quadratic stage SemDeDup avoids
        "semantic_near_pairs": (
            __import__("d2d_spark.operators.semantic", fromlist=["semantic_near_pairs"]).semantic_near_pairs(
                read_table(spark, SF, "embeddings"), "vec_id", "embedding",
                n_centroids=8, sample=500,
            ),
            lambda p: [] if "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
            else ["non-equi join in semantic dedup"],
        ),
    }
    # r5 additions
    from d2d_spark.operators.dedup import jaccard_prefix_pairs
    from d2d_spark.operators.sampling import chunk_by_sentences
    from d2d_spark.operators.scd import scd2_history
    from d2d_spark.operators.tfidf import bm25_scores

    events = read_table(spark, SF, "events")
    extras.update(
        {
            # candidates must come from prefix-token equi-joins — a
            # cartesian here would be the quadratic this operator
            # exists to avoid; the whole pipeline is pure Column
            "jaccard_prefix_pairs": (
                jaccard_prefix_pairs(docs, "text", "doc_id", threshold=0.5),
                lambda p: []
                if "CartesianProduct" not in p
                and "BroadcastNestedLoopJoin" not in p
                and "ArrowEvalPython" not in p
                else ["prefix join not a pure-Column equi-join"],
            ),
            # the link-graph degree pass: node-keyed hash aggregates
            # joined hash-wise, nothing Python, no cartesian (the
            # page_rank loop reuses exactly these shapes per round,
            # plus the deliberate one-row dangling-mass broadcast;
            # its iterative plan truncates, so the round shape is
            # audited here on the same primitives)
            "degree_stats": (
                __import__(
                    "d2d_spark.operators.graph", fromlist=["degree_stats"]
                ).degree_stats(
                    events.selectExpr(
                        "CAST(user_id AS STRING) AS src", "event_type AS dst"
                    )
                ),
                lambda p: []
                if "HashAggregate" in p
                and "CartesianProduct" not in p
                and "EvalPython" not in p
                else ["degree pass not a pure hash-agg/join pipeline"],
            ),
            # type-2 history is ONE key-partitioned window shuffle:
            # both window functions must reuse a single Exchange
            # (count the node headers, not every mention of the word)
            "scd2_history": (
                scd2_history(events, ["user_id"], "ts", ["event_type"], ["event_id"]),
                lambda p: []
                if "Window" in p
                and len(re.findall(r"\+- Exchange", p)) == 1
                else [
                    "scd2 expected exactly one Exchange node, plan has "
                    f"{len(re.findall(r'[+]- Exchange', p))}"
                ],
            ),
            # sentence chunking is a per-row Column fold: ANY exchange
            # (or Python stage) is a bug
            "chunk_by_sentences": (
                chunk_by_sentences(docs, "text", "doc_id", max_chars=512),
                lambda p: []
                if "Exchange" not in p and "EvalPython" not in p
                else ["sentence chunking shuffled or left the JVM"],
            ),
            # BM25 scoring: aggregates only, no Python, no cartesian
            "bm25_scores": (
                bm25_scores(docs, "text", "doc_id", ["the", "data"]),
                lambda p: []
                if "CartesianProduct" not in p
                and "EvalPython" not in p
                and "HashAggregate" in p
                else ["bm25 not a pure aggregate pipeline"],
            ),
        }
    )
    for name, (df, check) in extras.items():
        plan = df._jdf.queryExecution().explainString(mode)
        flags = check(plan)
        if "BatchEvalPython" in plan:
            flags.append("row-at-a-time Python UDF")
        print(f"== {name}: {'FLAGS: ' + ', '.join(flags) if flags else 'clean'}")
        if flags:
            problems.append((name, flags))

    total = len(names) + len(extras)
    print(f"\n{total - len(problems)}/{total} plans clean")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
