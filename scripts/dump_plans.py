"""Dump .explain("formatted") for declared queries to plans/<tag>/.

Usage: python scripts/dump_plans.py <tag> <suffix> [query ...]
  tag     -> plans/<tag>/ directory (e.g. r11)
  suffix  -> file suffix (before / after)
With no query names, dumps every registry query plus the bench-only
operator legs (same call shapes bench.py times).

The judge reads these files to check plan claims (Exchange count,
join strategy, PushedFilters, Python eval nodes) against the code.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF = "/root/testdata/sf0.01"


def bench_only_legs(spark):
    """The operator legs bench.py times directly (not via the registry),
    reproduced with identical call shapes so their plans are auditable."""
    from pyspark.sql import functions as F

    from d2d_spark.operators.dedup import (
        containment_prefix_pairs,
        jaccard_prefix_pairs,
        phonetic_blocked_pairs,
        weighted_jaccard_pairs,
    )
    from d2d_spark.operators.graph import triangle_count
    from d2d_spark.operators.join import golden_record
    from d2d_spark.operators.quantiles import quantiles_exact, weighted_quantiles_exact
    from d2d_spark.operators.ranks import rank_global
    from d2d_spark.operators.stats import corr_matrix
    from d2d_spark.operators.tfidf import _term_counts
    from d2d_spark.operators.winnow import winnow_near_pairs
    from d2d_spark.session import read_table

    docs = read_table(spark, SF, "documents")
    li = read_table(spark, SF, "lineitem")
    orders_df = read_table(spark, SF, "orders")
    part_df = read_table(spark, SF, "part")
    tri_edges = orders_df.select(
        (F.col("o_custkey") % 5000).alias("src"),
        (F.col("o_orderkey") % 5000).alias("dst"),
    )
    return {
        "jaccard_prefix_pairs": lambda: jaccard_prefix_pairs(
            docs, "text", "doc_id", threshold=0.5
        ),
        "winnow_near_pairs": lambda: winnow_near_pairs(
            docs, "text", "doc_id", k=16, w=8, threshold_pct=50, max_df=20
        ),
        "containment_prefix_pairs": lambda: containment_prefix_pairs(
            docs, "text", "doc_id", threshold=0.8
        ),
        "triangle_count": lambda: triangle_count(tri_edges),
        "quantiles_exact_lineitem": lambda: quantiles_exact(
            li, "l_extendedprice", [0.01, 0.25, 0.5, 0.75, 0.99]
        ),
        "weighted_jaccard_pairs": lambda: weighted_jaccard_pairs(
            _term_counts(docs.filter(F.col("doc_id") % 3 == 0), "text", "doc_id"),
            "__id", "tok", "tf", threshold_pct=30, max_df=100,
        ),
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
        ),
        "soundex_fuzzy_part": lambda: phonetic_blocked_pairs(
            part_df.select("p_partkey", "p_name"), "p_name", "p_partkey", max_dist=2
        ),
        "attribution_linear_events": lambda: __import__(
            "d2d_spark.operators.attribution", fromlist=["attribution"]
        ).attribution(
            read_table(spark, SF, "events"),
            "user_id", "ts", "event_type", ["purchase"], ["click", "view"],
            model="linear", lookback="48 hours", validate=False,
        ),
        "stats_corr_lineitem": lambda: corr_matrix(
            li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
        ),
        "weighted_quantiles_lineitem": lambda: weighted_quantiles_exact(
            li.filter(F.col("l_quantity") > 0),
            "l_extendedprice",
            "l_quantity",
            [0.25, 0.5, 0.9, 0.99],
        ),
        "rank_global_lineitem": lambda: rank_global(
            li, "l_extendedprice", "avg", "r"
        ),
    }


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    out_dir = REPO / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)

    from d2d_spark.plans.registry import load_all
    from d2d_spark.session import get_spark

    spark = get_spark("dump-plans", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = load_all()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    legs = bench_only_legs(spark)

    if not names:
        names = list(qs) + list(legs)
    for name in names:
        try:
            if name in qs:
                df = qs[name].fn(spark, SF)
            else:
                df = legs[name]()
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            continue
        path = out_dir / f"{name}_{suffix}.txt"
        path.write_text(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {len(plan.splitlines())} lines, {n_ex} Exchange -> {path.name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
