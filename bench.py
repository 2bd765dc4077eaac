"""Benchmark driver: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line the round driver records as BENCH_r{N}.json.

Headline set = one query per operator family that dominates cost at
scale: scan+agg (Q1), shuffle join, broadcast join, window/top-hits,
dedup (exact + minhash), similarity search, event-time windows. Each
query is forced with a count() so the full plan executes; wall time
is per-query, metric is total seconds across the set.
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
    "join_broadcast_part",
    "top_hits_latest_event_per_user",
    "dedup_exact_events",
    "minhash_lsh_pairs",
    "ann_bruteforce_topk",
    "text_stats_documents",
    "tumbling_hourly_events",
    "session_windows_per_user",
]


def main() -> int:
    from d2d_spark.plans.registry import load_all
    from d2d_spark.session import get_spark

    spark = get_spark("d2d_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = load_all()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = queries.get(name)
        if q is None:
            continue
        t0 = time.perf_counter()
        q.fn(spark, SF_DIR).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
