"""Cross-SF oracle check: run every oracled query against DuckDB at a
NON-default scale factor (default sf0.1, 10x the driver's gate) to
prove correctness isn't tuned to one dataset size — tie-breaking,
rounding, and partial-aggregation order all get re-exercised.

Usage: python scripts/crosscheck_sf.py [/root/testdata/sf0.1]
Exit 0 = all match. Quadratic-oracle queries are skipped (the DuckDB
side is O(n^2); Spark sides are covered at the driver's gate SF).
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SKIP = {
    "jaccard_pairs_clusters",
    "embedding_near_pairs",
    "llm_pipeline_end_to_end",  # contains the quadratic pair stage
}


def main() -> int:
    from d2d_spark.plans.registry import load_all
    from d2d_spark.session import get_spark
    from tests.compare_util import compare_query, duck_connect

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("crosscheck")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connect(sf_dir)
    failures = 0
    for name, q in sorted(load_all().items()):
        if q.oracle is None or name in SKIP:
            continue
        try:
            problems = compare_query(spark, con, q, sf_dir)
        except Exception as e:  # noqa: BLE001 - report, keep going
            problems = [f"{type(e).__name__}: {e}"]
        if problems:
            failures += 1
            print(f"FAIL {name}: {problems[0]}")
        else:
            print(f"ok   {name}")
    print(f"{failures} failures at {sf_dir}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
