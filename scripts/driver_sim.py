"""Simulate the driver's correctness gate against __spark_entry__.py.

Usage: python scripts/driver_sim.py [query_name ...]
With no args, checks entry() plus every oracled query at sf0.01.
Exit code 0 = everything matches the DuckDB oracle.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF = "/root/testdata/sf0.01"


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from tests.compare_util import duck_connect, compare_query
    from d2d_spark.plans.registry import load_all

    rows = e.entry(spark).collect()
    print(f"entry(): {len(rows)} rows")
    assert rows, "entry() returned no rows"

    names = sys.argv[1:] or [n for n, q in load_all().items() if q.oracle]
    con = duck_connect(SF)
    failed = []
    for name in names:
        q = load_all()[name]
        t0 = time.time()
        # per-query isolation: one broken query must report ERROR and
        # let the rest run, mirroring the real driver
        try:
            if q.oracle is None:
                n = q.fn(spark, SF).count()
                print(f"{name}: rows-only check, {n} rows")
                continue
            problems = compare_query(spark, con, q, SF)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR ({time.time() - t0:.1f}s)")
            print(f"  {type(exc).__name__}: {exc}".splitlines()[0][:300])
            failed.append(name)
            continue
        status = "OK" if not problems else "MISMATCH"
        print(f"{name}: {status} ({time.time() - t0:.1f}s)")
        for p in problems:
            print(f"  {p}")
        if problems:
            failed.append(name)
    print(f"{len(names) - len(failed)}/{len(names)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
