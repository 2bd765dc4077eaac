"""Quiet-box A/B for the migration bench leg (VERDICT r10 #3): run
the zero-shuffle lineitem write N times in one session, record wall
time AND per-trial executor task time (REST stage API, per job
group), alongside the host load average — so a wall/task-time swing
can be attributed to phantom host load vs a real write-path change.

Usage: python scripts/mig_ab.py [N_TRIALS]
Prints one JSON line per trial + a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import shutil
    import tempfile

    from bench import _RestMetrics
    from d2d_spark.migrate import Migration
    from d2d_spark.session import get_spark, read_table
    from d2d_spark.sources import ParquetConnector
    from pyspark.sql import functions as F

    spark = get_spark(
        "d2d_mig_ab",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4056"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    rest = _RestMetrics(spark)
    sc = spark.sparkContext

    class _Src:
        def read(self, index, **kw):
            return read_table(spark, SF_DIR, index)

        def get_indexes(self):
            return ["lineitem"]

    n_rows = read_table(spark, SF_DIR, "lineitem").count()
    out_dir = tempfile.mkdtemp(prefix="d2d_mig_ab_")
    results = []
    try:
        for t in range(trials):
            tag = f"mig_ab_{t}"
            sc.setJobGroup(tag, tag)
            load0 = os.getloadavg()
            t0 = time.perf_counter()
            Migration(
                _Src(),
                ParquetConnector(out_dir, spark),
                table_from="lineitem",
                mode="overwrite",
                format_data={
                    "net_price": F.col("l_extendedprice") * (1 - F.col("l_discount"))
                },
            ).run()
            wall = time.perf_counter() - t0
            m = rest.for_group(tag) or {}
            row = {
                "trial": t,
                "wall_s": round(wall, 3),
                "rows_per_s": round(n_rows / wall),
                "task_time_ms": m.get("task_time_ms"),
                "tasks": m.get("tasks"),
                "shuffle_write_bytes": m.get("shuffle_write_bytes"),
                "loadavg_1m": round(load0[0], 2),
            }
            results.append(row)
            print(json.dumps(row), flush=True)
        walls = sorted(r["wall_s"] for r in results)
        tts = sorted(r["task_time_ms"] or 0 for r in results)
        print(
            json.dumps(
                {
                    "summary": True,
                    "n": trials,
                    "rows": n_rows,
                    "wall_min": walls[0],
                    "wall_med": walls[len(walls) // 2],
                    "wall_max": walls[-1],
                    "best_rows_per_s": round(n_rows / walls[0]),
                    "task_ms_min": tts[0],
                    "task_ms_med": tts[len(tts) // 2],
                    "task_ms_max": tts[-1],
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
