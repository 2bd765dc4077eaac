"""Per-leg deep measurement: run ONE bench leg (or registry query)
with the UI on and print per-stage metrics — input bytes, shuffle
read/write, task time, task count — so the cost of a leg can be
attributed to stages instead of guessed from wall time.

Usage: python scripts/leg_probe.py <leg> [trials]
Legs: any bench.py headline/operator leg name or registry query name.
Timing uses the noop sink for DataFrame legs (guide §1.4) so the
computation is timed, not the sink or a count's column pruning —
EXCEPT when comparing against bench.py numbers (bench times .count();
both are printed).
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF = "/root/testdata/sf0.1"


def main() -> int:
    leg = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from d2d_spark import cache as opcache
    from d2d_spark.session import get_spark

    spark = get_spark(
        "leg-probe",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4057"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    import bench as b
    b.SF_DIR = SF

    # build the runnable: registry query or bench operator leg
    from d2d_spark.plans.registry import load_all
    from d2d_spark.session import read_table

    qs = load_all()
    if leg in qs:
        df_fn = lambda: qs[leg].fn(spark, SF)  # noqa: E731
        runs = {
            "count": lambda: df_fn().count(),
            "noop": lambda: df_fn().write.format("noop").mode("overwrite").save(),
        }
    else:
        import scripts.dump_plans as dp
        legs = dp.bench_only_legs.__wrapped__(spark) if hasattr(dp.bench_only_legs, "__wrapped__") else dp.bench_only_legs(spark)
        legs = {k: v for k, v in legs.items()}
        # patch: dump_plans reads sf0.01; rebuild at bench SF
        dp.SF = SF
        legs = dp.bench_only_legs(spark)
        if leg not in legs:
            print(f"unknown leg {leg}; known: {sorted(set(qs) | set(legs))}")
            return 2
        df_fn = legs[leg]
        runs = {
            "count": lambda: df_fn().count(),
            "noop": lambda: df_fn().write.format("noop").mode("overwrite").save(),
        }

    # warm-up (codegen, parquet footers)
    for t in ("lineitem", "orders", "events", "documents"):
        read_table(spark, SF, t).count()

    ui = sc.uiWebUrl
    with urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=10) as r:
        app = json.loads(r.read())[0]["id"]
    base = f"{ui}/api/v1/applications/{app}"

    def stages():
        with urllib.request.urlopen(f"{base}/stages?status=complete", timeout=10) as r:
            return json.loads(r.read())

    for mode, run in runs.items():
        sc.setJobGroup(f"probe_{mode}", leg)
        before_ids = {s["stageId"] for s in stages()}
        best = float("inf")
        for i in range(trials):
            t0 = time.perf_counter()
            run()
            dt = time.perf_counter() - t0
            best = min(best, dt)
            print(f"[{mode}] trial {i}: {dt:.3f}s", file=sys.stderr)
            if i == 0:
                first_ids = {s["stageId"] for s in stages()} - before_ids
        opcache.release()
        spark.catalog.clearCache()
        new = [s for s in stages() if s["stageId"] in first_ids]
        new.sort(key=lambda s: -s.get("executorRunTime", 0))
        print(f"\n== {leg} [{mode}] best of {trials}: {best:.3f}s; trial-1 stages:")
        tot = dict(run_ms=0, in_b=0, sw=0, sr=0, tasks=0)
        for s in new:
            print(
                f"  stage {s['stageId']:>4} tasks={s['numCompleteTasks']:>4} "
                f"run={s.get('executorRunTime', 0):>7}ms "
                f"in={s.get('inputBytes', 0):>11} "
                f"sw={s.get('shuffleWriteBytes', 0):>10} "
                f"sr={s.get('shuffleReadBytes', 0):>10}  "
                f"{s.get('description') or s.get('name', '')[:80]}"
            )
            tot["run_ms"] += s.get("executorRunTime", 0)
            tot["in_b"] += s.get("inputBytes", 0)
            tot["sw"] += s.get("shuffleWriteBytes", 0)
            tot["sr"] += s.get("shuffleReadBytes", 0)
            tot["tasks"] += s["numCompleteTasks"]
        print(
            f"  TOTAL tasks={tot['tasks']} run={tot['run_ms']}ms "
            f"in={tot['in_b'] / 1e6:.1f}MB sw={tot['sw'] / 1e6:.1f}MB "
            f"sr={tot['sr'] / 1e6:.1f}MB"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
