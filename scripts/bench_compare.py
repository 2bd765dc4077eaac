"""Compare two bench JSON records leg-by-leg and classify movers.

Usage: python scripts/bench_compare.py BENCH_r07.json BENCH_r08.json

Wall time on a shared box swings up to 3x with machine state, so a
wall-time move alone is not evidence of a regression. Shuffle bytes
(recorded per leg since r8) are a property of the PLAN — deterministic
for a fixed fixture — so the classification is:

  PLAN CHANGE    shuffle bytes moved >10% (wall move is explained —
                 inspect whether the new plan is intended)
  HOST NOISE     wall moved >1.5x but shuffle bytes flat (the r7
                 jaccard_prefix_pairs signature; ignore)
  FLAT           neither moved meaningfully
  NO METRICS     one side lacks leg_metrics (pre-r8 record) — wall
                 ratio reported, unattributable by design

Only legs present in BOTH records compare (renamed/added legs are
listed, not compared — the r5 lesson: a renamed leg with added work
reads as a fake regression).
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    a = json.loads(open(sys.argv[1]).read())
    b = json.loads(open(sys.argv[2]).read())
    # the round driver wraps bench's JSON line under "parsed"
    a = a.get("parsed", a)
    b = b.get("parsed", b)
    qa, qb = a.get("queries", {}), b.get("queries", {})
    ma, mb = a.get("leg_metrics", {}), b.get("leg_metrics", {})
    shared = sorted(set(qa) & set(qb))
    only_a, only_b = sorted(set(qa) - set(qb)), sorted(set(qb) - set(qa))
    print(f"{'leg':34} {'wall':>14} {'shuffle_bytes':>26}  verdict")
    total_a = total_b = 0.0
    for name in shared:
        wa, wb = qa[name], qb[name]
        total_a += wa
        total_b += wb
        wall = f"{wa:.2f}->{wb:.2f}s"
        sa = ma.get(name, {}).get("shuffle_write_bytes")
        sb = mb.get(name, {}).get("shuffle_write_bytes")
        if sa is None or sb is None:
            verdict = "NO METRICS" if max(wa, wb) > 1.5 * min(wa, wb) else "flat"
            sh = "-"
        else:
            sh = f"{sa}->{sb}"
            moved_sh = max(sa, sb) > 1.1 * min(sa, sb) + 1024
            moved_wall = max(wa, wb) > 1.5 * min(wa, wb)
            verdict = (
                "PLAN CHANGE" if moved_sh
                else "HOST NOISE" if moved_wall
                else "flat"
            )
        print(f"{name:34} {wall:>14} {sh:>26}  {verdict}")
    if shared and total_a > 0:
        print(f"\nshared-leg totals: {total_a:.2f}s -> {total_b:.2f}s "
              f"({(total_b - total_a) / total_a * 100:+.0f}%) over {len(shared)} legs")
    else:
        print("\nno shared legs to compare")
    if only_a:
        print(f"only in {sys.argv[1]}: {', '.join(only_a)}")
    if only_b:
        print(f"only in {sys.argv[2]}: {', '.join(only_b)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
