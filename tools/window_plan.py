#!/usr/bin/env python
"""Print the driver-window plan and the multi-round rotation forecast.

The plan itself is computed by ``sm_etl_cloud_run_spark.plans.
window_plan`` (the same function ``plans.all_queries()`` uses, so what
this prints IS what the driver will check). The forecast simulates
future rounds under the stale-first policy: each simulated round
greens its window, and the histogram shows how the ledger's oldest
round advances — the written rotation plan VERDICT r9 item 4 asks for,
kept executable instead of prose.

Usage: python tools/window_plan.py [--forecast N]
"""

from __future__ import annotations

import argparse
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sm_etl_cloud_run_spark import plans  # noqa: E402
from sm_etl_cloud_run_spark.plans.registry import _REGISTRY  # noqa: E402
from sm_etl_cloud_run_spark.plans.window_plan import (  # noqa: E402
    FORCE_RECHECK,
    WINDOW_SIZE,
    last_green,
    planned_order,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--forecast", type=int, default=6,
                    help="simulate this many future driver rounds")
    args = ap.parse_args()

    # registration order is the plan's tie-break baseline — the
    # forecast below must re-plan from IT each simulated round, not
    # from the already-planned yield order (ADVICE r10: planned
    # positions as tie-breaks diverge from what all_queries() yields).
    registered = list(_REGISTRY)
    greens = last_green()
    order = planned_order(registered, greens)
    assert order == list(plans.all_queries()), (
        "plans.all_queries() diverges from the plan")

    cur_round = max(greens.values(), default=0)
    window = order[:WINDOW_SIZE]
    print(f"registry: {len(order)} queries; window: {WINDOW_SIZE}; "
          f"latest ledger round: r{cur_round}")
    print(f"force-recheck: {list(FORCE_RECHECK)}")
    hist = Counter(greens.get(n, 0) for n in order)
    print("last-green histogram (0=never):",
          dict(sorted(hist.items())))
    print(f"\nwindow for r{cur_round + 1} (the first {WINDOW_SIZE} of "
          "plans.all_queries()):")
    for i, name in enumerate(window):
        tag = ("never" if name not in greens
               else "forced" if name in FORCE_RECHECK
               else f"r{greens[name]}")
        print(f"  {i + 1:2d}. {name}  [{tag}]")

    # rotation forecast: green each simulated window, re-plan
    sim = dict(greens)
    print("\nrotation forecast (stale-first, no new registrations):")
    for k in range(1, args.forecast + 1):
        rnd = cur_round + k
        w = planned_order(
            registered, sim, FORCE_RECHECK if k == 1 else ()
        )[:WINDOW_SIZE]
        for name in w:
            sim[name] = rnd
        oldest = min(sim.get(n, 0) for n in registered)
        h = Counter(sim.get(n, 0) for n in registered)
        print(f"  after r{rnd}: oldest last-green r{oldest}, "
              f"age {rnd - oldest}; histogram {dict(sorted(h.items()))}")


if __name__ == "__main__":
    main()
