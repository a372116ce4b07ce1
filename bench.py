"""Benchmark runner (driver contract).

Runs the bench-flagged headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is fully materialized (collect) — results are small
aggregates by construction, so collect measures compute, not transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sm_etl_cloud_run_spark import plans
from sm_etl_cloud_run_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    spark = get_spark("bench")

    # Warmup: run each query once at the smallest SF so whole-stage
    # codegen JIT compilation (measured ~4s for the widest plans) isn't
    # charged to the measured run — the steady-state number is what a
    # long-running cluster sees.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for spec in plans.bench_queries().values():
            try:
                spec.fn(spark, warm_dir).collect()
            except Exception:
                pass
    else:
        spark.range(1).count()

    # min of two measured runs per query: steady-state throughput with
    # less scheduler/GC noise (standard benchmarking practice)
    timings: dict[str, float] = {}
    for name, spec in sorted(plans.bench_queries().items()):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "bench_total_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
