"""Optimization-round harness: per-query plan capture + isolated timing.

Usage:
  python tools/opt_profile.py explain <suffix> [names...]
      Write .explain("formatted") for each query (default: bench set)
      to plans/$SPARK_GRAFT_PLANS_ROUND/<name>_<suffix>.txt (default
      r13). NOTE: plan capture may execute builder-embedded collects
      (seed lookups, _qt_fit statistics) at the configured SF — it is
      not free (ADVICE r12 item 3).
  python tools/opt_profile.py time [names...]
      Isolated timing at $SPARK_GRAFT_SF_DIR (default sf0.1): warm at
      sf0.001 first (codegen JIT), then min-of-3 with the noop sink
      (guide 1.4 — times the computation, not result transfer), with
      release_tracked between queries (cold-cache per rep, stricter
      than bench's hot-cache steady state; use bench.py for the
      driver-comparable number).
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sm_etl_cloud_run_spark import plans  # noqa: E402
from sm_etl_cloud_run_spark.cache import release_tracked  # noqa: E402
from sm_etl_cloud_run_spark.session import get_spark  # noqa: E402

PLANS_DIR = os.path.join(
    REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13")
)


def _specs(names: list[str]):
    if names:
        return [(n, plans.get(n)) for n in names]
    return sorted(plans.bench_queries().items())


def explain_cmd(suffix: str, names: list[str]) -> None:
    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = get_spark("opt_profile")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name, spec in _specs(names):
        t0 = time.perf_counter()
        try:
            df = spec.fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # plan build itself failed — record it
            text = f"PLAN BUILD FAILED: {exc!r}\n"
        release_tracked()
        path = os.path.join(PLANS_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"{name}: {len(text)} bytes ({time.perf_counter() - t0:.1f}s)",
              flush=True)


def time_cmd(names: list[str], reps: int = 3) -> None:
    spark = get_spark("opt_profile")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.001"
    specs = _specs(names)
    for name, spec in specs:
        if os.path.isdir(warm_dir) and warm_dir != sf_dir:
            try:
                spec.fn(spark, warm_dir).collect()
            except Exception:
                pass
            release_tracked()
    results = {}
    for name, spec in specs:
        ts = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"opt_profile: {name}")
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
            release_tracked()
        spark.sparkContext.setJobDescription(None)
        results[name] = round(min(ts), 3)
        print(f"{name}: min {min(ts):.3f}s  all {[round(t, 3) for t in ts]}",
              flush=True)
    print("TOTAL(min):", round(sum(results.values()), 3))


if __name__ == "__main__":
    if len(sys.argv) < 2 or sys.argv[1] not in {"explain", "time"}:
        print(__doc__)
        raise SystemExit(2)
    if sys.argv[1] == "explain":
        explain_cmd(sys.argv[2], sys.argv[3:])
    else:
        time_cmd(sys.argv[2:])
