"""Incremental job-runner CLI (SURVEY §3, §7.1 M5).

The Spark analog of the reference's HTTP route + dispatch layer
(sm_cloud_run/app.py:22-123 + scripts/verificar_e_executar.py): a job is
addressed by (tipo, ação), gated by the watermark control table, and
idempotent to re-runs. Instead of Flask routes, jobs are plain callables
resolved from a `module:function` path — schedulable by any orchestrator
(Airflow task, cron, spark-submit).

Usage:
    python -m sm_etl_cloud_run_spark.runner \\
        --control /path/sm_metadados_ftp --tipo PA --acao baixar \\
        [--job mypkg.jobs:baixar_pa] [--dry-run]

Without --job, prints the pending control rows (the gate decision) and
exits 0 if nothing is pending — the reference's "skip-if-fresh" reply.
"""

from __future__ import annotations

import argparse
import importlib
import json
import sys
from collections.abc import Callable

from .session import get_spark
from .streaming.incremental import gate_pending_runs


def _resolve(path: str) -> Callable:
    mod_name, _, fn_name = path.partition(":")
    if not fn_name:
        raise SystemExit(f"--job must be module:function, got {path!r}")
    return getattr(importlib.import_module(mod_name), fn_name)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="watermark-gated incremental job runner")
    ap.add_argument("--control", required=True, help="parquet path of the watermark control table")
    ap.add_argument("--tipo", required=True, help="source type key (PA, BI, PS, RD, HB, PF, ...)")
    ap.add_argument("--acao", required=True, choices=["baixar", "inserir"], help="pipeline stage")
    ap.add_argument("--job", help="module:function run per pending control row")
    ap.add_argument(
        "--batch", action="store_true",
        help="call --job ONCE with (spark, all_pending_rows) instead of "
             "once per row — for jobs that parallelize across files "
             "internally (e.g. rehearsal:ep1_baixar_pa_lote, whose "
             "per-file decode tasks run concurrently)",
    )
    ap.add_argument("--dry-run", action="store_true", help="gate only; never execute")
    args = ap.parse_args(argv)

    spark = get_spark("runner")
    control = spark.read.parquet(args.control)
    pending = gate_pending_runs(control, args.acao, tipo=args.tipo)
    rows = [r.asDict() for r in pending.collect()]
    print(json.dumps({"tipo": args.tipo, "acao": args.acao, "pending": len(rows)}, default=str))

    if not rows or args.dry_run or not args.job:
        return 0
    job = _resolve(args.job)
    if args.batch:
        job(spark, rows)
    else:
        for row in rows:
            job(spark, row)
    return 0


if __name__ == "__main__":
    sys.exit(main())
