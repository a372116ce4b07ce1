"""One-shot snapshot verification: pytest + oracle parity (both SFs) +
bench guard + vanilla driver contract, with a single PASS/FAIL summary.

Usage: python tools/verify_all.py [--skip-bench] [--skip-tests]
Exit code 0 iff every selected stage passed. This is the end-of-round
checklist ROUND_NOTES records, automated.
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd: list[str], env: dict | None = None) -> tuple[int, str]:
    proc = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO,
        env={**os.environ, **(env or {})},
    )
    return proc.returncode, proc.stdout + proc.stderr


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--skip-tests", action="store_true")
    args = ap.parse_args(argv)

    results: list[tuple[str, bool, str]] = []

    def stage(name: str, ok: bool, detail: str) -> None:
        results.append((name, ok, detail))
        print(f"[{'PASS' if ok else 'FAIL'}] {name}: {detail}", flush=True)

    if not args.skip_tests:
        t0 = time.time()
        rc, out = _run([sys.executable, "-m", "pytest", "tests/", "-q", "-x"])
        m = re.search(r"(\d+) passed", out)
        stage("pytest", rc == 0,
              f"{m.group(0) if m else 'no summary'} ({time.time() - t0:.0f}s)")

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rc, out = _run([sys.executable, "tools/check_parity.py", sf])
        m = re.search(r"(\d+) failures / (\d+) queries", out)
        ok = rc == 0 and m is not None and m.group(1) == "0"
        stage(f"parity {os.path.basename(sf)}", ok, m.group(0) if m else "no summary")

    if not args.skip_bench:
        rc, out = _run([sys.executable, "tools/bench_guard.py"])
        m = re.search(r"total [\d.]+s over \d+ queries", out)
        stage("bench_guard", rc == 0, m.group(0) if m else out.strip()[-120:])

    rc, out = _run([
        sys.executable, "-c",
        "import importlib.util as u;"
        "s=u.spec_from_file_location('e', '__spark_entry__.py');"
        "m=u.module_from_spec(s); s.loader.exec_module(m);"
        "from pyspark.sql import SparkSession;"
        "sp=SparkSession.builder.master('local[4]').getOrCreate();"
        "print('CONTRACT', len(m.entry(sp).collect()),"
        " len(m.queries()), len(m.oracle_sql()))",
    ])
    m = re.search(r"CONTRACT (\d+) (\d+) (\d+)", out)
    stage("driver contract", rc == 0 and m is not None,
          f"entry {m.group(1)} rows, {m.group(2)} queries, {m.group(3)} oracles"
          if m else "failed")

    failed = [n for n, ok, _ in results if not ok]
    print("SUMMARY:", "PASS" if not failed else f"FAIL ({', '.join(failed)})")
    return 0 if not failed else 1


if __name__ == "__main__":
    raise SystemExit(main())
