"""Bench regression guard (VERDICT r2 item 7).

Runs ``bench.py`` exactly as the driver does, then compares per-query
wall seconds against the committed floors in ``tools/bench_floor.json``.
Exit non-zero when:

- ``bench.py`` itself exits non-zero or prints no parseable JSON line
  (this alone would have caught the round-2 bench crash immediately);
- any floored query exceeds ``ratio_limit`` x its floor;
- a floored query disappears from the bench output.

New queries without a floor are reported but do not fail (add a floor
once their time is accepted).

Usage: python tools/bench_guard.py [--sf-dir DIR] [--from-json FILE]
``--from-json`` skips the run and validates an existing BENCH_r*.json
(either the raw driver record with a "parsed" key, or bench.py's own
output line).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(sf_dir: str | None) -> dict:
    env = dict(os.environ)
    if sf_dir:
        env["SPARK_GRAFT_SF_DIR"] = sf_dir
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env,
    )
    if proc.returncode != 0:
        print(proc.stdout[-2000:])
        print(proc.stderr[-4000:], file=sys.stderr)
        print(f"FAIL: bench.py exited rc={proc.returncode}")
        sys.exit(1)
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    print("FAIL: bench.py produced no parseable JSON line")
    sys.exit(1)


def _load_json(path: str) -> dict:
    with open(path) as f:
        rec = json.load(f)
    if "parsed" in rec:  # driver BENCH_r*.json wrapper
        if rec.get("rc", 0) != 0 or rec["parsed"] is None:
            print(f"FAIL: {path} records rc={rec.get('rc')} parsed={rec['parsed'] is not None}")
            sys.exit(1)
        return rec["parsed"]
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=None)
    ap.add_argument("--from-json", default=None)
    args = ap.parse_args()

    with open(os.path.join(REPO, "tools", "bench_floor.json")) as f:
        floor_doc = json.load(f)
    floors: dict[str, float] = floor_doc["queries"]
    limit: float = floor_doc["ratio_limit"]

    result = _load_json(args.from_json) if args.from_json else _run_bench(args.sf_dir)
    timings: dict[str, float] = result.get("queries", {})

    failures: list[str] = []
    for name, floor in sorted(floors.items()):
        if name not in timings:
            failures.append(f"{name}: missing from bench output (floor {floor}s)")
            continue
        got = timings[name]
        ratio = got / floor if floor else float("inf")
        status = "FAIL" if ratio > limit else "ok"
        print(f"{status:4} {name:38} {got:7.3f}s  floor {floor:6.3f}s  ratio {ratio:.2f}x")
        if ratio > limit:
            failures.append(f"{name}: {got:.3f}s > {limit}x floor {floor:.3f}s")
    for name in sorted(set(timings) - set(floors)):
        print(f"new  {name:38} {timings[name]:7.3f}s  (no floor — add one once accepted)")

    total = result.get("value")
    print(f"total {total}s over {len(timings)} queries")
    if failures:
        print("\nFAIL:")
        for f_ in failures:
            print(f"  {f_}")
        sys.exit(1)
    print("PASS: no query above its floor ratio")


if __name__ == "__main__":
    main()
