"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every registered query on Spark and its oracle on DuckDB over the
same parquet tables, then compares row count, column names/order, and
values (order-insensitive exact comparison — stricter than a hash).

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sm_etl_cloud_run_spark import plans
from sm_etl_cloud_run_spark.cache import release_tracked
from sm_etl_cloud_run_spark.session import get_spark
from sm_etl_cloud_run_spark.tables import TABLE_NAMES


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            # canonicalize NA first: Spark surfaces SQL NULL as None,
            # DuckDB as numpy nan — astype(str) would spell them
            # 'None' vs 'nan' and flag a phantom mismatch.
            df[c] = df[c].where(pd.notna(df[c]), None).astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _values_equal(a, b) -> bool:
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_df) != len(duck_df):
        problems.append(f"row count: spark={len(spark_df)} duck={len(duck_df)}")
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        problems.append(f"columns: spark={sc} duck={dc}")
        return problems
    if problems:
        return problems
    a, b = _normalize(spark_df), _normalize(duck_df)
    # Driver-hash fidelity: the driver's value hash is dtype-sensitive —
    # DuckDB HUGEINT surfaces as float64 in pandas while Spark longs stay
    # int64, so 123 vs 123.0 hash-differ even though they compare equal.
    for c in a.columns:
        ak, bk = a[c].dtype.kind, b[c].dtype.kind
        if {ak, bk} == {"i", "f"} or {ak, bk} == {"u", "f"}:
            problems.append(
                f"col {c}: dtype mismatch spark={a[c].dtype} duck={b[c].dtype}"
                " (driver hash would differ — cast the oracle aggregate)"
            )
    if problems:
        return problems
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(av, bv)) if not _values_equal(x, y)
        ]
        if bad:
            i, x, y = bad[0]
            problems.append(f"col {c}: {len(bad)}/{len(av)} mismatches, first @{i}: spark={x!r} duck={y!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("parity-check")
    con = _duck(sf_dir)
    registry = plans.all_queries()
    failures = 0
    for name, spec in sorted(registry.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        finally:
            release_tracked()
        if spec.oracle is None:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            if len(sdf) == 0:
                print(f"     WARNING: {name} returned 0 rows")
            continue
        try:
            ddf = con.execute(spec.oracle).fetchdf()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL {name} ({len(sdf)} vs {len(ddf)} rows):")
            for p in problems:
                print(f"     {p}")
        else:
            mark = "ok  " if len(sdf) else "ok? "  # 0-row matches are trivial — verify the query isn't filtered to nothing
            print(f"{mark} {name}: {len(sdf)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{failures} failures / {len([n for n in registry if not only or n in only])} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
