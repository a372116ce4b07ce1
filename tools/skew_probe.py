"""Skewed-key join probe (VERDICT r2 item 9).

Builds a fact table whose join key is pathologically hot (one key owns
~30% of all rows, remainder zipf-ish over 200k keys) and times three
strategies for fact⋈dim with broadcast disabled (so the shuffle path is
actually exercised):

  plain   — sort-merge join, AQE off: the hot key serializes one task
  aqe     — AQE skew-join splits oversized partitions at runtime
  salted  — operators.joins.salted_join: explicit key salting, AQE off

plus `broadcast` (the right answer when the dim fits) as the floor.
Prints one JSON line per strategy; paste the table into
ARCHITECTURE.md §skew.

Usage: python tools/skew_probe.py [n_fact_millions] (default 4)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sm_etl_cloud_run_spark.operators.joins import salted_join
from sm_etl_cloud_run_spark.session import get_spark

HOT_KEY = 7
N_DIM = 200_000


def build(spark, n_fact: int):
    fact = (
        spark.range(n_fact)
        .select(
            F.when(F.rand(1) < 0.30, F.lit(HOT_KEY))
            .otherwise((F.pow(F.rand(2), 3.0) * N_DIM).cast("long"))  # zipf-ish tail
            .alias("k"),
            (F.rand(3) * 100).alias("v"),
        )
    )
    dim = spark.range(N_DIM).select(F.col("id").alias("k"), (F.col("id") % 97).alias("w"))
    return fact, dim


def run(spark, fact, dim, strategy: str) -> dict:
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1" if strategy != "broadcast" else "64MB")
    spark.conf.set("spark.sql.adaptive.enabled", str(strategy == "aqe").lower())
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(strategy == "aqe").lower())
    t0 = time.monotonic()
    if strategy.startswith("salted"):
        joined = salted_join(fact, dim, "k", salt=int(strategy[6:]))
    elif strategy == "broadcast":
        joined = fact.join(F.broadcast(dim), "k")
    else:
        joined = fact.join(dim, "k")
    out = joined.agg(F.sum(F.col("v") * F.col("w")).alias("s")).collect()[0]["s"]
    wall = round(time.monotonic() - t0, 3)
    return {"strategy": strategy, "sec": wall, "checksum": round(out, 2)}


def main() -> None:
    n = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 4_000_000
    spark = get_spark()
    fact, dim = build(spark, n)
    fact.localCheckpoint()  # materialize once so generation cost is off the clock
    results = []
    for strategy in ("plain", "aqe", "salted8", "salted32", "broadcast"):
        r = run(spark, fact, dim, strategy)
        r["n_fact"] = n
        results.append(r)
        print(json.dumps(r), flush=True)
    base = results[0]["sec"]
    for r in results[1:]:
        print(f"# {r['strategy']}: {base / r['sec']:.2f}x vs plain", flush=True)


if __name__ == "__main__":
    main()
