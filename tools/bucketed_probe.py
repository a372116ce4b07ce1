"""Measure what bucketing buys: repeated joins/aggs on the bucket key.

Writes orders+lineitem from $SPARK_GRAFT_SF_DIR (default sf0.1),
key-replicated so the join is fact-to-fact sized (never broadcast),
as bucketed catalog tables, then times a join+wide-agg pipeline over
(a) the bucketed tables and (b) the same files read layout-blind,
sort-merge forced both ways. Runs are INTERLEAVED b,s,b,s,... after a
warm-up pass of each — a sequential A-then-B measurement hands B the
page cache A paid for, and on this host a single cold/stalled run can
swing 5x (playbook rule: never trust one number).

Reads shuffle-write bytes per run from the app status store: that is
the number that scales — a local[32] shuffle is an in-memory copy, but
on a 1000-executor cluster those bytes are the network, so "shuffle
bytes eliminated" is the honest 100 TB claim and the local wall-clock
delta is the lower bound of the win.

Usage: python tools/bucketed_probe.py [n_buckets] [replicas]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from sm_etl_cloud_run_spark.session import get_spark  # noqa: E402
from sm_etl_cloud_run_spark.sinks import (  # noqa: E402
    enable_sorted_bucket_scan,
    plan_has_exchange,
    write_bucketed,
)


def total_shuffle_write_bytes(spark) -> int:
    """Cumulative shuffle-write bytes across all completed stages."""
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    empty = sc._jvm.java.util.ArrayList()
    defaults = [getattr(store, f"stageList$default${i}")() for i in (2, 3, 4, 5)]
    stages = store.stageList(empty, *defaults)
    return sum(stages.apply(i).shuffleWriteBytes() for i in range(stages.size()))


def _replicate(df, key, replicas):
    r = df.crossJoin(F.broadcast(
        df.sparkSession.range(replicas).select(F.col("id").alias("__r"))
    ))
    return r.withColumn(key, F.col(key) * replicas + F.col("__r")).drop("__r")


def _pipeline(o, li):
    j = o.hint("merge").join(li, o.o_orderkey == li.l_orderkey)
    return (
        j.groupBy("o_orderkey", "o_orderpriority", "o_orderstatus")
        .agg(
            F.sum("l_quantity").alias("qty"),
            F.sum("l_extendedprice").alias("price"),
            F.max("l_shipdate").alias("last_ship"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def main() -> None:
    n_buckets = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bucketed-probe")
    enable_sorted_bucket_scan(spark)
    tmp = tempfile.mkdtemp(prefix="bkprobe_")
    try:
        orders = _replicate(spark.read.parquet(f"{sf_dir}/orders.parquet"),
                            "o_orderkey", replicas)
        li = _replicate(spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
                        "l_orderkey", replicas)
        t0 = time.monotonic()
        write_bucketed(orders, "bkp_orders", ["o_orderkey"], n_buckets,
                       sort_by=["o_orderkey"], path=f"{tmp}/orders")
        write_bucketed(li, "bkp_lineitem", ["l_orderkey"], n_buckets,
                       sort_by=["l_orderkey"], path=f"{tmp}/lineitem")
        write_sec = time.monotonic() - t0
        # layout-blind baseline: the same physical files re-read by path
        sides = {
            "bucketed": (spark.table("bkp_orders"), spark.table("bkp_lineitem")),
            "shuffled": (spark.read.parquet(f"{tmp}/orders"),
                         spark.read.parquet(f"{tmp}/lineitem")),
        }
        assert not plan_has_exchange(_pipeline(*sides["bucketed"]))
        assert plan_has_exchange(_pipeline(*sides["shuffled"]))
        # sort elimination check: the bucketed SMJ reads pre-sorted buckets
        bk_plan = (_pipeline(*sides["bucketed"])
                   ._jdf.queryExecution().executedPlan().toString())
        sort_free = "Sort [" not in bk_plan
        for o, l in sides.values():  # warm both paths
            _pipeline(o, l).count()
        timings: dict[str, list[float]] = {k: [] for k in sides}
        sbytes: dict[str, int] = {}
        for _ in range(5):
            for name, (o, l) in sides.items():
                b0 = total_shuffle_write_bytes(spark)
                t0 = time.monotonic()
                _pipeline(o, l).count()
                timings[name].append(round(time.monotonic() - t0, 3))
                sbytes[name] = total_shuffle_write_bytes(spark) - b0
        best = {k: min(v) for k, v in timings.items()}
        print(json.dumps({
            "sf_dir": sf_dir, "n_buckets": n_buckets, "replicas": replicas,
            "lineitem_rows": li.count(), "write_once_sec": round(write_sec, 2),
            "bucketed_sort_eliminated": sort_free,
            "join_agg_bucketed_sec": best["bucketed"],
            "join_agg_shuffled_sec": best["shuffled"],
            "speedup": round(best["shuffled"] / best["bucketed"], 2),
            "shuffle_bytes_bucketed": sbytes["bucketed"],
            "shuffle_bytes_eliminated": sbytes["shuffled"] - sbytes["bucketed"],
            "runs": timings,
        }))
    finally:
        spark.sql("DROP TABLE IF EXISTS bkp_orders")
        spark.sql("DROP TABLE IF EXISTS bkp_lineitem")
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
