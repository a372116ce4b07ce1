"""Sink-side scale probe: partition overwrite (K3/K4) and MERGE upsert
(K5) / retention delete (K6) timed on multiplied `events` data.

Usage: python tools/sink_probe.py [multipliers...]   (default: 16 64)
Reuses the fact data `tools/scale_probe.py` materializes under
`.scale_probe/x{N}` (building it on demand), writes sink tables under
`.scale_probe/sinks/`, prints one JSON line per multiplier.

What each measurement shows at 100 TB:
- `full_write`: the baseline partitioned fact write (one directory per
  day) — scales with executor count, not table size.
- `overwrite_1d`: re-processing one partition touches ONLY that
  directory (dynamic partition overwrite) — cost is the partition's
  size, independent of table size. This is the property that makes
  the reference's delete-by-file/period idempotency viable at scale.
- `merge_upsert`: a 1%-delta keyed merge — one shuffle on the key plus
  a staged rewrite; the shape Delta/Iceberg MERGE INTO executes
  without the rewrite.
- `retention_delete`: broadcast per-group thresholds + rewrite.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sm_etl_cloud_run_spark.session import get_spark
from sm_etl_cloud_run_spark.sinks.merge import merge_upsert, retention_delete
from sm_etl_cloud_run_spark.sinks.partitioned import write_partition_overwrite
from sm_etl_cloud_run_spark.tables import load_tables
from tools.scale_probe import PROBE_DIR, build_scaled

SINK_DIR = os.path.join(PROBE_DIR, "sinks")


def probe(spark, mult: int) -> dict:
    sf_dir = build_scaled(spark, mult)
    events = load_tables(spark, sf_dir)["events"].withColumn(
        "event_date", F.to_date("ts")
    )
    out: dict[str, float] = {}
    part_path = os.path.join(SINK_DIR, f"x{mult}-events-part")
    keyed_path = os.path.join(SINK_DIR, f"x{mult}-events-keyed")
    shutil.rmtree(part_path, ignore_errors=True)
    shutil.rmtree(keyed_path, ignore_errors=True)

    t0 = time.perf_counter()
    write_partition_overwrite(events, part_path, ["event_date"])
    out["full_write"] = round(time.perf_counter() - t0, 2)
    n0 = spark.read.parquet(part_path).count()

    one_day = events.agg(F.min("event_date")).collect()[0][0]
    delta_1d = events.where(F.col("event_date") == F.lit(one_day)).withColumn(
        "value", F.col("value") * 2
    )
    t0 = time.perf_counter()
    write_partition_overwrite(delta_1d, part_path, ["event_date"])
    out["overwrite_1d"] = round(time.perf_counter() - t0, 2)
    assert spark.read.parquet(part_path).count() == n0, "idempotency broken"

    t0 = time.perf_counter()
    events.write.mode("overwrite").parquet(keyed_path)
    out["keyed_write"] = round(time.perf_counter() - t0, 2)

    # materialize the delta first — timing the MERGE must not charge it
    # with re-sampling the source plan once per internal join
    max_id = events.agg(F.max("event_id")).collect()[0][0]
    delta = events.sample(0.01, seed=7).withColumn("value", F.col("value") + 1)
    inserts = delta.limit(1000).withColumn("event_id", F.col("event_id") + F.lit(max_id))
    delta_path = os.path.join(SINK_DIR, f"x{mult}-delta")
    delta.unionByName(inserts).write.mode("overwrite").parquet(delta_path)
    delta_df = spark.read.parquet(delta_path)
    t0 = time.perf_counter()
    merge_upsert(spark, delta_df, keyed_path, ["event_id"])
    out["merge_upsert"] = round(time.perf_counter() - t0, 2)

    thresholds = spark.createDataFrame(
        [(r["event_type"],) for r in events.select("event_type").distinct().collect()],
        "event_type string",
    ).withColumn("ts", F.date_add(F.lit(one_day), 3).cast("timestamp"))
    t0 = time.perf_counter()
    retention_delete(spark, thresholds, keyed_path, ["event_type"], "ts")
    out["retention_delete"] = round(time.perf_counter() - t0, 2)

    return {"mult": mult, "events_rows": n0, **out}


def main() -> None:
    mults = [int(m) for m in sys.argv[1:]] or [16, 64]
    spark = get_spark("sink-probe")
    os.makedirs(SINK_DIR, exist_ok=True)
    for mult in mults:
        print(json.dumps(probe(spark, mult)))


if __name__ == "__main__":
    main()
