"""Chaos test for the testdata physical-encoding contract (VERDICT r3 #5).

Round-3 postmortem: the driver regenerated ``events.parquet`` with
µs timestamps (previously TIMESTAMP(NANOS)) and ``events_sessionize``
crashed — ``load_tables`` had pinned one physical encoding. The fix
made ``load_tables`` encoding-agnostic: ``events.ts`` is normalized to
canonical ``TimestampType`` whatever arrives. This test locks that in
by rewriting the events fixture in every timestamp encoding Spark's
parquet reader can hand us —

- ``ns``   → TIMESTAMP(NANOS); with ``nanosAsLong`` it arrives LongType
- ``us``   → TIMESTAMP_NTZ (what the driver ships today)
- ``us+tz``→ TIMESTAMP (LTZ)

— and asserting the events-family queries return identical results on
all three.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from sm_etl_cloud_run_spark import plans
from sm_etl_cloud_run_spark.tables import TABLE_NAMES, load_tables

SRC = "/root/testdata/sf0.001"

ENCODINGS = {
    "nanos": pa.timestamp("ns"),
    "ntz": pa.timestamp("us"),
    "ltz": pa.timestamp("us", tz="UTC"),
}

# Representative events-family coverage: sessionize (the r3 crash),
# a truncation-based rollup, an as-of join, and a window query.
QUERIES = (
    "events_sessionize",
    "events_hourly_rollup",
    "events_asof_last_click",
    "events_sliding_window",
)


@pytest.fixture(scope="module")
def encoded_dirs(tmp_path_factory):
    """One sf-dir per encoding: events.ts re-encoded, other tables copied."""
    table = pq.read_table(os.path.join(SRC, "events.parquet"))
    dirs: dict[str, str] = {}
    for label, ts_type in ENCODINGS.items():
        d = tmp_path_factory.mktemp(f"enc_{label}")
        ts = pc.cast(table["ts"], ts_type)
        out = table.set_column(table.schema.get_field_index("ts"), "ts", ts)
        # version 2.6 writes ns as TIMESTAMP(NANOS) instead of coercing
        pq.write_table(out, str(d / "events.parquet"), version="2.6")
        for t in TABLE_NAMES:
            if t == "events":
                continue
            src = os.path.join(SRC, f"{t}.parquet")
            if os.path.exists(src):
                shutil.copy(src, str(d / f"{t}.parquet"))
        dirs[label] = str(d)
    return dirs


def test_written_encodings_are_distinct(encoded_dirs):
    got = {
        label: pq.read_schema(os.path.join(d, "events.parquet")).field("ts").type
        for label, d in encoded_dirs.items()
    }
    assert got["nanos"] == pa.timestamp("ns")
    assert got["ntz"] == pa.timestamp("us")
    assert got["ltz"] == pa.timestamp("us", tz="UTC")


def test_load_tables_normalizes_every_encoding(spark, encoded_dirs):
    from pyspark.sql import types as T

    for label, d in encoded_dirs.items():
        ts_type = load_tables(spark, d)["events"].schema["ts"].dataType
        assert isinstance(ts_type, T.TimestampType), (
            f"{label}: events.ts loaded as {ts_type}, want canonical TimestampType"
        )


@pytest.mark.parametrize("qname", QUERIES)
def test_events_queries_identical_across_encodings(spark, encoded_dirs, qname):
    spec = plans.all_queries()[qname]
    results = {}
    for label, d in encoded_dirs.items():
        df = spec.fn(spark, d).toPandas()
        df = df.reindex(sorted(df.columns), axis=1)
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
        results[label] = df
    base = results["ntz"]
    assert len(base) > 0, f"{qname} returned 0 rows — trivial pass"
    for label, df in results.items():
        pd_eq = base.equals(df)
        assert pd_eq, f"{qname}: {label} result differs from ntz result"
