"""Sink semantics: idempotent partition overwrite, MERGE upsert, retention
delete, watermark touch (SURVEY §2.2 K1–K7)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sm_etl_cloud_run_spark.sinks import (
    merge_upsert,
    retention_delete,
    touch_watermark,
    write_partition_overwrite,
)
from sm_etl_cloud_run_spark.sinks.merge import dedupe_last_write


def test_partition_overwrite_idempotent(spark, tmp_path):
    """K3: re-running the same file's batch must not duplicate rows."""
    path = str(tmp_path / "fact")
    batch1 = spark.createDataFrame(
        [("PASP2408.dbc", 1), ("PASP2408.dbc", 2), ("PASP2407.dbc", 3)], "arquivo string, v int"
    )
    write_partition_overwrite(batch1, path, ["arquivo"])
    # re-process one file with corrected content
    batch2 = spark.createDataFrame([("PASP2408.dbc", 99)], "arquivo string, v int")
    write_partition_overwrite(batch2, path, ["arquivo"])
    out = spark.read.parquet(path)
    rows = sorted((r["arquivo"], r["v"]) for r in out.collect())
    assert rows == [("PASP2407.dbc", 3), ("PASP2408.dbc", 99)]
    # idempotency: same batch again → same state
    write_partition_overwrite(batch2, path, ["arquivo"])
    assert sorted((r["arquivo"], r["v"]) for r in spark.read.parquet(path).collect()) == rows


def test_merge_upsert_k5_semantics(spark, tmp_path):
    """K5: insert new keys, update changed rows, touch unchanged rows."""
    path = str(tmp_path / "meta")
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 2, 1)
    initial = spark.createDataFrame(
        [("PASP2408", t0, 10, "old"), ("PASP2407", t0, 20, "keep")],
        "nome string, mtime timestamp, tamanho int, payload string",
    )
    merge_upsert(spark, initial, path, ["nome"])
    incoming = spark.createDataFrame(
        [
            ("PASP2408", t1, 11, "new"),   # changed mtime → update
            ("PASP2407", t0, 20, "noise"), # unchanged mtime → keep target payload
            ("PASP2409", t1, 30, "ins"),   # new key → insert
        ],
        "nome string, mtime timestamp, tamanho int, payload string",
    )
    merge_upsert(
        spark, incoming, path, ["nome"],
        update_condition=F.col("src.mtime") != F.col("tgt.mtime"),
    )
    rows = {r["nome"]: r for r in spark.read.parquet(path).collect()}
    assert rows["PASP2408"]["payload"] == "new" and rows["PASP2408"]["tamanho"] == 11
    assert rows["PASP2407"]["payload"] == "keep"
    assert rows["PASP2409"]["payload"] == "ins"
    assert len(rows) == 3


def test_dedupe_last_write(spark):
    df = spark.createDataFrame(
        [("a", 1, "old"), ("a", 2, "new"), ("b", 1, "x")], "k string, ver int, v string"
    )
    out = {r["k"]: r["v"] for r in dedupe_last_write(df, ["k"], "ver").collect()}
    assert out == {"a": "new", "b": "x"}


def test_retention_delete_k6(spark, tmp_path):
    """K6: per incoming group, drop target rows older than the group min."""
    path = str(tmp_path / "retain")
    target = spark.createDataFrame(
        [
            ("PA", "SP", dt.date(2023, 1, 1)),
            ("PA", "SP", dt.date(2024, 6, 1)),
            ("PA", "RJ", dt.date(2023, 1, 1)),  # group absent from incoming → kept
        ],
        "tipo string, uf string, d date",
    )
    target.write.parquet(path)
    incoming = spark.createDataFrame([("PA", "SP", dt.date(2024, 1, 1))], "tipo string, uf string, d date")
    retention_delete(spark, incoming, path, ["tipo", "uf"], "d")
    rows = sorted((r["tipo"], r["uf"], r["d"]) for r in spark.read.parquet(path).collect())
    assert rows == [
        ("PA", "RJ", dt.date(2023, 1, 1)),
        ("PA", "SP", dt.date(2024, 6, 1)),
    ]


def test_touch_watermark_k7(spark, tmp_path):
    path = str(tmp_path / "control")
    control = spark.createDataFrame(
        [("PA", "SP", None), ("PA", "RJ", None)],
        "tipo string, uf string, timestamp_etl_gcs timestamp",
    )
    control.write.parquet(path)
    touch_watermark(spark, path, {"tipo": "PA", "uf": "SP"}, "timestamp_etl_gcs")
    rows = {r["uf"]: r["timestamp_etl_gcs"] for r in spark.read.parquet(path).collect()}
    assert rows["SP"] is not None and rows["RJ"] is None


def test_merge_upsert_null_condition_keeps_target_row(spark, tmp_path):
    """ADVICE r1: a matched row whose update_condition evaluates NULL
    (e.g. either compared timestamp is NULL) must keep the target row —
    SQL MERGE semantics when no WHEN MATCHED clause fires — not vanish."""
    path = str(tmp_path / "meta")
    t0 = dt.datetime(2024, 1, 1)
    initial = spark.createDataFrame(
        [("A", None, "tgt-a"), ("B", t0, "tgt-b")],
        "nome string, mtime timestamp, payload string",
    )
    merge_upsert(spark, initial, path, ["nome"])
    incoming = spark.createDataFrame(
        [("A", t0, "src-a"),    # tgt.mtime NULL → condition NULL → keep target
         ("B", None, "src-b")], # src.mtime NULL → condition NULL → keep target
        "nome string, mtime timestamp, payload string",
    )
    merge_upsert(
        spark, incoming, path, ["nome"],
        update_condition=F.col("src.mtime") != F.col("tgt.mtime"),
    )
    rows = {r["nome"]: r["payload"] for r in spark.read.parquet(path).collect()}
    assert rows == {"A": "tgt-a", "B": "tgt-b"}
