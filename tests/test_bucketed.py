"""Bucketed-table co-location: joins and aggregations on the bucket key
must run with NO shuffle exchange (the 100 TB repeated-join primitive)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sm_etl_cloud_run_spark.sinks import (
    plan_has_exchange,
    read_bucketed,
    write_bucketed,
)

N_BUCKETS = 4


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(
        orders, "bk_orders", ["o_orderkey"], N_BUCKETS,
        sort_by=["o_orderkey"], path=str(base / "orders"),
    )
    write_bucketed(
        lineitem, "bk_lineitem", ["l_orderkey"], N_BUCKETS,
        sort_by=["l_orderkey"], path=str(base / "lineitem"),
    )
    yield "bk_orders", "bk_lineitem"
    spark.sql("DROP TABLE IF EXISTS bk_orders")
    spark.sql("DROP TABLE IF EXISTS bk_lineitem")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    t_orders, t_lineitem = bucketed_tables
    o = read_bucketed(spark, t_orders)
    li = read_bucketed(spark, t_lineitem)
    # force the sort-merge strategy both times: at test SF the optimizer
    # would broadcast either way (no shuffle regardless), which proves
    # nothing about layout; at 100 TB both sides are fact-sized and SMJ
    # is the real strategy this test models.
    joined = o.hint("merge").join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderkey", "o_custkey", "l_linenumber", "l_quantity"
    )
    assert not plan_has_exchange(joined), (
        "bucketed join must be satisfied by the scan layout:\n"
        + joined._jdf.queryExecution().executedPlan().toString()
    )
    # the same SMJ over path-read (layout-blind) frames DOES shuffle —
    # proves the assertion hook can tell the difference
    o_raw = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li_raw = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    shuffled = o_raw.hint("merge").join(li_raw, o_raw.o_orderkey == li_raw.l_orderkey)
    assert plan_has_exchange(shuffled)
    # and the results are identical
    raw_rows = shuffled.select(
        "o_orderkey", "o_custkey", "l_linenumber", "l_quantity"
    ).sort("o_orderkey", "l_linenumber").collect()
    assert joined.sort("o_orderkey", "l_linenumber").collect() == raw_rows


def test_sorted_bucket_scan_eliminates_smj_sort(spark, bucketed_tables):
    """With the one-file-per-bucket layout and the opt-in conf, the
    sort-merge join trusts sortBy order and plans no Sort at all."""
    from sm_etl_cloud_run_spark.sinks import enable_sorted_bucket_scan

    t_orders, t_lineitem = bucketed_tables
    o = read_bucketed(spark, t_orders)
    li = read_bucketed(spark, t_lineitem)
    joined = o.hint("merge").join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderkey", "l_linenumber", "l_quantity"
    )
    old = spark.conf.get("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    try:
        enable_sorted_bucket_scan(spark)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan and "Sort [" not in plan, plan
        # and the sorted path returns the same rows as the sorted-anyway path
        n = joined.count()
    finally:
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", old)
    assert n == li.count()


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_tables):
    _, t_lineitem = bucketed_tables
    li = read_bucketed(spark, t_lineitem)
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("qty"))
    assert not plan_has_exchange(agg)


def test_bucketed_layout_one_file_per_bucket(spark, bucketed_tables):
    """The pre-repartition keeps the file count at n_buckets, not
    tasks x n_buckets — the small-files failure mode at scale."""
    t_orders, _ = bucketed_tables
    files = spark.table(t_orders).inputFiles()
    assert len(files) == N_BUCKETS


def test_bucketed_join_matches_unbucketed_counts(spark, sf_dir, bucketed_tables):
    t_orders, t_lineitem = bucketed_tables
    o = read_bucketed(spark, t_orders)
    li = read_bucketed(spark, t_lineitem)
    n = o.join(li, o.o_orderkey == li.l_orderkey).count()
    assert n == spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
