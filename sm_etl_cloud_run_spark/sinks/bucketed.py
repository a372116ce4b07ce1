"""Bucketed (hash-clustered) tables — shuffle-free co-located joins.

The reference joins its facts to the same dimension keys over and over
(municipality `id_sus` and period lookups in every fact pipeline —
transform/*.py's `pd.merge` chains). In pandas each merge rebuilds a
hash index; the Spark translation of that habit is one shuffle per
join, and at 100 TB the repeated fact-side exchange IS the job cost.

Spark's native fix is hash bucketing: `bucketBy(n, key)` at write time
splits each table into `n` files by `hash(key) % n` and records the
layout in the catalog. A later join (or groupBy) on the bucket key of
two tables bucketed into the SAME number of buckets needs NO exchange
on either side — the scan itself satisfies the join's distribution
requirement, so the 100 TB fact table is never reshuffled again after
the one-time clustered write. `sortBy` additionally pre-orders rows
inside each bucket file so sort-merge joins can skip (or cheapen) the
per-task sort.

Scale guidance (applies at any SF; constants here are test-sized):

- Size `n_buckets` so one bucket of the LARGEST table fits a task
  comfortably (~128-512 MB): e.g. a 100 TB fact at 256 MB/bucket →
  ~400k buckets. Both sides of a co-located join must agree on the
  bucket count or be integer multiples with
  `spark.sql.bucketing.coalesceBucketsInJoin.enabled=true`.
- Bucketing pays off after ~2 joins/aggregations on the key; a table
  joined once is cheaper to shuffle ad hoc.
- Each writing task emits one file per bucket it touches — repartition
  by the bucket key first (done below) so the layout is n_buckets
  files, not tasks × n_buckets small files.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    n_buckets: int,
    *,
    sort_by: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write `df` as a catalog table hash-bucketed on `bucket_by`.

    `path` makes the table external (data at `path`, metadata in the
    catalog) — tests and staged layouts use this; production tables can
    live in the warehouse. The pre-repartition on the bucket key keeps
    the file count at n_buckets (one file per bucket), which is also
    the layout sorted-bucket merge joins need to skip their sort.
    """
    cols = list(bucket_by)
    writer = (
        df.repartition(n_buckets, *cols)
        .write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, cols[0], *cols[1:])
    )
    if sort_by:
        writer = writer.sortBy(list(sort_by)[0], *list(sort_by)[1:])
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def enable_sorted_bucket_scan(spark: SparkSession) -> None:
    """Let sort-merge joins TRUST the sortBy order of bucket files.

    Spark 3+ stopped propagating bucket-file sort order by default
    (reading several files per bucket would interleave them unsorted);
    with `write_bucketed`'s one-file-per-bucket layout the order IS
    valid, and this conf removes the per-task Sort under sort-merge
    joins on the bucket key. Only enable where that layout invariant
    holds — a bucket written by multiple tasks (e.g. appends) breaks it
    and would silently produce wrong merge-join results.
    """
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read that preserves the bucketed layout.

    Must go through the table identifier — `spark.read.parquet(path)`
    on the same files LOSES the bucket metadata and the join shuffles
    again. Keep `spark.sql.sources.bucketing.enabled=true` (default).
    """
    return spark.table(table)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains any shuffle exchange.

    The assertion hook for bucketing tests and for pipeline authors:
    a co-located join that silently regressed to shuffling (bucket
    counts diverged, a cast broke the bucket expression, someone read
    the path instead of the table) fails loudly instead of costing a
    100 TB exchange at 3am.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan or "Exchange rangepartitioning" in plan
