"""JDBC warehouse source (SURVEY §2.1 S7) — deploy-time connector.

The reference reflects Postgres tables lazily and queries them
per-value (utilitarios/bd_utilitarios.py:33-82); the Spark-native read
is a partition-parallel JDBC scan. Two shapes matter at scale:

- **dimension read** (`read_jdbc_table` without bounds): one
  connection, whole table — right for the small dims the engine
  broadcasts (periodos, ufs, unidades_geograficas).
- **partitioned fact read** (with `partition_column` + bounds):
  `num_partitions` concurrent range-scans, each executor pulling one
  stride — the only way a JDBC source keeps a cluster busy. Catalyst
  pushes filters/projections into the generated queries.

Verified live against the embedded Derby database whose driver ships in
Spark's own classpath (tests/test_jdbc_live.py): whole-table and
partition-parallel reads both execute against a real JDBC endpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetch_size: int = 10_000,
) -> DataFrame:
    """S7: read a JDBC table, optionally as parallel range partitions.

    `partition_column` must be numeric/date and roughly uniform for the
    strides to balance; bounds do NOT filter (rows outside still land in
    the edge partitions) — they only shape the strides.
    """
    if not url.startswith("jdbc:"):
        raise ValueError(f"not a JDBC url: {url!r}")
    bounds = (partition_column, lower_bound, upper_bound)
    if any(b is not None for b in bounds) and any(b is None for b in bounds):
        raise ValueError(
            "partitioned read needs all of partition_column, lower_bound, upper_bound"
        )
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", fetch_size)
    )
    if user is not None:
        reader = reader.option("user", user).option("password", password or "")
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
            .option("numPartitions", num_partitions)
        )
    return reader.load()
