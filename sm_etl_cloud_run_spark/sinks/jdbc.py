"""JDBC warehouse sink (SURVEY §2.2 K2) — deploy-time connector.

The reference bulk-loads Postgres with `COPY ... FROM STDIN WITH CSV`
in 10k-row transactional batches (utilitarios/bd_utilitarios.py:85-251).
The Spark-native equivalent is a partition-parallel JDBC write with
`batchsize` + `rewriteBatchedStatements`; for Postgres specifically,
`reWriteBatchedInserts=true` turns executeBatch into multi-row inserts,
the closest JVM-side analog of COPY.

No JDBC driver jar ships in this container, so this module is exercised
at deploy time only; the call shape and idempotency contract (truncate/
delete-scope handled upstream by the partition-overwrite/merge layer)
are documented here and unit-smoked via argument validation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEFAULT_BATCH_SIZE = 10_000  # reference `carregar_dataframe(passo=10000)`


def write_jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    *,
    user: str,
    password: str,
    batch_size: int = DEFAULT_BATCH_SIZE,
    num_partitions: int | None = None,
) -> None:
    """K2: append `df` to a JDBC table in `batch_size` row batches.

    Each Spark partition opens one connection; `num_partitions` caps the
    DB's concurrent-writer load (the reference serialized through one
    connection — a cluster write wants a handful, not thousands).
    """
    if not url.startswith("jdbc:"):
        raise ValueError(f"not a JDBC url: {url!r}")
    out = df.repartition(num_partitions) if num_partitions else df
    (
        out.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("batchsize", batch_size)
        .option("isolationLevel", "READ_COMMITTED")
        .option("reWriteBatchedInserts", "true")
        .mode("append")
        .save()
    )
