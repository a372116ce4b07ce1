"""Small-file compaction — table maintenance for parquet directories.

Continuous ingestion (streaming foreachBatch, per-batch incremental
loads) accretes many small files; at 100 TB the scan cost of a table
is dominated by file count long before data size (driver listing,
task-per-file scheduling, no intra-file parallelism to amortize).
Compaction rewrites a directory into ~target-sized files, optionally
range-sorted so min/max footer stats prune scans (the poor-man's
clustering when no ACID table format is available — same constraint
as sinks/merge.py, same answer: staged write + atomic directory swap).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession

from .merge import _atomic_replace

_PARQUET_EXT = ".parquet"


def dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a local parquet directory."""
    n, size = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(_PARQUET_EXT) and not f.startswith((".", "_")):
                n += 1
                size += os.path.getsize(os.path.join(root, f))
    return n, size


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
    min_files_to_compact: int = 2,
) -> dict:
    """Rewrite `path` into ceil(bytes / target) files; returns a report
    dict (files/bytes before and after, rows).

    With `sort_cols`, the rewrite is repartitionByRange + sortWithin-
    Partitions on those columns — each output file then covers a
    disjoint key range, so parquet min/max stats prune point/range
    scans (the clustering layout a real lakehouse gets from
    OPTIMIZE ... ZORDER; range-sort is the single-dimension version).
    Without, a plain repartition bin-packs by size only.

    The swap is all-or-nothing (stage → rename), readers see either
    the old file set or the new one, and a verification count guards
    the swap — maintenance must never lose rows.
    """
    files_before, bytes_before = dir_stats(path)
    if files_before < min_files_to_compact:
        return {"skipped": True, "files_before": files_before}
    df = spark.read.parquet(path)
    rows_before = df.count()
    # cap the output count: a mis-sized target must not explode into a
    # hundred-thousand-partition shuffle (one compaction pass writes at
    # most 4096 files; run again for pathological inputs)
    n_out = min(4096, max(1, math.ceil(bytes_before / target_file_bytes)))
    if sort_cols:
        out = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n_out)
    _atomic_replace(spark, out, path)
    rows_after = spark.read.parquet(path).count()
    if rows_after != rows_before:   # pragma: no cover - safety net
        raise RuntimeError(
            f"compaction row drift: {rows_before} -> {rows_after} at {path}"
        )
    files_after, bytes_after = dir_stats(path)
    return {
        "skipped": False,
        "files_before": files_before, "files_after": files_after,
        "bytes_before": bytes_before, "bytes_after": bytes_after,
        "rows": rows_after,
    }
