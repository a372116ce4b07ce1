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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .merge import _atomic_replace

_PARQUET_EXT = ".parquet"

_MORTON_BITS = 16


def morton_code(a: Column, b: Column, *, bits: int = _MORTON_BITS) -> Column:
    """Interleave the low `bits` bits of two non-negative integer
    columns into one Z-order key (a's bits at even positions).

    Sorting by this key clusters rows that are close in BOTH
    dimensions, so a compaction sorted by it gives every output file a
    small bounding box in (a, b) — parquet min/max footers then prune
    2-D point/range scans, which a single-column sort can only do for
    its leading column. Pure bit arithmetic (shiftleft/or), stays in
    whole-stage codegen. Values are clamped to the `bits` low bits —
    rescale/bucket inputs upstream if their range exceeds 2^bits.
    """
    mask = (1 << bits) - 1
    x = F.col(a) if isinstance(a, str) else a
    y = F.col(b) if isinstance(b, str) else b
    x = x.cast("long").bitwiseAND(F.lit(mask))
    y = y.cast("long").bitwiseAND(F.lit(mask))
    code = F.lit(0).cast("long")
    for i in range(bits):
        bit = F.lit(1 << i).cast("long")
        code = (
            code
            .bitwiseOR(F.shiftleft(x.bitwiseAND(bit), i))
            .bitwiseOR(F.shiftleft(y.bitwiseAND(bit), i + 1))
        )
    return code


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
    zorder_cols: tuple[str, str] | None = None,
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
    if zorder_cols:
        # OPTIMIZE ... ZORDER: range-partition and sort by the Morton
        # interleave of two columns so each file's (a, b) bounding box
        # is small and parquet footer stats prune 2-D scans
        z = morton_code(*zorder_cols)
        out = (
            df.withColumn("__z", z)
            .repartitionByRange(n_out, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )
    elif sort_cols:
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
