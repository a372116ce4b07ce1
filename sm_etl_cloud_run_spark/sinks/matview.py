"""Incremental materialized-aggregate maintenance.

A daily/hourly rollup over a 100 TB fact stream is never recomputed
from scratch — new partitions arrive, their PARTIAL aggregates are
computed (a scan of only the delta), and the stored rollup is merged
algebraically. That works exactly for the distributive/algebraic
aggregate family (COUNT and SUM add; MIN/MAX combine; AVG = merged
SUM/COUNT; the sketch rollup in plans/events_queries.py covers the
approximate family the same way). Holistic aggregates (exact median,
exact distinct) don't merge — that boundary is documented, not hidden.

The refresh itself reuses the engine's staged atomic swap, and
`refresh_incremental` is idempotent per delta when the delta carries a
partition id: re-merging an already-applied partition is detected via
the applied-partitions column and skipped.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .merge import _atomic_replace

_APPLIED_COL = "__applied_parts"


def partial_aggregate(
    delta: DataFrame,
    keys: Sequence[str],
    *,
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    part_id: str,
) -> DataFrame:
    """Partial (mergeable) aggregate of one delta partition.

    Emits n_rows plus sum_/min_/max_ prefixed columns and the sorted
    applied-partition list — the merge algebra's state, computed with
    ordinary map-side-combined hash aggregation over just the delta.
    """
    aggs = [F.count("*").cast("long").alias("n_rows")]
    aggs += [F.sum(c).alias(f"sum_{c}") for c in sum_cols]
    aggs += [F.min(c).alias(f"min_{c}") for c in min_cols]
    aggs += [F.max(c).alias(f"max_{c}") for c in max_cols]
    aggs.append(F.array(F.lit(part_id)).alias(_APPLIED_COL))
    return delta.groupBy(*keys).agg(*aggs)


def merge_partials(a: DataFrame, b: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Merge two partial-aggregate relations: the algebraic combine
    (sum+sum, min(min), max(max), count+count) over a full outer join
    — commutative and associative, so any merge order or grouping of
    deltas yields the same rollup."""
    if a.columns != b.columns:
        raise ValueError(
            f"partial-aggregate schemas diverge: {a.columns} vs {b.columns}"
        )
    joined = a.alias("a").join(b.alias("b"), on=list(keys), how="full_outer")
    out_cols: list = [F.col(k) for k in keys]
    for c in a.columns:
        if c in keys:
            continue
        ac, bc = F.col(f"a.{c}"), F.col(f"b.{c}")
        if c == _APPLIED_COL:
            merged = F.array_sort(
                F.array_union(
                    F.coalesce(ac, F.array().cast("array<string>")),
                    F.coalesce(bc, F.array().cast("array<string>")),
                )
            )
        elif c == "n_rows":
            merged = F.coalesce(ac, F.lit(0)) + F.coalesce(bc, F.lit(0))
        elif c.startswith("sum_"):
            # SUM's NULL means "no non-NULL inputs yet" — it must
            # survive the merge (a full recompute would return NULL),
            # so coalesce-to-0 only when at least one side has a value
            merged = F.when(
                ac.isNull() & bc.isNull(), F.lit(None)
            ).otherwise(F.coalesce(ac, F.lit(0)) + F.coalesce(bc, F.lit(0)))
        elif c.startswith("min_"):
            # least/greatest are NULL-tolerant only via coalesce: an
            # outer-join miss must not poison the combine
            merged = F.coalesce(F.least(ac, bc), ac, bc)
        elif c.startswith("max_"):
            merged = F.coalesce(F.greatest(ac, bc), ac, bc)
        else:
            raise ValueError(f"unmergeable column in partial aggregate: {c}")
        out_cols.append(merged.alias(c))
    return joined.select(*out_cols)


def refresh_incremental(
    spark: SparkSession,
    delta: DataFrame,
    rollup_path: str,
    keys: Sequence[str],
    *,
    part_id: str,
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> bool:
    """Apply one delta partition to the stored rollup (atomic swap).

    Returns False without touching the table when `part_id` was already
    applied (re-run idempotency — the at-least-once scheduler case).
    Cost is O(delta) + O(|rollup|) — never O(full fact history).
    """
    partial = partial_aggregate(
        delta, keys, sum_cols=sum_cols, min_cols=min_cols, max_cols=max_cols,
        part_id=part_id,
    )
    if not os.path.exists(rollup_path):
        _atomic_replace(spark, partial, rollup_path)
        return True
    existing = spark.read.parquet(rollup_path)
    already = (
        existing.select(F.explode(_APPLIED_COL).alias("p"))
        .where(F.col("p") == part_id)
        .limit(1)
        .count()
    )
    if already:
        return False
    merged = merge_partials(existing, partial, keys)
    _atomic_replace(spark, merged, rollup_path)
    return True
