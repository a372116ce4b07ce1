"""SCD Type-2 dimension versioning — history-keeping upserts.

The reference's load path is delete-then-insert / keyed upsert (K2-K5:
current-state only). SCD2 is the history-keeping variant every
warehouse eventually needs: instead of overwriting a changed dimension
row, the old version is CLOSED (valid_to stamped, is_current=false)
and a new version opened — so facts can always join the dimension AS
OF their own date (the j1 period-range join is exactly that consumer).

Pure transform: `scd2_apply` returns the new history frame; persisting
it goes through the same staged-write + atomic-swap as every other
sink (sinks/merge.py), keeping re-runs idempotent.

Scale shape: one full outer join of the CURRENT slice against the
snapshot on the business key (both sides shuffle on the key once;
closed history is untouched — at 100 TB that's the entire point:
history grows forever, but each apply touches only |current| +
|snapshot| rows). Change detection is null-safe column comparison,
no hashing required.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    history: DataFrame,
    snapshot: DataFrame,
    *,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
    effective_col: str = "effective_date",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Apply a full snapshot to an SCD2 history table.

    `history` carries `key_cols + compare_cols + valid_from + valid_to
    + current_flag`; `snapshot` carries `key_cols + compare_cols +
    effective_col` (one row per key — dedupe upstream with
    dedupe_last_write).

    Per key:
    - value change → the open version closes (valid_to = effective,
      current_flag = false) and a new open version starts;
    - new key → a new open version;
    - unchanged / key absent from snapshot → untouched (a missing key
      is "no news", not a delete — handle deletes as explicit
      tombstone rows upstream).

    Re-applying the same snapshot is a no-op (change detection is
    null-safe equality), so the apply is idempotent.
    """
    key_cols = list(key_cols)
    compare_cols = list(compare_cols)
    closed_history = history.where(~F.col(current_flag))
    current = history.where(F.col(current_flag))

    snap = snapshot.select(
        *[F.col(k).alias(f"__snap_{k}") for k in key_cols],
        *[F.col(c).alias(f"__snap_{c}") for c in compare_cols],
        F.col(effective_col).alias("__snap_eff"),
    )
    key_match = reduce(
        Column.__and__,
        [F.col(k).eqNullSafe(F.col(f"__snap_{k}")) for k in key_cols],
    )
    joined = current.join(snap, key_match, "full_outer")

    in_current = F.col(current_flag).isNotNull()
    in_snap = F.col("__snap_eff").isNotNull()
    differs = ~reduce(
        Column.__and__,
        [F.col(c).eqNullSafe(F.col(f"__snap_{c}")) for c in compare_cols],
    )

    hist_cols = [*key_cols, *compare_cols, valid_from, valid_to, current_flag]

    unchanged = joined.where(in_current & (~in_snap | ~differs)).select(*hist_cols)
    closed = joined.where(in_current & in_snap & differs).select(
        *key_cols, *compare_cols, valid_from,
        F.col("__snap_eff").alias(valid_to),
        F.lit(False).alias(current_flag),
    )
    opened = joined.where(in_snap & (~in_current | differs)).select(
        *[F.col(f"__snap_{k}").alias(k) for k in key_cols],
        *[F.col(f"__snap_{c}").alias(c) for c in compare_cols],
        F.col("__snap_eff").alias(valid_from),
        F.lit(None).cast(history.schema[valid_to].dataType).alias(valid_to),
        F.lit(True).alias(current_flag),
    )
    return closed_history.select(*hist_cols).unionByName(
        unchanged
    ).unionByName(closed).unionByName(opened)
