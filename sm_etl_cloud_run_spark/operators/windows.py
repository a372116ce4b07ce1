"""Window-function operators: top-k per group, sessionization.

Common OLAP patterns the engine exposes as combinators; both are single
shuffles on the partition key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_name: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number (deterministic when order_by
    includes a tiebreaker)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return df.withColumn(rank_name, F.row_number().over(w)).where(F.col(rank_name) <= k)


def sessionize(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign session ids: a new session starts when the gap from the
    previous event (per user) exceeds `gap_minutes`.

    lag + conditional cumsum — one shuffle on the user key. The
    streaming analog is `session_window` (see streaming/stream_ops.py).

    Works for TIMESTAMP and TIMESTAMP_NTZ inputs: NTZ can't cast to
    BIGINT directly, so go through TIMESTAMP first. That hop uses the
    session timezone, but gaps are differences of epochs, so any fixed
    offset cancels — and the engine pins the session to UTC
    (session.py), so there is no DST-varying offset either.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return df.withColumn("__new", is_new).withColumn(
        session_col, F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).drop("__new")
