"""Structured Streaming operators — the continuous upgrade path.

The reference has no continuous processing (SURVEY §2.9); these
operators extend the engine to streams while sharing transformation
logic with their batch twins, so the same business logic runs in either
mode (the Structured Streaming contract).

- tumbling/sliding windowed aggregation with event-time watermarks
- streaming sessionization via `session_window`
- file-source ingestion of the same parquet layout the batch path reads
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_events_stream(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """File-source stream over the batch parquet layout (one file per
    trigger by default keeps local smoke runs bounded)."""
    return spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)


def windowed_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window count+sum with a late-data watermark.

    Works on both batch and streaming DataFrames — the batch twin of
    this exact expression backs the `events_hourly_rollup` oracle query.
    """
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), key_col, "n", "total_value")
    )


def streaming_sessions(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user (gap-based), streaming-native."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("s"), F.col(user_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            user_col,
            "n_events",
        )
    )


def run_stream_to_memory(df: DataFrame, query_name: str, *, output_mode: str = "append"):
    """Drive a streaming DataFrame to completion against the memory sink
    (local smoke testing; production uses foreachBatch → idempotent
    sinks from `sinks/`)."""
    q = df.writeStream.outputMode(output_mode).format("memory").queryName(query_name).start()
    q.processAllAvailable()
    return q
