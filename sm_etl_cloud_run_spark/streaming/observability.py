"""Streaming observability: capture per-micro-batch progress metrics.

A `StreamingQueryListener` that records each query-progress event
(rows, rates, trigger durations, state-store size) into an in-memory,
thread-safe buffer and renders it as a DataFrame — the minimal ops
surface a production stream needs for lag/throughput dashboards and
state-growth alerts, without any external metrics system.

At scale this is the hook point: the same listener can forward each
progress dict to a metrics sink (the driver receives one event per
trigger, not per record, so the cost is independent of stream volume).
"""

from __future__ import annotations

import threading
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

PROGRESS_SCHEMA = (
    "query_name string, batch_id long, num_input_rows long, "
    "input_rows_per_second double, processed_rows_per_second double, "
    "trigger_ms long, state_rows long"
)


class MetricsRecorder(StreamingQueryListener):
    """Buffers QueryProgressEvent metrics; attach with
    `spark.streams.addListener(rec)`, detach with `removeListener`."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._rows: list[tuple] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API names)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        state_rows = sum(
            (op.numRowsTotal or 0) for op in (p.stateOperators or [])
        )
        trigger_ms = (p.durationMs or {}).get("triggerExecution", 0)
        with self._lock:
            self._rows.append(
                (
                    p.name,
                    p.batchId,
                    int(p.numInputRows or 0),
                    float(p.inputRowsPerSecond or 0.0),
                    float(p.processedRowsPerSecond or 0.0),
                    int(trigger_ms or 0),
                    int(state_rows),
                )
            )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def snapshot(self) -> list[tuple]:
        with self._lock:
            return list(self._rows)

    def to_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self.snapshot(), PROGRESS_SCHEMA)

    def wait_for_batches(self, n: int, *, timeout_s: float = 30.0) -> bool:
        """Listener events are delivered asynchronously (after
        `processAllAvailable` returns) — poll until `n` progress events
        with input rows have landed or the timeout passes."""
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            with self._lock:
                seen = sum(1 for r in self._rows if r[2] > 0)
            if seen >= n:
                return True
            time.sleep(0.1)
        return False
