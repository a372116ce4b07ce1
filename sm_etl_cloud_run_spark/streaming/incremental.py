"""Watermark-gated incremental batch orchestration (SURVEY §2.9 I2/I3, §3).

The reference's control flow (scripts/verificar_e_executar.py):
per (tipo, UF, período) the control table stores three timestamps —
source modification, bronze-landing, warehouse-load — and a job runs
only when its upstream is newer than its downstream:

- download stage: `timestamp_etl_gcs IS NULL OR
  timestamp_modificacao_ftp > timestamp_etl_gcs`   (:36-38)
- insert stage:   `timestamp_load_bd IS NULL OR
  timestamp_etl_gcs > timestamp_load_bd`           (:39-41)

Retroactive source updates simply re-trigger the partition, and the
idempotent sinks (partition overwrite / merge) make the re-run safe —
that's the reference's late-data story, and it survives at 100 TB
because the gate touches only the tiny control table.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STAGE_CONDITIONS: dict[str, tuple[str, str]] = {
    # stage name → (source_ts_col, sink_ts_col)
    "baixar": ("timestamp_modificacao_ftp", "timestamp_etl_gcs"),
    "inserir": ("timestamp_etl_gcs", "timestamp_load_bd"),
}


def gate_pending_runs(control: DataFrame, stage: str, **match: object) -> DataFrame:
    """Rows of the control table that need (re-)processing for `stage`,
    optionally scoped by key columns (tipo/sigla_uf/período)."""
    source_ts, sink_ts = STAGE_CONDITIONS[stage]
    cond = F.col(sink_ts).isNull() | (F.col(source_ts) > F.col(sink_ts))
    for k, v in match.items():
        cond = cond & (F.col(k) == F.lit(v))
    return control.where(cond)


@dataclass
class IncrementalJob:
    """One dispatchable pipeline, keyed like the reference's route table
    (scripts/verificar_e_executar.py:67-135): (tipo, ação) → callable."""

    tipo: str
    acao: str
    run: Callable[[SparkSession, dict], None]


class JobRunner:
    """The Spark analog of the reference's Flask route + dispatch layer:
    look up pending control rows, run the matching job per row, let the
    job's sink update the watermark (K7)."""

    def __init__(self, jobs: list[IncrementalJob]):
        self._jobs = {(j.tipo, j.acao): j for j in jobs}

    def run_pending(self, spark: SparkSession, control: DataFrame, tipo: str, acao: str) -> int:
        job = self._jobs.get((tipo, acao))
        if job is None:
            raise KeyError(f"no job registered for ({tipo!r}, {acao!r})")
        pending = gate_pending_runs(control, acao, tipo=tipo)
        rows = pending.collect()  # control table: tiny by construction
        for row in rows:
            job.run(spark, row.asDict())
        return len(rows)


def plan_backfill(
    control: DataFrame,
    stage: str,
    *,
    period_col: str = "periodo",
    start: str | None = None,
    end: str | None = None,
    force: bool = False,
    max_partitions: int | None = None,
) -> DataFrame:
    """Plan an idempotent backfill: the control-table rows to re-run for
    `stage` within an optional [start, end] period range.

    `force=False` (default) re-runs only genuinely stale rows (the
    normal watermark gate scoped to the range — "heal this window");
    `force=True` re-runs EVERY row in the range regardless of
    watermarks — the "upstream logic changed, rebuild the window" case.
    Because all sinks are idempotent (partition overwrite / keyed
    merge), replans and overlapping backfills are safe to dispatch
    repeatedly; `max_partitions` caps one wave (ordered oldest-first so
    repeated waves drain the backlog deterministically).
    """
    source_ts, sink_ts = STAGE_CONDITIONS[stage]
    scoped = control
    if start is not None:
        scoped = scoped.where(F.col(period_col) >= F.lit(start))
    if end is not None:
        scoped = scoped.where(F.col(period_col) <= F.lit(end))
    if not force:
        scoped = scoped.where(
            F.col(sink_ts).isNull() | (F.col(source_ts) > F.col(sink_ts))
        )
    planned = scoped.orderBy(F.col(period_col).asc())
    if max_partitions is not None:
        planned = planned.limit(max_partitions)
    return planned
