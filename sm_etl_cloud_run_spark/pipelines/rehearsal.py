"""EP1/EP2/EP3 full-lifecycle wiring — SURVEY §3 closed end-to-end.

The reference's three entry points (sm_cloud_run/app.py routes +
scripts/verificar_e_executar.py gate + the per-source etl/load_bd
modules) as `runner.py`-dispatchable jobs over ANY transport and
warehouse: a canned in-memory FTP plus embedded Derby in the rehearsal
test, the real DATASUS FTP plus Postgres in production — the jobs
themselves don't change.

- **EP3** (`refresh_control`): FTP LIST scan (S3) → filename parse
  (P8) → watermark-preserving control-table upsert — the reference's
  `/ftp_metadados` refresh (etl/datasus_ftp_metadados.py:252-382).
- **EP1** (`ep1_baixar_pa`): gate-selected file → executor-side
  download + DBC decode (S1) → `transform_fact` (the full F/P/C/J
  chain) → bronze CSV (K1) → `timestamp_etl_gcs` watermark (K7) —
  etl/siasus_procedimentos_ambulatoriais.py:117-464.
- **EP2** (`ep2_inserir_pa`): bronze all-string CSV (S6) → typed cast
  (C20) → staged transactional JDBC load: delete-conflicts + insert +
  single commit (K2/K3) → `timestamp_load_bd` watermark —
  load_bd/siasus_procedimentos_ambulatoriais_load_bd.py:146-215.

`runner.py` passes only (spark, control-row) to a job, mirroring the
reference's route-dispatch contract, so deployment parameters (paths,
transport, warehouse URL, dims) are module configuration set once per
process via :func:`configure` — the analog of the reference's
environment-variable config surface.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.jdbc import commit_staged_load, stage_jdbc_load, staged_transactional_load
from ..sinks.merge import _atomic_replace
from ..sinks.partitioned import write_bronze_csv
from ..sinks.watermark import touch_watermark
from ..sources.csv_allstring import read_csv_allstring
from ..sources.datasus_ftp import ftp_metadata_scan, read_datasus_ftp
from .base import cast_allstring_typed, transform_fact
from .siasus_pa import PA_SPEC, condicao_saude_mental

CONFIG: dict[str, Any] = {}

_REQUIRED = (
    "host", "directory", "control_path", "bronze_root",
    "panel_ids", "periods", "geo",
)


def configure(**kw: Any) -> None:
    """Set deployment parameters for the lifecycle jobs.

    Required: host, directory, control_path, bronze_root, panel_ids,
    periods (DataFrame: data_inicio, id), geo (DataFrame: id_sus, id).
    Optional: transport_factory (canned FTP in tests), jdbc_url,
    jdbc_table, jdbc_column_types.
    """
    CONFIG.update(kw)


def _cfg(key: str) -> Any:
    if key not in CONFIG and key in _REQUIRED:
        raise RuntimeError(f"rehearsal.configure({key}=...) not set")
    return CONFIG.get(key)


# ---------------------------------------------------------------------------
# EP3 — control-table refresh from the FTP listing
# ---------------------------------------------------------------------------

_PA_NAME_RE = r"^PA([A-Z]{2})(\d{2})(\d{2})[a-z]?\.(?i:dbc)$"


def refresh_control(spark: SparkSession) -> DataFrame:
    """Scan the FTP directory and upsert the watermark control table.

    New files appear with NULL stage watermarks (so both stages are
    pending); files already tracked keep their `timestamp_etl_gcs` /
    `timestamp_load_bd` — only the FTP modification timestamp is
    refreshed, which is exactly what re-triggers a retroactively
    re-published period (the reference's "new or updated" condition,
    verificar_e_executar.py:36-41).

    True UPSERT, never a rebuild: a tracked file absent from one LIST
    scan (transient/partial FTP listing) survives with all its
    watermarks — the reference's upsert
    (datasus_ftp_metadados.py upsert_dados_no_postgres) likewise never
    deletes rows merely missing from a listing; it prunes solely by
    age (>13 months), which callers do explicitly if desired.
    """
    scan = ftp_metadata_scan(
        spark, _cfg("host"), _cfg("directory"),
        transport_factory=_cfg("transport_factory"), prefixes=("PA",),
    )
    fresh = scan.where(F.col("nome").rlike(_PA_NAME_RE)).select(
        F.lit("PA").alias("tipo"),
        F.col("nome").alias("arquivo"),
        F.regexp_extract("nome", _PA_NAME_RE, 1).alias("sigla_uf"),
        F.concat(F.lit("20"), F.regexp_extract("nome", _PA_NAME_RE, 2),
                 F.lit("-"), F.regexp_extract("nome", _PA_NAME_RE, 3)).alias("periodo"),
        "timestamp_modificacao_ftp",
        F.lit(None).cast("timestamp").alias("timestamp_etl_gcs"),
        F.lit(None).cast("timestamp").alias("timestamp_load_bd"),
    )
    import os

    path = _cfg("control_path")
    if os.path.exists(path):
        old = spark.read.parquet(path)
        merged = (
            fresh.alias("f")
            .join(old.alias("o"), ["tipo", "arquivo"], "full_outer")
            .select(
                "tipo", "arquivo",
                F.coalesce("f.sigla_uf", "o.sigla_uf").alias("sigla_uf"),
                F.coalesce("f.periodo", "o.periodo").alias("periodo"),
                # listing present → take its mtime; listing omitted the
                # file → keep the last-seen mtime (no state is lost).
                F.coalesce(
                    "f.timestamp_modificacao_ftp", "o.timestamp_modificacao_ftp"
                ).alias("timestamp_modificacao_ftp"),
                F.col("o.timestamp_etl_gcs").alias("timestamp_etl_gcs"),
                F.col("o.timestamp_load_bd").alias("timestamp_load_bd"),
            )
        )
    else:
        merged = fresh
    _atomic_replace(spark, merged, path)
    return spark.read.parquet(path)


# ---------------------------------------------------------------------------
# EP1 — stage-1 ETL for one pending control row
# ---------------------------------------------------------------------------

def _validated_arquivo(row: dict) -> str:
    """The control-row filename is interpolated into a JDBC delete
    predicate (EP2) and a bronze path (EP1); re-validate it HERE, at
    the point of use, so a hand-edited or backfilled control row can
    never inject SQL or traverse paths — defense does not rely on the
    upstream refresh_control filter alone."""
    arquivo = row["arquivo"]
    if not re.fullmatch(_PA_NAME_RE, arquivo):
        raise ValueError(
            f"control row filename {arquivo!r} does not match the PA "
            "naming contract; refusing to use it in SQL/path contexts"
        )
    return arquivo


def _ep1_body(spark: SparkSession, arquivo: str) -> None:
    """EP1 minus the watermark: download + decode + transform one PA
    file to its bronze directory. Thread-safe — everything here builds
    an isolated plan and writes an isolated path, so the batch form can
    run many bodies concurrently on one session."""
    raw = read_datasus_ftp(
        spark, _cfg("host"), _cfg("directory"),
        re.compile(re.escape(arquivo)), PA_SPEC.raw_columns,
        transport_factory=_cfg("transport_factory"),
    ).fillna("")
    out = transform_fact(
        raw, PA_SPEC,
        panel_ids=_cfg("panel_ids"),
        panel_raw_cols=("PA_UFMUN", "PA_MUNPCN"),
        condition=condicao_saude_mental(),
        periods=_cfg("periods"),
        geo=_cfg("geo"),
        ftp_arquivo_nome=arquivo,
        deterministic_ids=True,
    )
    write_bronze_csv(out, f"{_cfg('bronze_root')}/{arquivo}")


def ep1_baixar_pa(spark: SparkSession, row: dict) -> None:
    """Download + decode + transform one PA file to bronze, then
    watermark. `row` is a pending control row from the runner gate."""
    arquivo = _validated_arquivo(row)
    _ep1_body(spark, arquivo)
    touch_watermark(
        spark, _cfg("control_path"),
        {"tipo": "PA", "arquivo": arquivo}, "timestamp_etl_gcs",
    )


def ep1_baixar_pa_lote(spark: SparkSession, rows: list[dict]) -> None:
    """Batched EP1 — ALL pending files at once (runner `--batch`).

    The per-row dispatch mirrors the reference's job-per-file routes,
    but it serializes the one stage with no JVM parallelism: each
    file's pure-Python DBC decode runs in a single task, so N pending
    shards cost N × decode wall even on 32 idle cores (measured:
    4 shards 88 s, 8 shards 188 s — flat ~4.3k rows/s). Here the
    per-file bodies are submitted CONCURRENTLY from a thread pool —
    Spark schedules concurrent actions on one session, each body's
    single decode task lands on its own core, and the bronze layout
    stays byte-identical to the sequential form (one directory per
    file). Watermarks are touched strictly AFTER every body succeeds,
    and sequentially: the control-table upsert is read-modify-swap, so
    concurrent touches would race (lost updates) — and late watermarks
    keep re-run semantics identical to the per-row form (a crashed
    batch re-runs every unwatermarked file; re-runs are idempotent
    because bronze writes are per-file overwrites).

    At cluster scale the same shape holds: a year × 27 UFs is one
    324-body batch = one wave of 324 concurrent single-task jobs, not
    324 sequential chunk loops (the reference's model).
    """
    from concurrent.futures import ThreadPoolExecutor

    arquivos = [_validated_arquivo(row) for row in rows]
    if not arquivos:
        return
    with ThreadPoolExecutor(max_workers=min(len(arquivos), 32)) as pool:
        # list() re-raises the first body failure before any watermark
        list(pool.map(lambda a: _ep1_body(spark, a), arquivos))
    for arquivo in arquivos:
        touch_watermark(
            spark, _cfg("control_path"),
            {"tipo": "PA", "arquivo": arquivo}, "timestamp_etl_gcs",
        )


# ---------------------------------------------------------------------------
# EP2 — stage-2 warehouse load for one pending control row
# ---------------------------------------------------------------------------

def ep2_inserir_pa(spark: SparkSession, row: dict) -> None:
    """Bronze → typed → staged transactional JDBC load (delete the
    file's previous rows + insert + commit as ONE transaction), then
    watermark. Re-runs are idempotent: the delete clears any earlier
    load of the same file before the insert lands (K3), and a crash
    before commit leaves the target untouched."""
    arquivo = _validated_arquivo(row)
    raw = read_csv_allstring(spark, f"{_cfg('bronze_root')}/{arquivo}")
    typed = cast_allstring_typed(raw, PA_SPEC)
    staged_transactional_load(
        spark, typed,
        _cfg("jdbc_url"), CONFIG.get("jdbc_table", "pa_fato"),
        delete_where=f"\"ftp_arquivo_nome\" = '{arquivo}'",
        column_types=CONFIG.get("jdbc_column_types"),
    )
    touch_watermark(
        spark, _cfg("control_path"),
        {"tipo": "PA", "arquivo": arquivo}, "timestamp_load_bd",
    )


def ep2_inserir_pa_lote(spark: SparkSession, rows: list[dict]) -> None:
    """Batched EP2 — ALL pending files at once (runner `--batch`), the
    stage-2 twin of `ep1_baixar_pa_lote` (ROUND_NOTES round-12
    candidate 2).

    The expensive half of EP2 — bronze read, typed cast, and the
    executor-parallel JDBC transfer — has no cross-file dependency, so
    each file stages CONCURRENTLY into its OWN staging table
    (`<target>_stg_<n>`; disjoint tables, so even a single-writer
    warehouse like embedded Derby only ever sees non-conflicting table
    locks). The commit sections — delete-conflicts + INSERT..SELECT +
    commit against the SHARED target — then run strictly SEQUENTIALLY:
    the target is the single-writer resource, and serialized commits
    keep the reference's one-transaction-per-file atomicity (K2/K3)
    bit-for-bit. Watermarks touch after each file's commit, in the
    same order, so a crash mid-batch leaves exactly the uncommitted
    files pending — identical re-run semantics to the per-row form
    (re-runs are idempotent: the delete clears any earlier load).

    Against a concurrent-writer warehouse (Postgres), the same shape
    holds and the commit loop is the only serial section — ~ms per
    file, so wall time converges to max(stage) instead of Σ(file).
    """
    from concurrent.futures import ThreadPoolExecutor

    arquivos = [_validated_arquivo(row) for row in rows]
    if not arquivos:
        return
    target = CONFIG.get("jdbc_table", "pa_fato")
    url = _cfg("jdbc_url")
    coltypes = CONFIG.get("jdbc_column_types")

    def typed_for(arquivo: str) -> DataFrame:
        raw = read_csv_allstring(spark, f"{_cfg('bronze_root')}/{arquivo}")
        return cast_allstring_typed(raw, PA_SPEC)

    # bootstrap the SHARED target once, OUTSIDE the pool — concurrent
    # CREATE TABLE bootstraps race on every engine
    from ..sinks.jdbc import write_jdbc_append

    write_jdbc_append(
        typed_for(arquivos[0]).limit(0), url, target, column_types=coltypes
    )

    def stage(i_arquivo: tuple[int, str]) -> tuple[str, str, list[str]]:
        i, arquivo = i_arquivo
        typed = typed_for(arquivo)
        staging = f"{target}_stg_{i}"
        stage_jdbc_load(
            spark, typed, url, target, staging, column_types=coltypes,
            ensure_target=False,
        )
        return arquivo, staging, typed.columns

    with ThreadPoolExecutor(max_workers=min(len(arquivos), 32)) as pool:
        # list() re-raises the first staging failure before any commit
        staged = list(pool.map(stage, enumerate(arquivos)))
    for arquivo, staging, columns in staged:
        commit_staged_load(
            spark, url, target, staging, columns,
            delete_where=f"\"ftp_arquivo_nome\" = '{arquivo}'",
            drop_staging=True,  # per-file tables would otherwise pile up
        )
        touch_watermark(
            spark, _cfg("control_path"),
            {"tipo": "PA", "arquivo": arquivo}, "timestamp_load_bd",
        )
