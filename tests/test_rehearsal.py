"""Full-lifecycle EP1/EP2/EP3 rehearsal (SURVEY §3 as ONE measured run):

FTP LIST scan → control table (EP3) → runner-gated download + DBC
decode + transform_fact + bronze CSV + watermark (EP1) → runner-gated
typed cast + staged transactional Derby load + watermark (EP2), then
the idempotency story: drained gates, a retroactive FTP re-publish
re-triggering exactly one file, and the delete-then-insert keeping the
warehouse exact on the re-run. Wall time per stage is printed and
recorded in ROUND_NOTES.md.
"""

from __future__ import annotations

import datetime as dt
import re
import sys
import time

from pyspark import cloudpickle
from pyspark.sql import functions as F

from dbc_fixtures import make_dbc, make_dbf
from test_datasus_ftp import FakeFtpSession

from sm_etl_cloud_run_spark import runner
from sm_etl_cloud_run_spark.pipelines import PA_SPEC, rehearsal
from sm_etl_cloud_run_spark.sources.jdbc import read_jdbc_table

cloudpickle.register_pickle_by_value(sys.modules[__name__])

_DIR = "/dissemin/publicos/SIASUS/200801_/Dados"
_ROWS_PER_SHARD = 6000
_SHARDS = ("PASP2408a.dbc", "PASP2408b.dbc", "PASP2408c.dbc", "PASP2408d.dbc")


def _shard_bytes(shard_idx: int) -> bytes:
    """One PA shard: even rows pass panel+condition (CAPS in São Paulo),
    odd rows are outside the panel → dropped by F1. All 56 raw columns
    present so the real FactSpec rename/clean chain runs unmodified."""
    cols = PA_SPEC.raw_columns
    base = {c: "X" for c in cols}
    base.update({
        "PA_TPUPS": "70", "PA_MVM": "202408", "PA_CMP": "202408",
        "PA_MN_IND": "M", "PA_OBITO": "1", "PA_ENCERR": "0",
        "PA_PERMAN": "", "PA_ALTA": "1", "PA_TRANSF": "0",
        "PA_MOTSAI": "11", "PA_CNPJMNT": "00000000000000",
        "PA_IDADE": "042", "PA_SRV_C": "121001",
        "PA_CIDPRI": "F200", "PA_CATEND": "01",
    })
    data = []
    for i in range(_ROWS_PER_SHARD):
        r = dict(base)
        n = shard_idx * _ROWS_PER_SHARD + i
        r["PA_CODUNI"] = f"{n % 9999999:07d}"
        r["PA_PROC_ID"] = f"{n % 999999999:09d}"
        r["PA_CBOCOD"] = f"{n % 999999:06d}"
        r["PA_QTDPRO"] = str(5 + n % 7)
        r["PA_QTDAPR"] = str(1 + n % 5)
        if i % 2 == 0:
            r["PA_UFMUN"], r["PA_MUNPCN"] = "355030", "355030"
        else:
            r["PA_UFMUN"], r["PA_MUNPCN"] = "111111", "222222"  # non-panel
        data.append([r[c] for c in cols])
    widths = {c: max(1, max(len(row[i]) for row in data))
              for i, c in enumerate(cols)}
    fields = [(c, "C", widths[c]) for c in cols]
    return make_dbc(make_dbf(fields, data))


def test_ep1_ep2_ep3_full_lifecycle(spark, tmp_path):
    t0 = time.perf_counter()
    tree = {_DIR: {name: _shard_bytes(i) for i, name in enumerate(_SHARDS)}}
    gen_sec = time.perf_counter() - t0

    control = str(tmp_path / "sm_metadados_ftp")
    derby = f"jdbc:derby:{tmp_path}/wh;create=true"
    periods = spark.createDataFrame(
        [(dt.date(2024, 8, 1), "p-2024-08-M")], "data_inicio date, id string"
    )
    geo = spark.createDataFrame(
        [("355030", "m-sp"), ("330455", "m-rj")], "id_sus string, id string"
    )
    rehearsal.configure(
        host="ftp.fake", directory=_DIR,
        transport_factory=lambda: FakeFtpSession(tree),
        control_path=control, bronze_root=str(tmp_path / "bronze"),
        panel_ids=["355030", "330455"], periods=periods, geo=geo,
        jdbc_url=derby, jdbc_table="pa_fato",
        jdbc_column_types="ftp_arquivo_nome VARCHAR(64)",
    )

    # EP3: control refresh — 4 files, both stages pending
    t0 = time.perf_counter()
    ctl = rehearsal.refresh_control(spark)
    ep3_sec = time.perf_counter() - t0
    assert ctl.count() == 4
    assert ctl.where(F.col("timestamp_etl_gcs").isNull()).count() == 4
    assert set(r["periodo"] for r in ctl.collect()) == {"2024-08"}

    # EP1 via the runner CLI: gate selects all 4, job lands bronze + watermark
    t0 = time.perf_counter()
    rc = runner.main([
        "--control", control, "--tipo", "PA", "--acao", "baixar",
        "--job", "sm_etl_cloud_run_spark.pipelines.rehearsal:ep1_baixar_pa",
    ])
    ep1_sec = time.perf_counter() - t0
    assert rc == 0
    ctl = spark.read.parquet(control)
    assert ctl.where(F.col("timestamp_etl_gcs").isNull()).count() == 0

    # EP2 via the runner CLI: gate selects all 4, staged Derby load
    t0 = time.perf_counter()
    rc = runner.main([
        "--control", control, "--tipo", "PA", "--acao", "inserir",
        "--job", "sm_etl_cloud_run_spark.pipelines.rehearsal:ep2_inserir_pa",
    ])
    ep2_sec = time.perf_counter() - t0
    assert rc == 0

    expected = _SHARDS and len(_SHARDS) * (_ROWS_PER_SHARD // 2)
    loaded = read_jdbc_table(spark, derby, "pa_fato")
    assert loaded.count() == expected
    # typed semantics survived the whole path
    one = loaded.where(F.col("quantidade_aprovada").isNotNull()).limit(1).collect()[0]
    assert isinstance(one["quantidade_aprovada"], int)
    assert one["obito"] is True

    # both gates drained: a re-run finds nothing pending
    for acao in ("baixar", "inserir"):
        from sm_etl_cloud_run_spark.streaming.incremental import gate_pending_runs
        assert gate_pending_runs(
            spark.read.parquet(control), acao, tipo="PA"
        ).count() == 0

    # retroactive re-publish: bump ONE file's FTP timestamp via a fresh
    # LIST (EP3 keeps the other watermarks) → exactly one file re-pends,
    # and the re-run's delete-then-insert keeps the warehouse exact
    class BumpedFtp(FakeFtpSession):
        def retrlines(self, cmd, callback):
            assert cmd == "LIST"
            for name, content in sorted(self._tree[self._cwd].items()):
                # far-future stamp so it beats the wall-clock watermark
                stamp = "09-03-99" if name == _SHARDS[0] else "09-03-24"
                callback(f"{stamp}  03:45PM      {len(content)} {name}")

    rehearsal.configure(transport_factory=lambda: BumpedFtp(tree))
    rehearsal.refresh_control(spark)
    from sm_etl_cloud_run_spark.streaming.incremental import gate_pending_runs
    assert gate_pending_runs(
        spark.read.parquet(control), "baixar", tipo="PA"
    ).count() == 1  # exactly the re-published shard
    t0 = time.perf_counter()
    runner.main([
        "--control", control, "--tipo", "PA", "--acao", "baixar",
        "--job", "sm_etl_cloud_run_spark.pipelines.rehearsal:ep1_baixar_pa",
    ])
    runner.main([
        "--control", control, "--tipo", "PA", "--acao", "inserir",
        "--job", "sm_etl_cloud_run_spark.pipelines.rehearsal:ep2_inserir_pa",
    ])
    rerun_sec = time.perf_counter() - t0
    assert read_jdbc_table(spark, derby, "pa_fato").count() == expected

    total_raw = len(_SHARDS) * _ROWS_PER_SHARD
    print(
        f"\nREHEARSAL raw_rows={total_raw} loaded_rows={expected} "
        f"gen={gen_sec:.1f}s ep3={ep3_sec:.1f}s ep1={ep1_sec:.1f}s "
        f"ep2={ep2_sec:.1f}s retro_rerun={rerun_sec:.1f}s"
    )


def test_refresh_control_survives_partial_listing(spark, tmp_path):
    """A transient FTP listing that omits a tracked file must NOT drop
    that file's row or its stage watermarks — the reference's control
    refresh is an upsert (datasus_ftp_metadados.py
    upsert_dados_no_postgres), never a rebuild; it prunes only by age."""
    control = str(tmp_path / "ctl")
    full_tree = {_DIR: {"PASP2407.dbc": b"x", "PASP2408.dbc": b"yy"}}
    rehearsal.configure(
        host="ftp.fake", directory=_DIR,
        transport_factory=lambda: FakeFtpSession(full_tree),
        control_path=control, bronze_root=str(tmp_path / "bronze"),
        panel_ids=["355030"], periods=None, geo=None,
    )
    ctl = rehearsal.refresh_control(spark)
    assert ctl.count() == 2

    # mark 2407 as fully processed
    from sm_etl_cloud_run_spark.sinks.watermark import touch_watermark
    touch_watermark(spark, control, {"tipo": "PA", "arquivo": "PASP2407.dbc"},
                    "timestamp_etl_gcs")
    touch_watermark(spark, control, {"tipo": "PA", "arquivo": "PASP2407.dbc"},
                    "timestamp_load_bd")

    # transient listing omits 2407 entirely
    partial_tree = {_DIR: {"PASP2408.dbc": b"yy"}}
    rehearsal.configure(transport_factory=lambda: FakeFtpSession(partial_tree))
    ctl = rehearsal.refresh_control(spark)
    rows = {r["arquivo"]: r for r in ctl.collect()}
    assert set(rows) == {"PASP2407.dbc", "PASP2408.dbc"}
    kept = rows["PASP2407.dbc"]
    assert kept["timestamp_etl_gcs"] is not None
    assert kept["timestamp_load_bd"] is not None
    assert kept["timestamp_modificacao_ftp"] is not None  # last-seen mtime
    assert kept["sigla_uf"] == "SP" and kept["periodo"] == "2024-07"


def test_lifecycle_jobs_reject_unsafe_filenames(spark, tmp_path):
    """ep1/ep2 re-validate the control-row filename at the point of use:
    a hand-edited row can't reach the JDBC delete predicate or the
    bronze path with SQL/path metacharacters."""
    import pytest

    for bad in ("PA'; DROP TABLE pa_fato; --", "../../etc/passwd",
                "PASP24.dbc/../x", "PASP9999.dbc.exe"):
        with pytest.raises(ValueError):
            rehearsal.ep1_baixar_pa(spark, {"arquivo": bad})
        with pytest.raises(ValueError):
            rehearsal.ep2_inserir_pa(spark, {"arquivo": bad})


def test_ep1_batch_matches_sequential(spark, tmp_path):
    """ep1_baixar_pa_lote (runner --batch: concurrent per-file decode
    bodies, watermarks after the fact) lands byte-identical bronze and
    the same drained gate as the sequential per-row dispatch — the
    parallel form is a scheduling change, never a semantic one."""
    tree = {_DIR: {name: _shard_bytes(i) for i, name in enumerate(_SHARDS[:3])}}
    periods = spark.createDataFrame(
        [(dt.date(2024, 8, 1), "p-2024-08-M")], "data_inicio date, id string"
    )
    geo = spark.createDataFrame(
        [("355030", "m-sp"), ("330455", "m-rj")], "id_sus string, id string"
    )

    def run(job_args, control, bronze):
        rehearsal.configure(
            host="ftp.fake", directory=_DIR,
            transport_factory=lambda: FakeFtpSession(tree),
            control_path=control, bronze_root=bronze,
            panel_ids=["355030", "330455"], periods=periods, geo=geo,
        )
        rehearsal.refresh_control(spark)
        rc = runner.main(
            ["--control", control, "--tipo", "PA", "--acao", "baixar", *job_args]
        )
        assert rc == 0
        ctl = spark.read.parquet(control)
        assert ctl.where(F.col("timestamp_etl_gcs").isNull()).count() == 0

    run(["--job", "sm_etl_cloud_run_spark.pipelines.rehearsal:ep1_baixar_pa"],
        str(tmp_path / "ctl_seq"), str(tmp_path / "bronze_seq"))
    run(["--job", "sm_etl_cloud_run_spark.pipelines.rehearsal:ep1_baixar_pa_lote",
         "--batch"],
        str(tmp_path / "ctl_lote"), str(tmp_path / "bronze_lote"))

    from sm_etl_cloud_run_spark.sources.csv_allstring import read_csv_allstring

    for name in _SHARDS[:3]:
        seq = read_csv_allstring(spark, str(tmp_path / "bronze_seq" / name))
        lote = read_csv_allstring(spark, str(tmp_path / "bronze_lote" / name))
        # audit timestamps are now(): drop them; everything else —
        # deterministic row ids included — must match exactly
        drop = ["criacao_data", "atualizacao_data"]
        a = sorted(map(tuple, seq.drop(*drop).collect()))
        b = sorted(map(tuple, lote.drop(*drop).collect()))
        assert a == b, name


def test_ep2_batch_matches_sequential(spark, tmp_path):
    """ep2_inserir_pa_lote (runner --batch: concurrent per-file staging
    into disjoint staging tables, strictly sequential commits against
    the shared target) loads the identical warehouse state and drains
    the same gate as the sequential per-row dispatch — the parallel
    form is a scheduling change, never a semantic one."""
    tree = {_DIR: {name: _shard_bytes(i) for i, name in enumerate(_SHARDS[:3])}}
    periods = spark.createDataFrame(
        [(dt.date(2024, 8, 1), "p-2024-08-M")], "data_inicio date, id string"
    )
    geo = spark.createDataFrame(
        [("355030", "m-sp"), ("330455", "m-rj")], "id_sus string, id string"
    )

    def run(job_args, control, bronze, derby):
        rehearsal.configure(
            host="ftp.fake", directory=_DIR,
            transport_factory=lambda: FakeFtpSession(tree),
            control_path=control, bronze_root=bronze,
            panel_ids=["355030", "330455"], periods=periods, geo=geo,
            jdbc_url=derby, jdbc_table="pa_fato",
            jdbc_column_types="ftp_arquivo_nome VARCHAR(64)",
        )
        rehearsal.refresh_control(spark)
        rc = runner.main(
            ["--control", control, "--tipo", "PA", "--acao", "baixar",
             "--job", "sm_etl_cloud_run_spark.pipelines.rehearsal:ep1_baixar_pa_lote",
             "--batch"]
        )
        assert rc == 0
        rc = runner.main(
            ["--control", control, "--tipo", "PA", "--acao", "inserir", *job_args]
        )
        assert rc == 0
        ctl = spark.read.parquet(control)
        assert ctl.where(F.col("timestamp_load_bd").isNull()).count() == 0
        return read_jdbc_table(spark, derby, "pa_fato")

    seq = run(
        ["--job", "sm_etl_cloud_run_spark.pipelines.rehearsal:ep2_inserir_pa"],
        str(tmp_path / "ctl_seq"), str(tmp_path / "bronze_seq"),
        f"jdbc:derby:{tmp_path}/wh_seq;create=true",
    )
    lote = run(
        ["--job", "sm_etl_cloud_run_spark.pipelines.rehearsal:ep2_inserir_pa_lote",
         "--batch"],
        str(tmp_path / "ctl_lote"), str(tmp_path / "bronze_lote"),
        f"jdbc:derby:{tmp_path}/wh_lote;create=true",
    )
    # audit timestamps are now(): drop them; everything else — the
    # deterministic row ids included — must match exactly
    drop = ["criacao_data", "atualizacao_data"]
    a = sorted(map(tuple, seq.drop(*drop).collect()))
    b = sorted(map(tuple, lote.drop(*drop).collect()))
    assert len(a) == 3 * (_ROWS_PER_SHARD // 2)
    assert a == b

    # batch re-run is idempotent FOR REAL: clear one file's load
    # watermark so the gate re-selects it, re-run the batch job, and
    # assert the warehouse row set is unchanged (delete-then-insert) —
    # a --dry-run would prove only that the gate is drained.
    ctl_path = str(tmp_path / "ctl_lote")
    ctl = spark.read.parquet(ctl_path)
    redo = ctl.withColumn(
        "timestamp_load_bd",
        F.when(F.col("arquivo") == _SHARDS[0], F.lit(None).cast("timestamp"))
        .otherwise(F.col("timestamp_load_bd")),
    )
    from sm_etl_cloud_run_spark.sinks.merge import _atomic_replace

    _atomic_replace(spark, redo, ctl_path)
    rc = runner.main(
        ["--control", ctl_path, "--tipo", "PA", "--acao", "inserir",
         "--job", "sm_etl_cloud_run_spark.pipelines.rehearsal:ep2_inserir_pa_lote",
         "--batch"]
    )
    assert rc == 0
    again = read_jdbc_table(
        spark, f"jdbc:derby:{tmp_path}/wh_lote;create=true", "pa_fato"
    )
    assert sorted(map(tuple, again.drop(*drop).collect())) == b
