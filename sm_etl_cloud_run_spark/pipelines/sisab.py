"""SISAB production-report pipelines (melt-shaped, SURVEY §3 fourth family).

Reference behavior (utilitarios/sisab_relatorio_producao_utilitarios.py:280-354,
etl/sisab_tipo_equipe_por_tipo_producao.py:40-255,
etl/sisab_resolutividade_por_condicao.py): scraped wide report →
unpivot to long (R1) → NULL→0 int measures (C18) → panel filter (F1) →
period/geo enrichment (J1/J2) → audit columns → fixed column order (P6).

The scrape itself is driver-side (sources/sisab.py parses the report
text); this module owns the distributed transform.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import fill_zero_long
from ..functions.dates import now_gmt_minus3
from ..functions.ids import deterministic_row_id, uuid7_column
from ..operators import joins
from ..operators.reshape import melt


def transform_sisab_producao(
    report: DataFrame,
    *,
    variavel_coluna: str,
    variavel_saida: str,
    competencia,  # datetime.date of the report request
    panel_ids: Sequence[str] | None = None,
    periods: DataFrame | None = None,
    geo: DataFrame | None = None,
    measure_name: str = "quantidade_registrada",
    constants: dict[str, str] | None = None,
    deterministic_ids: bool = False,
) -> DataFrame:
    """Wide municipality report → long, typed, enriched fact.

    `constants` models the reference's second categorical axis: the
    SISAB fan-out requests one report per (competência, filter-value)
    combination, so values like `problema_condicao_avaliada` and the
    literal `tipo_producao='Atendimento Individual'` arrive as
    per-request constants, not as report columns
    (etl/sisab_resolutividade_por_condicao.py:135-143, :102-111)."""
    id_vars = ["Uf", "Ibge", "Municipio"]
    value_vars = [c for c in report.columns if c not in id_vars]

    # R1 — verticalize: one row per (municipality, category)
    long = melt(report, id_vars, value_vars, variavel_saida, "quantidade_aprovada")

    # C18 — measures: NULL→0, decimal-string → long
    long = long.withColumn(
        measure_name,
        fill_zero_long(F.col("quantidade_aprovada").cast("double").cast("long")),
    ).drop("quantidade_aprovada")

    # P1 — canonical names; record the request competência (P3)
    long = (
        long.withColumnRenamed("Ibge", "unidade_geografica_id_sus")
        .withColumnRenamed("Uf", "uf_sigla")
        .withColumnRenamed("Municipio", "municipio_nome")
        .withColumn("periodo_data_inicio", F.lit(competencia).cast("date"))
    )

    # P3 — per-request constants (the second categorical axis)
    for cname, cval in (constants or {}).items():
        long = long.withColumn(cname, F.lit(cval))

    # F1 — active-panel municipalities
    if panel_ids is not None:
        long = long.where(F.col("unidade_geografica_id_sus").isin(list(panel_ids)))

    # P9 — row id. The hash must cover the per-request constants: two
    # fan-out requests differing only in (e.g.) problema_condicao share
    # (id_sus, variável, competência), and their union must not collide.
    if deterministic_ids:
        const_cols = [F.lit(f"{k}={v}") for k, v in sorted((constants or {}).items())]
        long = long.withColumn(
            "id",
            deterministic_row_id(
                F.col("unidade_geografica_id_sus"),
                F.col(variavel_saida),
                F.lit(str(competencia)),
                *const_cols,
            ),
        )
    else:
        long = long.withColumn("id", uuid7_column())

    # J1/J2 — period + geography enrichment
    if periods is not None:
        long = joins.period_equi_join(
            long, periods.select("data_inicio", "id"),
            F.col("periodo_data_inicio"), attach={"id": "periodo_id"},
        )
    if geo is not None:
        long = joins.broadcast_lookup(
            long, geo.select("id_sus", "id"),
            F.col("unidade_geografica_id_sus") == geo["id_sus"],
            select={"id": "unidade_geografica_id"},
        )

    # P3/P5/P6 — audit stamp, drop helper columns, fixed order
    long = long.withColumn("atualizacao_data", now_gmt_minus3()).drop("uf_sigla", "municipio_nome")
    ordered = [
        "id",
        "unidade_geografica_id",
        "unidade_geografica_id_sus",
        "periodo_id",
        "periodo_data_inicio",
        *(constants or {}),
        variavel_saida,
        measure_name,
        "atualizacao_data",
    ]
    return long.select(*[c for c in ordered if c in long.columns])
