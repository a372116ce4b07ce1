"""FTP-metadata refresh pipeline (SURVEY §3 EP3).

Reference (etl/datasus_ftp_metadados.py:93-382): LIST scans over the
DATASUS directories → filename parsing (P8) → US-timestamp parse (C13)
→ keep-last-13-months window (F6) → per-file partition rollup (A1) →
retention delete (K6) + keyed upsert with change detection (K5) into
the watermark control table.

Everything here composes operators that already exist; listing is
driver-side (like the reference), the transform+merge is distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregates import sorted_set_agg
from ..operators.filters import retention_window
from ..sinks.merge import dedupe_last_write, merge_upsert, retention_delete
from ..sources.ftp_list import parse_ftp_list_lines

_FINAL_COLUMNS = (
    "tipo",
    "sigla_uf",
    "ano",
    "mes",
    "nome",
    "particoes",
    "tamanho",
    "processamento_periodo_data_inicio",
    "timestamp_modificacao_ftp",
)


def transformar_metadados(
    listado: DataFrame,
    *,
    ufs: list[str] | None = None,
    retention_months: int = 13,
) -> DataFrame:
    """LIST rows → one row per logical file with partition rollup.

    P8: `PASP2408_1.dbc` → tipo 'PA', UF 'SP', ano '24', mes '08',
    partição '_1.dbc', logical nome 'PASP2408'.
    """
    parsed = listado.select(
        F.substring("nome", 1, 2).alias("tipo"),
        F.substring("nome", 3, 2).alias("sigla_uf"),
        F.substring("nome", 5, 2).alias("ano"),
        F.substring("nome", 7, 2).alias("mes"),
        F.substring("nome", 1, 8).alias("nome_logico"),
        # shard suffix keeps its extension: 'PASP2408_1.dbc' → '_1.dbc'
        F.when(
            F.regexp_extract("nome", r"^\w{8}(.+)\.(?i:dbc)$", 1) != "",
            F.concat(F.regexp_extract("nome", r"^\w{8}(.+)\.(?i:dbc)$", 1), F.lit(".dbc")),
        ).otherwise("").alias("particao"),
        "tamanho",
        "timestamp_modificacao_ftp",
    ).withColumn(
        "processamento_periodo_data_inicio",
        F.make_date(
            F.concat(F.lit("20"), F.col("ano")).cast("int"), F.col("mes").cast("int"), F.lit(1)
        ),
    )

    # F6 — keep only the last N months per file type
    parsed = retention_window(
        parsed, ["tipo"], "processamento_periodo_data_inicio", months=retention_months
    )

    if ufs:
        parsed = parsed.where(F.col("sigla_uf").isin(ufs))

    # A1 — roll partitioned shards up to one row per logical file
    rolled = parsed.groupBy("tipo", "sigla_uf", "ano", "mes", F.col("nome_logico").alias("nome")).agg(
        F.array_join(sorted_set_agg(F.when(F.col("particao") != "", F.col("particao"))), ",").alias("particoes"),
        F.sum("tamanho").alias("tamanho"),
        F.min("processamento_periodo_data_inicio").alias("processamento_periodo_data_inicio"),
        F.max("timestamp_modificacao_ftp").alias("timestamp_modificacao_ftp"),
    )
    return rolled.select(*_FINAL_COLUMNS)


def atualizar_controle(
    spark: SparkSession,
    list_lines: list[str],
    control_path: str,
    *,
    prefixes: tuple[str, ...] = (),
    ufs: list[str] | None = None,
) -> None:
    """EP3 end-to-end: parse LIST → transform → K6 retention → K5 upsert.

    Matched rows update payload only when the FTP mtime changed;
    unmatched insert. Watermark columns of existing rows survive the
    merge (touch semantics).
    """
    listed = parse_ftp_list_lines(spark, list_lines, prefixes=prefixes)
    incoming = transformar_metadados(listed, ufs=ufs)
    incoming = dedupe_last_write(incoming, ["nome"], "timestamp_modificacao_ftp")

    # K6 — drop control rows older than each (tipo, UF) group's new minimum
    retention_delete(
        spark, incoming, control_path, ["tipo", "sigla_uf"], "processamento_periodo_data_inicio"
    )
    # K5 — keyed upsert with mtime change detection
    merge_upsert(
        spark,
        incoming,
        control_path,
        ["nome"],
        update_condition=F.col("src.timestamp_modificacao_ftp") != F.col("tgt.timestamp_modificacao_ftp"),
    )
