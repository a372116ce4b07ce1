"""Source-connector tests: SISAB dialect, FTP LIST, all-string CSV, DBF scaffold."""

from __future__ import annotations

import datetime as dt

from sm_etl_cloud_run_spark.sources import (
    parse_ftp_list_lines,
    parse_sisab_report,
    prefer_partitioned,
    read_csv_allstring,
)
from sm_etl_cloud_run_spark.sources.csv_allstring import cast_columns
from sm_etl_cloud_run_spark.sources.dbf import read_dbf_files

_REPORT = (
    "Relatório de produção\nqualquer coisa; outra\n\n\n"
    "Uf;Ibge;Municipio;Consulta;Visita;Unnamed: 5\n"
    "SP;0355030;São Paulo;1.234,56;7;\n"
    "RJ;330455;Rio de Janeiro;;3;\n"
    "\n\n\nFonte: SISAB"
)


def test_parse_sisab_report(spark):
    df = parse_sisab_report(spark, _REPORT)
    assert df.columns == ["Uf", "Ibge", "Municipio", "Consulta", "Visita"]
    rows = {r["Ibge"]: r for r in df.collect()}
    assert rows["0355030"]["Consulta"] == "1.234,56"  # leading zero kept, dialect raw
    assert rows["330455"]["Consulta"] is None  # empty → NULL on value cols


def test_parse_ftp_list_lines(spark):
    lines = [
        "09-03-24  03:45PM       123456 PASP2408.dbc",
        "01-31-24  12:00AM            7 BISP2408_1.dbc",
        "garbage line",
    ]
    out = {r["nome"]: r for r in parse_ftp_list_lines(spark, lines).collect()}
    assert out["PASP2408.dbc"]["tamanho"] == 123456
    assert out["PASP2408.dbc"]["timestamp_modificacao_ftp"] == dt.datetime(2024, 9, 3, 15, 45)
    assert len(out) == 2


def test_prefer_partitioned():
    names = ["BISP2408.dbc", "BISP2408_1.dbc", "BISP2408_2.dbc", "PASP2408.dbc"]
    out = prefer_partitioned(names, r"^(BI|PA)SP2408.*\.dbc$")
    assert "BISP2408.dbc" not in out
    assert {"BISP2408_1.dbc", "BISP2408_2.dbc", "PASP2408.dbc"} <= set(out)


def test_read_csv_allstring_and_cast(spark, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("a,b,c\n1,2.5,True\n,0.5,False\n")
    df = read_csv_allstring(spark, str(p))
    assert all(f.dataType.simpleString() == "string" for f in df.schema.fields)
    typed = cast_columns(df, {"a": "long", "b": "double", "c": "boolean"})
    rows = typed.orderBy("b").collect()
    assert rows[0]["a"] is None and rows[0]["c"] is False
    assert rows[1]["a"] == 1 and rows[1]["b"] == 2.5 and rows[1]["c"] is True


def test_read_dbf_files_with_fake_decoder(spark, tmp_path):
    (tmp_path / "x.dbf").write_bytes(b"AB")
    (tmp_path / "y.dbf").write_bytes(b"CD")

    def decoder(content: bytes):
        for i in range(2):
            yield {"COL1": f"{content.decode()}-{i}", "COL2": i}

    df = read_dbf_files(spark, str(tmp_path), ["COL1", "COL2"], decoder=decoder)
    rows = sorted((r["COL1"], r["COL2"]) for r in df.collect())
    assert rows == [("AB-0", "0"), ("AB-1", "1"), ("CD-0", "0"), ("CD-1", "1")]
    assert all(f.dataType.simpleString() == "string" for f in df.schema.fields)


def test_read_jdbc_table_argument_contract(spark):
    """Deploy-time connector: smoke the argument validation (no driver
    jar in this container to run a real scan)."""
    import pytest

    from sm_etl_cloud_run_spark.sources.jdbc import read_jdbc_table

    with pytest.raises(ValueError, match="not a JDBC url"):
        read_jdbc_table(spark, "postgres://x", "t", user="u", password="p")
    with pytest.raises(ValueError, match="partitioned read needs"):
        read_jdbc_table(
            spark, "jdbc:postgresql://h/db", "t", user="u", password="p",
            partition_column="id",  # bounds missing
        )
