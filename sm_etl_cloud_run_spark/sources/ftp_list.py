"""FTP LIST metadata scan (SURVEY §2.1 S2/S3).

The reference parses `LIST` response lines with a regex into
(mod-date, hour, size, name) (etl/datasus_ftp_metadados.py:93-126) and
prefers partitioned shards (`X_1.dbc … X_N.dbc`) over the unpartitioned
monolith when both exist (utilitarios/datasus_ftp.py:117-126).

Listing is inherently driver-side; parsing and downstream transforms are
distributed.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# `09-03-24  03:45PM       123456 PASP2408.dbc`
_LIST_RE = r"^(\d{2}-\d{2}-\d{2})\s+(\d{2}:\d{2}[APM]{2})\s+(\d+)\s+(.+)$"


def parse_ftp_list_lines(spark: SparkSession, lines: list[str], *, prefixes: tuple[str, ...] = ()) -> DataFrame:
    """LIST lines → DataFrame(data_modificacao, hora, tamanho, nome)
    with the US timestamp parsed (C13) and optional prefix filtering."""
    df = spark.createDataFrame([(ln,) for ln in lines], "line string")
    parsed = df.select(
        F.regexp_extract("line", _LIST_RE, 1).alias("data_raw"),
        F.regexp_extract("line", _LIST_RE, 2).alias("hora_raw"),
        F.regexp_extract("line", _LIST_RE, 3).alias("tamanho_raw"),
        F.regexp_extract("line", _LIST_RE, 4).alias("nome"),
    ).where(F.col("nome") != "")
    out = parsed.select(
        "nome",
        F.col("tamanho_raw").cast("long").alias("tamanho"),
        F.to_timestamp(
            F.concat_ws(" ", "data_raw", "hora_raw"), "MM-dd-yy hh:mma"
        ).alias("timestamp_modificacao_ftp"),
    )
    if prefixes:
        cond = None
        for p in prefixes:
            term = F.col("nome").startswith(p)
            cond = term if cond is None else (cond | term)
        out = out.where(cond)
    return out


def prefer_partitioned(names: list[str], pattern: str | re.Pattern) -> list[str]:
    """S2: among files matching `pattern`, if both partitioned
    (`BASE_1.dbc`) and unpartitioned (`BASE.dbc`) forms exist, keep only
    the partitioned shards (they supersede the monolith)."""
    rx = re.compile(pattern) if isinstance(pattern, str) else pattern
    matched = [n for n in names if rx.fullmatch(n) or rx.match(n)]
    part_re = re.compile(r"^(?P<base>\w{8})_(\d+)\.dbc$", re.IGNORECASE)
    partitioned_bases = {m.group("base").upper() for n in matched if (m := part_re.match(n))}
    out = []
    for n in matched:
        stem = n.rsplit(".", 1)[0].upper()
        if part_re.match(n):
            out.append(n)
        elif stem in partitioned_bases:
            continue  # superseded by shards
        else:
            out.append(n)
    return out
