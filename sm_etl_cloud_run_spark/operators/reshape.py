"""Reshaping / set operations (SURVEY §2.7).

- R1 unpivot/melt — the SISAB wide-report → long transform
  (utilitarios/sisab_relatorio_producao_utilitarios.py:306-310)
- R2 schema-harmonized union — chunk/report re-assembly
  (`pd.concat`, e.g. etl/datasus_ftp_metadados.py:241-242)
- P4 add-missing-columns schema harmonization (etl/sihsus_aih_rd.py:238-244)

`melt` uses the native DataFrame.unpivot (Spark ≥3.4) — a narrow
transformation, no shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def melt(
    df: DataFrame,
    id_vars: Sequence[str],
    value_vars: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """R1: wide → long. Value columns are coerced to a common type by
    Spark's unpivot; pre-cast numerics to double for mixed-type inputs."""
    return df.unpivot(list(id_vars), list(value_vars), var_name, value_name)


def harmonize_columns(df: DataFrame, required: Sequence[str]) -> DataFrame:
    """P4: add every missing `required` column as NULL string (the AIH-RD
    vintage harmonization), preserving existing columns."""
    missing = [c for c in required if c not in df.columns]
    if missing:
        df = df.withColumns({c: F.lit(None).cast("string") for c in missing})
    return df


def union_harmonized(*dfs: DataFrame) -> DataFrame:
    """R2: union by column name, filling absent columns with NULL —
    `pd.concat(ignore_index=True)` semantics."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out
