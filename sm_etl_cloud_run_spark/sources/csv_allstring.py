"""All-string CSV scan (SURVEY §2.1 S6).

The reference reads every bronze CSV with `dtype=str`
(utilitarios/cloud_storage.py:57,109) — schema-on-read suppressed, typing
deferred to the load stage (C20). Spark equivalent: explicit all-
StringType schema (never `inferSchema`, which would both scan twice and
guess types the load stage owns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv_allstring(
    spark: SparkSession,
    path: str,
    *,
    columns: list[str] | None = None,
    encoding: str = "UTF-8",
    sep: str = ",",
    header: bool = True,
) -> DataFrame:
    """Read CSV with every column as nullable string.

    If `columns` is given, the schema is fixed up front (single pass, no
    inference job); otherwise only the header line is read to discover
    names.
    """
    reader = spark.read.option("header", header).option("encoding", encoding).option("sep", sep)
    if columns is None:
        # One tiny job over the header only — not an inference pass.
        head = spark.read.option("header", True).option("encoding", encoding).option("sep", sep).csv(path)
        columns = head.columns
    schema = T.StructType([T.StructField(c, T.StringType(), True) for c in columns])
    return reader.schema(schema).csv(path)


def cast_columns(df: DataFrame, type_map: dict[str, str]) -> DataFrame:
    """C20: the load-stage str→typed coercion pipeline.

    `type_map` maps column → Spark type DDL ("long", "double", "boolean",
    "date", "timestamp"). Booleans follow the reference's `'True'`-string
    decode (load_bd/*:128-131); invalid numerics/dates → NULL (pandas
    `coerce` semantics, session runs ANSI-off).
    """
    from pyspark.sql import functions as F

    exprs = {}
    for col, typ in type_map.items():
        c = F.col(col)
        if typ == "boolean":
            exprs[col] = F.when(c.isNull(), None).otherwise(c == "True")
        elif typ in ("long", "bigint", "int"):
            # two-phase via double to survive "1.0"-style strings (pandas issue 25472 parity)
            exprs[col] = c.cast("double").cast("long")
        else:
            exprs[col] = c.cast(typ)
    return df.withColumns(exprs)
