"""Second batch of operator queries: projections (P1/P2/P3/P6), substance
flags (C5), timestamp round-trips (C13/C17), FTP LIST scan (S3), distinct
(A5), deterministic row ids (P9), vintage harmonization (P4 e2e),
cube/rollup, and vocabulary top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dates import make_date_from_year_month, to_iso8601
from ..functions.ids import deterministic_row_id
from ..functions.text import tokens
from ..operators.projections import add_constants, normalize_headers, project, rename_map
from ..operators.reshape import harmonize_columns, union_harmonized
from ..sources.ftp_list import parse_ftp_list_lines
from ..tables import load_tables
from .registry import register

# ---------------------------------------------------------------------------
# P1/P2/P3/P6 — the rename/normalize/constants/project pipeline head
# ---------------------------------------------------------------------------

_DE_PARA = {
    "P_PARTKEY": "produto_id",
    "P_BRAND": "marca",
    "P_TYPE": "tipo",
    "P_SIZE": "tamanho",
}

_P1_ORACLE = """
SELECT p_partkey AS produto_id, p_brand AS marca, p_type AS tipo,
       CAST(p_size AS BIGINT) AS tamanho,
       'PASP2408.dbc' AS ftp_arquivo_nome
FROM part
"""


@register("p1_p6_rename_project", oracle=_P1_ORACLE,
          description="P1/P2/P3/P6: header normalize → de-para rename → constants → fixed projection")
def p1_p6_rename_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    raw = normalize_headers(t["part"])  # P2: upper-case headers like raw DBF
    renamed = rename_map(raw, _DE_PARA)  # P1
    final = add_constants(renamed, {"ftp_arquivo_nome": F.lit("PASP2408.dbc")})  # P3
    final = final.withColumn("tamanho", F.col("tamanho").cast("long"))
    return project(final, ["produto_id", "marca", "tipo", "tamanho", "ftp_arquivo_nome"])  # P6


# ---------------------------------------------------------------------------
# C5 — substance-abuse flag decode (contains-letter flags)
# ---------------------------------------------------------------------------

_C5_ORACLE = """
WITH src AS (
  SELECT CASE o_orderkey % 6
           WHEN 0 THEN '' WHEN 1 THEN 'A' WHEN 2 THEN 'AC'
           WHEN 3 THEN 'ACO' WHEN 4 THEN 'C' WHEN 5 THEN 'O' END AS tp_droga
  FROM orders
)
SELECT tp_droga,
       contains(tp_droga, 'A') AS usa_alcool,
       contains(tp_droga, 'C') AS usa_crack,
       contains(tp_droga, 'O') AS usa_outras,
       length(tp_droga) > 0 AS usa_drogas,
       CAST(COUNT(*) AS BIGINT) AS n
FROM src
GROUP BY 1, 2, 3, 4, 5
"""


@register("c5_substance_flags", oracle=_C5_ORACLE,
          description="C5: 'A'/'C'/'O' contains-flags decode (RAAS TP_DROGA)")
def c5_substance_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    code = (
        F.when(F.col("o_orderkey") % 6 == 0, "")
        .when(F.col("o_orderkey") % 6 == 1, "A")
        .when(F.col("o_orderkey") % 6 == 2, "AC")
        .when(F.col("o_orderkey") % 6 == 3, "ACO")
        .when(F.col("o_orderkey") % 6 == 4, "C")
        # no otherwise: CASE-without-ELSE semantics — a NULL o_orderkey
        # yields NULL tp_droga (an otherwise("O") would swallow NULLs
        # and diverge from the oracle on hostile NULL-key rows).
        .when(F.col("o_orderkey") % 6 == 5, "O")
    )
    src = t["orders"].select(code.alias("tp_droga"))
    return src.select(
        "tp_droga",
        F.col("tp_droga").contains("A").alias("usa_alcool"),
        F.col("tp_droga").contains("C").alias("usa_crack"),
        F.col("tp_droga").contains("O").alias("usa_outras"),
        (F.length("tp_droga") > 0).alias("usa_drogas"),
    ).groupBy("tp_droga", "usa_alcool", "usa_crack", "usa_outras", "usa_drogas").agg(
        F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# C13/C17 — US-FTP timestamp parse + ISO-8601 serialization round-trip
# ---------------------------------------------------------------------------

_C13_ORACLE = """
WITH s AS (
  SELECT event_id, strftime(ts, '%m-%d-%y %I:%M%p') AS us_ts FROM events
), p AS (
  SELECT event_id, us_ts, try_strptime(us_ts, '%m-%d-%y %I:%M%p') AS parsed FROM s
)
SELECT event_id, us_ts, parsed,
       strftime(parsed, '%Y-%m-%dT%H:%M:%S') AS iso
FROM p
"""


@register("c13_c17_timestamp_roundtrip", oracle=_C13_ORACLE,
          description="C13: 'MM-DD-YY HH:MMAM' parse; C17: ISO-8601 serialization")
def c13_c17_timestamp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    us_ts = F.date_format(F.col("ts"), "MM-dd-yy hh:mma")
    s = t["events"].select("event_id", us_ts.alias("us_ts"))
    parsed = F.to_timestamp(F.col("us_ts"), "MM-dd-yy hh:mma")
    return s.select("event_id", "us_ts", parsed.alias("parsed"), to_iso8601(parsed).alias("iso"))


# ---------------------------------------------------------------------------
# S3 — FTP LIST line scan (fixed fixture lines; listing is driver-side)
# ---------------------------------------------------------------------------

_LIST_LINES = [
    "09-03-24  03:45PM       123456 PASP2408.dbc",
    "09-03-24  03:46PM         7890 PASP2408_1.dbc",
    "01-31-24  12:00AM          555 BISP2401.dbc",
    "02-29-24  11:59PM           42 RDSP2402.dbc",
    "total 4 files",
]

_S3_ORACLE = f"""
WITH raw(line) AS (VALUES {", ".join("('" + ln + "')" for ln in _LIST_LINES)}),
parsed AS (
  SELECT regexp_extract(line, '^(\\d{{2}}-\\d{{2}}-\\d{{2}})\\s+(\\d{{2}}:\\d{{2}}[APM]{{2}})\\s+(\\d+)\\s+(.+)$', 1) AS data_raw,
         regexp_extract(line, '^(\\d{{2}}-\\d{{2}}-\\d{{2}})\\s+(\\d{{2}}:\\d{{2}}[APM]{{2}})\\s+(\\d+)\\s+(.+)$', 2) AS hora_raw,
         regexp_extract(line, '^(\\d{{2}}-\\d{{2}}-\\d{{2}})\\s+(\\d{{2}}:\\d{{2}}[APM]{{2}})\\s+(\\d+)\\s+(.+)$', 3) AS tamanho_raw,
         regexp_extract(line, '^(\\d{{2}}-\\d{{2}}-\\d{{2}})\\s+(\\d{{2}}:\\d{{2}}[APM]{{2}})\\s+(\\d+)\\s+(.+)$', 4) AS nome
  FROM raw
)
SELECT nome, CAST(tamanho_raw AS BIGINT) AS tamanho,
       try_strptime(data_raw || ' ' || hora_raw, '%m-%d-%y %I:%M%p') AS timestamp_modificacao_ftp
FROM parsed WHERE nome <> ''
"""


@register("s3_ftp_list_scan", oracle=_S3_ORACLE,
          description="S3: FTP LIST metadata parse (regex extract + C13 timestamp)")
def s3_ftp_list_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return parse_ftp_list_lines(spark, _LIST_LINES)


# ---------------------------------------------------------------------------
# A5 — distinct values
# ---------------------------------------------------------------------------

_A5_ORACLE = "SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders"


@register("a5_distinct", oracle=_A5_ORACLE, description="A5: distinct value scan")
def a5_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["orders"].select("o_orderpriority", "o_orderstatus").distinct()


# ---------------------------------------------------------------------------
# P9 — deterministic content-derived row ids (the testable uuid7 stand-in)
# ---------------------------------------------------------------------------

_P9_ORACLE = """
SELECT o_orderkey,
       substr(sha256(concat_ws(chr(31), CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR))), 1, 32) AS row_id
FROM orders
"""


@register("p9_deterministic_row_id", oracle=_P9_ORACLE,
          description="P9: content-derived 32-hex row id (uuid7's oracle-checkable twin)")
def p9_deterministic_row_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["orders"].select(
        "o_orderkey",
        deterministic_row_id(
            F.col("o_orderkey").cast("string"), F.col("o_custkey").cast("string")
        ).alias("row_id"),
    )


# ---------------------------------------------------------------------------
# P4 — two-vintage schema harmonization end-to-end (AIH-RD adicionais)
# ---------------------------------------------------------------------------

_P4_ORACLE = """
WITH va AS (
  SELECT o_orderkey,
         CAST(year(o_orderdate) AS VARCHAR) AS ano,
         CAST(month(o_orderdate) AS VARCHAR) AS mes,
         o_orderpriority AS extra
  FROM orders WHERE o_orderkey % 2 = 0
), vb AS (
  SELECT o_orderkey,
         CAST(year(o_orderdate) AS VARCHAR) AS ano,
         CAST(month(o_orderdate) AS VARCHAR) AS mes,
         CAST(NULL AS VARCHAR) AS extra
  FROM orders WHERE o_orderkey % 2 = 1
), unioned AS (
  SELECT * FROM va UNION ALL SELECT * FROM vb
)
SELECT CAST(make_date(CAST(ano AS INTEGER), CAST(mes AS INTEGER), 1) AS TIMESTAMP) AS competencia,
       extra IS NOT NULL AS has_extra,
       CAST(COUNT(*) AS BIGINT) AS n
FROM unioned
GROUP BY 1, 2
"""


@register("p4_vintage_harmonization", oracle=_P4_ORACLE,
          description="P4/R2/C12: two file vintages harmonized, unioned, make_date")
def p4_vintage_harmonization(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    o = t["orders"]
    va = o.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        F.year("o_orderdate").cast("string").alias("ano"),
        F.month("o_orderdate").cast("string").alias("mes"),
        F.col("o_orderpriority").alias("extra"),
    )
    vb = o.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        F.year("o_orderdate").cast("string").alias("ano"),
        F.month("o_orderdate").cast("string").alias("mes"),
    )
    vb = harmonize_columns(vb, va.columns)  # P4: add missing 'extra' as NULL string
    unioned = union_harmonized(va, vb)  # R2
    return unioned.select(
        make_date_from_year_month(F.col("ano"), F.col("mes")).cast("timestamp").alias("competencia"),
        F.col("extra").isNotNull().alias("has_extra"),
    ).groupBy("competencia", "has_extra").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# cube / rollup — multidimensional aggregates (engine extension)
# ---------------------------------------------------------------------------

_CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("cube_aggregate", oracle=_CUBE_ORACLE,
          description="CUBE grouping-set aggregate (all dimension subsets)")
def cube_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["lineitem"].cube("l_returnflag", "l_linestatus").agg(
        F.sum(F.round(F.col("l_quantity"), 0).cast("long")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


_ROLLUP_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


@register("rollup_aggregate", oracle=_ROLLUP_ORACLE,
          description="ROLLUP hierarchical aggregate")
def rollup_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["orders"].rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).cast("double") / 100.0).alias("total_price"),
    )


# ---------------------------------------------------------------------------
# vocabulary top-k — global token frequency (text-pipeline staple)
# ---------------------------------------------------------------------------

_VOCAB_ORACLE = """
WITH tok AS (SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents)
SELECT w AS token, CAST(COUNT(*) AS BIGINT) AS freq
FROM tok GROUP BY w
ORDER BY freq DESC, token ASC
LIMIT 100
"""


@register("text_vocab_topk", oracle=_VOCAB_ORACLE, bench=True,
          description="global token frequency top-100 (explode + count + top-k)")
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    tok = t["documents"].select(F.explode(tokens(F.col("text"))).alias("token"))
    return (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(100)
    )


_SQL_CTE = """
WITH cust_rev AS (
  SELECT o_custkey,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_cents
  FROM orders GROUP BY o_custkey
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(n_orders) AS BIGINT) AS n_orders,
       CAST(SUM(total_cents) AS BIGINT) AS total_cents
FROM customer JOIN cust_rev ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


@register("sql_interface_cte", oracle=_SQL_CTE,
          description="the spark.sql surface: CTE over registered views, ANSI SQL verbatim")
def sql_interface_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry path: `load_tables` registers the catalog views and
    the exact oracle text runs through `spark.sql` — one string, two
    engines. Catalyst plans it identically to the DataFrame form (CTE
    inlined, aggregate pushed below the join)."""
    load_tables(spark, sf_dir)
    return spark.sql(_SQL_CTE)
