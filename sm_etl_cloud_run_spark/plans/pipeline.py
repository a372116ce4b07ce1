"""Flagship query: the reference's stage-1 PA pipeline shape mapped onto
the driver's testdata (SURVEY §3 EP1 → §7.1 M0).

Reference pipeline (etl/siasus_procedimentos_ambulatoriais.py:153-363):
panel filter (F1) → condition filter (F2) → rename/parse/clean → period
lookup (J1) → geo lookup (J2) → audit columns (P3) → validate → sink.

Testdata mapping: `lineitem ⋈ orders` is the fact; the BUILDING-segment
customers are the active panel; a composite part predicate plays the
mental-health condition filter; a derived month dim plays `periodos`;
customer→nation→region plays the geography lookup.

Plan shape at scale: panel + part-flag are broadcast semi-joins (no
fact shuffle), the fact join shuffles once on orderkey, the period and
geo lookups are broadcast hash joins, then one hash aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dates import now_gmt_minus3
from ..operators import filters, joins
from ..tables import load_tables
from .registry import register
from .relational import _bp, _cents, _month_periods

_FLAGSHIP_ORACLE = """
WITH panel AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
),
part_flag AS (
  SELECT p_partkey FROM part
  WHERE p_type = 'PROMO'
     OR p_name LIKE 'red%'
     OR regexp_matches(p_name, '(gear|gizmo)$')
     OR p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
),
periodos AS (
  SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE) AS data_inicio FROM orders
),
p2 AS (
  SELECT data_inicio,
         CAST(year(data_inicio) AS VARCHAR) || '.M' || CAST(month(data_inicio) AS VARCHAR) AS codigo
  FROM periodos
),
enr AS (
  SELECT c_custkey, n_name, r_name
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
)
SELECT p2.codigo AS periodo_codigo,
       enr.r_name AS region_name,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN p2 ON CAST(date_trunc('month', o_orderdate) AS DATE) = p2.data_inicio
JOIN enr ON o_custkey = enr.c_custkey
WHERE o_custkey IN (SELECT c_custkey FROM panel)
  AND l_partkey IN (SELECT p_partkey FROM part_flag)
GROUP BY 1, 2
"""


def build_flagship(spark: SparkSession, sf_dir: str, *, with_audit: bool = False) -> DataFrame:
    t = load_tables(spark, sf_dir)

    # F1 — active-panel semi-join (broadcast; reference pulls an id list).
    panel = t["customer"].where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders_panel = filters.panel_semi_join(t["orders"], panel, "o_custkey", "c_custkey")

    # F2 — composite condition predicate on the part dim → semi-join keys.
    cond = filters.composite_condition(
        equals=[(F.col("p_type"), "PROMO")],
        prefixes=[(F.col("p_name"), ["red"])],
        rlikes=[(F.col("p_name"), "(gear|gizmo)$")],
        isin=[(F.col("p_brand"), ["Brand#1", "Brand#2", "Brand#3"])],
    )
    part_flag = t["part"].where(cond).select("p_partkey")
    li = filters.panel_semi_join(t["lineitem"], part_flag, "l_partkey", "p_partkey")

    # fact join — the one genuine shuffle (orderkey × orderkey).
    fact = li.join(orders_panel, F.col("l_orderkey") == F.col("o_orderkey"))

    # J1 — month-period lookup (equi fast path over derived periodos dim).
    periods = _month_periods(t["orders"]).select("data_inicio", "codigo")
    fact = joins.period_equi_join(
        fact, periods, F.col("o_orderdate"), attach={"codigo": "periodo_codigo"}
    )

    # J2 — geography broadcast lookups (customer → nation → region).
    enr = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "n_name", "r_name")
    )
    fact = joins.broadcast_lookup(
        fact, enr, F.col("o_custkey") == enr["c_custkey"],
        select={"r_name": "region_name"},
    )

    out = fact.groupBy("periodo_codigo", "region_name").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.round(F.col("l_quantity"), 0).cast("long")).alias("sum_qty"),
        (F.sum(_cents("l_extendedprice") * (100 - _bp("l_discount"))).cast("double") / 10000.0).alias("revenue"),
    )
    if with_audit:
        # P3 — audit columns (reference stamps criacao/atualizacao in GMT-3);
        # excluded from oracle comparison (non-deterministic by design).
        out = out.withColumns(
            {"criacao_data": now_gmt_minus3(), "atualizacao_data": now_gmt_minus3()}
        )
    return out


@register("flagship_panel_enrichment", oracle=_FLAGSHIP_ORACLE, bench=True,
          description="flagship PA-pipeline shape: F1+F2+J1+J2+A over testdata")
def flagship_panel_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_flagship(spark, sf_dir, with_audit=False)
