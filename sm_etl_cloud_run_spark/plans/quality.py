"""Declarative data-quality suite over the fact table.

The reference hardcodes its validators (A4 null-count checks,
`validar_dataframe`-style assertions — see SURVEY §2); this module
runs the generalized form: a declarative expectation suite compiled to
ONE aggregate pass (operators/expectations.py), reported long-format
so runs can be diffed and alerted on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.expectations import Expectation, run_expectations
from ..tables import load_tables
from .registry import register

_SUITE = [
    Expectation("orderkey_not_null", "not_null", column="l_orderkey"),
    Expectation("pk_unique", "unique", columns=("l_orderkey", "l_linenumber")),
    Expectation("quantity_in_1_50", "in_range", column="l_quantity", lo=1, hi=50),
    Expectation("returnflag_domain", "accepted_values", column="l_returnflag",
                values=("A", "N", "R")),
    Expectation("discount_complete_99pct", "completeness_bp", column="l_discount",
                threshold=9900),
    Expectation("linestatus_uppercase", "regex_violations", column="l_linestatus",
                pattern="^[A-Z]$"),
]

_DQ_ORACLE = """
WITH a AS (
  SELECT COUNT(*) - COUNT(l_orderkey) AS nn,
         COUNT(*) - COUNT(DISTINCT concat_ws('|',
             COALESCE(CAST(l_orderkey AS VARCHAR), '∅'),
             COALESCE(CAST(l_linenumber AS VARCHAR), '∅'))) AS dup,
         COUNT(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END) AS rng,
         COUNT(CASE WHEN l_returnflag IS NOT NULL
                     AND l_returnflag NOT IN ('A', 'N', 'R') THEN 1 END) AS accv,
         (10000 * COUNT(l_discount)) // COUNT(*) AS comp,
         COUNT(CASE WHEN l_linestatus IS NOT NULL
                     AND NOT regexp_matches(l_linestatus, '^[A-Z]$') THEN 1 END) AS rex
  FROM lineitem
)
SELECT 'orderkey_not_null' AS check_id, 'not_null' AS kind,
       'l_orderkey' AS col_name, CAST(nn AS BIGINT) AS observed,
       CAST(0 AS BIGINT) AS threshold, CAST(nn <= 0 AS BIGINT) AS passed FROM a
UNION ALL
SELECT 'pk_unique', 'unique', 'l_orderkey|l_linenumber', CAST(dup AS BIGINT),
       CAST(0 AS BIGINT), CAST(dup <= 0 AS BIGINT) FROM a
UNION ALL
SELECT 'quantity_in_1_50', 'in_range', 'l_quantity', CAST(rng AS BIGINT),
       CAST(0 AS BIGINT), CAST(rng <= 0 AS BIGINT) FROM a
UNION ALL
SELECT 'returnflag_domain', 'accepted_values', 'l_returnflag',
       CAST(accv AS BIGINT), CAST(0 AS BIGINT), CAST(accv <= 0 AS BIGINT) FROM a
UNION ALL
SELECT 'discount_complete_99pct', 'completeness_bp', 'l_discount',
       CAST(comp AS BIGINT), CAST(9900 AS BIGINT),
       CAST(comp >= 9900 AS BIGINT) FROM a
UNION ALL
SELECT 'linestatus_uppercase', 'regex_violations', 'l_linestatus',
       CAST(rex AS BIGINT), CAST(0 AS BIGINT), CAST(rex <= 0 AS BIGINT) FROM a
"""


@register("dq_expectations_report", oracle=_DQ_ORACLE,
          description="declarative data-quality suite (not-null / unique / "
                      "range / domain / completeness / regex) in ONE aggregate "
                      "pass, long-format report")
def dq_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-expectation quality gate over lineitem, compiled to a single
    hash-aggregate scan (never one job per check — see
    operators/expectations.py for the 100 TB argument). Observations
    are exact integers (violation counts / completeness basis points),
    so the report is bit-stable across engines and runs."""
    t = load_tables(spark, sf_dir)
    return run_expectations(t["lineitem"], _SUITE)
