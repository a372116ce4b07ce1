"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The engine lives in ``sm_etl_cloud_run_spark/``; queries and oracles are
registered in ``sm_etl_cloud_run_spark.plans`` (one entry per operator
from SURVEY.md §2 plus the LLM-pipeline scale layer).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sm_etl_cloud_run_spark import plans  # noqa: E402
from sm_etl_cloud_run_spark.plans.pipeline import build_flagship  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return build_flagship(spark, _SMOKE_SF_DIR, with_audit=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in plans.all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible
    ops — driver records a rows-only check for those)."""
    return {
        name: spec.oracle
        for name, spec in plans.all_queries().items()
        if spec.oracle is not None
    }
