"""Query plans: the driver-facing registry of operator queries.

Each query is (a) a Spark callable `(spark, sf_dir) -> DataFrame` built
from the engine's operator modules and (b) — when SQL-expressible — an
ANSI oracle string DuckDB runs over the same parquet tables. Importing
this package populates the registry.
"""

from . import (  # noqa: F401
    corpus_stats,
    entity,
    events_queries,
    graph_train,
    mixture,
    pipeline,
    pipeline_fact,
    quality,
    relational,
    relational2,
    search,
    sequence,
    textops,
    tpch_extra,
    training,
    tpch_joins,
    tpch_wide,
    vector,
)
from .registry import all_queries, bench_queries, get  # noqa: F401
