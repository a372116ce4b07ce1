"""Query registry: name → (spark callable, DuckDB oracle SQL, bench flag).

Conventions that make the driver's hash comparison deterministic
(CORRECTNESS gate, see /root/repo/__spark_entry__.py):

- every computed column is aliased identically in Spark and SQL;
- float aggregates are computed in **scaled integer space** (cents /
  basis points / 1e9 fixed-point) and divided back at the end — the sum
  of doubles is order-dependent across Spark partitions, the sum of
  longs is exact on both engines;
- content hashing is md5 (available & byte-identical on both engines);
- every ORDER BY ... LIMIT has a unique tiebreaker column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    bench: bool = False
    description: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    *,
    oracle: str | None = None,
    bench: bool = False,
    description: str = "",
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, bench, description)
        return fn

    return deco


# The driver's CORRECTNESS gate checks exactly the FIRST 50 queries that
# ``all_queries()`` yields. Rounds 1-2 checked the 50 below (all green in
# CORRECTNESS_r02.json); rotate them to the back so the other 50 —
# dedup_*/knn_*/text_*/q2–q22 — get driver rows in round 3
# (VERDICT r2, "Next round" item 4). Registration order is unchanged;
# only the yield order rotates.
_DRIVER_CHECKED_R1_R2 = (
    "events_hourly_rollup", "events_sliding_window", "percentile_metrics",
    "corr_qty_discount", "events_sessionize", "events_json_extract",
    "topk_per_group", "f5_sliding_month_gate", "f4_watermark_gate",
    "events_asof_last_click", "skew_salted_user_join",
    "events_pivot_type_counts", "events_running_balance",
    "events_daily_from_hourly", "events_value_histogram",
    "events_cume_dist", "events_hourly_gapfill", "dedup_last_write",
    "events_anomaly_zscore", "events_conversion_funnel",
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "f1_panel_semi_join", "f2_composite_predicate", "f3_conditional_null",
    "f6_retention_window", "j1_period_range_join", "j1_period_equi_join",
    "j1_period_bucketed_range_join", "j4_next_period_lead",
    "a1_partition_rollup", "a4_null_validator", "r1_unpivot_melt",
    "r2_union_harmonized", "p7_p8_code_split", "c1_c2_bool_decode",
    "c6_roman_numerals", "c9_c14_date_parse", "c16_interval_text",
    "c19_decimal_comma", "c18_c20_typed_measures",
    "flagship_panel_enrichment", "pipeline_fact_transform",
    "p1_p6_rename_project", "c5_substance_flags",
    "c13_c17_timestamp_roundtrip", "s3_ftp_list_scan", "a5_distinct",
    "p9_deterministic_row_id",
)


# Queries added in round 3+ (never driver-checked, but locally
# parity-verified): yield them AFTER the r1/r2-unchecked block so they
# don't displace that block from the driver's first-50 window.
_NEW_SINCE_R3 = (
    "training_pack_sequences", "training_stratified_sample",
    "training_shuffle_buckets",
)


def all_queries() -> dict[str, QuerySpec]:
    later = set(_DRIVER_CHECKED_R1_R2) | set(_NEW_SINCE_R3)
    fresh = {k: v for k, v in _REGISTRY.items() if k not in later}
    new = {k: _REGISTRY[k] for k in _NEW_SINCE_R3 if k in _REGISTRY}
    prior = {k: _REGISTRY[k] for k in _DRIVER_CHECKED_R1_R2 if k in _REGISTRY}
    return {**fresh, **new, **prior}


def bench_queries() -> dict[str, QuerySpec]:
    return {k: v for k, v in _REGISTRY.items() if v.bench}


def get(name: str) -> QuerySpec:
    return _REGISTRY[name]
