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

import re
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Hostile-row contracts, enforced identically on BOTH engines: Spark
# normalizes at load (tables.load_tables), and every oracle is
# rewritten at registration to read the table through the same
# normalization. Without these, driver-regenerated data with NULL rows
# diverged (NULL propagation differs between Spark explode/size/window
# and DuckDB unnest/len/window NULLS ordering):
# - documents: NULL text is an empty document (8 queries diverged);
# - events: a row with NULL ts is not an event — dropped (3 window/
#   rollup queries diverged: Spark time-windows drop NULL keys and
#   sort NULLS FIRST, DuckDB keeps them and sorts NULLS LAST).
# No oracle uses table-qualified bare references (`documents.x`), so
# the unaliased subqueries are drop-ins; aliased refs keep the alias.
_TABLE_CONTRACTS = {
    # NULL text is an empty document; a document without an id is not
    # addressable (doc_id feeds rank orderings and md5 coins, where
    # Spark's NULLS FIRST vs DuckDB's NULLS LAST would diverge) —
    # dropped. Every documents consumer already reads doc_id, so the
    # IsNotNull adds no ReadSchema cost.
    "documents": "(SELECT * REPLACE (coalesce(text, '') AS text) FROM documents"
                 " WHERE doc_id IS NOT NULL)",
    "events": "(SELECT * FROM events WHERE ts IS NOT NULL)",
    # a vector without an id or payload can be neither ranked (seed
    # selection is ORDER BY vec_id) nor scored — dropped.
    "embeddings": "(SELECT * FROM embeddings"
                  " WHERE vec_id IS NOT NULL AND embedding IS NOT NULL)",
    # A fact row without its date is not a valid fact row (see
    # tables.load_tables — date-only so column pruning survives):
    # key/attribute NULLs stay and queries handle them SQL-identically.
    "orders": "(SELECT * FROM orders WHERE o_orderdate IS NOT NULL)",
    "lineitem": "(SELECT * FROM lineitem WHERE l_shipdate IS NOT NULL)",
}


def _contract_oracle(oracle: str | None) -> str | None:
    if oracle is None:
        return None
    for tbl, wrap in _TABLE_CONTRACTS.items():
        oracle = re.sub(rf"\b(FROM|JOIN)(\s+){tbl}\b", rf"\1\2{wrap}", oracle)
    return oracle


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
        _REGISTRY[name] = QuerySpec(name, fn, _contract_oracle(oracle), bench, description)
        return fn

    return deco


# The driver's CORRECTNESS gate checks exactly the FIRST 50 queries that
# ``all_queries()`` yields. The yield order is change-aware (VERDICT r3,
# "Next round" item 2): lead with queries whose implementation changed
# since their last green driver row or that never had one, then the
# longest-unchecked block, then the most recently checked block.
# Registration order is unchanged; only the yield order is prioritized.

# Tier 1 — queries whose implementation changed after their last green
# driver row. CORRECTNESS_r05 closed the never-checked gap entirely
# (driver union r1-r5 = 195/195); from round 6 on this tier is purely
# change-tracking: every query here rides code touched THIS round
# (grouped distributed_rank rewires of the rank-exact percentile
# family, the bounded perplexity calibration sample, the tracked-cache
# persist switch in windows/graph/simhash, the sampled-candidates
# minhash-accuracy mode), plus anything newly registered. The window's
# tail falls through to tier 2 (longest-unchecked — their green rows
# date to rounds 1/2, so re-greening the oldest costs the driver
# nothing and keeps rows fresh).
_CHANGED_OR_NEVER_CHECKED = (
    # registered THIS round (driver r7), never driver-checked:
    "mixture_unimax_budget",
    "corpus_vocab_coverage",
    "corpus_filter_funnel",
    "quality_linear_classifier",
    "events_multitouch_attribution",
    "events_timedecay_attribution",
    "orders_cohort_ltv",
    "join_bloom_prefilter",
    "text_bigram_kneser_ney",
    "embedding_jl_distortion",
    # registered last round; kept in the window until a CORRECTNESS
    # row is observed for them (r6 artifacts did not land in-repo):
    "corpus_bytes_per_token",
    "dedup_cluster_canonical",
    "embedding_int8_quant_error",
    "mixture_doremi_step",
    "corpus_oov_rate",
    "dedup_survivorship",
    "knn_label_propagation",
    "corpus_topic_tags",
    "text_token_entropy",
    "quality_score_calibration",
    "training_decontaminate_report",
    "dedup_cross_lingual",
    # changed THIS round after their r4/r5 green rows:
    "events_value_ntile",       # grouped distributed_ntile rewire
    "events_cume_dist",         # cume_dist/percent_rank via grouped rank
            # cume_dist/percent_rank via grouped rank
    "events_winsorized_stats",      # grouped distributed_rank rewire
    "events_mad_outliers",          # grouped distributed_rank rewire
    "events_inter_arrival_stats",   # distributed_lag rewire
    "corpus_perplexity_buckets",    # per-lang bounded calibration sample
    "dedup_minhash_accuracy",       # sampled-candidates mode
    "dedup_simhash_pairs",          # persist -> persist_tracked
    "knn_graph_link_prediction",    # persist -> persist_tracked
    # distributed_rank/ntile/cumsum riders (operators/windows.py now
    # persists through the tracked-cache module):
    "training_dsir_sample",
    "text_zipf_fit",
    "documents_length_deciles",
    "events_key_skew_profile",
    "events_rfm_segments",
    "events_decile_lift",
    "training_token_budget_fill",
)

# Tier 2 — last driver-checked in rounds 1/2 (longest unchecked).
_DRIVER_CHECKED_R1_R2 = (
    "events_hourly_rollup", "events_sliding_window", "percentile_metrics",
    "corr_qty_discount", "events_sessionize", "events_json_extract",
    "topk_per_group", "f5_sliding_month_gate", "f4_watermark_gate",
    "events_asof_last_click", "skew_salted_user_join",
    "events_pivot_type_counts", "events_running_balance",
    "events_daily_from_hourly", "events_value_histogram",
    "events_hourly_gapfill", "dedup_last_write",
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


def all_queries() -> dict[str, QuerySpec]:
    """Yield specs in driver-window priority order.

    Tier 1 (changed/never-checked) first, then tier 2 (longest
    unchecked), then everything else (checked green most recently, in
    registration order). Names listed but not registered are skipped.
    """
    ordered: dict[str, QuerySpec] = {}
    for name in (*_CHANGED_OR_NEVER_CHECKED, *_DRIVER_CHECKED_R1_R2):
        if name in _REGISTRY and name not in ordered:
            ordered[name] = _REGISTRY[name]
    for name, spec in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered


def bench_queries() -> dict[str, QuerySpec]:
    return {k: v for k, v in _REGISTRY.items() if v.bench}


def get(name: str) -> QuerySpec:
    return _REGISTRY[name]
