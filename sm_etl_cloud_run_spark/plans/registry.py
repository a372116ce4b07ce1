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
    # a row with no timestamp is not an event; a row with no event_id is
    # not addressable (conversion key in attribution, dedup key in CDC).
    "events": "(SELECT * FROM events"
              " WHERE ts IS NOT NULL AND event_id IS NOT NULL)",
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
        # FROM t / JOIN t / comma-join ",t" (with or without space) —
        # the comma form would otherwise silently dodge the contract
        # (found live: a boundary-count oracle read raw events through
        # "FROM bd, events" and counted a contract-dropped NULL-ts
        # row). Whitespace is quantified PER BRANCH: a bare (\s*)
        # shared by all three would let the FROM/JOIN branches match
        # inside identifiers like "FROMevents". The (?!\s*\.) lookahead
        # keeps the comma branch from rewriting table-QUALIFIED refs
        # that happen to follow a comma outside a FROM list ("GROUP BY
        # x, events.y" — ADVICE r8); the repo convention remains "no
        # table-qualified bare references in oracles", and
        # tests/test_plans.py::test_contract_oracle_comma_contexts pins
        # both directions.
        oracle = re.sub(
            rf"(\bFROM\s+|\bJOIN\s+|,\s*){tbl}\b(?!\s*\.)", rf"\1{wrap}", oracle
        )
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
# driver row, plus anything newly registered. Round 9: CORRECTNESS_r08
# greened exactly the first 50 of the round-8 ordering, so the head is
# now the 29 contract-touched events rows that missed that window
# (VERDICT r8 "Next round" item 1 — their newest driver-green row
# predates the event_id load contract), ordered longest-unchecked
# first, then this round's newly-registered queries.
_CHANGED_OR_NEVER_CHECKED = (
    # events family under the event_id contract, missed the r8 window —
    # last driver-checked r4/r5:
    "events_grouping_sets",
    "events_asof_tolerance",
    "events_rolling_wau",
    "events_type_cooccurrence",
    "events_session_stats",
    "events_nstep_funnel",
    "events_ab_test_readout",
    "events_benford_audit",
    # rows-only by design (weaker driver check, still contract-touched;
    # events_sketch_rollup_merge additionally REIMPLEMENTED this round
    # as a fully oracle-checked portable sketch — VERDICT r8 item 2):
    "events_sketch_profile",
    "events_sketch_rollup_merge",
    "events_rolling_wau_hll",
    # events family under the contract — last driver-checked r7:
    "events_multitouch_attribution",
    "events_value_ntile",
    "events_cume_dist",
    "events_winsorized_stats",
    "events_mad_outliers",
    "events_inter_arrival_stats",
    "events_key_skew_profile",
    "events_rfm_segments",
    "events_decile_lift",
    "events_hourly_rollup",
    "events_sliding_window",
    "percentile_metrics",
    "events_sessionize",
    "events_json_extract",
    "f4_watermark_gate",
    "events_asof_last_click",
    "skew_salted_user_join",
    "events_pivot_type_counts",
    # registered round 9, never driver-checked (appended as they land):
    "quality_classifier_train",
    "multimodal_audio_fingerprint_dedup",
    "events_gk_portable_quantiles",
    "events_bitmap_distinct_rollup",
    "events_theta_sketch_distinct",
    "dedup_clone_collapse_gate",
    "events_tdigest_portable",
    "events_sessionize_incremental",
    "events_late_data_profile",
    "dedup_containment_pairs",
    "quality_classifier_auc",
    "join_size_estimate_sampled",
    "customer_t_closeness",
    "quality_classifier_train_auc",
    "text_shingle_df_profile",
    "events_stream_state_census",
    "knn_ivf_recall_curve",
    "knn_graph_kcore",
    "events_watermark_tradeoff",
)

# Tier 2 — longest unchecked among unchanged queries (green rows from
# rounds 1/2). 29 + 8 tier-1 rows leave 13 window slots: the first 13
# below complete the 50; the rest clear in round 10 (every other
# registry row is r8-green, so the whole ledger is ≤2 rounds old
# after that).
_DRIVER_CHECKED_R1_R2 = (
    "corr_qty_discount", "topk_per_group", "f5_sliding_month_gate",
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
    "s3_ftp_list_scan", "a5_distinct",
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
