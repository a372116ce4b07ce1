"""Physical-plan assertions — the 100 TB design contract.

These pin the plan shapes that make the engine scale:
- filters reach the parquet scan (PushedFilters),
- scans prune to referenced columns only (ReadSchema),
- dimension joins broadcast (no fact-side shuffle),
- hot paths stay JVM-side (no BatchEvalPython / row-wise Python).
"""

from __future__ import annotations

import contextlib
import io

import pytest

from sm_etl_cloud_run_spark.plans import get


def _plan(spark, name, sf_dir, mode="formatted") -> str:
    df = get(name).fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_q1_filter_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, "q1_pricing_summary", sf_dir)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: untouched columns must not be read
    assert "l_partkey" not in plan
    assert "l_suppkey" not in plan


def test_flagship_broadcasts_dims(spark, sf_dir):
    plan = _plan(spark, "flagship_panel_enrichment", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # panel + part-flag semi-joins should be broadcast, not shuffle
    assert "LeftSemi BuildRight" in plan


def test_period_equi_join_is_hash_not_nested_loop(spark, sf_dir):
    plan = _plan(spark, "j1_period_equi_join", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_period_range_join_is_broadcast_nested_loop(spark, sf_dir):
    # the general interval form: acceptable ONLY because the dim is tiny
    plan = _plan(spark, "j1_period_range_join", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan


def test_no_python_udf_in_hot_paths(spark, sf_dir):
    for q in (
        "q1_pricing_summary",
        "flagship_panel_enrichment",
        "dedup_minhash_signatures",
        "dedup_lsh_pairs",
        "text_token_stats",
        "events_hourly_rollup",
    ):
        plan = _plan(spark, q, sf_dir)
        assert "BatchEvalPython" not in plan, q
        assert "ArrowEvalPython" not in plan, q


def test_knn_paths_use_arrow_not_pickled_rows(spark, sf_dir):
    """r13 (guide §4.2 / VERDICT r12 item 5): the kNN fixed-point
    arithmetic runs as vectorized numpy over ARROW batches — the plans
    must show ArrowEvalPython (the byte-identity-pinned twins), and
    never BatchEvalPython (row-pickled scalar UDFs)."""
    for q in ("knn_brute_force", "knn_graph_lsh", "knn_graph_brute"):
        plan = _plan(spark, q, sf_dir)
        assert "ArrowEvalPython" in plan, q
        assert "BatchEvalPython" not in plan, q


def test_semi_join_used_for_panel_filter(spark, sf_dir):
    plan = _plan(spark, "f1_panel_semi_join", sf_dir)
    assert "LeftSemi" in plan


def test_q19_brackets_push_to_scans(spark, sf_dir):
    """The OR-of-AND brackets must partially push down: brand/size terms
    reach the part scan, quantity bounds the lineitem scan, and the part
    side broadcasts (no fact shuffle for a dim join)."""
    plan = _plan(spark, "q19_bracket_disjunction", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters" in plan
    # the quantity disjunction's global bounds should reach lineitem
    assert "l_quantity" in plan.split("lineitem.parquet")[0] or "Or(" in plan


def test_q2_min_cost_single_fact_shuffle(spark, sf_dir):
    """Per-(part,supplier) agg then window-min per part: the fact side
    shuffles on the group keys once; part/supplier joins stay broadcast
    or reuse the partitioning — no CartesianProduct, no nested loop."""
    plan = _plan(spark, "q2_min_cost_supplier", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q8_dims_broadcast(spark, sf_dir):
    plan = _plan(spark, "q8_market_share", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# Queries where a nested-loop/cartesian shape is the DESIGN, not a bug:
# the general-form range join (broadcast NLJ), brute-force/LSH ANN and
# embedding pair scoring (explicit small-side crossJoin), and scalar
# broadcasts of 1-row aggregates (q11/q15/q22-style thresholds).
_NESTED_LOOP_OK = {
    "j1_period_range_join",
    "knn_brute_force",
    "knn_lsh_bucketed",
    "knn_ivf",
    "knn_graph_brute",   # batch query-set broadcast: |corpus|×|queries| scoring is the work

    "embedding_dup_pairs",
    "q11_important_stock",
    "q15_top_supplier",
    "q22_dormant_customers",
    "f5_sliding_month_gate",
    "events_sliding_window",
    "set_intersect_except",  # three 1-row aggs crossJoined into one output row
    "text_tfidf_topterms",   # 1-row corpus-size scalar broadcast (N for idf)
    "quality_score_calibration",  # 1-row score-range (mn,mx) scalar broadcast
    "text_unigram_logprob",  # 1-row total-token scalar broadcast
    "mixture_doremi_step",   # two 1-row scalar broadcasts (vocab total, loss baseline)
    "text_bigram_logprob",   # same 1-row total-token scalar broadcast
    # exact dup-pair self-join edge discovery (small-input twin of the
    # LSH candidate path) + 1-row pr0/teleport scalar broadcast:
    "knn_graph_pagerank",
    "knn_graph_bfs_levels",  # same edge discovery as pagerank (plane scalars)
    "knn_graph_triangles",   # same edge discovery (plane scalars)
    "knn_graph_kcore",       # same edge discovery (plane scalars)
    "training_dsir_sample",  # 1-row t_src/t_tgt scalar broadcast
    "events_dedup_state_census",  # 1-row n_events scalar broadcast (r13 — was a driver collect)
    "text_pmi_collocations",  # 1-row total-token scalar broadcast (N for PMI)
    "text_bm25_topk",        # 1-row corpus-stats (N, total_tokens) scalar broadcast
    "search_hybrid_rrf",     # same corpus-stats scalar + 1-row query-vector broadcast
    "events_distribution_drift",  # 1-row time/value extrema scalar broadcast
    "events_type_cooccurrence",   # 1-row user-count scalar broadcast (N for lift)
    "events_benford_audit",       # 1-row total-count scalar broadcast (n for E[d])
    "dedup_cross_source_matrix",  # |sources|² grid from two dimension-sized sides
    "events_decile_lift",         # 10-row decile table × 1-row totals broadcast
    "events_heavy_hitters_exact", # 1-row total-traffic scalar broadcast
    "embedding_hard_negatives",   # anchor-set broadcast: |corpus|x|anchors| scoring is the work
    "corpus_perplexity_buckets",  # 1-row corpus-total scalar broadcast (unigram logprob denominator)
    "training_token_budget_fill", # same 1-row logprob-denominator broadcast
    "orders_market_basket",       # 1-row order-total scalar broadcast
    "events_rfm_segments",        # 1-row anchor-date scalar broadcast
    "events_rfm_migration",       # 1-row midpoint-timestamp scalar broadcast
    "join_size_estimate_two_table",  # two 1-row aggs crossJoined (exact + sampled arm)
    "embedding_centroid_drift",   # 1-row id-midpoint scalar broadcast
    "dedup_lsh_recall_probe",     # fixed 64-doc sample: the 2016-pair NLJ IS the probe
    "dedup_lsh_banding_tuner",    # same fixed-budget sample, all bandings in one pass
    "curation_pipeline_tuned",    # embeds the tuner core's fixed-budget sample pass
    "curation_doc_verdicts",      # same shared flag computation (tuner sample pass)
    "embedding_pca_top_component",  # 1-row max-abs normalizer broadcast
    "text_keyword_textrank",      # 1-row pr0/teleport scalar broadcast (pagerank base)
    "text_bigram_kneser_ney",     # 1-row bigram-type-count scalar broadcast (B for P_cont)
    "corpus_vocab_coverage",      # 1-row ladder-sums scalar broadcast onto <=5 boundary rows
    "join_bloom_prefilter",       # 1-row bloom-bitset map broadcast (element_at lookups)
    "events_churn_hazard",        # 1-row observation-horizon scalar broadcast
    "events_range_partition_plan",  # 8-row boundary-table broadcast onto ONE fact aggregate
    "embedding_isotropy_probe",   # 64×64 fixed-budget pair join: the pair set IS the work
    "dedup_clone_collapse_gate",  # two 1-row aggs (corpus stats × pair costs) crossJoined into the 1-row gate
    "join_size_estimate_sampled",  # exact-arm × sampled-arm 1-row aggs crossJoined into the 1-row estimate
    "customer_t_closeness",  # |QI-groups| × |bands| dense grid crossJoin — both sides parameter-sized
}
# Python appears only where the operator is Python by contract:
# uuid7 ids and the stubbed multimodal decode kernels.
_PYTHON_OK = {"multimodal_feature_extract"}


def test_registry_wide_plan_hygiene(spark, sf_dir):
    """Every registered query plan stays JVM-side and join-strategy
    sane: no row-wise Python (BatchEvalPython) outside the declared
    Python operators, and no nested-loop/cartesian join outside the
    queries designed around one."""
    from sm_etl_cloud_run_spark.plans import all_queries

    offenders_py, offenders_nlj = [], []
    for name, spec in sorted(all_queries().items()):
        plan = _plan(spark, name, sf_dir, mode="simple")
        if "BatchEvalPython" in plan and name not in _PYTHON_OK:
            offenders_py.append(name)
        if (
            ("CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan)
            and name not in _NESTED_LOOP_OK
        ):
            offenders_nlj.append(name)
    assert not offenders_py, f"row-wise Python crept into: {offenders_py}"
    assert not offenders_nlj, f"nested-loop joins crept into: {offenders_nlj}"


def test_sketch_profile_accuracy_vs_exact(spark, sf_dir):
    """events_sketch_profile has no SQL oracle (DuckDB's sketches are
    different algorithms) — bound its error against exact aggregates
    instead: HLL distinct within 5%, GK percentiles within 5% of the
    exact percentile values."""
    from pyspark.sql import functions as F

    from sm_etl_cloud_run_spark.plans import get
    from sm_etl_cloud_run_spark.tables import load_tables

    approx = {r["event_type"]: r for r in get("events_sketch_profile").fn(spark, sf_dir).collect()}
    t = load_tables(spark, sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    exact = {
        r["event_type"]: r
        for r in (
            t["events"]
            .select("event_type", "user_id", cents.alias("cents"))
            .groupBy("event_type")
            .agg(
                F.countDistinct("user_id").alias("users"),
                (F.percentile("cents", F.lit(0.5)).cast("double") / 100.0).alias("median"),
                (F.percentile("cents", F.lit(0.9)).cast("double") / 100.0).alias("p90"),
            )
            .collect()
        )
    }
    assert set(approx) == set(exact)
    for et, a in approx.items():
        e = exact[et]
        assert abs(a["approx_users"] - e["users"]) <= max(1, 0.05 * e["users"]), et
        assert abs(a["approx_median"] - e["median"]) <= max(0.5, abs(0.05 * e["median"])), et
        assert abs(a["approx_p90"] - e["p90"]) <= max(0.5, abs(0.05 * e["p90"])), et


def test_sketch_rollup_merge_exact_vs_single_pass(spark, sf_dir):
    """Two-level HLL rollups must give the SAME estimate as one direct
    pass over raw events (union-of-registers is exact — the property
    that makes stored daily sketches trustworthy), within 5%/10% of
    the true distinct count. Covers BOTH forms: the ENGINE-NATIVE
    Datasketches path (hll_sketch_agg → hll_union_agg, built inline
    here — its registers have no DuckDB twin, so pytest is its home)
    and the oracle-checked portable query events_sketch_rollup_merge
    (md5 registers), whose merge_exact flag must be 1 everywhere."""
    from pyspark.sql import functions as F

    from sm_etl_cloud_run_spark.plans import get
    from sm_etl_cloud_run_spark.tables import load_tables

    t = load_tables(spark, sf_dir)
    # engine-native two-level rollup: stored daily sketches, merged
    native_daily = (
        t["events"]
        .select(F.to_date("ts").alias("day"), "event_type", "user_id")
        .groupBy("day", "event_type")
        .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("user_sketch"))
    )
    native = {
        r["event_type"]: r
        for r in native_daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.hll_sketch_estimate(F.hll_union_agg("user_sketch"))
            .cast("long").alias("merged_est"),
        )
        .collect()
    }
    direct = {
        r["event_type"]: r
        for r in (
            t["events"]
            .groupBy("event_type")
            .agg(
                F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(14)))
                .cast("long").alias("est"),
                F.countDistinct("user_id").alias("truth"),
                F.countDistinct(F.to_date("ts")).alias("days"),
            )
            .collect()
        )
    }
    assert set(native) == set(direct)
    for et, m in native.items():
        d = direct[et]
        assert m["merged_est"] == d["est"], et                  # merge exactness
        assert abs(m["merged_est"] - d["truth"]) <= max(1, 0.05 * d["truth"]), et
        assert m["n_days"] == d["days"], et

    # portable oracle-checked form: merge==single-pass flag recorded in
    # the output itself; m=64 registers → looser (10%) accuracy bound
    portable = {r["event_type"]: r for r in
                get("events_sketch_rollup_merge").fn(spark, sf_dir).collect()}
    assert set(portable) == set(direct)
    for et, p in portable.items():
        d = direct[et]
        assert p["merge_exact"] == 1, et
        assert p["merged_users"] == p["single_pass_users"], et
        assert p["n_days"] == d["days"], et
        assert p["exact_users"] == d["truth"], et
        # m=64 linear counting at tiny n carries a few units of noise
        # (sf0.001: truth 15 → est 17), hence the absolute floor of 3
        assert abs(p["merged_users"] - d["truth"]) <= max(3, 0.10 * d["truth"]), et


def test_sample_estimate_accuracy_vs_exact(spark):
    """events_sample_estimate's scaled 10%-sample estimates must land
    within 25% of the exact per-type totals. Uses sf0.01 (≈10k events):
    at sf0.001 a per-type sample is ~20 rows and the value column is
    skewed enough that a 10% sample legitimately misses by >50% — the
    bound is a property of sample SIZE, which is the point of AQP."""
    from pyspark.sql import functions as F

    from sm_etl_cloud_run_spark.plans import get
    from sm_etl_cloud_run_spark.tables import load_tables

    sf_dir = "/root/testdata/sf0.01"
    est = {r["event_type"]: r for r in
           get("events_sample_estimate").fn(spark, sf_dir).collect()}
    t = load_tables(spark, sf_dir)
    exact = {
        r["event_type"]: r
        for r in (
            t["events"]
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("rows"),
                (F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast("double")
                 / 100.0).alias("total"),
            )
            .collect()
        )
    }
    assert set(est) == set(exact)
    for et, e in est.items():
        x = exact[et]
        assert abs(e["est_total_rows"] - x["rows"]) <= 0.25 * x["rows"], et
        assert abs(e["est_total_value"] - x["total"]) <= 0.25 * abs(x["total"]), et


def test_dsir_bucket_table_broadcasts(spark, sf_dir):
    """DSIR's 64-row likelihood-ratio table must broadcast — the point
    of hashing features is that the model side is parameter-sized."""
    plan = _plan(spark, "training_dsir_sample", sf_dir)
    assert "BroadcastHashJoin" in plan


def test_pq_codebook_train_stays_codegen(spark, sf_dir):
    """Codebook assignment is literal-array arithmetic: no Python, no
    nested loop, no join at all before the final aggregate."""
    plan = _plan(spark, "pq_codebook_train", sf_dir, mode="simple")
    assert "BatchEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_column_profile_single_scan(spark, sf_dir):
    """Five columns' stats in one pass — the plan reads lineitem once."""
    plan = _plan(spark, "lineitem_column_profile", sf_dir, mode="simple")
    final = plan.split("Initial Plan")[0]
    assert final.count("lineitem.parquet") <= 1


def test_bm25_term_stats_broadcast_single_doc_shuffle(spark, sf_dir):
    """BM25's df table and the 1-row corpus stats are parameter-sized —
    both must broadcast; the only hash-partitioned exchange on data is
    the doc-keyed tf aggregate (plus the final TakeOrdered)."""
    plan = _plan(spark, "text_bm25_topk", sf_dir, mode="simple")
    final = plan.split("Initial Plan")[0]
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final
    assert "BatchEvalPython" not in final


def test_winsorized_bounds_broadcast(spark, sf_dir):
    """The per-type p05/p95 bounds relation is |types| rows — the join
    back onto the ranked fact must be broadcast, not a shuffle join."""
    plan = _plan(spark, "events_winsorized_stats", sf_dir, mode="simple")
    final = plan.split("Initial Plan")[0]
    assert "BroadcastHashJoin" in final and "SortMergeJoin" not in final


def test_transition_matrix_one_fact_exchange(spark, sf_dir):
    """Only the lag window shuffles EVENT data (on user_id); the pair
    aggregate and the probability window exchange the |types|²-row pair
    relation — three hash exchanges total, one on the fact."""
    plan = _plan(spark, "events_transition_matrix", sf_dir, mode="simple")
    final = plan.split("Initial Plan")[0]
    assert final.count("Exchange hashpartitioning") <= 3
    assert final.count("hashpartitioning(user_id") == 1


def test_bigram_lm_total_broadcasts(spark, sf_dir):
    """The 1-row token total and the unigram joins stay broadcast; no
    Python anywhere in the LM scoring path."""
    plan = _plan(spark, "text_bigram_logprob", sf_dir, mode="simple")
    final = plan.split("Initial Plan")[0]
    assert "BroadcastHashJoin" in final
    assert "BatchEvalPython" not in final


def test_lsh_candidate_recall_vs_exact_jaccard(spark, sf_dir):
    """Retrieval-quality harness for the dedup pipeline: with 8 hashes
    in 4 bands (r=2), a pair at Jaccard s collides with p = 1-(1-s²)⁴
    — for the high-similarity pairs the dedup actually targets
    (s ≥ 0.5, p ≥ 0.68) the banding must recover a clear majority of
    the exact n-gram ground truth on this corpus. Pins the measured
    recall so a banding/hashing regression (wrong band split, broken
    min selection) shows up as a recall collapse, not as silently
    worse dedup."""
    from sm_etl_cloud_run_spark.plans import get

    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in get("dedup_ngram_jaccard").fn(spark, sf_dir).collect()
    }
    candidates = {
        (r["id_a"], r["id_b"])
        for r in get("dedup_lsh_pairs").fn(spark, sf_dir).collect()
    }
    assert exact, "ground-truth pair set is empty — corpus regenerated?"
    strong = {p for p, s in exact.items() if s >= 0.5}
    if strong:
        strong_recall = len(strong & candidates) / len(strong)
        assert strong_recall >= 0.65, f"strong-pair recall collapsed: {strong_recall:.2f}"
    overall_recall = len(set(exact) & candidates) / len(exact)
    # threshold pairs at s≈0.18 collide with p≈0.12 — overall recall is
    # naturally modest; guard the floor, not an aspiration
    assert overall_recall >= 0.10, f"overall recall collapsed: {overall_recall:.2f}"


def test_rolling_wau_hll_accuracy_vs_exact(spark):
    """The sketch-merge WAU must track the exact WAU within HLL error
    (lgK=14 → rsd ≈ 0.8%; bound at 5%) on every day — the property that
    makes the one-scan mergeable path a safe substitute at 100 TB."""
    from sm_etl_cloud_run_spark.plans import get

    sf = "/root/testdata/sf0.01"
    exact = {r["day"]: r["wau"] for r in get("events_rolling_wau").fn(spark, sf).collect()}
    approx = {r["day"]: r["wau_approx"]
              for r in get("events_rolling_wau_hll").fn(spark, sf).collect()}
    assert set(exact) == set(approx)
    for day, wau in exact.items():
        assert abs(approx[day] - wau) <= max(2, 0.05 * wau), (day, wau, approx[day])


def test_cms_heavy_hitters_bounds_vs_exact(spark, sf_dir):
    """The Count-Min twin of events_heavy_hitters_exact obeys the CMS
    guarantee: true <= est <= true + eps*N, at both a tight and a
    deliberately coarse eps (the coarse one proves the bound is doing
    work, not that the sketch is secretly exact)."""
    from pyspark.sql import functions as F

    from sm_etl_cloud_run_spark.operators.aggregates import cms_heavy_hitters
    from sm_etl_cloud_run_spark.tables import load_tables

    ev = load_tables(spark, sf_dir)["events"].where(F.col("ts").isNotNull())
    exact = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "user_id").limit(20).collect()
    }
    total = ev.count()
    for eps in (0.0001, 0.05):
        est = dict(cms_heavy_hitters(ev, "user_id", list(exact), eps=eps))
        for k, true_n in exact.items():
            assert true_n <= est[k] <= true_n + eps * total + 1, (eps, k)
    # determinism: same seed, same estimates
    again = dict(cms_heavy_hitters(ev, "user_id", list(exact)))
    assert again == dict(cms_heavy_hitters(ev, "user_id", list(exact)))


def test_minhash_accuracy_sampled_subset(spark, sf_dir):
    """sample_rate < 1 must yield a deterministic, engine-stable SUBSET
    of the exhaustive rows (identical values per kept pair — the md5
    gate only filters, never perturbs), sized near rate * |pairs|."""
    from sm_etl_cloud_run_spark.cache import release_tracked
    from sm_etl_cloud_run_spark.plans.textops import minhash_accuracy

    key = lambda r: (r["id_a"], r["id_b"])
    full = {key(r): tuple(r) for r in minhash_accuracy(spark, sf_dir).collect()}
    samp = {key(r): tuple(r)
            for r in minhash_accuracy(spark, sf_dir, sample_rate=0.5).collect()}
    again = {key(r): tuple(r)
             for r in minhash_accuracy(spark, sf_dir, sample_rate=0.5).collect()}
    release_tracked()
    assert samp == again                      # deterministic membership
    assert set(samp) < set(full)              # strict subset
    for k, row in samp.items():
        assert row == full[k]                 # values untouched
    # uniform gate: Binomial(n, .5) stays inside 4 sigma comfortably
    n = len(full)
    assert abs(len(samp) - 0.5 * n) <= 4 * (0.25 * n) ** 0.5 + 1, (len(samp), n)


def test_unimax_budget_allocation_invariants(spark, sf_dir):
    """The UniMax waterfilling closed form must behave like the
    sequential algorithm: the capped set is an ascending-capacity
    prefix, capped languages get exactly their capacity (= the epoch
    cap), and when at least one language is uncapped the budget is
    exhausted EXACTLY (floor share + distributed remainder)."""
    from sm_etl_cloud_run_spark.plans import get
    from sm_etl_cloud_run_spark.plans.mixture import _UNIMAX_BUDGET_X, _UNIMAX_EPOCH_CAP

    rows = get("mixture_unimax_budget").fn(spark, sf_dir).collect()
    assert rows
    total_tokens = sum(r["n_tokens"] for r in rows)
    budget = _UNIMAX_BUDGET_X * total_tokens
    by_cap = sorted(rows, key=lambda r: (r["capacity"], r["lang"] is None, r["lang"] or ""))
    flags = [r["capped"] for r in by_cap]
    assert flags == sorted(flags, reverse=True), "capped set must be a prefix"
    for r in rows:
        assert r["capacity"] == r["n_tokens"] * _UNIMAX_EPOCH_CAP
        assert r["budget_tokens"] <= r["capacity"]
        if r["capped"] == 1:
            assert r["budget_tokens"] == r["capacity"]
            assert r["epochs_milli"] == 1000 * _UNIMAX_EPOCH_CAP
    if any(r["capped"] == 0 for r in rows):
        assert sum(r["budget_tokens"] for r in rows) == budget
        # uncapped languages split the leftover within 1 token of equal
        unc = [r["budget_tokens"] for r in rows if r["capped"] == 0]
        assert max(unc) - min(unc) <= 1


def test_bloom_prefilter_no_false_negatives(spark, sf_dir):
    """A Bloom filter admits extra rows but NEVER drops a true match:
    per priority, n_matched must equal the exact semi-join count, and
    candidates must dominate matches."""
    from pyspark.sql import functions as F

    from sm_etl_cloud_run_spark.plans import get
    from sm_etl_cloud_run_spark.plans.tpch_joins import _BLOOM_SEGMENT
    from sm_etl_cloud_run_spark.tables import load_tables

    got = {r["o_orderpriority"]: r for r in
           get("join_bloom_prefilter").fn(spark, sf_dir).collect()}
    t = load_tables(spark, sf_dir)
    keys = t["customer"].where(F.col("c_mktsegment") == _BLOOM_SEGMENT).select("c_custkey")
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in (
            t["orders"].join(keys, t["orders"]["o_custkey"] == keys["c_custkey"], "left_semi")
            .groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n")).collect()
        )
    }
    assert set(exact) <= set(got)
    for pri, r in got.items():
        assert r["n_matched"] == exact.get(pri, 0), pri
        assert r["n_candidates"] >= r["n_matched"], pri
        assert r["n_false_pos"] == r["n_candidates"] - r["n_matched"], pri


def test_jl_distortion_concentrates_around_unit(spark, sf_dir):
    """E[||y||^2] = r * ||x||^2 for a Rademacher projection, so the
    per-label AVERAGE distortion must concentrate near 10000 bp (the
    per-vector spread is chi-square-wide, the mean is not)."""
    from sm_etl_cloud_run_spark.plans import get

    rows = get("embedding_jl_distortion").fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_vecs"] > 0
        assert 7000 <= r["avg_distortion_bp"] <= 13000, r
        assert r["min_distortion_bp"] <= r["avg_distortion_bp"] <= r["max_distortion_bp"], r


def test_kneser_ney_outputs_are_probabilities(spark, sf_dir):
    """Every smoothed estimate must stay inside (0, 1] and the
    discount must bite: pkn < raw MLE c12/c1 + the full backoff mass."""
    from sm_etl_cloud_run_spark.plans import get

    rows = get("text_bigram_kneser_ney").fn(spark, sf_dir).collect()
    assert len(rows) == 50
    counts = [r["c12"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert 0 < r["pkn_micro"] <= 1_000_000, r
        # discounted term1 stays below the raw MLE
        assert (1_000_000 * (4 * r["c12"] - 3)) // (4 * r["c1"]) \
            <= (1_000_000 * r["c12"]) // r["c1"], r


@pytest.mark.parametrize(
    "qname", ["events_multitouch_attribution", "events_timedecay_attribution"]
)
def test_attribution_conserves_credit(spark, sf_dir, qname):
    """Every conversion distributes EXACTLY 10000 bp — summed over all
    touch types (including 'unattributed'), total credit must equal
    10000 x the number of purchase conversions, and per-row credit
    never exceeds the conversions it touches. Holds for BOTH
    attribution models (linear and time-decay)."""
    from pyspark.sql import functions as F

    from sm_etl_cloud_run_spark.plans import get
    from sm_etl_cloud_run_spark.tables import load_tables

    rows = get(qname).fn(spark, sf_dir).collect()
    t = load_tables(spark, sf_dir)
    n_conv = (
        t["events"]
        .where((F.col("event_type") == "purchase") & F.col("event_id").isNotNull())
        .count()
    )
    assert sum(r["total_credit_bp"] for r in rows) == 10000 * n_conv
    for r in rows:
        assert r["total_credit_bp"] <= 10000 * r["n_conversions"], r
        if r["touch_type"] == "unattributed":
            assert r["n_touches"] == 0
            assert r["total_credit_bp"] == 10000 * r["n_conversions"]


def test_cms_estimates_dominate_exact_counts(spark, sf_dir):
    """The Count-Min invariant: the sketch NEVER undercounts — for
    every top-k user, cms_n >= exact_n, and the overcount column is
    consistent. Guards the sketch construction (a bucket-derivation
    bug typically shows up as an undercount)."""
    from sm_etl_cloud_run_spark.plans import get

    rows = get("events_cms_heavy_hitters").fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["cms_n"] >= r["exact_n"], r
        assert r["overcount_n"] == r["cms_n"] - r["exact_n"], r


def test_portable_hll_accuracy_bounded(spark, sf_dir):
    """events_hll_portable is parity-checked for exactness of the
    COMPUTATION; this bounds the ESTIMATOR: with m=64 registers and
    the small-range correction, per-type error stays within 20%
    (theoretical RSE 1.04/sqrt(64) = 13%; the bound leaves noise
    headroom). Guards against silently degrading the estimator while
    keeping both engines in agreement."""
    from sm_etl_cloud_run_spark.plans import get

    rows = get("events_hll_portable").fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["err_bp"] <= 2000, r
        assert r["hll_users"] >= 1, r


@pytest.mark.parametrize(
    "qname", ["multimodal_phash_dedup", "multimodal_audio_fingerprint_dedup"]
)
def test_phash_dedup_recovers_target_hashes(spark, sf_dir, qname):
    """The codec roundtrip (BMP→aHash for images, WAV→rFFT band
    binarization for audio) must recover the closed-form target
    fingerprint EXACTLY for every doc (the property the oracle's
    closed form relies on): every within-cluster pair appears with the
    designed Hamming distance (0 for same-motif clones, 1 for the
    flipped member), i.e. pair count = C(3,2) + 3 per full cluster of
    4 consecutive doc_ids."""
    from sm_etl_cloud_run_spark.plans import get
    from sm_etl_cloud_run_spark.tables import load_tables

    rows = get(qname).fn(spark, sf_dir).collect()
    n_docs = load_tables(spark, sf_dir)["documents"].count()
    full, rem = divmod(n_docs, 4)
    by_h = {}
    for r in rows:
        by_h.setdefault(r["hamming"], 0)
        by_h[r["hamming"]] += 1
        assert r["id_a"] < r["id_b"]
        # band collisions across motifs are filtered by hamming <= 3,
        # and designed distances are only 0 or 1
        assert r["hamming"] in (0, 1), r
    # full cluster {4k..4k+3}: members 4k+1..3 share a hash (3 clone
    # pairs) and 4k differs by one bit from each (3 distance-1 pairs)
    m = max(rem - 1, 0)  # unflipped members of the partial cluster
    exp0 = full * 3 + m * (m - 1) // 2
    exp1 = full * 3 + m
    assert by_h.get(0, 0) == exp0, (by_h, n_docs)
    assert by_h.get(1, 0) == exp1, (by_h, n_docs)


def test_contract_oracle_comma_contexts():
    """The _TABLE_CONTRACTS rewrite must wrap genuine relation
    references (FROM t / JOIN t / comma-join ", t") and must NOT
    rewrite a table-QUALIFIED reference that happens to follow a comma
    outside a FROM list (ADVICE r8: "GROUP BY x, events.y" would have
    become an inline subquery followed by ".y" — invalid SQL)."""
    from sm_etl_cloud_run_spark.plans.registry import (
        _TABLE_CONTRACTS,
        _contract_oracle,
    )

    wrap = _TABLE_CONTRACTS["events"]

    # genuine relation refs: all three forms are wrapped
    assert _contract_oracle("SELECT 1 FROM events") == f"SELECT 1 FROM {wrap}"
    assert _contract_oracle("SELECT 1 FROM a JOIN events ON a.x = y") == (
        f"SELECT 1 FROM a JOIN {wrap} ON a.x = y"
    )
    assert _contract_oracle("SELECT 1 FROM a, events WHERE a.x = y") == (
        f"SELECT 1 FROM a, {wrap} WHERE a.x = y"
    )
    assert _contract_oracle("SELECT 1 FROM a,events") == f"SELECT 1 FROM a,{wrap}"

    # qualified refs after a comma (select list / GROUP BY / function
    # args) are left alone
    for sql in (
        "SELECT x, events.y FROM events",
        "SELECT 1 FROM events GROUP BY x, events.y",
        "SELECT coalesce(a, events.y) FROM events",
    ):
        out = _contract_oracle(sql)
        assert "events.y" in out, out
        assert f"{wrap}.y" not in out, out
        # the genuine FROM ref in the same statement is still wrapped
        assert f"FROM {wrap}" in out, out

    # identifiers merely containing the table name are untouched
    assert (
        _contract_oracle("SELECT 1 FROM my_events") == "SELECT 1 FROM my_events"
    )


def test_theta_sketch_estimator_bounded(spark, sf_dir):
    """events_theta_sketch_distinct is parity-checked for exactness of
    the COMPUTATION; this bounds the ESTIMATOR: KMV with K=64 has RSE
    ≈ 1/sqrt(K-2) ≈ 13%, so per-type error stays within 25% (noise
    headroom), the small-count branch (hash_distinct <= K) must be
    exact, and every estimate is positive."""
    from sm_etl_cloud_run_spark.plans import get

    rows = get("events_theta_sketch_distinct").fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["theta_users"] >= 1, r
        assert r["err_bp"] <= 2500, r
        if r["hash_distinct"] <= 64:
            # sketch holds the whole hash-distinct set: estimator exact
            # up to 32-bit md5 hash collisions (none at test scale)
            assert r["theta_users"] == r["hash_distinct"], r


def test_bitmap_rollup_is_exact(spark, sf_dir):
    """The bitmap rollup's whole claim is EXACTNESS twice over: the
    daily→total bit_or merge equals the single-pass bitmap, and both
    equal count(distinct). A regression in word/bit arithmetic (e.g. a
    shift overflow) breaks one of these flags before it breaks parity."""
    from sm_etl_cloud_run_spark.plans import get

    rows = get("events_bitmap_distinct_rollup").fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["merge_exact"] == 1, r
        assert r["bitmap_exact"] == 1, r
        assert r["merged_users"] == r["exact_users"], r


def test_portable_quantile_twins_bounded(spark, sf_dir):
    """The two portable quantile estimators stay near the rank-exact
    values: the md5 sample's nearest-rank estimate within a
    sample-size-aware bound (quantile sampling error shrinks ~1/sqrt(n),
    so the bp budget is 2500 + 50000/sqrt(sample_n) — ~12500 at the
    sf0.001 25-row samples, ~5700 at sf0.01), and the 32-bin centroid
    digest within one bin width of the exact value per (type, quantile)."""
    from sm_etl_cloud_run_spark.plans import get
    from sm_etl_cloud_run_spark.tables import load_tables
    from pyspark.sql import functions as F

    gk = get("events_gk_portable_quantiles").fn(spark, sf_dir).collect()
    assert gk
    for r in gk:
        assert r["sample_n"] * 8 <= r["full_n"] * 12, r  # rate sanity
        assert r["err_bp"] <= 2500 + int(50000 / r["sample_n"] ** 0.5), r

    # bin width per type = (hi-lo+1)/32 cents
    t = load_tables(spark, sf_dir)
    bounds = {
        row["event_type"]: (row["lo"], row["hi"])
        for row in t["events"].where(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.min(F.round(F.col("value") * 100, 0).cast("long")).alias("lo"),
            F.max(F.round(F.col("value") * 100, 0).cast("long")).alias("hi"),
        ).collect()
    }
    td = get("events_tdigest_portable").fn(spark, sf_dir).collect()
    assert td
    for r in td:
        lo, hi = bounds[r["event_type"]]
        bin_width = (hi - lo + 1) / 32
        assert abs(r["err_cents"]) <= bin_width + 1, (r, bin_width)


def test_sessionize_incremental_matches_batch(spark, sf_dir):
    """The associativity claim itself: state-carried incremental
    sessionization equals the full-batch recompute for EVERY user, and
    the row split covers all events."""
    from sm_etl_cloud_run_spark.plans import get
    from sm_etl_cloud_run_spark.tables import load_tables

    rows = get("events_sessionize_incremental").fn(spark, sf_dir).collect()
    assert rows
    assert all(r["match"] == 1 for r in rows)
    total = load_tables(spark, sf_dir)["events"].count()
    assert sum(r["n_old"] + r["n_new"] for r in rows) == total


def test_clone_collapse_gate_invariants(spark, sf_dir):
    """pairs_raw >= pairs_collapsed always (clone multiplicities only
    add pairs); savings bp consistent; the gate must fire whenever a
    clone cluster reaches the threshold."""
    from sm_etl_cloud_run_spark.plans import get

    (r,) = get("dedup_clone_collapse_gate").fn(spark, sf_dir).collect()
    assert r["pairs_raw"] >= r["pairs_collapsed"] >= 0, r
    assert r["n_docs"] >= r["n_clone_keys"] >= 1, r
    if r["max_clone_size"] >= 6:
        assert r["gate_collapse"] == 1, r
    if r["pairs_raw"] > 0:
        expect = 10000 * (r["pairs_raw"] - r["pairs_collapsed"]) // r["pairs_raw"]
        assert r["pairs_saved_bp"] == expect, r


def test_trained_auc_beats_standin_and_chance():
    """The train→evaluate loop's semantic claim, pinned via the oracles
    (DuckDB only — engine agreement is the parity harness's job): the
    step-K trained scores rank en above non-en better than the
    untrained md5 stand-in scorer, and at least at chance."""
    import duckdb

    from sm_etl_cloud_run_spark.plans import all_queries

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    qs = all_queries()
    trained = con.execute(qs["quality_classifier_train_auc"].oracle).fetchone()
    standin = con.execute(qs["quality_classifier_auc"].oracle).fetchone()
    assert trained[0] > 0 and trained[1] > 0  # both classes present
    assert trained[3] > standin[3]
    assert trained[3] >= 0.5


def test_stream_state_census_monotone_in_delay():
    """Larger watermark delay can only hold state longer: peak and
    total open-time must be monotone over the delay ladder, and merged
    intervals monotone non-increasing (longer gaps merge more).
    Pinned via the oracle (engine agreement is the parity harness)."""
    import duckdb

    from sm_etl_cloud_run_spark.plans import all_queries

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/events.parquet')"
    )
    rows = {r[0]: r for r in con.execute(
        all_queries()["events_stream_state_census"].oracle).fetchall()}
    m1, m10, h1 = rows["1m"], rows["10m"], rows["1h"]
    assert m1[3] <= m10[3] <= h1[3]          # peak_state
    assert m1[2] <= m10[2] <= h1[2]          # sum_open_us
    assert m1[1] >= m10[1] >= h1[1]          # n_intervals


def test_ivf_recall_curve_monotone_with_exact_anchor():
    """Recall must be non-decreasing in nprobe, and probing ALL
    centroids (nprobe=4 of 4) is a full scan — exactly the brute-force
    answer, so the last point MUST read 10000 bp."""
    import duckdb

    from sm_etl_cloud_run_spark.plans import all_queries

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/embeddings.parquet')"
    )
    rows = sorted(con.execute(
        all_queries()["knn_ivf_recall_curve"].oracle).fetchall())
    assert [r[0] for r in rows] == [1, 2, 4]
    assert rows[0][3] <= rows[1][3] <= rows[2][3]
    assert rows[2][3] == 10000


def test_tuner_refusal_empties_all_three_tuned_plans(spark, sf_dir, monkeypatch):
    """The tuner family's refusal contract, executable: with the
    measured-recall floor raised past the 10000 bp maximum, NO banding
    can clear it — the decision table must flag nothing chosen, and
    BOTH downstream consumers (pair enumeration and the linear group
    assignment) must return EMPTY relations with their non-refusal
    schemas rather than picking a least-bad banding (the
    plan_watermark_delay contract)."""
    from sm_etl_cloud_run_spark.plans import textops

    monkeypatch.setattr(textops, "_TUNE_RECALL_FLOOR_BP", 10001)
    decision = textops.dedup_lsh_banding_tuner(spark, sf_dir).collect()
    assert len(decision) == 4
    assert all(r["chosen"] == 0 for r in decision)
    assert all(r["meets_floor"] == 0 for r in decision)

    pairs = textops.dedup_lsh_pairs_tuned(spark, sf_dir)
    assert pairs.columns == ["banding", "id_a", "id_b"]
    assert pairs.count() == 0

    groups = textops.dedup_lsh_groups_tuned(spark, sf_dir)
    assert groups.columns == ["banding", "doc_id", "group_rep"]
    assert groups.count() == 0


def test_curation_funnel_invariants(spark, sf_dir):
    """curation_pipeline_tuned's 7-row report is a real funnel: stages
    chain (docs_in[k] == docs_out[k-1]), removals are non-negative and
    consistent, token counts shrink with the doc set, and every
    SQL-decidable gate is non-trivial on the synthetic corpus (the
    exact-dedup stage's removal arithmetic is exercised by the hostile
    clone fixture in test_encoding_chaos instead — this corpus has no
    exact clones, so its row is honestly zero)."""
    from sm_etl_cloud_run_spark.plans import textops

    rows = sorted(
        textops.curation_pipeline_tuned(spark, sf_dir).collect(),
        key=lambda r: r["stage_idx"],
    )
    assert [r["stage"] for r in rows] == list(textops._CUR_STAGES)
    for prev, cur in zip(rows, rows[1:]):
        assert cur["docs_in"] == prev["docs_out"]
        assert cur["tokens_out"] <= prev["tokens_out"]
    for r in rows:
        assert r["removed"] == r["docs_in"] - r["docs_out"] >= 0
        assert r["tokens_out"] >= 0
    removed = {r["stage"]: r["removed"] for r in rows}
    for stage in ("length_gate", "lang_gate", "quality_gate",
                  "near_dedup_tuned", "decontaminate"):
        assert removed[stage] > 0, (stage, removed)
    assert removed["exact_dedup"] == 0  # no exact clones in this corpus


def test_curation_verdicts_reconcile_with_funnel(spark, sf_dir):
    """The two curation reports derive from one shared flag
    computation — executable proof: per-stage verdict counts equal the
    funnel's removed column, and 'kept' equals the last stage's
    docs_out."""
    from sm_etl_cloud_run_spark.plans import textops

    funnel = {r["stage"]: r
              for r in textops.curation_pipeline_tuned(spark, sf_dir).collect()}
    verd = {r["verdict"]: r["count"]
            for r in textops.curation_doc_verdicts(spark, sf_dir)
            .groupBy("verdict").count().collect()}
    assert verd.get("kept", 0) == funnel["decontaminate"]["docs_out"]
    for stage in ("length_gate", "lang_gate", "quality_gate",
                  "exact_dedup", "near_dedup_tuned", "decontaminate"):
        assert verd.get(stage, 0) == funnel[stage]["removed"], stage
    assert sum(verd.values()) == funnel["ingest"]["docs_in"]


def test_curation_near_dedup_stage_noop_on_tuner_refusal(
    spark, sf_dir, monkeypatch
):
    """The pipeline inherits the tuner family's refusal contract: with
    the measured-recall floor unreachable, the near-dedup stage must
    become a NO-OP (refuse to dedup at an unjustified banding, don't
    pick a least-bad one) while every other stage is untouched."""
    from sm_etl_cloud_run_spark.plans import textops

    base = {r["stage"]: r
            for r in textops.curation_pipeline_tuned(spark, sf_dir).collect()}
    monkeypatch.setattr(textops, "_TUNE_RECALL_FLOOR_BP", 10001)
    refused = {r["stage"]: r
               for r in textops.curation_pipeline_tuned(spark, sf_dir).collect()}
    nd = refused["near_dedup_tuned"]
    assert nd["removed"] == 0
    assert nd["docs_out"] == nd["docs_in"] == base["near_dedup_tuned"]["docs_in"]
    for s in ("ingest", "length_gate", "lang_gate", "quality_gate",
              "exact_dedup"):
        assert refused[s] == base[s], s
    assert base["near_dedup_tuned"]["removed"] > 0  # the no-op is observable


def test_rows_only_sketches_track_their_oracle_checked_twins(spark):
    """Executable justification for the registry's rows-only entries
    (VERDICT r11 item 6), referenced by name from
    __spark_entry__.rows_only_queries(): the engine-native sketch
    estimates are recomputed against their ORACLE-CHECKED registry
    twins on the same fixture with asserted bounds — so "the native
    row is safe because the portable twin is hash-checked" is a test,
    not prose. events_sketch_profile's HLL++ users land within 7% of
    events_hll_portable (both estimate the same exact count: native
    rsd 2%, portable's err_bp is hash-checked), and its GK percentiles
    within 5% of the exact percentile_metrics twin. The rolling-WAU
    native row is pinned by test_rolling_wau_hll_accuracy_vs_exact
    against its oracle-verified exact twin events_rolling_wau."""
    from sm_etl_cloud_run_spark.plans import get

    sf = "/root/testdata/sf0.01"
    native = {r["event_type"]: r
              for r in get("events_sketch_profile").fn(spark, sf).collect()}
    hll = {r["event_type"]: r
           for r in get("events_hll_portable").fn(spark, sf).collect()}
    pct = {r["event_type"]: r
           for r in get("percentile_metrics").fn(spark, sf).collect()}
    assert set(native) == set(hll) == set(pct)
    for et, n in native.items():
        h, p = hll[et], pct[et]
        assert abs(n["approx_users"] - h["hll_users"]) \
            <= max(2, 0.07 * h["exact_users"]), (et, n, h)
        assert abs(n["approx_median"] - p["median_value"]) \
            <= max(0.5, abs(0.05 * p["median_value"])), (et, n, p)
        assert abs(n["approx_p90"] - p["p90_value"]) \
            <= max(0.5, abs(0.05 * p["p90_value"])), (et, n, p)
