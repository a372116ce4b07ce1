"""Scale probe: multiply the sf0.1 testdata N× (key-offset unions) and
measure headline-query scaling — the local evidence that plans survive
growth (linear-ish time, no OOM, no plan degradation).

Usage: python tools/scale_probe.py [multipliers...]   (default: 1 4 16)
Writes probe data under .scale_probe/ (gitignored), prints one JSON line
per multiplier.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sm_etl_cloud_run_spark import plans
from sm_etl_cloud_run_spark.session import get_spark
from sm_etl_cloud_run_spark.tables import load_tables

BASE_SF = "/root/testdata/sf0.1"
PROBE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale_probe")

QUERIES = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "flagship_panel_enrichment",
    "j1_period_bucketed_range_join",
    "dedup_minhash_signatures",
    "dedup_lsh_groups",
    "events_hourly_rollup",
    "text_vocab_topk",
    "events_asof_last_click",
    "events_hourly_gapfill",
    "q8_market_share",
    "text_winnowing_fingerprints",
    # training-prep layer (VERDICT r3 stretch): the pack window and the
    # stratified top-K are the shapes worth probing — per-shard windows
    # and per-group rank pushdown must not degrade superlinearly.
    "training_pack_sequences",
    "training_stratified_sample",
    "training_temperature_sample",
    # round-5 additions: inverted n-gram index, LSH-bucketed k-NN graph,
    # anti-join ingest dedup, bounded-explode mix materialization, and
    # the exchange-reusing cohort matrix.
    "text_dup_ngram_fraction",
    "knn_graph_lsh",
    "dedup_incremental_new_docs",
    "corpus_training_mix",
    "events_cohort_retention",
    # round-6 additions: per-subspace codebook trainer (explode+agg to a
    # parameter-sized result), DSIR's 64-bucket broadcast join, and the
    # LSH-bucketed PageRank (bucket hash join + 2 Pregel rounds).
    "pq_codebook_train",
    "training_dsir_sample",
    "knn_graph_pagerank",
    "text_remove_dup_spans",
    "events_concurrency_profile",
    # round-7 additions: BM25's filter-then-explode inverted stats, the
    # lag+pair-agg transition matrix, the rank-window winsorizer, and
    # the exchange-reusing path assembly.
    "text_bm25_topk",
    "events_transition_matrix",
    "events_winsorized_stats",
    "events_top_paths",
    # round-8 additions (VERDICT r4 item 1): the distributed_rank
    # rewires — fact-cardinality rank/ntile with NO single-partition
    # sort; their probe rows are the "flat scaling" evidence.
    "events_decile_lift",
    "text_zipf_fit",
    # round-8 tranche 2: the Gini skew diagnostic (distributed_rank over
    # fact-cardinality keys), the two estimator-QA queries (LSH-candidate
    # verify pass, pigeonhole simhash band join), and the graph two-hop.
    "events_key_skew_profile",
    "dedup_minhash_accuracy",
    "dedup_simhash_pairs",
    "knn_graph_link_prediction",
    # round-10 additions: the broadcast-bitset prefilter (the join must
    # stay 4x BroadcastHashJoin with the fact never shuffling), the
    # bigram-type joins behind Kneser-Ney, the map-side JL projection,
    # and the distributed_rank-riding coverage curve.
    "join_bloom_prefilter",
    "text_bigram_kneser_ney",
    "embedding_jl_distortion",
    "corpus_vocab_coverage",
    "mixture_unimax_budget",
    "events_multitouch_attribution",
    "events_timedecay_attribution",
    # round-11 additions (driver r8): the codec→aHash→band-join bridge,
    # the vocab-sized BPE pair-count round, the fingerprint-keyed
    # domain rollup, and the grouped prefix-sum CUSUM rider.
    "multimodal_phash_dedup",
    "corpus_bpe_merge_step",
    "dedup_domain_rollup",
    "events_cusum_changepoint",
    "corpus_bpe_train_rounds",
    "events_cms_heavy_hitters",
    "events_hll_portable",
    # round-12 additions (driver r8): the map-side dim explode profile,
    # the distributed_ntile PR sweep, the stream-keyed life table, the
    # per-doc lang-argmax confusion matrix, and the WAV-roundtrip QC.
    "embedding_dim_profile",
    "quality_pr_curve",
    "events_churn_hazard",
    "text_lang_confusion",
    "multimodal_audio_qc",
    "quality_gate_agreement",
    "events_range_partition_plan",
    "orders_repeat_purchase",
    "multimodal_resize_qa",
    "embedding_isotropy_probe",
    "quality_length_bias",
    "customer_l_diversity",
    "events_dau_mau_stickiness",
    "dedup_component_size_histogram",
    "multimodal_frame_sample",
    "corpus_language_balance",
    # round-13 additions (driver r9): the GD trainer (K feat-sized
    # aggregate rounds off ONE corpus featurization — the per-step cost
    # is the probe claim) and the portable two-level register rollup.
    "quality_classifier_train",
    "events_sketch_rollup_merge",
    "multimodal_audio_fingerprint_dedup",
    # round-14 additions (driver r9): the prefix-MAX lateness audit
    # (global running max with no single-task sort — the monoid sibling
    # of distributed_cumsum), the df-capped containment self-join, and
    # the bounded-relation exact AUC.
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
    # the watermark decision table (census arm + lateness ladder) — its
    # 256x number in ROUND_NOTES must be reproducible from the default
    # probe set, not an ad-hoc --queries invocation (ADVICE r9)
    "events_watermark_tradeoff",
    # round-15 additions (driver r10)
    "events_rfm_migration",
    "quality_classifier_lang_fairness",
    "training_curriculum_schedule",
    "embedding_outlier_profile",
    "multimodal_frame_scene_cut",
    "join_size_estimate_two_table",
    # round-15 tranche 2
    "training_context_length_ladder",
    "multimodal_patch_stats",
    "customer_k_anon_generalization_ladder",
    "embedding_centroid_drift",
    "events_dedup_state_census",
    "orders_pareto_revenue_curve",
    "dedup_lsh_recall_probe",
    "dedup_lsh_banding_tuner",
    "dedup_lsh_pairs_tuned",
    "dedup_lsh_groups_tuned",
    "curation_pipeline_tuned",
    "curation_doc_verdicts",
)

# key columns to offset per copy so multiplied fact rows stay distinct
_OFFSETS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
_DIMS = ("region", "nation", "customer", "supplier", "part")


def build_scaled(spark, mult: int) -> str:
    out_dir = os.path.join(PROBE_DIR, f"x{mult}")
    # embeddings is written last, so its _SUCCESS marks a complete build
    if os.path.exists(os.path.join(out_dir, "embeddings.parquet", "_SUCCESS")):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    t = load_tables(spark, BASE_SF)
    for name in _DIMS:
        t[name].write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
    for name, keys in _OFFSETS.items():
        df = t[name]
        maxes = {k: df.agg(F.max(k)).collect()[0][0] + 1 for k in keys}
        copies = []
        for i in range(mult):
            c = df
            for k in keys:
                if k in ("o_custkey", "user_id"):
                    continue  # keep FK domains intact (customers/users shared)
                c = c.withColumn(k, F.col(k) + F.lit(i * maxes[k]))
            copies.append(c)
        scaled = copies[0]
        for c in copies[1:]:
            scaled = scaled.unionByName(c)
        scaled.repartition(32).write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
    return out_dir


def main() -> None:
    args = sys.argv[1:]
    queries = QUERIES
    if "--queries" in args:  # focused probe: --queries a,b,c
        i = args.index("--queries")
        queries = tuple(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    mults = [int(m) for m in args] or [1, 4, 16]
    spark = get_spark("scale-probe")
    # warm codegen so multipliers are comparable
    for q in queries:
        plans.get(q).fn(spark, BASE_SF.replace("sf0.1", "sf0.001")).collect()
    for mult in mults:
        sf_dir = build_scaled(spark, mult)
        n_li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
        timings = {}
        for q in queries:
            # min of two runs: the first pays cold page-cache I/O for the
            # probe's just-written parquet (a cluster reads in parallel
            # from many disks); the second is the steady-state compute.
            # count(), not collect(): queries with corpus-sized output
            # (winnowing: one row per fingerprint) would otherwise charge
            # single-threaded driver transfer to the scaling curve —
            # 64× winnowing measured 45.7 s via collect vs 3.0 s compute.
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                plans.get(q).fn(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            timings[q] = round(best, 2)
        print(json.dumps({"mult": mult, "lineitem_rows": n_li,
                          "total_sec": round(sum(timings.values()), 2), "queries": timings}))


if __name__ == "__main__":
    main()
