"""Chaos test for the testdata physical-encoding contract (VERDICT r3 #5).

Round-3 postmortem: the driver regenerated ``events.parquet`` with
µs timestamps (previously TIMESTAMP(NANOS)) and ``events_sessionize``
crashed — ``load_tables`` had pinned one physical encoding. The fix
made ``load_tables`` encoding-agnostic: ``events.ts`` is normalized to
canonical ``TimestampType`` whatever arrives. This test locks that in
by rewriting the events fixture in every timestamp encoding Spark's
parquet reader can hand us —

- ``ns``   → TIMESTAMP(NANOS); with ``nanosAsLong`` it arrives LongType
- ``us``   → TIMESTAMP_NTZ (what the driver ships today)
- ``us+tz``→ TIMESTAMP (LTZ)

— and asserting the events-family queries return identical results on
all three.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from sm_etl_cloud_run_spark import plans
from sm_etl_cloud_run_spark.tables import TABLE_NAMES, load_tables

SRC = "/root/testdata/sf0.001"

ENCODINGS = {
    "nanos": pa.timestamp("ns"),
    "ntz": pa.timestamp("us"),
    "ltz": pa.timestamp("us", tz="UTC"),
}

# Representative events-family coverage: sessionize (the r3 crash),
# a truncation-based rollup, an as-of join, and a window query.
QUERIES = (
    "events_sessionize",
    "events_hourly_rollup",
    "events_asof_last_click",
    "events_sliding_window",
)


@pytest.fixture(scope="module")
def encoded_dirs(tmp_path_factory):
    """One sf-dir per encoding: events.ts re-encoded, other tables copied."""
    table = pq.read_table(os.path.join(SRC, "events.parquet"))
    dirs: dict[str, str] = {}
    for label, ts_type in ENCODINGS.items():
        d = tmp_path_factory.mktemp(f"enc_{label}")
        ts = pc.cast(table["ts"], ts_type)
        out = table.set_column(table.schema.get_field_index("ts"), "ts", ts)
        # version 2.6 writes ns as TIMESTAMP(NANOS) instead of coercing
        pq.write_table(out, str(d / "events.parquet"), version="2.6")
        for t in TABLE_NAMES:
            if t == "events":
                continue
            src = os.path.join(SRC, f"{t}.parquet")
            if os.path.exists(src):
                shutil.copy(src, str(d / f"{t}.parquet"))
        dirs[label] = str(d)
    return dirs


def test_written_encodings_are_distinct(encoded_dirs):
    got = {
        label: pq.read_schema(os.path.join(d, "events.parquet")).field("ts").type
        for label, d in encoded_dirs.items()
    }
    assert got["nanos"] == pa.timestamp("ns")
    assert got["ntz"] == pa.timestamp("us")
    assert got["ltz"] == pa.timestamp("us", tz="UTC")


def test_load_tables_normalizes_every_encoding(spark, encoded_dirs):
    from pyspark.sql import types as T

    for label, d in encoded_dirs.items():
        ts_type = load_tables(spark, d)["events"].schema["ts"].dataType
        assert isinstance(ts_type, T.TimestampType), (
            f"{label}: events.ts loaded as {ts_type}, want canonical TimestampType"
        )


@pytest.mark.parametrize("qname", QUERIES)
def test_events_queries_identical_across_encodings(spark, encoded_dirs, qname):
    spec = plans.all_queries()[qname]
    results = {}
    for label, d in encoded_dirs.items():
        df = spec.fn(spark, d).toPandas()
        df = df.reindex(sorted(df.columns), axis=1)
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
        results[label] = df
    base = results["ntz"]
    assert len(base) > 0, f"{qname} returned 0 rows — trivial pass"
    for label, df in results.items():
        pd_eq = base.equals(df)
        assert pd_eq, f"{qname}: {label} result differs from ntz result"


# ---------------------------------------------------------------------------
# forward-looking chaos: other encodings the driver could regenerate into
# ---------------------------------------------------------------------------


def _oracle_compare(spark, sf_dir: str, qname: str) -> list[str]:
    """Run a query's Spark plan and DuckDB oracle on the SAME sf_dir and
    return compare problems (reuses tools/check_parity's comparator, the
    local replica of the driver gate)."""
    import importlib.util

    import duckdb

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cp_spec = importlib.util.spec_from_file_location(
        "check_parity", os.path.join(repo, "tools", "check_parity.py")
    )
    cp = importlib.util.module_from_spec(cp_spec)
    cp_spec.loader.exec_module(cp)

    spec = plans.all_queries()[qname]
    sdf = spec.fn(spark, sf_dir).toPandas()
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    ddf = con.execute(spec.oracle).fetchdf()
    assert len(sdf) > 0, f"{qname} returned 0 rows on re-encoded data — trivial pass"
    return cp.compare(qname, sdf, ddf)


@pytest.fixture(scope="module")
def date32_dir(tmp_path_factory):
    """lineitem/orders with their timestamp date columns as parquet DATE —
    a plausible future driver regeneration (TESTDATA dates are midnight
    timestamps today)."""
    d = tmp_path_factory.mktemp("enc_date32")
    for t in TABLE_NAMES:
        src = os.path.join(SRC, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        table = pq.read_table(src)
        for col in ("l_shipdate", "o_orderdate"):
            if col in table.column_names:
                idx = table.schema.get_field_index(col)
                table = table.set_column(idx, col, pc.cast(table[col], pa.date32()))
        pq.write_table(table, str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("qname", ["q1_pricing_summary", "q3_shipping_priority"])
def test_date32_arrival_keeps_oracle_parity(spark, date32_dir, qname):
    problems = _oracle_compare(spark, date32_dir, qname)
    assert not problems, f"{qname} on DATE-encoded data: {problems}"


@pytest.fixture(scope="module")
def embedding_double_dir(tmp_path_factory):
    """embeddings.embedding as list<double> instead of list<float>."""
    d = tmp_path_factory.mktemp("enc_embdouble")
    for t in TABLE_NAMES:
        src = os.path.join(SRC, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        table = pq.read_table(src)
        if t == "embeddings":
            idx = table.schema.get_field_index("embedding")
            table = table.set_column(
                idx, "embedding", pc.cast(table["embedding"], pa.list_(pa.float64()))
            )
        pq.write_table(table, str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("qname", ["knn_brute_force", "embedding_label_centroids", "embedding_norm_profile", "embedding_hard_negatives"])
def test_embedding_double_arrival_keeps_oracle_parity(spark, embedding_double_dir, qname):
    problems = _oracle_compare(spark, embedding_double_dir, qname)
    assert not problems, f"{qname} on double-encoded embeddings: {problems}"


# 24 all-distinct tokens, exactly two 'en'-marker hits (the, and) and
# zero marker hits for any other language profile
_CLONE_TEXT = ("the quick brown fox jumps over seven lazy dogs while bright "
               "morning sun rises beyond tall green hills and cold rivers "
               "run quietly north")


@pytest.fixture(scope="module")
def hostile_docs_dir(tmp_path_factory):
    """documents with empty-text, whitespace-only, and NULL-text rows
    appended — the divide-by-zero / tokenize-divergence / NULL
    propagation hazards a future testdata regeneration could
    introduce. Round-4 probes found SEVEN queries diverging on empty
    rows (fixed by string_split-parity tokenization) and EIGHT on NULL
    rows (fixed by the NULL-text-is-empty contract: coalesce at load +
    *-REPLACE rewrite of every documents oracle —
    plans/registry._nullsafe_docs)."""
    d = tmp_path_factory.mktemp("hostile_docs")
    table = pq.read_table(os.path.join(SRC, "documents.parquet"))
    extra = pa.table(
        {
            # 900001/900002: empty + whitespace text; 900003: NULL text
            # AND NULL lang (exercises the NULLS LAST mixture ordering);
            # None: NULL doc_id — dropped by the addressability contract;
            # 900004: a 70-char whitespace token — past the BPE pair
            # enumeration's 63-position cap (range(1,64) in the oracles,
            # least(length-1, 63) in Spark — ADVICE r8: an uncapped
            # Spark sequence() would emit 6 extra pairs on this row).
            # 900005: internal whitespace RUNS (double space, tab,
            # newline) — ADVICE r10: a single-space string_split counts
            # empty tokens from '  ' and never splits on '\t'/'\n', so
            # any query whose two sides disagree on the tokenizer
            # (regex vs single-space) diverges on this row; both
            # conventions are parity-safe only when used on BOTH sides.
            # 900006: VERTICAL TAB between tokens — ADVICE r11: Java
            # regex \s includes \x0B but RE2's \s does not, so a
            # `\s+`-split pair of engines disagrees on n_tokens for
            # this row; both sides now spell the class explicitly
            # ([ \t\n\x0B\f\r]+) and this row pins that convention.
            "doc_id": pa.array(
                [900001, 900002, 900003, None, 900004, 900005, 900006,
                 900007, 900008],
                pa.int64(),
            ),
            # 900007/900008: an exact CLONE PAIR that passes the
            # curation funnel's length/lang/quality gates (24 tokens,
            # 2 'en' stopword hits = 833 bp, all-distinct tokens) — the
            # synthetic corpus has no gate-passing exact clones, so
            # this pair is what makes curation_pipeline_tuned's
            # exact-dedup stage removal arithmetic observable
            # (test_curation_exact_dedup_stage_removes_hostile_clone).
            "text": pa.array(
                ["", "   ", None, "stray row", "ab" * 35 + " tail",
                 "multi  space\ttab\nnewline  run",
                 "vertical\x0Btab token run",
                 _CLONE_TEXT, _CLONE_TEXT],
                pa.string(),
            ),
            "lang": pa.array(
                ["en", "en", None, "en", "en", "en", "en", "en", "en"],
                pa.string(),
            ),
            "source": pa.array(
                ["web", "web", "web", "web", "web", "web", "web", "web",
                 "web"],
                pa.string(),
            ),
            "n_chars": pa.array(
                [0, 3, None, 9, 75, 29, 22, len(_CLONE_TEXT),
                 len(_CLONE_TEXT)],
                pa.int64(),
            ),
        }
    )
    pq.write_table(
        pa.concat_tables([table.select(extra.column_names), extra]),
        str(d / "documents.parquet"),
    )
    for t in TABLE_NAMES:
        if t == "documents":
            continue
        src = os.path.join(SRC, f"{t}.parquet")
        if os.path.exists(src):
            shutil.copy(src, str(d / f"{t}.parquet"))
    return str(d)


# The seven queries that diverged before the tokens() alignment, plus
# the curation pipeline as the composition representative.
_HOSTILE_QUERIES = (
    "text_token_stats",
    "text_quality_score",
    "text_vocab_topk",
    "text_tfidf_topterms",
    "text_unigram_logprob",
    "text_repetition_filter",
    "corpus_quality_report",
    "corpus_curation_pipeline",
    "text_dup_ngram_fraction",
    "text_c4_heuristics",
    "domain_mixture_weights",
    "dedup_incremental_new_docs",
    "corpus_training_mix",
    "text_chunk_windows",
    "training_dsir_sample",
    "training_weighted_sample",
    "text_remove_dup_spans",
    "text_quality_zscore_by_lang",
    "text_pmi_collocations",
    "text_bm25_topk",
    "text_zipf_fit",
    "text_bigram_logprob",
    "dedup_cross_source_matrix",
    "text_ngram_novelty",
    "documents_length_deciles",
    "corpus_bpe_merge_candidates",
    "corpus_bpe_merge_step",
    "corpus_bpe_train_rounds",
    "training_curriculum_order",
    "text_readability",
    "dedup_minhash_accuracy",
    "dedup_simhash_pairs",
    "corpus_perplexity_buckets",
    "training_token_budget_fill",
    "text_keyword_textrank",
    "quality_score_calibration",
    "training_decontaminate_report",
    "dedup_cross_lingual",
    "corpus_bytes_per_token",
    "dedup_cluster_canonical",
    "mixture_doremi_step",
    "corpus_oov_rate",
    "dedup_survivorship",
    "corpus_topic_tags",
    "text_token_entropy",
    "mixture_unimax_budget",
    "corpus_vocab_coverage",
    "corpus_filter_funnel",
    "quality_linear_classifier",
    "text_bigram_kneser_ney",
    "quality_pr_curve",
    "quality_classifier_train",
    "text_lang_confusion",
    "multimodal_audio_qc",
    "multimodal_audio_fingerprint_dedup",
    "quality_gate_agreement",
    "multimodal_resize_qa",
    "quality_length_bias",
    "dedup_component_size_histogram",
    "multimodal_frame_sample",
    "corpus_language_balance",
    "dedup_clone_collapse_gate",
    # round-14: containment collapses md5(text) clones (NULL text ->
    # coalesced '' at load, so all hostile rows share one rep), the
    # AUC pair reads lang (NULL lang -> negative class), the df ladder
    # shingles the coalesced text.
    "dedup_containment_pairs",
    "quality_classifier_auc",
    "quality_classifier_train_auc",
    "text_shingle_df_profile",
    # round-15: the fairness audit groups by a NULLable lang, the
    # curriculum tiles coalesced-empty docs (0 tokens -> excluded by
    # the explode on both engines), the scene-cut kernel only needs
    # doc_id (contract-guaranteed non-NULL).
    "quality_classifier_lang_fairness",
    "training_curriculum_schedule",
    "multimodal_frame_scene_cut",
    # tranche 2: the SFT ladder counts coalesced-empty docs as
    # 0-token (pure pad) rows; patchify needs only doc_id
    "training_context_length_ladder",
    # round 12: pack_sequences shares the ladder's explicit
    # whitespace-class tokenizer — enrolled with the \x0B row (900006)
    # that pins the Java-vs-RE2 \s convention on both queries
    "training_pack_sequences",
    "multimodal_patch_stats",
    "dedup_lsh_recall_probe",
    # round 11: the banding tuner seeds from widest-banding candidates
    # over clone-collapsed reps (all hostile rows collapse/drop out)
    "dedup_lsh_banding_tuner",
    "dedup_lsh_pairs_tuned",
    # round 12: the tuned GROUP assignment shares the tuner core (all
    # hostile rows clone-collapse/drop out before the group pass)
    "dedup_lsh_groups_tuned",
    # round 12: the curation funnel tokenizes/fingerprints/shingles the
    # coalesced-empty hostile rows through every stage — and the
    # hostile clones make the exact-dedup stage remove > 0 docs (the
    # synthetic corpus has no exact clones, so this fixture is the one
    # place that stage's removal arithmetic is exercised)
    "curation_pipeline_tuned",
    "curation_doc_verdicts",
)


@pytest.mark.parametrize("qname", _HOSTILE_QUERIES)
def test_empty_text_rows_keep_oracle_parity(spark, hostile_docs_dir, qname):
    problems = _oracle_compare(spark, hostile_docs_dir, qname)
    assert not problems, f"{qname} with empty-text rows: {problems}"


def test_curation_exact_dedup_stage_removes_hostile_clone(
    spark, hostile_docs_dir
):
    """The executable half of the clone-pair fixture comment: with the
    gate-passing 900007/900008 clones present, the curation funnel's
    exact-dedup stage removes at least one document (on the clean
    synthetic corpus that stage's removal is honestly zero)."""
    from sm_etl_cloud_run_spark.plans import textops

    rows = {
        r["stage"]: r
        for r in textops.curation_pipeline_tuned(
            spark, hostile_docs_dir
        ).collect()
    }
    assert rows["exact_dedup"]["removed"] >= 1


@pytest.fixture(scope="module")
def renumbered_embeddings_dir(tmp_path_factory):
    """embeddings with vec_id renumbered (×10 + 7) — sparse, nonzero
    start. The ANN/semdedup queries pick seed vectors by RANK over
    vec_id, not literal id, so a regeneration that renumbers ids must
    not crash the seed collect or desynchronize Spark and oracle."""
    d = tmp_path_factory.mktemp("renumbered_emb")
    for t in TABLE_NAMES:
        src = os.path.join(SRC, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        table = pq.read_table(src)
        if t == "embeddings":
            idx = table.schema.get_field_index("vec_id")
            new_ids = pc.add(pc.multiply(table["vec_id"], pa.scalar(10, pa.int64())), pa.scalar(7, pa.int64()))
            table = table.set_column(idx, "vec_id", new_ids)
        pq.write_table(table, str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "qname",
    ["knn_brute_force", "knn_lsh_bucketed", "knn_ivf", "dedup_semantic_clusters",
     "knn_graph_brute", "knn_graph_lsh", "knn_pq_adc",
     "kmeans_embedding_clusters", "pq_codebook_train", "knn_graph_pagerank",
     "knn_ivf_pq", "embedding_hard_negatives",
     "knn_ivf_recall", "kmeans_cluster_purity", "knn_graph_link_prediction",
     "embedding_int8_quant_error", "knn_label_propagation",
     "embedding_jl_distortion",
     "embedding_outlier_profile",
     # renumbered ids shift the midpoint split but identically so
     "embedding_centroid_drift"],
)
def test_renumbered_vec_ids_keep_oracle_parity(spark, renumbered_embeddings_dir, qname):
    problems = _oracle_compare(spark, renumbered_embeddings_dir, qname)
    assert not problems, f"{qname} on renumbered vec_ids: {problems}"


@pytest.fixture(scope="module")
def hostile_events_dir(tmp_path_factory):
    """events with NULL-ts / NULL-user / NULL-type / NULL-event_id /
    duplicate-event_id rows appended. The NULL-ts and NULL-event_id
    contracts (a row with no timestamp is not an event; a row with no
    event_id is not addressable — both dropped at load, oracles read
    through the same filter) exist because Spark time-windows drop NULL
    keys and sort NULLS FIRST while DuckDB keeps them and sorts NULLS
    LAST, and a NULL conversion key would merge attribution windows.
    event_id UNIQUENESS is deliberately NOT a load contract (it would
    cost a fact-wide shuffle): the duplicate-id row (9000006, twice)
    pins that duplicates behave identically on both engines."""
    import datetime

    d = tmp_path_factory.mktemp("hostile_events")
    table = pq.read_table(os.path.join(SRC, "events.parquet"))
    extra = pa.table(
        {
            "event_id": pa.array(
                [9000001, 9000002, 9000003, 9000004, 9000005,
                 None, 9000006, 9000006],
                pa.int64(),
            ),
            "ts": pa.array(
                [None] + [pa.scalar(datetime.datetime(2024, 8, 1, 12, m), pa.timestamp("us"))
                          for m in (0, 1, 2, 3, 4, 5, 6)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([1, None, 2, 3, 4, 5, 6, 6], pa.int64()),
            "event_type": pa.array(
                ["click", None, "click", "click", "click",
                 "click", "purchase", "purchase"],
                pa.string(),
            ),
            "value": pa.array(
                [None, 1.5, 2.5, 3.5, 4.5, 5.5, 6.5, 7.5], pa.float64()
            ),
            # {bad json and '' are malformed (Spark extracts NULL,
            # DuckDB would THROW without the oracle's json_valid gate);
            # {"k":"xyz"} is valid JSON whose k is non-numeric (Spark's
            # cast NULLs, DuckDB CAST would throw without TRY_CAST).
            "props": pa.array(
                [None, "{}", "{bad json", "", '{"k": "xyz"}',
                 '{"k": "1"}', '{"k": "2"}', '{"k": "3"}'],
                pa.string(),
            ),
        }
    )
    pq.write_table(
        pa.concat_tables([table.select(extra.column_names), extra]),
        str(d / "events.parquet"),
    )
    for t in TABLE_NAMES:
        if t == "events":
            continue
        src = os.path.join(SRC, f"{t}.parquet")
        if os.path.exists(src):
            shutil.copy(src, str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "qname",
    # the full events family — every oracle reading FROM events
    ["c13_c17_timestamp_roundtrip", "dedup_last_write",
     "events_anomaly_zscore", "events_asof_last_click",
     "events_cohort_retention", "events_conversion_funnel",
     "events_cume_dist", "events_daily_from_hourly",
     "events_multitouch_attribution", "events_timedecay_attribution",
     "events_hourly_gapfill", "events_hourly_rollup",
     "events_json_extract", "events_variant_extract",
     "events_concurrency_profile", "events_trend_regression",
     "events_sample_estimate", "events_seasonal_baseline",
     "events_pivot_type_counts",
     "events_running_balance", "events_sessionize",
     "events_sliding_window", "events_value_histogram",
     "events_session_window_native",
     "events_transition_matrix", "events_top_paths",
     "events_cdc_snapshot", "events_ewma",
     "events_value_ntile", "events_seasonal_anomaly",
     "events_user_coherent_sample", "events_winsorized_stats",
     "events_grouping_sets", "events_asof_tolerance",
     "events_rolling_wau", "events_distribution_drift",
     "events_json_key_profile", "events_type_cooccurrence",
     "events_session_stats", "events_nstep_funnel",
     "events_autocorrelation", "events_mad_outliers",
     "events_ab_test_readout", "events_benford_audit",
     "events_inter_arrival_stats", "events_decile_lift",
     "events_cusum_changepoint", "events_cms_heavy_hitters",
     "events_hll_portable",
     "events_heavy_hitters_exact", "events_key_skew_profile",
     "events_rfm_segments", "events_velocity_rule",
     "events_churn_hazard", "events_range_partition_plan",
     "events_dau_mau_stickiness",
     "events_theta_sketch_distinct", "events_bitmap_distinct_rollup",
     "events_gk_portable_quantiles", "events_tdigest_portable",
     "events_sessionize_incremental", "events_sketch_rollup_merge",
     "f4_watermark_gate", "percentile_metrics", "skew_salted_user_join",
     # round-14: lateness orders by (event_id, tsu) — the duplicate
     # event_id rows pin the tie contract; the census partitions by a
     # NULLable user_id (a real group on both engines).
     "events_late_data_profile", "events_stream_state_census",
     "events_watermark_tradeoff",
     # round-15: per-half monetary quartiles (NULL user filtered, NULL
     # value coalesced to 0 cents on both engines)
     "events_rfm_migration",
     # the dedup census: hostile DUPLICATE event_ids exercise the
     # suppression chain for real (NULL ids dropped by contract)
     "events_dedup_state_census"],
)
def test_null_event_rows_keep_oracle_parity(spark, hostile_events_dir, qname):
    problems = _oracle_compare(spark, hostile_events_dir, qname)
    assert not problems, f"{qname} with NULL event rows: {problems}"


@pytest.fixture(scope="module")
def hostile_facts_dir(tmp_path_factory):
    """lineitem/orders with hostile NULL rows appended: NULL primary
    keys, NULL dates, NULL measures, NULL attributes. The fact-row
    contract (a row without its DATE column is not a valid fact row —
    dropped at load; key/attribute/measure NULLs STAY and every query
    must handle them with SQL semantics) exists because
    (a) Spark when/otherwise decodes and array_join aggregates treat
    NULL inputs differently from SQL CASE/string_agg, and (b) a NULL in
    a window ORDER BY key makes even DuckDB's parallel window
    nondeterministic (j4's lead() flipped values across connections)."""
    d = tmp_path_factory.mktemp("hostile_facts")
    li = pq.read_table(os.path.join(SRC, "lineitem.parquet"))

    def li_row(overrides):
        base = {c: li.column(c)[0].as_py() for c in li.column_names}
        base.update(overrides)
        return base

    li_extra = pa.Table.from_pylist(
        [
            li_row({"l_orderkey": None, "l_linenumber": 99}),
            li_row({"l_shipdate": None, "l_orderkey": 999999}),
            li_row({"l_quantity": None, "l_discount": None, "l_orderkey": 999998}),
            li_row({"l_returnflag": None, "l_linestatus": None, "l_orderkey": 999997}),
            li_row({"l_partkey": None, "l_suppkey": None, "l_orderkey": 999996}),
        ],
        schema=li.schema,
    )
    pq.write_table(pa.concat_tables([li, li_extra]), str(d / "lineitem.parquet"))

    od = pq.read_table(os.path.join(SRC, "orders.parquet"))

    def o_row(overrides):
        base = {c: od.column(c)[0].as_py() for c in od.column_names}
        base.update(overrides)
        return base

    od_extra = pa.Table.from_pylist(
        [
            o_row({"o_orderkey": None}),
            o_row({"o_orderdate": None, "o_orderkey": 888888}),
            o_row({"o_custkey": None, "o_orderkey": 888887}),
            o_row({"o_totalprice": None, "o_orderpriority": None,
                   "o_orderstatus": None, "o_orderkey": 888886}),
        ],
        schema=od.schema,
    )
    pq.write_table(pa.concat_tables([od, od_extra]), str(d / "orders.parquet"))
    for t in TABLE_NAMES:
        if t in ("lineitem", "orders"):
            continue
        src = os.path.join(SRC, f"{t}.parquet")
        if os.path.exists(src):
            shutil.copy(src, str(d / f"{t}.parquet"))
    return str(d)


# Representative fact-family coverage: the six queries that diverged
# before the contract (period joins, list agg, when/otherwise decode)
# plus the heaviest downstream consumers.
_HOSTILE_FACT_QUERIES = (
    "j1_period_equi_join",
    "j1_period_range_join",
    "j1_period_bucketed_range_join",
    "j4_next_period_lead",
    "a1_partition_rollup",
    "c5_substance_flags",
    "q1_pricing_summary",
    "q9_product_profit",
    "q13_custdist_outer",
    "flagship_panel_enrichment",
    "pipeline_fact_transform",
    "dq_expectations_report",
    "lineitem_column_profile",
    "order_fulfillment_latency",
    "lineitem_corr_matrix",
    "orders_repeat_purchase",
    # round-14: the estimator's md5 coin must flip identically on the
    # contract-surviving key set (NULL l_partkey rows group as one key)
    "join_size_estimate_sampled",
    # round-15: the correlated two-table coin (NULL orderkeys never
    # join, identically on both engines)
    "join_size_estimate_two_table",
    "orders_pareto_revenue_curve",
)


@pytest.mark.parametrize("qname", _HOSTILE_FACT_QUERIES)
def test_null_fact_rows_keep_oracle_parity(spark, hostile_facts_dir, qname):
    problems = _oracle_compare(spark, hostile_facts_dir, qname)
    assert not problems, f"{qname} with NULL fact rows: {problems}"


@pytest.fixture(scope="module")
def hostile_dims_dir(tmp_path_factory):
    """customer/part/supplier with NULL-key and NULL-attribute rows.
    Dims need NO load contract: every consumer reaches them through
    equi-joins (NULL keys match nothing, identically on both engines)
    or through aggregates with SQL NULL semantics — this fixture proves
    that claim holds query-by-query."""
    d = tmp_path_factory.mktemp("hostile_dims")
    mutations = {
        "customer": [{"c_custkey": None}, {"c_nationkey": None, "c_custkey": 777777}],
        "part": [{"p_partkey": None}, {"p_brand": None, "p_type": None, "p_partkey": 777777}],
        "supplier": [{"s_suppkey": None}, {"s_nationkey": None, "s_suppkey": 777777}],
    }
    for t in TABLE_NAMES:
        src = os.path.join(SRC, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        table = pq.read_table(src)
        if t in mutations:
            rows = []
            for overrides in mutations[t]:
                base = {c: table.column(c)[0].as_py() for c in table.column_names}
                base.update(overrides)
                rows.append(base)
            extra = pa.Table.from_pylist(rows, schema=table.schema)
            table = pa.concat_tables([table, extra])
        pq.write_table(table, str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "qname",
    ["q3_shipping_priority", "q5_region_revenue", "q9_product_profit",
     "q13_custdist_outer", "q2_min_cost_supplier", "flagship_panel_enrichment",
     "q10_returned_items", "q16_supplier_anti",
     "customer_k_anonymity", "customer_l_diversity",
     # round-14: NULL nationkey is a real QI group; its grid rows join
     # no group counts on EITHER engine (equality drops NULL=NULL)
     "customer_t_closeness",
     # the generalization ladder: NULL nation/band group on both engines
     "customer_k_anon_generalization_ladder"],
)
def test_null_dim_rows_keep_oracle_parity(spark, hostile_dims_dir, qname):
    problems = _oracle_compare(spark, hostile_dims_dir, qname)
    assert not problems, f"{qname} with NULL dim rows: {problems}"


@pytest.fixture(scope="module")
def hostile_embeddings_dir(tmp_path_factory):
    """embeddings with a NULL-vec_id row and a NULL-embedding row.
    Both are dropped by the load contract: vec_id feeds the rank-based
    seed selection (ORDER BY vec_id — Spark sorts NULLS FIRST, DuckDB
    NULLS LAST, so a NULL id would give the two engines different seed
    vectors), and a NULL payload cannot be scored."""
    d = tmp_path_factory.mktemp("hostile_emb")
    for t in TABLE_NAMES:
        src = os.path.join(SRC, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        table = pq.read_table(src)
        if t == "embeddings":
            base = {c: table.column(c)[0].as_py() for c in table.column_names}
            rows = [
                dict(base, vec_id=None),
                dict(base, vec_id=900001, embedding=None),
            ]
            extra = pa.Table.from_pylist(rows, schema=table.schema)
            table = pa.concat_tables([table, extra])
        pq.write_table(table, str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "qname",
    ["knn_brute_force", "knn_lsh_bucketed", "knn_graph_lsh", "knn_pq_adc",
     "kmeans_embedding_clusters", "embedding_label_centroids",
     "pq_codebook_train", "knn_graph_pagerank", "knn_ivf_pq",
     "embedding_hard_negatives",
     "knn_ivf_recall", "kmeans_cluster_purity", "knn_graph_link_prediction",
     "embedding_pca_top_component", "embedding_dim_profile",
     "embedding_isotropy_probe", "knn_ivf_recall_curve",
     "knn_graph_kcore"],
)
def test_null_embedding_rows_keep_oracle_parity(spark, hostile_embeddings_dir, qname):
    problems = _oracle_compare(spark, hostile_embeddings_dir, qname)
    assert not problems, f"{qname} with NULL embedding rows: {problems}"
