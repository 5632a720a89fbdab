#!/usr/bin/env python
"""10x scale probe: generate a key-offset replica of sf0.1 and compare
plan shapes + wall times between the two scales.

Replica construction: each of 10 copies offsets every entity key by
i * 1e8 (customers, orders, lineitems, suppliers, parts, events, docs,
embeddings), so join cardinalities genuinely grow 10x with no artificial
hot keys; nation/region stay fixed (they are bounded dimensions in any
TPC-H-like schema).  Plan-shape comparison counts the physical operators
that determine scale behavior — a query whose operator multiset changes
between scales has an estimate-driven plan that will surprise at 100 TB.

Usage: python tools/scale_probe.py [--regen] [--out /tmp/sf1]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC_SF = "/root/testdata/sf0.1"
COPIES = 10
KEY_OFFSET = 100_000_000

# key columns to offset per table (dims nation/region replicate as-is)
OFFSET_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "nation": [],
    "region": [],
}

PROBE_QUERIES = [
    # bench headliners
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q10_returned_items",
    "q18_large_volume_customer",
    "q21_suppliers_kept_waiting",
    "join_chain_revenue_by_nation",
    "window_topk_per_group",
    "asof_join_maxby",
    "dedup_minhash_lsh",
    # round-3 scale-relevant operators
    "join_bloom_pruned",
    "events_gapfill_locf",
    "cdc_apply_changelog",
    "events_anomaly_zscore",
    "events_top_paths",
    "snapshot_diff",
    "corpus_curation_gate",
    "graph_pagerank_parts",
    # round-3 session-2 additions
    "market_basket_rules",
    "graph_label_propagation",
    "events_concurrent_sessions",
    "events_attribution_linear",
    "pipeline_events_e2e",
    "corpus_length_bucketing",
    "join_dynamic_partition_pruning",
    # round-4 additions
    "subquery_recursive_cte",
    "ivm_incremental_agg_join",
    "entity_resolution_parts",
    "similarity_topk_pq",
    "text_keyword_search",
    "events_ewma_daily",
    "window_rolling_median",
    "dq_k_anonymity",
    "multimodal_video_keyframes",
    # round-5 probe extension (r4 verdict ask #8)
    "dedup_paragraph_chunks",
    "similarity_customers_jaccard",
    "cdc_time_travel",
    "dq_expectations_suite",
    "pipeline_corpus_e2e",
    # round-5 new-operator shapes with scale-sensitive joins/windows
    "events_session_overlap_pairs",
    "text_jaccard_knn_graph",
    "pipeline_pretraining_shards_e2e",
    "agg_weighted_median",
    "events_churn_hazard",
    "events_copresence_topk",
    "scd1_upsert_orders",
    "embedding_power_iteration_pc1",
    "multimodal_image_flip_augment",
    "feature_hashed_bow",
    "events_ab_lift_report",
    "events_weekly_autocorrelation",
    "agg_gini_coefficient",
    "events_max_drawdown",
    "source_binaryfile_scan",
    "sql_optimizer_hints",
    "events_outage_windows",
    "orders_repurchase_intervals",
    "events_funnel_by_cohort",
    "dedup_rate_by_source",
    "reshape_pivot_unpivot_roundtrip",
    "events_new_vs_returning",
    "events_conversion_lag_quantiles",
    "parquet_ignore_corrupt_files",
    "csv_multiline_quoted_roundtrip",
    "sql_direct_file_query",
    "governance_column_lineage",
    "pyds_vacuum_orphans",
    "bucket_pruning_scan",
    "embedding_pc1_explained_variance",
    "embedding_standardize",
    "text_vocab_oov_rate",
    "text_adaptive_stopwords",
    "corpus_epoch_upsampling",
    "corpus_shard_interleave",
    "multimodal_audio_energy",
    "sql_scalar_udf",
    "sql_table_udf",
    "sql_execute_immediate",
    "window_nth_value",
    # round-6 new-operator shapes
    "agg_sliding_distinct_exact",
    "events_cusum_changepoint",
    "parts_supplier_hhi",
    "similarity_two_stage_rerank",
    "events_consecutive_pattern",
    "text_bpe_pair_counts",
    "embedding_dimension_stats",
    "ivm_retraction_zset",
    "graph_pagerank_parts",
    # round-6 session-2 additions
    "graph_k_core",
    "events_bitmap_retention",
    "stat_auc_roc",
    "stat_anova_oneway",
    "stat_levene_brown_forsythe",
    "stat_permutation_shift",
    "events_theil_sen_trend",
    "events_changepoint_binseg",
    "events_mad_outlier_days",
    "dq_block_checksums",
    "layout_range_partition_plan",
    "graph_link_prediction_ra",
    "window_rolling_median_7d",
    # round-6 session-3 additions
    "ivm_incremental_distinct",
    "events_interarrival_burstiness",
    "stat_kendall_tau",
    "stat_spearman_rho",
    "stat_kaplan_meier",
    "events_diversity_simpson",
    "feature_robust_scaler",
    "customer_lorenz_deciles",
    "multimodal_audio_zero_crossing",
    "stat_cohens_d",
    "stat_cramers_v",
    "events_cuped_adjustment",
    "graph_degree_assortativity",
    "graph_global_clustering",
    "ml_ols_normal_equations",
    "events_holt_linear_forecast",
    "events_bot_score_gate",
    "similarity_mmr_rerank",
    "graph_modularity",
    "events_growth_accounting",
    "events_residual_anomaly_gate",
    "stat_two_proportion_ztest",
    "stat_power_mde",
    "ml_leakage_audit_target_encoding",
    "events_forecast_model_selection",
    "window_rolling_slope_14d",
    "embedding_matryoshka_recall",
    "pipeline_experiment_e2e",
    "stat_bootstrap_se",
    "stat_wilcoxon_signed_rank",
    "events_local_peaks",
    "multimodal_image_edge_density",
    "ml_leakage_audit_target_encoding",
    "scd6_hybrid_dim",
    "dim_late_arriving_inferred",
    "interval_allen_relations",
    "dq_erasure_audit",
    "text_vocab_coverage_curve",
    "embedding_knn_label_eval",
    # round-6 session-4 operators
    "events_lead_lag_xcorr",
    "text_bm25_search",
    "graph_bfs_hops",
    "stat_fdr_bh_control",
    "events_lttb_downsample",
    "corpus_pack_next_fit",
    "embedding_kmeans_lloyd",
    "search_hybrid_rrf",
    "embedding_silhouette_centroid",
    "events_wow_attribution",
    "events_croston_intermittent",
    "stat_poisson_rate_ci",
    "dq_iqr_fences",
    "events_holt_winters_additive",
    "events_active_coverage_union",
    "customer_segment_migration",
    "text_bigram_kneser_ney",
    "pipeline_hybrid_search_e2e",
    "dq_t_closeness",
    "events_uplift_by_decile",
    "text_lang_id_char_ngram",
    "events_bollinger_bands",
    "layout_partition_size_advisor",
    "events_anomaly_ensemble",
    "text_source_vocab_tv_matrix",
    "graph_community_inequality",
    "multimodal_audio_crest_factor",
    "orders_month_seasonal_index",
    "parts_return_rate_by_brand",
    "parts_discount_quantity_slope",
    "text_term_burstiness",
    "orders_fiscal_445_rollup",
    "events_wow_price_volume_bridge",
    "multimodal_image_contrast",
    "events_time_to_nth_event",
    "dedup_threshold_sensitivity",
    "graph_avg_neighbor_degree",
    "text_vocab_growth_checkpoints",
    "multimodal_video_motion_intensity",
    "stat_mcnemar_classifiers",
    "customer_cohort_nrr",
    "pipeline_training_build_e2e",
    # round-7 additions
    "corpus_quality_funnel",
    "text_gopher_repetition",
    "text_tokenizer_fertility",
    "corpus_kfold_leakage_safe",
    "corpus_pack_next_fit_decreasing",
    "text_char_diversity_screen",
    "stat_runs_test_daily",
    "graph_node_jaccard_topk",
    "lakehouse_partition_evolution",  # post-fix: hot-tail + one-file-per-dir
    "dq_cross_field_rules",
    "supplier_ship_delay_quantiles",
    "events_markov_stationary_power",
    "corpus_pack_waste_report",
    "pipeline_curation_screens_e2e",
    "text_template_prefix_families",
    "orders_order_size_histogram",
    "profile_distinct_counts",
    "graph_pagerank_bucketed_rounds",
    "stream_curation_gate",
    # round-7 session-2 operators
    "text_unigram_surprisal_gate",
    "dedup_source_overlap_matrix",
    "stat_jarque_bera",
    "stat_theil_sen_daily_slope",
    "corpus_dsir_importance_weights",
    "multimodal_audio_clipping_rate",
    "embedding_pc2_deflation",
    "scd4_history_split",
    "graph_ktruss_support_tiers",
    "text_bigram_holdout_surprisal",
    "multimodal_image_psnr_pairs",
    "events_attribution_markov_removal",
    "text_rake_keyphrases",
    "events_did_estimator",
    "embedding_cka_quantization",
    "stream_dsir_scoring",
    # round-7 session-3 operators (scale-sensitive shapes: pair rewrites,
    # per-value cumulative passes, graph joins, codec maps, fold chains)
    "events_attribution_shapley",
    "stat_mann_kendall_trend",
    "stat_deming_regression",
    "stat_nelson_aalen",
    "stat_cliffs_delta",
    "stat_durbin_watson",
    "events_hurst_exponent",
    "graph_rich_club_coefficient",
    "events_entropy_rate",
    "orders_abc_xyz_classification",
    "orders_receivable_aging",
    "orders_yoy_growth",
    "events_drawdown_recovery",
    "ml_brier_decomposition",
    "multimodal_image_sharpness",
    "multimodal_audio_snr",
    "text_heaps_law_fit",
    "corpus_filter_bias_audit",
    "embedding_quantization_error_histogram",
    "embedding_centroid_drift",
    "dedup_url_canonical",
    "pipeline_trend_monitoring_e2e",
    "lakehouse_snapshot_expiry",
    "stat_kruskal_wallis",
    "layout_zorder_skipping_planner",
    "text_source_token_entropy",
    "pipeline_source_scorecard_e2e",
    "events_page_hinkley_drift",
    "parts_single_source_risk",
    # round-8: two-phase prefix-sum rewrites + sample-bound planner
    "stat_ks_two_sample",
    "parts_abc_classification",
    # round-9: two-phase migrations off the unpartitioned-window allowlist
    "stat_mann_whitney_u",
    "stat_wilcoxon_signed_rank",
    "ml_brier_decomposition",
    "customer_rfm_segments",
    "ml_linear_scoring",
    "surrogate_keys_dim",
    "dq_sequence_gaps",
    "agg_count_min_sketch",
    "parts_safety_stock_reorder",
    "parts_newsvendor_quantity",
    "dq_format_conformance",
    "multimodal_modality_mix_card",
    "similarity_quantized_recall",
    # round-9 new operators
    "dedup_exact_substring_spans",
    "pipeline_exact_substring_e2e",
    "stat_kuiper_two_sample",
    "stat_wasserstein_1d",
    "stat_jonckheere_terpstra",
    "stat_brunner_munzel",
    "stat_grubbs_max_outlier",
    "dq_psi_jsd_value_drift",
    "stat_page_trend_test",
    "stat_jackknife_ratio_se",
    "ml_conformal_daily_interval",
    # round-11 new operators
    "text_symspell_correction",
    "dedup_bloom_prefilter",
    "embedding_semdedup_ivf",
    "corpus_curriculum_phases",
    "corpus_quality_quota_trim",
    "similarity_knn_classify",
    "dedup_cdc_chunks",
    "dedup_minhash_bbit_eval",
    # round-10 new operators + the r9 bucketed twins (deep-probe tier)
    "text_bpe_train_merges",
    "text_bpe_compression_by_source",
    "multimodal_pack_interleaved",
    "graph_connected_components_bucketed",
    "graph_hits_bipartite_bucketed",
    "similarity_ivf_nprobe_recall",
    "dedup_soft_weights",
    # round-8 new operators
    "customer_pareto_deciles",
    "events_value_ecdf_deciles",
    "stat_cramer_von_mises",
    "customer_spend_ntile_bands",
    "corpus_length_percentile_trim",
    "corpus_domain_reweight_entropy",
    "text_boilerplate_ngrams",
    "events_srm_check",
    "events_power_analysis_mde",
    "sql_pipe_multi_stage",
    "stat_anderson_darling_two_sample",
    "stat_mood_median",
    "dedup_winnowing_pairs",
    "stat_brown_forsythe",
    "parts_kraljic_matrix",
    "stat_welch_anova",
    "text_code_detection_screen",
    "geo_grid_radius_join",
    "geo_cell_rollup_multires",
    "geo_dbscan_core_points",
    "stat_bartlett_test",
    "stat_chow_test",
    "stat_ljung_box",
    "graph_connected_components",
    "graph_hits_bipartite",
    "embedding_semdedup",
    "text_ccnet_perplexity_buckets",
    "corpus_dataset_card",
    "layout_footer_stats_audit",
    "text_lang_id_naive_bayes",
    "stat_tukey_hsd_pairs",
    "pipeline_geo_e2e",
    "parts_eoq_policy",
    "stream_geo_fence_counts",
    "text_instruction_format_screen",
    "text_memorization_span_mass",
    "scd3_previous_value",
    "ivm_delta_join",
    "recursive_bom_explosion",
    "basket_brand_transitions",
    "stat_breusch_pagan",
    "events_adstock_transform",
    "agg_topk_plus_others",
    "stat_cooks_distance_days",
    "customer_bgnbd_inputs",
    "stat_granger_causality_lag1",
]
# a few names were appended by more than one round's session list; probe
# each exactly once, first-occurrence order (graph_pagerank_parts ran
# twice per pass before this)
PROBE_QUERIES = list(dict.fromkeys(PROBE_QUERIES))

# physical operators whose presence/count defines the plan's scale shape
SHAPE_OPS = (
    "SortMergeJoin",
    "BroadcastHashJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "Window",
    "WindowGroupLimit",
    "Exchange",
    "TakeOrderedAndProject",
    "Generate",
)


_ALPHA_LO = "abcdefghijklmnopqrstuvwxyz"
_ALPHA_UP = _ALPHA_LO.upper()
_DIGITS = "0123456789"


def _caesar_maps(i: int) -> tuple[str, str]:
    """Per-copy character substitution (letters shift by i mod 26, digits
    by i mod 10): copy i's text keeps every structural statistic of the
    original — word lengths, whitespace, punctuation, repetition shape —
    while its TOKENS land in a disjoint region of shingle space, so a
    100x replica models '100x more unique data' instead of '100 exact
    copies of the same corpus'.  Copies i and i+26 still collide (shift
    wraps), leaving realistic bounded duplicate clusters (~copies/26
    members) for the dedup operators to find."""
    s, d = i % 26, i % 10
    return (
        _ALPHA_LO + _ALPHA_UP + _DIGITS,
        _ALPHA_LO[s:] + _ALPHA_LO[:s] + _ALPHA_UP[s:] + _ALPHA_UP[:s]
        + _DIGITS[d:] + _DIGITS[:d],
    )


def generate(
    spark, out_dir: str, copies: int = COPIES, decollide: bool = False
) -> None:
    """Key-offset replica generator.  Default mode replicates every fact
    row ``copies`` times with disjoint keys (the r5 10x-probe design).
    ``decollide`` additionally perturbs the content-bearing tables so
    duplicate-cluster sizes do NOT scale with ``copies``: documents get a
    per-copy Caesar substitution (see _caesar_maps), embeddings a
    per-copy cyclic rotation of the vector (norm-preserving, decollides
    cosine structure; copies i and i+dim collide, bounding semantic-dup
    clusters at ~copies/dim members).  Without this, a 100x replica hands
    every near-dup operator duplicate clusters 100x the real-world size —
    pair volume then grows quadratically as a DATA artifact the probe
    would misattribute to the plan."""
    from pyspark.sql import functions as F

    from etl_pipeline_aws_spark.catalog import TABLES, load_table

    os.makedirs(out_dir, exist_ok=True)
    for name in TABLES:
        src = load_table(spark, SRC_SF, name)
        cols = OFFSET_COLS[name]
        if not cols:
            out = src  # bounded dimensions replicate as-is
        elif decollide and name in ("documents", "embeddings", "part"):
            # per-copy loop: these tables are small and need per-copy
            # literal transforms (translate maps / rotation offsets)
            parts = []
            for i in range(copies):
                df = src
                for c in cols:
                    df = df.withColumn(c, F.col(c) + F.lit(i * KEY_OFFSET))
                if name == "documents":
                    frm, to = _caesar_maps(i)
                    df = df.withColumn("text", F.translate("text", frm, to))
                elif name == "part":
                    # r10 verdict ask #3: decollide part NAMES too, so the
                    # entity-resolution probe models a catalog of genuinely
                    # unique spellings (copies i and i+26 still collide,
                    # bounding duplicate clusters at ~copies/26 members —
                    # same wrap semantics as documents)
                    frm, to = _caesar_maps(i)
                    df = df.withColumn("p_name", F.translate("p_name", frm, to))
                else:
                    dim = 64
                    r = i % dim
                    if r:
                        df = df.withColumn(
                            "embedding",
                            F.expr(
                                f"concat(slice(embedding, {r + 1},"
                                f" size(embedding) - {r}),"
                                f" slice(embedding, 1, {r}))"
                            ),
                        )
                parts.append(df)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        else:
            # one scan + copy-index cross join: a 100-scan union plan
            # compiles slowly; this shape scales to any copy count
            rep = F.broadcast(
                spark.range(copies).withColumnRenamed("id", "_copy")
            )
            df = src.crossJoin(rep)
            for c in cols:
                df = df.withColumn(c, F.col(c) + F.col("_copy") * KEY_OFFSET)
            out = df.drop("_copy")
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
        print(f"generated {name}", flush=True)


def plan_shape(df) -> dict[str, int]:
    plan = df._jdf.queryExecution().sparkPlan().toString()
    return {op: len(re.findall(rf"\b{op}\b", plan)) for op in SHAPE_OPS}


def probe(spark, sf_dir: str) -> dict[str, dict]:
    import etl_pipeline_aws_spark as engine

    qs = engine.all_queries()
    out: dict[str, dict] = {}
    for name in PROBE_QUERIES:
        engine.clear_caches(spark)
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        shape = plan_shape(df)
        df.count()
        out[name] = {"sec": round(time.perf_counter() - t0, 2), "shape": shape}
        print(f"{sf_dir} {name}: {out[name]['sec']}s", flush=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--regen", action="store_true")
    ap.add_argument("--only", help="comma-separated subset of PROBE_QUERIES")
    ap.add_argument("--copies", type=int, default=COPIES)
    ap.add_argument(
        "--decollide",
        action="store_true",
        help="perturb documents/embeddings per copy (see generate docstring)",
    )
    ap.add_argument(
        "--skip-small",
        action="store_true",
        help="probe only the replica (skip the sf0.1 pass)",
    )
    args = ap.parse_args()
    if args.only:
        global PROBE_QUERIES
        keep = set(args.only.split(","))
        PROBE_QUERIES = [q for q in PROBE_QUERIES if q in keep]

    import etl_pipeline_aws_spark as engine

    spark = engine.get_spark("scale-probe")
    if args.regen or not os.path.isdir(args.out):
        generate(spark, args.out, copies=args.copies, decollide=args.decollide)

    r_small = None if args.skip_small else probe(spark, SRC_SF)
    r_big = probe(spark, args.out)

    diffs = {}
    for name in PROBE_QUERIES:
        if r_small is None:
            break
        delta = {
            op: (r_small[name]["shape"][op], r_big[name]["shape"][op])
            for op in SHAPE_OPS
            if r_small[name]["shape"][op] != r_big[name]["shape"][op]
        }
        if delta:
            diffs[name] = delta
    report = {
        "copies": args.copies,
        "decollide": args.decollide,
        "plan_shape_diffs": diffs,
        "timings": {
            name: {
                "sf0.1": None if r_small is None else r_small[name]["sec"],
                "replica": r_big[name]["sec"],
            }
            for name in PROBE_QUERIES
        },
        "shapes_replica": {n: r_big[n]["shape"] for n in PROBE_QUERIES},
    }
    print(json.dumps(report, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
