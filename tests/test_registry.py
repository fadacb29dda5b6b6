"""Registry integrity: a module that fails to import is silently
skipped (by design, to keep the driver contract alive), so this test
pins the full expected query inventory — any accidental drop fails CI
loudly instead of quietly shrinking the graded surface."""

from __future__ import annotations

from projet_meteo_etl_spark import registry

EXPECTED_QUERIES = {
    # relational core + ext
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "revenue_by_nation", "order_priority_count", "customers_without_orders",
    "customer_order_counts", "top_orders_per_customer", "running_revenue_by_user",
    "lag_lead_event_gaps", "topk_expensive_parts", "distinct_count_by_group",
    "nation_set_ops", "scalar_functions_showcase", "rollup_revenue",
    "above_avg_balance_customers", "q6_forecast_revenue", "q7_supplier_nation_volume",
    "q10_returned_items", "q12_priority_by_returnflag", "q14_promo_revenue",
    "q18_large_orders", "q19_bracket_predicates", "q22_idle_customers",
    "orders_above_customer_avg", "order_status_pivot", "cube_revenue",
    "q15_top_supplier", "q17_small_quantity_revenue", "modern_aggregates_showcase",
    "salted_skew_aggregation", "lineitem_sample_stats",
    # tpch fill (the full 22 as of round 6: Q4/Q13 joined Q2/Q8/Q9/Q11/
    # Q16/Q20/Q21 on the schema subset)
    "q2_min_cost_supplier", "q8_market_share", "q9_product_profit",
    "q11_important_parts", "q16_supplier_part_counts", "q20_excess_suppliers",
    "q21_waiting_suppliers", "q4_order_priority", "q13_customer_distribution",
    # showcases
    "ranking_functions_showcase", "grouping_sets_revenue", "array_functions_showcase",
    "collation_segment_reconcile", "join_hints_showcase",
    "unpivot_returnflag_measures",
    "sql_interface_q1",
    # weather (reference surface)
    "weather_etl_unified", "weather_quality_report",
    "weather_station_daily_rollup", "weather_anomaly_rate_by_station",
    # temporal + timeseries
    "asof_purchase_before_click", "range_join_clicks_after_purchase",
    "range_join_binned",
    "pit_training_set_assembly", "cold_start_coverage",
    "linear_attribution_credit", "session_duration_percentiles",
    "user_value_trend", "user_hourly_ffill", "user_value_ewma",
    # quality audits
    "range_audit_lineitem", "null_audit_events", "duplicate_audit",
    "functional_dependency_audit",
    "date_range_audit", "consistency_audit_documents", "count_reconciliation",
    # sinks
    "sink_partitioned_roundtrip", "sink_pruned_partition_read",
    "sink_text_formats_roundtrip",
    # dedup
    "dedup_exact", "dedup_fingerprint_groups", "ngram_jaccard_pairs",
    "dedup_pair_density_audit",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_embedding_cosine",
    "dedup_connected_components", "winnow_fingerprint_pairs",
    "containment_pairs", "dedup_token_savings",
    "ngram_contamination_audit", "source_contamination_matrix",
    # curation
    "pack_sequences", "stratified_sample_mix", "benchmark_decontamination",
    "incremental_dedup_report", "length_band_filter",
    # multimodal
    "multimodal_metadata", "multimodal_frame_sample", "multimodal_features",
    "multimodal_thumbnails", "multimodal_header_decode",
    # sketches
    "approx_user_stats", "hll_sketch_mergeability",
    # similarity
    "ann_bruteforce_topk", "ann_lsh_topk", "ann_ivf_topk", "ann_ivfpq_topk",
    "jl_projection_distortion",
    "triplet_margin_mining", "knn_label_accuracy", "mmr_diversified_topk",
    "embedding_label_centroids",
    # text
    "training_data_pipeline", "near_dup_edit_distance",
    "text_token_stats", "text_quality_score",
    "text_langid", "text_fingerprints", "gopher_quality_rules",
    "filter_agreement_kappa",
    "c4_line_filter", "pii_pattern_audit",
    # data selection (DSIR + boilerplate) and the bloom sketch audit
    "dsir_importance_weights", "boilerplate_segment_filter",
    "bloom_membership_audit",
    # corpus curation / selection audits (operators/selection.py)
    "policy_blocklist_audit", "prefix_dup_groups", "cross_source_overlap",
    "vocab_kl_by_source", "dedup_retention_policy",
    # portable (oracle-exact) HLL
    "portable_hll_distinct", "hll_sliding_distinct_users",
    # data-layout operators (plans/layout.py)
    "zorder_layout_audit", "zone_pruning_estimate",
    # sliding-window chunking (plans/curation.py)
    "chunk_documents",
    # product quantization (operators/clustering.py)
    "pq_codebook_audit", "ann_pq_adc_topk",
    # optimizer-statistics sketch + slice explanation mining
    "join_size_estimate", "revenue_delta_contributors",
    # histogram selectivity forecast + per-group hash reservoir
    "selectivity_estimate", "per_group_sample",
    # classifier evaluation + windowed attribution
    "langid_confusion_matrix", "last_touch_attribution",
    # delta-join incremental view maintenance + CDC merge apply
    "join_view_maintenance", "cdc_merge_apply",
    # batch windows
    "events_tumbling_counts", "events_sliding_avg", "events_session_windows",
    "events_json_typed_extract",
    "events_json_props", "events_late_data_filter",
    "events_multi_grain_rollup",
    # structured streaming
    "stream_tumbling_counts", "stream_tumbling_counts_update",
    "stream_backfill_seam",
    "stream_user_running_totals", "stream_pit_features",
    "stream_pit_features_files", "stream_user_totals_files",
    "stream_user_totals_restart",
    "stream_late_event_dropper", "stream_static_segment_counts",
    "stream_stream_purchase_click_join", "stream_session_windows",
    "stream_sliding_avg",
    # Spark-4 API surface (plans/modern_api.py)
    "pyds_ticks_station_stats", "udtf_token_run_lengths",
    "variant_props_extract", "cogroup_asof_purchase_click",
    "pandas_udaf_user_median", "arrow_vector_norms",
    "pandas_udf_scalar_hatch", "udtf_partitioned_session_stats",
    "pyds_stream_ticks_totals",
    # ORC / XML sinks
    "sink_orc_roundtrip", "sink_xml_roundtrip", "binaryfile_ingest_audit",
    # SQL-text surface (plans/sql_surface.py)
    "recursive_cte_daily_orders", "pipe_syntax_returnflag_revenue",
    "sql_udf_discount_bands", "observed_load_metrics",
    # sparse retrieval (operators/retrieval.py)
    "tfidf_topk_similar", "bm25_keyword_search",
    # corpus statistics (operators/corpus_stats.py)
    "text_repetition_filter", "corpus_vocab_topk", "heaps_vocab_growth",
    "vocab_coverage_curve",
    # embedding compression (operators/similarity.py)
    "embedding_int8_quantize",
    # numeric profiler (operators/profiling.py)
    "profile_numeric_stats", "profile_numeric_histograms",
    "column_cardinality_profile",
    # anomaly + SCD2 history (plans/timeseries.py)
    "events_zscore_outliers", "scd2_value_band_history",
    "weekday_seasonal_decomposition",
    # budgeted selection + split (plans/curation.py)
    "token_budget_selection", "train_test_split_report",
    # weighted sampling + shard layout (plans/curation.py)
    "weighted_sample_wor", "shard_assignment_audit",
    # feature engineering (plans/feature_eng.py)
    "kfold_target_encoding", "negative_sampling_pairs",
    "coclick_positive_pairs",
    # mixture weights + curriculum phases (plans/curation.py)
    "mixture_temperature_weights", "curriculum_quality_buckets",
    # LSH index-quality eval (operators/dedup.py)
    "lsh_candidate_precision",
    "lsh_precision_sampled",
    # chained stateful streaming (streaming/structured.py)
    "stream_chained_dedup_dau",
    # compaction planner (plans/layout.py) + OOV audit (corpus_stats.py)
    "small_files_compaction_plan", "oov_rate_audit",
    # round-5 batch 3: allocation / IPW / fertility / DV planner
    "neyman_allocation_plan", "propensity_ipw_weights",
    "tokenizer_fertility_by_source", "deletion_vector_plan",
    # round-5 batch 4: bootstrap CI + ranking eval
    "bootstrap_ci_purchase_mean", "ndcg_at_k_eval",
    # round-5 batch 5: skew advisor / seasonality / MapType surface
    "salt_factor_advisor", "events_hour_of_week_seasonality",
    "map_functions_showcase",
    # round-5 batch 6: scaler fit / temporal CV / hashing audit / media dedup
    "robust_scaler_params", "time_series_cv_folds",
    "feature_hash_collision_audit", "multimodal_payload_near_dup",
    # round-5 batch 7: rank-exact model eval / spectral probe / Holt
    "auc_roc_eval", "ks_value_drift", "mann_whitney_value_shift",
    "pca_power_component",
    "pr_curve_points",
    "holt_linear_forecast",
    "cusum_revenue_drift",
    "markov_attribution_removal",
    "stream_cusum_revenue_alert",
    "stream_foreachbatch_upsert",
    "stream_checkpoint_restart_totals", "stream_session_custom_timeout",
    "stream_rocksdb_user_totals",
    # round-5 batch 8: LPA communities + streaming heavy hitters
    "label_propagation_communities", "stream_sliding_topk_items",
    # round-5 batch 9: exact ANOVA + Kaplan-Meier survival
    "anova_value_by_type", "kaplan_meier_first_purchase",
    "spearman_daily_rev_clicks", "kendall_daily_rev_clicks",
    "ccf_rev_clicks_lags", "mann_kendall_revenue_trend",
    "pinball_loss_eval", "conformal_interval_calibration",
    "cuped_adjusted_lift", "jackknife_ratio_metric",
    "k_anonymity_audit", "l_diversity_audit", "t_closeness_audit",
    "mrr_hit_rate_eval",
    "hhi_supplier_concentration", "abc_inventory_classes",
    "nelson_aalen_cum_hazard", "propensity_forecast_brier",
    "position_based_attribution", "funnel_stage_latency",
    "sorted_neighborhood_pairs", "winsorized_ab_lift",
    "source_quantile_alignment", "stream_rate_alert",
    "uplift_by_decile", "regression_stump_split",
    "item_ktruss_edges", "customer_rfm_segments",
    # graph analytics (operators/graph.py)
    "pagerank_click_graph",
    "hits_hub_authority", "personalized_pagerank_seeds",
    "click_graph_bfs_reach",
    "kmeans_embedding_clusters",
    "semdedup_prune",
    "item_cooccurrence_topk",
    "item_jaccard_similarity",
    "profile_correlations",
    "profile_group_percentiles",
    "bigram_lm_doc_scores",
    "hybrid_rrf_search",
    "event_funnel_counts",
    "cms_heavy_hitters",
    "stream_dedup_user_day",
    "events_dau_wau",
    "vocab_zipf_fit",
    "cohort_retention",
    "user_value_deciles",
    "profile_benford_digits",
    "user_value_twap", "user_decayed_engagement",
    "events_value_psi",
    "event_transition_matrix",
    "incremental_agg_maintenance",
    "snapshot_table_diff",
    "seasonal_forecast_error",
    "embedding_matryoshka_quality",
    "corpus_token_gini",
    "events_rolling_3day_revenue",
    "pareto_frontier_parts",
    "session_path_topk",
    "ab_test_analysis", "srm_chi_square_check",
    "user_behavior_entropy",
    "profile_higher_moments",
    "token_pmi_topk",
    "event_burstiness",
    "chi_square_priority_weekday",
    "revenue_autocorrelation",
    # tokenizer training + substring dedup (operators/tokenizer.py)
    "bpe_merge_topk", "bpe_train_merges", "repeated_ngram_spans",
    # classifier inference (operators/importance.py)
    "fasttext_quality_score",
    # triangle counting (operators/cooccur.py)
    "item_triangle_count",
    # skew-join rewrite (plans/relational_ext.py)
    "salted_skew_join",
    # FK orphan audit (operators/quality_queries.py)
    "referential_integrity_audit",
    # left-outer stream-stream join with heartbeat-flushed state
    "stream_left_outer_lonely_purchases",
    # winsorization + shuffle-key skew diagnostics (operators/profiling.py)
    "winsorized_value_stats", "shuffle_skew_audit",
    # held-out LM eval (operators/corpus_stats.py) + IVF tuning curve
    "lm_holdout_nll", "ann_ivf_recall_curve",
    # HLL set algebra (operators/sketches.py)
    "hll_set_operations",
    # k-core peeling (operators/cooccur.py)
    "item_kcore_peel",
    # median/MAD robust outliers + CUSUM changepoint (plans/timeseries.py)
    "events_mad_outliers", "revenue_changepoint",
    # sketch-driven join ordering (operators/sketches.py)
    "join_order_advisor",
    # per-source composite quality rollup (operators/selection.py)
    "corpus_report_card",
    # robust trend + persisted ANN index
    "revenue_theilsen_trend", "ann_ivf_persisted_index",
    # HLL registers as streaming state
    "stream_hll_users",
    # classifier calibration curve (operators/selection.py)
    "quality_score_calibration",
    "calibration_ece_summary",
    # CMS as streaming state (streaming/structured.py)
    "stream_cms_item_counts",
    # round-8 batch 2: weighted shortest path, market-basket rules,
    # RA link prediction, randomization inference, DiD
    "cheapest_path_bellman_ford",
    "association_rules_lift", "link_prediction_ra_index",
    "permutation_test_weekend_lift", "diff_in_diff_lift",
    # round-8 batch 3: assortativity, source marginal novelty, HW
    "degree_assortativity", "source_novelty_curve",
    "holt_winters_weekly_forecast",
    # round-8 batch 4: exact Shapley-value attribution + EB smoothing
    "shapley_attribution_channels", "eb_shrunk_item_ctr",
    # round-8 batch 5: transitivity panel over the co-click backbone
    "clustering_coefficient_bands",
    # round-8 batch 6: retention half-life (censoring-aware decay fit)
    "retention_halflife_fit",
    # round-9: portable bottom-k mergeable quantile sketch family
    # (operators/quantiles.py + the sketch-as-state streaming twin)
    "portable_quantile_sketch", "quantile_adaptive_range_audit",
    "stream_quantile_sketch_state",
    # round-9: Apriori 3-itemset rules + LPA partition quality
    "frequent_triples_lift", "community_modularity_score",
    # round-9: weather capstone — cross-validated neighbor-station
    # regression imputation over the S1-S4 path
    "weather_impute_temperature",
    # round-9: sliding quantiles from mergeable daily bottom-k partials
    "quantile_sliding_daily",
    # round-9: Fellegi-Sunter probabilistic record linkage (estimate +
    # score) over the SNM blocking
    "fs_linkage_weights", "fs_linkage_scores",
    # round-9: time-respecting earliest-arrival reachability
    "temporal_reachability_items",
    # round-9: next-click predictor eval (time-split hit-rate)
    "markov_next_click_hitrate",
    # round-9: beyond-accuracy recommender panel (coverage/ILD/pop-bias)
    "rec_list_quality",
    # round-9: log-log cross-sectional regression (econometrics family)
    "price_elasticity_by_brand",
    # round-9: offline policy eval (replay estimator)
    "bandit_replay_ctr",
    # round-9: first-order entropy rate (predictability ceiling)
    "transition_entropy_rate",
    # round-9: Gries DP term dispersion (corpus-linguistics panel)
    "term_dispersion_dp",
    # round-10: Lee et al. exact substring trim report (hierarchical
    # 50-token window hash + gaps-and-islands maximal spans)
    "exact_substring_trim_spans",
    # round-10: DoReMi one-step Group-DRO domain reweighting
    "doremi_mixture_weights",
    # round-10: WordPiece greedy longest-match tokenizer inference
    "wordpiece_greedy_segment",
    # round-10: Rocchio nearest-centroid quality-classifier training
    "rocchio_quality_classifier",
    # round-11: unigram-LM (SentencePiece-style) hard-EM + pruning round
    "unigram_lm_em_step",
    # round-11: real stdlib-only PNG pixel decode (inflate + unfilter)
    "png_pixel_stats",
    "jpeg_pixel_stats",
    "unigram_lm_prune_round",
    "dedup_substring_incremental",
    # round-11: incremental near-dup — batch signatures probed against
    # a persisted partition-pruned banded index
    "dedup_minhash_incremental",
    # round-11: CCNet-style per-source perplexity head/middle/tail split
    "perplexity_bucket_filter",
    # round-11: embedding twin of the incremental dedup — batch probes
    # a persisted cell-partitioned IVF index
    "dedup_embedding_incremental",
    # round-11: whole-doc best-fit-decreasing packing (no-split variant)
    "best_fit_packing",
    # round-11: T5/UL2 span-corruption mask planning (hash-seeded spans)
    "span_corruption_plan",
}

# rows-only by necessity: engine-specific hashing/sketches/batching.
# (weather_etl_unified / weather_quality_report graduated to hash oracles
# in round 6: DuckDB can't read their latin-1 CSV inputs, but it CAN read
# the pure-Python ground-truth parquet the fixture generator now stages.)
# every registered query now carries a hash oracle: the two sketch
# queries converted to contract-flag oracles in round 7
EXPECTED_ROWS_ONLY: set[str] = set()


def test_registry_complete_and_consistent():
    from projet_meteo_etl_spark.streaming.structured import has_tws_runtime

    expected = set(EXPECTED_QUERIES)
    if has_tws_runtime():  # environment-gated registration
        expected.add("stream_tws_user_totals")
        expected.add("stream_tws_session_timers")
        expected.add("stream_tws_user_lastk")
        expected.add("stream_tws_user_totals_restart")
    queries, oracles = registry.collect()
    # name the drift explicitly: "registered but not pinned" means a new
    # query needs its EXPECTED_QUERIES line; "pinned but not registered"
    # means a module silently failed to import or a query was dropped
    unpinned = sorted(set(queries) - expected)
    dropped = sorted(expected - set(queries))
    assert not unpinned, (
        f"queries registered but missing from EXPECTED_QUERIES "
        f"(add them to tests/test_registry.py): {unpinned}"
    )
    assert not dropped, (
        f"queries pinned in EXPECTED_QUERIES but not registered "
        f"(module import failure or accidental drop): {dropped}"
    )
    assert set(oracles) == expected - EXPECTED_ROWS_ONLY
