"""Scale probe: replicate the sf0.1 fact tables in-plan (×N union) and
time the headline scan/join/agg/window queries against ~N× the rows —
evidence that plans scale linearly, without generating new test data.

Replication happens through a catalog override: `load_table` returns
the union of N identical scans for fact tables (lineitem/orders/
events), dims stay single.  Row counts differ from the real tables, so
results are NOT oracle-comparable — this is a throughput probe only.

Usage: python tools/scale_probe.py [N] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from functools import reduce

from projet_meteo_etl_spark import catalog
from projet_meteo_etl_spark.session import get_spark

FACTS = {"lineitem", "orders", "events", "documents", "part", "embeddings"}


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3:])  # optional probe-name filter
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    real_load = catalog.load_table

    def scaled_load(s, d, name):
        df = real_load(s, d, name)
        if name in FACTS and n > 1:
            df = reduce(lambda a, b: a.unionByName(b), [df] * n)
        return df

    catalog.load_table = scaled_load
    seam_dir = None
    try:
        from projet_meteo_etl_spark.operators import (
            cooccur,
            importance,
            selection,
            sketches,
            tokenizer,
        )
        from projet_meteo_etl_spark.plans import (
            curation,
            relational,
            relational_ext,
            temporal,
        )

        probes = {
            "q1_pricing_summary": relational.q1_pricing_summary,
            "q5_local_supplier_volume": relational.q5_local_supplier_volume,
            "revenue_by_nation": relational.revenue_by_nation,
            "q18_large_orders": relational_ext.q18_large_orders,
            "top_orders_per_customer": relational.top_orders_per_customer,
            "asof_purchase_before_click": temporal.asof_purchase_before_click,
            "salted_skew_aggregation": relational_ext.salted_skew_aggregation,
            # round-2 surface: corpus audits + sketches over the
            # replicated documents/events streams
            "policy_blocklist_audit": selection.policy_blocklist_audit,
            "vocab_kl_by_source": selection.vocab_kl_by_source,
            "chunk_documents": curation.chunk_documents,
            "portable_hll_distinct": sketches.portable_hll_distinct,
            "join_size_estimate": sketches.join_size_estimate,
            # round-2b: tokenizer/substring-dedup/classifier/triangles
            "bpe_merge_topk": tokenizer.bpe_merge_topk,
            "repeated_ngram_spans": tokenizer.repeated_ngram_spans,
            "fasttext_quality_score": importance.fasttext_quality_score,
            "item_triangle_count": cooccur.item_triangle_count,
            "salted_skew_join": relational_ext.salted_skew_join,
        }
        # round-3: the five de-single-partitioned two-pass rank plans
        from projet_meteo_etl_spark.operators import corpus_stats
        from projet_meteo_etl_spark.plans import incremental

        probes.update(
            {
                "pareto_frontier_parts": incremental.pareto_frontier_parts,
                "user_value_deciles": temporal.user_value_deciles,
                "quality_score_calibration": selection.quality_score_calibration,
                "token_budget_selection": curation.token_budget_selection,
                "corpus_token_gini": corpus_stats.corpus_token_gini,
            }
        )
        # round-4: the round-3 additions — anchors×corpus broadcast
        # shapes (linear in corpus, not corpus²) and user-window plans
        from projet_meteo_etl_spark.operators import similarity, sketches as sk
        from projet_meteo_etl_spark.plans import timeseries

        probes.update(
            {
                "pit_training_set_assembly": temporal.pit_training_set_assembly,
                "user_decayed_engagement": timeseries.user_decayed_engagement,
                "knn_label_accuracy": similarity.knn_label_accuracy,
                "triplet_margin_mining": similarity.triplet_margin_mining,
                "mmr_diversified_topk": similarity.mmr_diversified_topk,
                "hll_sliding_distinct_users": sk.hll_sliding_distinct_users,
            }
        )
        # round-4 additions: PQ/IVF-PQ search, curation-rule audits,
        # weighted sampling, shard layout
        from projet_meteo_etl_spark.operators import clustering, text as tx

        probes.update(
            {
                "ann_pq_adc_topk": clustering.ann_pq_adc_topk,
                "ann_ivfpq_topk": similarity.ann_ivfpq_topk,
                "gopher_quality_rules": tx.gopher_quality_rules,
                "c4_line_filter": tx.c4_line_filter,
                "pii_pattern_audit": tx.pii_pattern_audit,
                "weighted_sample_wor": curation.weighted_sample_wor,
                "shard_assignment_audit": curation.shard_assignment_audit,
            }
        )
        # round-5 additions: the new quadratic-family member (inverted-
        # index candidate join) and the lambda/kappa seam.  The seam
        # reads STAGED files, outside the load_table override, so it
        # gets a genuinely replicated events table: rows ×N then
        # re-sorted by (ts, event_id) to satisfy the staging monotone
        # assert (duplicate ids sort adjacent; >= holds).
        from projet_meteo_etl_spark.operators import dedup
        from projet_meteo_etl_spark.streaming import structured

        if n > 1:
            import tempfile

            import pyarrow as pa
            import pyarrow.parquet as pq

            src = os.path.join(sf_dir, "events.parquet")
            t = pq.read_table(src)
            big = pa.concat_tables([t] * n).sort_by(
                [("ts", "ascending"), ("event_id", "ascending")]
            )
            seam_dir = tempfile.mkdtemp(prefix="spark_graft_scaleprobe_")
            pq.write_table(
                big, os.path.join(seam_dir, "events.parquet"), version="2.6"
            )

        def seam_probe(s, d):
            return structured.stream_backfill_seam(s, seam_dir or d)

        probes.update(
            {
                "containment_pairs": dedup.containment_pairs,
                "stream_backfill_seam": seam_probe,
            }
        )
        # round-5 additions with join-expansion shapes: the LSH index
        # eval (quadratic-family truth side) and the temporal co-click
        # pair miner (per-user self-join)
        from projet_meteo_etl_spark.plans import feature_eng

        probes.update(
            {
                "lsh_candidate_precision": dedup.lsh_candidate_precision,
                "coclick_positive_pairs": feature_eng.coclick_positive_pairs,
                "kfold_target_encoding": feature_eng.kfold_target_encoding,
            }
        )
        # round-5 batches 7-8: rank-stat evals (per-distinct-score
        # rollups must stay value-domain bounded), the Gram-partial PCA
        # (one corpus pass, d² shuffle cells), the recursive-CTE Holt
        # (depth = days, invariant under row replication), and LPA
        # (edge-list join growth)
        from projet_meteo_etl_spark.operators import dedup, graph, retrieval
        from projet_meteo_etl_spark.plans import (
            experiments,
            model_eval,
            relational_ext,
            temporal,
        )

        probes.update(
            {
                "auc_roc_eval": model_eval.auc_roc_eval,
                "ks_value_drift": model_eval.ks_value_drift,
                "pca_power_component": clustering.pca_power_component,
                "holt_linear_forecast": timeseries.holt_linear_forecast,
                "label_propagation_communities": (
                    graph.label_propagation_communities
                ),
                # batch 9: one map-combinable moment aggregate (ANOVA)
                # and a per-user agg feeding a date-domain-bounded
                # recursive product-limit (KM) — both should be ~flat
                "anova_value_by_type": model_eval.anova_value_by_type,
                "kaplan_meier_first_purchase": (
                    model_eval.kaplan_meier_first_purchase
                ),
                # batch 10: both rank correlations reduce the log to the
                # per-day rollup first — pair/window work is days²-bounded,
                # so the probes should track the rollup shuffle only
                "spearman_daily_rev_clicks": (
                    model_eval.spearman_daily_rev_clicks
                ),
                "kendall_daily_rev_clicks": (
                    model_eval.kendall_daily_rev_clicks
                ),
                # batch 11: lag-join and pair-join over the daily rollup —
                # both days-bounded after the one log shuffle
                "ccf_rev_clicks_lags": timeseries.ccf_rev_clicks_lags,
                "mann_kendall_revenue_trend": (
                    timeseries.mann_kendall_revenue_trend
                ),
                # batch 12: rank-selection on one time slice each, then a
                # broadcast k-row quantile table onto the other slice's agg
                "pinball_loss_eval": model_eval.pinball_loss_eval,
                "conformal_interval_calibration": (
                    model_eval.conformal_interval_calibration
                ),
                # batch 13: |users|-rollup moments (CUPED) and |days|-row
                # integer replicates (jackknife) — log scan dominates
                "cuped_adjusted_lift": experiments.cuped_adjusted_lift,
                "jackknife_ratio_metric": (
                    experiments.jackknife_ratio_metric
                ),
                # batch 15: catalog-bounded ranking broadcast onto the
                # distinct (user, purchased-item) pairs
                "mrr_hit_rate_eval": retrieval.mrr_hit_rate_eval,
                # batch 16: map-combined (nation, supplier) / per-part
                # aggregates; everything downstream is catalog-sized
                "hhi_supplier_concentration": (
                    relational_ext.hhi_supplier_concentration
                ),
                "abc_inventory_classes": (
                    relational_ext.abc_inventory_classes
                ),
                # batch 17: survival grid (date-domain bounded, no
                # recursion) and item-catalog forecast error
                "nelson_aalen_cum_hazard": (
                    model_eval.nelson_aalen_cum_hazard
                ),
                "propensity_forecast_brier": (
                    model_eval.propensity_forecast_brier
                ),
                # batch 18: horizon-bounded purchase×touch expansion and
                # hour-domain gap rollups
                "position_based_attribution": (
                    temporal.position_based_attribution
                ),
                "funnel_stage_latency": temporal.funnel_stage_latency,
                # batch 19: blocked SNM — pairs ∝ w·n by construction
                "sorted_neighborhood_pairs": (
                    dedup.sorted_neighborhood_pairs
                ),
                # batch 20: per-user rollup + value-domain P99 pick
                "winsorized_ab_lift": experiments.winsorized_ab_lift,
                # batch 21: length-domain rollups + 9-row broadcast grid
                "source_quantile_alignment": (
                    corpus_stats.source_quantile_alignment
                ),
                # batch 23: per-user rollup + 9-row decile-cut broadcast
                "uplift_by_decile": experiments.uplift_by_decile,
                # batch 24: 50-row split-candidate prefix scan
                "regression_stump_split": (
                    feature_eng.regression_stump_split
                ),
                # batch 25: two oriented-wedge support rounds + peels
                "item_ktruss_edges": cooccur.item_ktruss_edges,
                # batch 26: per-user rollup + three 4-cut broadcasts
                "customer_rfm_segments": (
                    experiments.customer_rfm_segments
                ),
            }
        )
        # round-6 additions: TPC-H Q4/Q13 (semi-join / outer-join +
        # double agg), value-domain rollup evals (PR curve, SRM,
        # t-closeness, κ), the stack-unpivot profiler, the min/max-day
        # cold-start rollup, and the build+parse multimodal round trip
        from projet_meteo_etl_spark.operators import (
            multimodal,
            profiling,
            quality_queries,
        )
        from projet_meteo_etl_spark.plans import tpch_fill

        probes.update(
            {
                "q4_order_priority": tpch_fill.q4_order_priority,
                "q13_customer_distribution": (
                    tpch_fill.q13_customer_distribution
                ),
                "pr_curve_points": model_eval.pr_curve_points,
                "srm_chi_square_check": experiments.srm_chi_square_check,
                "t_closeness_audit": quality_queries.t_closeness_audit,
                "column_cardinality_profile": (
                    profiling.column_cardinality_profile
                ),
                "filter_agreement_kappa": tx.filter_agreement_kappa,
                "cold_start_coverage": temporal.cold_start_coverage,
                "multimodal_header_decode": (
                    multimodal.multimodal_header_decode
                ),
                # round-6 batch 2: date/weekday rollups, fp-partitioned
                # dup ranking, min-bucket vocab growth, and the
                # one-window linear attribution
                "weekday_seasonal_decomposition": (
                    timeseries.weekday_seasonal_decomposition
                ),
                "dedup_token_savings": dedup.dedup_token_savings,
                "heaps_vocab_growth": corpus_stats.heaps_vocab_growth,
                "linear_attribution_credit": (
                    temporal.linear_attribution_credit
                ),
                # round-6 batch 3: distinct-tf rollup coverage and the
                # persisted one-pass sessionization percentile panel
                "vocab_coverage_curve": corpus_stats.vocab_coverage_curve,
                "session_duration_percentiles": (
                    temporal.session_duration_percentiles
                ),
                # round-7: decontamination joins (distinct-gram index,
                # linear) and the partition-local CUSUM kernel
                "ngram_contamination_audit": (
                    dedup.ngram_contamination_audit
                ),
                "source_contamination_matrix": (
                    dedup.source_contamination_matrix
                ),
                "cusum_revenue_drift": timeseries.cusum_revenue_drift,
                "markov_attribution_removal": (
                    temporal.markov_attribution_removal
                ),
                "calibration_ece_summary": (
                    selection.calibration_ece_summary
                ),
                # round-8: the flagship linear ops promoted to the 100×
                # probe tier (verdict item 3) — hash-groupBy exact dedup,
                # banded-signature LSH, and the term-partitioned
                # inverted-index BM25
                "dedup_exact": dedup.dedup_exact,
                "dedup_minhash_lsh": dedup.dedup_minhash_lsh,
                "bm25_keyword_search": retrieval.bm25_keyword_search,
            }
        )
        # round-8 additions: Pregel-as-joins HITS (edge-linear rounds),
        # the value-domain-rollup rank test, the one-shuffle grouping-
        # sets time rollup, and the anchor-bounded JL audit
        from projet_meteo_etl_spark.operators import graph as gr
        from projet_meteo_etl_spark.operators import similarity as sim
        from projet_meteo_etl_spark.streaming import windows as wnd

        from projet_meteo_etl_spark.plans import modern_api, showcase

        probes.update(
            {
                "hits_hub_authority": gr.hits_hub_authority,
                "personalized_pagerank_seeds": (
                    gr.personalized_pagerank_seeds
                ),
                "mann_whitney_value_shift": model_eval.mann_whitney_value_shift,
                "events_multi_grain_rollup": wnd.events_multi_grain_rollup,
                "jl_projection_distortion": sim.jl_projection_distortion,
                # batch 3/4: the keyless binned interval join (pair
                # products densify under replication — the documented
                # blow-up class), the partitioned UDTF, the FD audit,
                # and the two strategy showcases
                "range_join_binned": temporal.range_join_binned,
                "udtf_partitioned_session_stats": (
                    modern_api.udtf_partitioned_session_stats
                ),
                "functional_dependency_audit": (
                    quality_queries.functional_dependency_audit
                ),
                "collation_segment_reconcile": (
                    showcase.collation_segment_reconcile
                ),
                "join_hints_showcase": showcase.join_hints_showcase,
            }
        )
        # round-8 batch 2: weighted shortest path (Pregel-as-joins,
        # click-count-weighted edges), the capped-fan-out basket pair
        # ops, and the fixed-128-explode randomization test
        from projet_meteo_etl_spark.plans import experiments

        probes.update(
            {
                "cheapest_path_bellman_ford": gr.cheapest_path_bellman_ford,
                "association_rules_lift": cooccur.association_rules_lift,
                "link_prediction_ra_index": cooccur.link_prediction_ra_index,
                "permutation_test_weekend_lift": (
                    experiments.permutation_test_weekend_lift
                ),
                "diff_in_diff_lift": experiments.diff_in_diff_lift,
                # batch 3: edge-linear moment aggregate, corpus-linear
                # gram pass, and the date-domain-bounded HW kernel
                "degree_assortativity": gr.degree_assortativity,
                "source_novelty_curve": curation.source_novelty_curve,
                "holt_winters_weekly_forecast": (
                    timeseries.holt_winters_weekly_forecast
                ),
                # batch 4: one user-rollup shuffle + a 16-row coalition
                # table — constant beyond the scan
                "shapley_attribution_channels": (
                    temporal.shapley_attribution_channels
                ),
                # one per-item rollup + broadcast pooled prior
                "eb_shrunk_item_ctr": feature_eng.eb_shrunk_item_ctr,
                # shares the degree-oriented triangle relations
                "clustering_coefficient_bands": (
                    cooccur.clustering_coefficient_bands
                ),
                # distinct (user, day) pass + week-domain fit
                "retention_halflife_fit": temporal.retention_halflife_fit,
            }
        )
        # round-9: the last two heavy r8 additions without probe rows —
        # the degree-peeling loop (edge-linear rounds, value-domain peel
        # ranks) and the EventTimeTimeout sessionizer.  The stream reads
        # STAGED files like the seam probe, so it gets the genuinely
        # replicated events dir built above (falls back to the real dir
        # at n=1).
        def custom_timeout_probe(s, d):
            return structured.stream_session_custom_timeout(
                s, seam_dir or d
            )

        def quantile_state_probe(s, d):
            return structured.stream_quantile_sketch_state(
                s, seam_dir or d
            )

        probes.update(
            {
                "item_kcore_peel": cooccur.item_kcore_peel,
                "stream_session_custom_timeout": custom_timeout_probe,
                "stream_quantile_sketch_state": quantile_state_probe,
            }
        )
        # round-9 additions: the portable bottom-k quantile sketch pair
        # (threshold-filtered sample build + two-pass exact ranks; the
        # adaptive audit re-scans with the 4-row bounds broadcast)
        from projet_meteo_etl_spark.operators import quantiles

        probes.update(
            {
                "portable_quantile_sketch": quantiles.portable_quantile_sketch,
                "quantile_adaptive_range_audit": (
                    quantiles.quantile_adaptive_range_audit
                ),
                # Apriori triple lattice (frequent-pair-bounded expansion)
                # and the LPA modularity rollup (two edge-label joins)
                "frequent_triples_lift": cooccur.frequent_triples_lift,
                "community_modularity_score": gr.community_modularity_score,
                # days×k partial-merge sliding quantiles
                "quantile_sliding_daily": quantiles.quantile_sliding_daily,
                # FS linkage: rollup-only estimate + w·n blocked scoring
                "fs_linkage_weights": dedup.fs_linkage_weights,
                "fs_linkage_scores": dedup.fs_linkage_scores,
                # time-respecting earliest-arrival, Pregel-as-joins
                "temporal_reachability_items": (
                    gr.temporal_reachability_items
                ),
                # lag-pass + pair-rollup top-k + one eval join
                "markov_next_click_hitrate": (
                    temporal.markov_next_click_hitrate
                ),
                # CF scoring join + users×k list relations
                "rec_list_quality": cooccur.rec_list_quality,
                # one lineitem rollup + |parts|-bounded OLS
                "price_elasticity_by_brand": (
                    experiments.price_elasticity_by_brand
                ),
                # (day,item) rollup + date×catalog cumulative grid
                "bandit_replay_ctr": model_eval.bandit_replay_ctr,
                # lag pass + pair-domain entropy sums
                "transition_entropy_rate": (
                    temporal.transition_entropy_rate
                ),
                # one tokenize rollup + top-k×sources grid
                "term_dispersion_dp": corpus_stats.term_dispersion_dp,
            }
        )
        # round-10: Lee-et-al exact substring trim (hierarchical window
        # hash + occurrence bucketing + gaps-and-islands — the one new
        # corpus-linear pass of the round), the DoReMi reweighting step
        # (two vocab²-bounded LM aggregates + one held-out scoring
        # pass), and the two heavy per-user streaming state machines
        # (staged-replicated events dir, like the seam probe)
        def user_totals_probe(s, d):
            return structured.stream_user_running_totals(s, seam_dir or d)

        def tws_totals_probe(s, d):
            return structured.stream_tws_user_totals(s, seam_dir or d)

        probes.update(
            {
                "exact_substring_trim_spans": (
                    tokenizer.exact_substring_trim_spans
                ),
                "doremi_mixture_weights": (
                    corpus_stats.doremi_mixture_weights
                ),
                "stream_user_running_totals": user_totals_probe,
                "stream_tws_user_totals": tws_totals_probe,
                # vocab-collapsed pair: all post-wordcount work is
                # vocabulary-sized, so replication should read ~flat
                "wordpiece_greedy_segment": (
                    tokenizer.wordpiece_greedy_segment
                ),
                "rocchio_quality_classifier": (
                    importance.rocchio_quality_classifier
                ),
            }
        )

        # round-11: unigram-LM EM round (vocab-collapsed like
        # WordPiece — expect ~flat) and the two remaining TWS state
        # types (MapState+timers / ListState), staged-replicated
        # events like the seam probe
        from projet_meteo_etl_spark.operators import multimodal as mm

        def tws_timers_probe(s, d):
            return structured.stream_tws_session_timers(s, seam_dir or d)

        def tws_lastk_probe(s, d):
            return structured.stream_tws_user_lastk(s, seam_dir or d)

        probes.update(
            {
                "unigram_lm_em_step": tokenizer.unigram_lm_em_step,
                "stream_tws_session_timers": tws_timers_probe,
                "stream_tws_user_lastk": tws_lastk_probe,
                "dedup_minhash_incremental": dedup.dedup_minhash_incremental,
                "dedup_embedding_incremental": (
                    similarity.dedup_embedding_incremental
                ),
                "perplexity_bucket_filter": (
                    corpus_stats.perplexity_bucket_filter
                ),
                "png_pixel_stats": mm.png_pixel_stats,
                "best_fit_packing": curation.best_fit_packing,
                "span_corruption_plan": curation.span_corruption_plan,
            }
        )
        # round-12: the JPEG sibling (decode rides the scan like PNG),
        # the unigram prune round (vocab-collapsed — expect ~flat),
        # the third incremental dedup (probe cost scales with the
        # batch), and the two checkpoint-restart recovery queries
        # (staged-replicated events like the other streaming probes)
        def gs_restart_probe(s, d):
            return structured.stream_user_totals_restart(s, seam_dir or d)

        def tws_restart_probe(s, d):
            return structured.stream_tws_user_totals_restart(
                s, seam_dir or d
            )

        probes.update(
            {
                "jpeg_pixel_stats": mm.jpeg_pixel_stats,
                "unigram_lm_prune_round": tokenizer.unigram_lm_prune_round,
                "dedup_substring_incremental": (
                    tokenizer.dedup_substring_incremental
                ),
                "stream_user_totals_restart": gs_restart_probe,
                "stream_tws_user_totals_restart": tws_restart_probe,
            }
        )
        # round-12b: the winnow df-cap refit (re-probed after the sf1.0
        # tier's OOM fix), the linear pair-budget pre-flight, and the
        # stratum-sampled LSH eval (quadratic truth cut by the modulus)
        probes.update(
            {
                "winnow_fingerprint_pairs": dedup.winnow_fingerprint_pairs,
                "dedup_pair_density_audit": dedup.dedup_pair_density_audit,
                "lsh_precision_sampled": dedup.lsh_precision_sampled,
            }
        )
        timings = {}
        # warmup
        relational.revenue_by_nation(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        for name, fn in probes.items():
            if only and name not in only:
                continue
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        print(
            json.dumps(
                {
                    "metric": "scale_probe_wall_sec",
                    "replication": n,
                    "approx_lineitem_rows": 600_000 * n,
                    "queries": timings,
                    "total": round(sum(timings.values()), 3),
                }
            )
        )
    finally:
        catalog.load_table = real_load
        if seam_dir:
            import shutil

            shutil.rmtree(seam_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
