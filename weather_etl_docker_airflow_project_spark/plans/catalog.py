"""Import side-effect module: pulls in every plan module so the registry is
fully populated, then re-exports the driver-contract accessors.

The registry is re-ordered after import: the round driver oracle-checks the
FIRST 50 registered queries only (round-1 lesson — everything past the cut
got no hard-signal correctness row). ``_PRIORITY`` therefore front-loads
(a) the flagship (``entry()`` smoke depends on it being runnable), (b) the
reference-fidelity pipeline, (c) the entire LLM-pipeline surface, streaming,
and IO queries, (d) queries whose oracles changed this round and need a
fresh verdict. The first 50 priority entries fill the window exactly;
entries after position 50 are ordered ahead of the unlisted remainder but
sit PAST the driver's cut — they are next-round rotation candidates (in
rotation order: oldest green rows first, freshest last), not checked this
round.
``_reorder`` raises on names missing from the registry so a renamed query
can never silently shift the window.
"""

from __future__ import annotations

from . import relational  # noqa: F401
from . import functions_q  # noqa: F401
from . import ref_weather  # noqa: F401
from . import streaming_q  # noqa: F401
from . import llm_q  # noqa: F401
from . import io_q  # noqa: F401
from . import timeseries_q  # noqa: F401
from . import tpch_q  # noqa: F401
from . import mining_q  # noqa: F401

from .registry import REGISTRY, all_oracles, all_queries  # noqa: F401,E402

_PRIORITY: tuple[str, ...] = (
    # ================= ROUND-12 WINDOW (first 50) =================
    # Head: flagship (entry() smoke), the NINE round-12 surface
    # additions needing their FIRST driver row (s41 incremental/
    # predicate-scoped OPTIMIZE — the r11 verdict's top task; s42
    # z-order x bucket coexistence; s43 multi-writer auto-rebase; t23
    # streaming change feed; s44 batch table_changes; s45 batch
    # DataSource over the format; s46 predicate DML; s48 incremental
    # compaction; cdc4 streaming CDC replication), and every versioned-
    # family query whose machinery materially changed this round
    # (cluster_rewrite rewritten scoped+granular; merge/delete gained
    # CDF staging + the widened superset-key granular trigger + the
    # commuting auto-rebase; vacuum reclaim recursive + cdf-aware;
    # identity commits pinned; rename CAS-first; DV reads broadcast;
    # t22 ignoreChanges/vacuumed-offset fixes; clone carries _cdf).
    # The rest: the r6-currency rotation (verdict item 8 — a13, a14,
    # a16, dq1, j10, j11, q1, s11, the l5 codec trio, and the rest of
    # the r6 tier), plus g2 (a fresh row after the r12 regression
    # probe cleared it: HEAD 4.87 s vs r10-code 4.83 s min-of-3
    # same-host — variance, not code). Displaced to positions 51+ for
    # the r13 window: w1_top3, l3_ivf_persisted_probe, s39 (machinery
    # unchanged this round), w5, tpch_q4.
    # ================= PAST THE CUT (positions 51+) ================
    # r13 rotation order: the entries just displaced, then oldest
    # remaining tiers (r7, r8, r9, r10 in the prior rotation order),
    # then the r11-fresh entries demoted from last round's window
    # (freshest last).
    "flagship",
    "s41_incremental_optimize",
    "s42_clustered_bucket_table",
    "s43_concurrent_writers",
    "t23_stream_change_feed",
    "s34_zorder_table_optimize",
    "s28_bucketed_sparse_merge",
    "s25_versioned_merge_upsert",
    "s30_bucket_pruned_lookup",
    "s32_deletion_vector_delete",
    "s29_clone_safe_vacuum",
    "s40_identity_column",
    "s38_column_mapping_ddl",
    "s23_change_feed_cdc",
    "cdc3_replicate_changefeed",
    "t22_versioned_stream_source",
    "t21_stream_merge_upsert",
    "s31_versioned_schema_evolution",
    "s24_compaction_roundtrip",
    "s26_shallow_clone_divergence",
    "s27_constraint_enforced_commits",
    "s35_restore_rollback",
    "s36_timestamp_time_travel",
    "s37_type_widening_evolution",
    "s48_incremental_compact",
    "s33_stats_pruned_scan",
    "s11_schema_evolution_scan",
    "s12_bucketed_colocated_join",
    "t10_stream_static_enrich",
    "t11_stream_outer_join",
    "l5_gif_pixel_features",
    "l5_jpeg_pixel_features",
    "l5_audio_features",
    "t2_weather_stream_upsert",
    "l6_oversample_mix",
    "l4_bpe_pretokens",
    "s46_predicate_dml",
    "s45_versioned_batch_source",
    "q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "j5_anti_customers_without_big_orders",
    "a13_salted_skew_agg",
    "s44_change_feed_batch",
    "a14_stats_suite",
    "a16_incremental_rollup",
    "dq1_orders_quality",
    "j10_fuzzy_blocked_join",
    "j11_salted_skew_join",
    "cdc4_stream_replicate",
    "g2_triangle_counts",
    "w1_top3_orders_per_segment",
    "l3_ivf_persisted_probe",
    "s39_describe_history",
    "w5_distribution_windows",
    "ts5_weekly_retention_cohorts",
    "l4_lm_familiarity",
    "a23_countmin_estimates",
    "l5_ahash_buckets",
    "l6_curriculum_order",
    "w8_max_concurrency",
    "l2_incremental_neardup",
    "t19_stream_countmin",
    "l5_mixed_pixel_features",
    "w9_capped_running_sum",
    "l3_ivf_delete",
    "dq5_referential_integrity",
    "s20_versioned_time_travel",
    "t20_stream_versioned_commits",
    "l6_sequence_packing",
    "a20_weighted_median",
    "l3_ann_persisted_multiquery",
    "t12_stream_full_outer_join",
    "tpch_q21_waiting_suppliers",
    "l3_ann_persisted_probe",
    "a18_heavy_hitters",
    "l4_bm25_topk",
    "tpch_q6_forecast_revenue",
    "tpch_q12_priority_classes",
    "tpch_q19_disjunctive_revenue",
    "tpch_q15_top_supplier",
    "tpch_q17_small_qty_revenue",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_stock",
    "tpch_q16_supplier_part_counts",
    "tpch_q20_promotion_suppliers",
    "udtf_document_chunks",
    "j2_full_outer_nation_presence",
    "j7_bucketed_interval_join",
    "f10_array_suite",
    "f11_map_suite",
    "tpch_q5_local_supplier_volume",
    "a5_cube_order_grid",
    "l6_exact_stratified_take",
    "l6_chunk_and_pack",
    "l2_span_dedup",
    "l3_radius_search",
    "ts11_markov_transitions",
    "w10_analytic_suite",
    "dq6_column_profile",
    "j13_bloom_pruned_join",
    "l6_ngram_contamination",
    "j16_interval_overlap_join",
    "s22_version_diff_scan",
    "l3_ivf_search",
    "p10_null_safe_join",
    "w3_range_frame_hourly_load",
    "l5_pixel_features",
    "f12_hash_suite",
    "f13_cast_suite",
    "f9_json_suite",
    "l1_exact_dedup",
    "l2_minhash_lsh_pairs",
    "l2_simhash_neardup_pairs",
    "l2_simhash_signatures",
    "l3_ann_lsh_bucketed",
    "l3_ann_lsh_multiprobe",
    "l3_knn_bruteforce",
    "l4_boilerplate_shingles",
    "l4_fingerprint",
    "l4_gopher_rules",
    "l4_lang_id",
    "l4_quality_score",
    "l4_redact_pii",
    "l4_repetition_stats",
    "l4_term_stats",
    "l4_tfidf_top_terms",
    "l5_frame_sample",
    "l5_media_decode",
    "l5_multimodal_features",
    "l6_decontaminate_against_eval",
    "l6_stratified_sample",
    "l6_train_val_test_split",
    "l7_training_corpus_pipeline",
    "p4_null_guard",
    "ref_weather_transform",
    "s5_catalog_weather_roundtrip",
    "s7_csv_roundtrip",
    "s8_partitioned_scan",
    "t5_sliding_window_counts",
    "t5_tumbling_window_counts",
    "t6_session_windows",
    "t7_stream_dedup_within_watermark",
    "t8_stateful_user_stats",
    "t9_stream_stream_join",
    "l2_semantic_neardup_cells",
    "l2_embedding_neardup_pairs",
    "l4_token_stats",
    "scd2_customer_segment",
    "tpch_q10_returned_items",
    "j1_inner_segment_revenue",
    "j2_left_outer_order_counts",
    "j3_broadcast_nation_rollcall",
    "j4_semi_customers_with_open_orders",
    "j6_theta_nation_pairs",
    "j7_range_value_buckets",
    "j8_asof_error_after_click",
    "j9_cross_region_segment_grid",
    "a1_count_with_predicate",
    "a3_distinct_status_priority",
    "a5_rollup_lineitem_status",
    "a5_grouping_sets_order_mix",
    "a6_filtered_aggregate",
    "a7_collect_statuses",
    "a8_pivot_status_by_priority",
    "a9_unpivot_status_counts",
    "a10_exact_percentiles",
    "a11_value_histogram",
    "a12_mode_event_type_per_user",
    "w2_lag_value_delta",
    "w3_moving_avg_value",
    "o1_top20_orders",
    "o4_max_by_customer_per_nation",
    "u1_union_active_parties",
    "u2_intersect_custkeys",
    "u3_except_custkeys",
    "p3_equality_conjunction",
    "p5_predicate_suite",
    "p6_pruned_projection",
    "p7_decorrelated_subquery",
    "f5_datetime_suite",
    "f6_string_suite",
    "f7_math_suite",
    "f8_conditional_suite",
    "l3_ann_lsh_multiquery",
    "l6_sequence_packing_firstfit",
    "l3_knn_multiquery",
    "tpch_q7_volume_shipping",
    "tpch_q13_customer_distribution",
    "tpch_q22_global_sales_opportunity",
    "t13_stream_semi_join",
    "l2_semantic_dedup_keep",
    "l2_neardup_pipeline",
    "l2_dedup_clusters",
    "l2_ngram_jaccard_pairs",
    "l2_containment_pairs",
    "dq7_snapshot_drift",
    "l3_ivf_persisted_multiquery",
    "tpch_q14_promo_revenue",
    "tpch_q18_large_orders",
    "s10_clustered_compact_scan",
    "g1_pagerank_purchase_graph",
    "a19_frequent_pairs",
    "ts8_ewma_smoothing",
    "p8_lateral_topk",
    "p9_recursive_month_spine",
    "f15_xml_suite",
    "s15_python_datasource_feed",
    "s16_python_datasource_sink",
    "t15_stream_python_source",
    "dq3_table_fingerprint",
    "s17_binaryfile_ingest",
    "j12_temporal_dim_join",
    "l6_leakage_safe_split",
    "t16_stream_file_sink",
    "f16_sql_udf_suite",
    "l3_mmr_rerank",
    "ts9_rolling_wau",
    "u4_schema_drift_union",
    "s18_dynamic_partition_overwrite",
    "l5_scene_cuts",
    "l7_mixture_rebalance",
    "w6_value_streaks",
    "ts10_rolling_zscore",
    "cdc2_apply_changelog",
    "s19_corrupt_record_handling",
    "w7_ratio_to_report",
    "f17_try_suite",
    "l3_knn_filtered",
    "j14_asof_tolerance",
    "t17_stream_multibatch",
    "l6_target_encode",
    "u5_bag_set_ops",
    "l5_resize_pixels",
    "l4_bpe_train",
    "a17_sketch_rollup",
    "l3_pq_search",
    "a15_approx_percentiles",
    "l3_ivf_kmeans_search",
    "l4_bpe_encode",
    "a4_approx_count_distinct",
    "l6_importance_sampling",
    "a22_approx_topk",
    "dq4_observed_metrics",
    "f18_variant_explode",
    "j15_cogroup_merge",
    "p11_collation_group",
    "p12_parameterized_sql",
    "t18_stream_union_fanin",
    "l3_int8_quantize",
    "l4_feature_hash_embed",
    "l6_deterministic_shuffle",
    "f14_variant_suite",
    "cdc1_snapshot_diff",
    "ts6_linear_interpolation",
    "ts7_ohlc_bars",
    "l6_weighted_sample",
    "dq2_iqr_outliers",
    "s13_zorder_clustered_scan",
    "o5_pareto_frontier",
    "s14_orc_roundtrip",
    "l4_inverted_probe",
    "l4_ngram_lm",
    "l3_ivf_add",
    "a21_incremental_join",
    "ts1_batch_sessionize",
    "ts2_gap_fill_hourly",
    "ts3_funnel_steps",
    "ts4_cumulative_distinct_users",
)


def _reorder() -> None:
    unknown = [n for n in _PRIORITY if n not in REGISTRY]
    if unknown:
        raise ValueError(
            f"_PRIORITY names missing from registry (renamed query?): {unknown}"
        )
    ordered = {n: REGISTRY[n] for n in _PRIORITY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()
