"""Import side-effect module: pulls in every plan module so the registry is
fully populated, then re-exports the driver-contract accessors.

The registry is re-ordered after import: the round driver oracle-checks the
FIRST 50 registered queries only (round-1 lesson — everything past the cut
got no hard-signal correctness row). ``_PRIORITY`` therefore front-loads
(a) the flagship (``entry()`` smoke depends on it being runnable), (b) the
reference-fidelity pipeline, (c) the entire LLM-pipeline surface, streaming,
and IO queries, (d) queries whose oracles changed this round and need a
fresh verdict. The first 50 priority entries fill the window exactly;
entries after position 50 (the round-1-proven relational canaries) are
ordered ahead of the unlisted remainder but sit PAST the driver's cut —
they are next-round rotation candidates, not checked this round.
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

from .registry import REGISTRY, all_oracles, all_queries  # noqa: F401,E402

_PRIORITY: tuple[str, ...] = (
    # ================= ROUND-3 WINDOW (first 50) =================
    # The r2 verdict's top instruction: the 44 relational/function queries
    # whose only hard-signal row is from round 1 rotate back INTO the
    # window; the twice-proven LLM/streaming/IO block rotates OUT, keeping
    # one canary per family whose code or oracle CHANGED this round (those
    # need a fresh verdict anyway — double duty for the slots).
    # -- entry() flagship must stay first
    "flagship",
    # -- changed/new this round: fresh hash verdict required
    "l5_pixel_features",           # NEW: real PNG pixel decode end-to-end
    "l2_ngram_jaccard_pairs",      # semantics changed: hot-shingle DF cap
    "l2_dedup_clusters",           # impl changed: large-star/small-star CC
    "l2_embedding_neardup_pairs",  # banding changed: 8x4 -> recall>=0.9 cfg
    "l4_token_stats",              # oracle changed: _TOKS empty-token twin
    # -- rotated: TPC-H-ish headline queries
    "q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q10_returned_items",
    "scd2_customer_segment",
    # -- rotated: join family
    "j1_inner_segment_revenue",
    "j2_left_outer_order_counts",
    "j3_broadcast_nation_rollcall",
    "j4_semi_customers_with_open_orders",
    "j5_anti_customers_without_big_orders",
    "j6_theta_nation_pairs",
    "j7_range_value_buckets",
    "j8_asof_error_after_click",
    "j9_cross_region_segment_grid",
    # -- rotated: aggregation family
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
    # -- rotated: window / order / set / predicate families
    "w1_top3_orders_per_segment",
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
    # -- rotated: function suites
    "f5_datetime_suite",
    "f6_string_suite",
    "f7_math_suite",
    "f8_conditional_suite",
    # -- new this round: the r2-verdict items 4/6/8 define done as a
    #    hash-green DRIVER row, so they take the slots freed by dropping
    #    one sibling each from the a5/j2/j7/w3 families (each family keeps
    #    another in-window representative, so no §2 row loses fresh
    #    coverage).
    "l3_knn_multiquery",
    "l3_ann_lsh_multiquery",
    "l6_sequence_packing_firstfit",
    "a13_salted_skew_agg",
    # a4_approx_count_distinct and l3_ivf_kmeans_search stay out of the
    # window in every round: both are rows-only by design (HLL sketch /
    # learned quantizer have no SQL oracle) — their real gates are pytest
    # error/recall contracts, so a window slot adds no signal.
    # ================= PAST THE CUT (positions 51+) ================
    # r4 rotation candidates first: queries added in round 3 (fresh, never
    # driver-checked), then the remaining function suites, then the
    # twice-proven LLM/streaming/IO block as future canary stock.
    "l5_gif_pixel_features",
    "l5_audio_features",
    "ts1_batch_sessionize",
    "ts2_gap_fill_hourly",
    "a14_stats_suite",
    "l6_oversample_mix",
    "l4_bpe_pretokens",
    "t10_stream_static_enrich",
    "s10_clustered_compact_scan",
    "ts3_funnel_steps",
    "j10_fuzzy_blocked_join",
    "tpch_q4_order_priority",
    "tpch_q14_promo_revenue",
    "tpch_q18_large_orders",
    "l5_jpeg_pixel_features",
    "l5_mixed_pixel_features",
    "ts4_cumulative_distinct_users",
    "ts5_weekly_retention_cohorts",
    "a16_incremental_rollup",
    "s12_bucketed_colocated_join",
    "w5_distribution_windows",
    "l3_ivf_persisted_probe",
    "j11_salted_skew_join",
    "dq1_orders_quality",
    "t11_stream_outer_join",
    "s11_schema_evolution_scan",
    # a15 stays out of the window in every round (rows-only, like a4)
    "tpch_q5_local_supplier_volume",
    "a5_cube_order_grid",
    "j2_full_outer_nation_presence",
    "j7_bucketed_interval_join",
    "w3_range_frame_hourly_load",
    "f9_json_suite",
    "f10_array_suite",
    "f11_map_suite",
    "f12_hash_suite",
    "f13_cast_suite",
    "ref_weather_transform",
    "l1_exact_dedup",
    "l2_minhash_lsh_pairs",
    "l2_simhash_signatures",
    "l2_simhash_neardup_pairs",
    "l2_neardup_pipeline",
    "l3_knn_bruteforce",
    "l3_ann_lsh_bucketed",
    "l3_ann_lsh_multiprobe",
    "l3_ivf_search",
    "l3_ann_persisted_probe",
    "l4_term_stats",
    "l4_quality_score",
    "l4_lang_id",
    "l4_fingerprint",
    "l4_tfidf_top_terms",
    "l4_boilerplate_shingles",
    "l4_redact_pii",
    "l4_repetition_stats",
    "l4_gopher_rules",
    "l5_multimodal_features",
    "l5_media_decode",
    "l5_frame_sample",
    "l6_train_val_test_split",
    "l6_stratified_sample",
    "l6_decontaminate_against_eval",
    "l6_sequence_packing",
    "l7_training_corpus_pipeline",
    "t5_tumbling_window_counts",
    "t5_sliding_window_counts",
    "t6_session_windows",
    "t7_stream_dedup_within_watermark",
    "t8_stateful_user_stats",
    "t9_stream_stream_join",
    "t2_weather_stream_upsert",
    "s5_catalog_weather_roundtrip",
    "s7_csv_roundtrip",
    "s8_partitioned_scan",
    "p4_null_guard",
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
