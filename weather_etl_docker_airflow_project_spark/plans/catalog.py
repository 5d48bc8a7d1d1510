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

from .registry import REGISTRY, all_oracles, all_queries  # noqa: F401,E402

_PRIORITY: tuple[str, ...] = (
    # -- entry() flagship must stay first
    "flagship",
    # -- reference-fidelity (the REF surface end-to-end)
    "ref_weather_transform",
    # -- LLM pipeline: dedup family
    "l1_exact_dedup",
    "l2_minhash_lsh_pairs",
    "l2_simhash_signatures",
    "l2_simhash_neardup_pairs",
    "l2_ngram_jaccard_pairs",
    "l2_embedding_neardup_pairs",
    "l2_neardup_pipeline",
    "l2_dedup_clusters",
    # -- LLM pipeline: similarity search
    "l3_knn_bruteforce",
    "l3_ann_lsh_bucketed",
    "l3_ann_lsh_multiprobe",
    "l3_ivf_search",
    "l3_ann_persisted_probe",
    # l3_ivf_kmeans_search is deliberately NOT prioritized: it is a
    # rows-only check (no SQL oracle for a learned quantizer) and its real
    # gate is the pytest recall floor — the window slot goes to a
    # hash-checked query instead
    # -- LLM pipeline: text analysis
    "l4_token_stats",
    "l4_term_stats",
    "l4_quality_score",
    "l4_lang_id",
    "l4_fingerprint",
    "l4_tfidf_top_terms",
    "l4_boilerplate_shingles",
    "l4_redact_pii",
    "l4_repetition_stats",
    "l4_gopher_rules",
    # -- LLM pipeline: multimodal + corpus ops
    "l5_multimodal_features",
    "l5_media_decode",
    "l5_frame_sample",
    "l6_train_val_test_split",
    "l6_stratified_sample",
    "l6_decontaminate_against_eval",
    "l6_sequence_packing",
    "l7_training_corpus_pipeline",
    # -- streaming
    "t5_tumbling_window_counts",
    "t5_sliding_window_counts",
    "t6_session_windows",
    "t7_stream_dedup_within_watermark",
    "t8_stateful_user_stats",
    "t9_stream_stream_join",
    "t2_weather_stream_upsert",
    # -- IO / DDL
    "s5_catalog_weather_roundtrip",
    "s7_csv_roundtrip",
    "s8_partitioned_scan",
    "p4_null_guard",
    # -- function suites never driver-checked (past round-1 cut)
    "f12_hash_suite",
    "f13_cast_suite",
    # -- oracles fixed this round; need a fresh hash verdict
    "a6_filtered_aggregate",
    "f5_datetime_suite",
    "f7_math_suite",
    "f9_json_suite",
    # a4_approx_count_distinct is rows-only (HLL sketch, no oracle); its
    # 5%-error contract is pytest-gated — not worth a window slot
    # -- round-1-proven relational canaries: ordered here but PAST the
    #    50-query cut; rotate them into the window in a future round
    "q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "j8_asof_error_after_click",
    "w1_top3_orders_per_segment",
    "a5_rollup_lineitem_status",
    "scd2_customer_segment",
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
