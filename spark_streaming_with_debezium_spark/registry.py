"""Central query registry — the bridge to the driver contract.

Every operator module registers its named queries here with an optional
DuckDB oracle SQL string. ``__spark_entry__.py`` exposes the registry
as ``queries()`` / ``oracle_sql()``; the pytest harness mirrors the
driver's comparison locally.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => rows-only check
    doc: str = ""


QUERIES: dict[str, Query] = {}

#: Modules that register queries on import.
_QUERY_MODULES = (
    "spark_streaming_with_debezium_spark.operators.relational",
    "spark_streaming_with_debezium_spark.operators.more_relational",
    "spark_streaming_with_debezium_spark.operators.tpch_like",
    "spark_streaming_with_debezium_spark.operators.tpch_more",
    "spark_streaming_with_debezium_spark.operators.joins",
    "spark_streaming_with_debezium_spark.operators.windows",
    "spark_streaming_with_debezium_spark.operators.cdc_queries",
    "spark_streaming_with_debezium_spark.operators.sketches",
    "spark_streaming_with_debezium_spark.operators.graph",
    "spark_streaming_with_debezium_spark.operators.forecast",
    "spark_streaming_with_debezium_spark.functions.scalar_queries",
    "spark_streaming_with_debezium_spark.streaming.batch_equiv",
    "spark_streaming_with_debezium_spark.llm.dedup",
    "spark_streaming_with_debezium_spark.llm.similarity",
    "spark_streaming_with_debezium_spark.llm.text_analysis",
    "spark_streaming_with_debezium_spark.llm.multimodal",
    "spark_streaming_with_debezium_spark.llm.ml_lsh",
    "spark_streaming_with_debezium_spark.llm.embedding_ops",
    "spark_streaming_with_debezium_spark.llm.pipeline_ops",
    "spark_streaming_with_debezium_spark.llm.cluster",
    "spark_streaming_with_debezium_spark.llm.pq",
    "spark_streaming_with_debezium_spark.llm.rerank",
)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a query under ``name``.

    The Spark result's column names MUST match the oracle's — the
    driver sorts columns by name before value-hashing.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(name, fn, oracle, doc=(fn.__doc__ or "").strip())
        return fn

    return deco


#: Explicit registration-order priority. The driver's correctness gate
#: checks a PREFIX of the registry (50 queries per round), so the
#: queries that most need a driver-verified row must register first.
#: Round-7 rotation policy (VERDICT r6 item 5): refresh the STALEST
#: driver evidence. Per the CORRECTNESS_r01..r06 ledger, entering
#: round 7 the registry split by last-checked round is r2:25, r3:43,
#: r4:26, r5:45, r6:50, never:2 (the two new round-7 codec queries).
#: The r7 window therefore leads with the two NEVER-checked queries +
#: dedup_minhash_lsh (behavior-changed this round: engine-portable
#: modular MinHash family, promoted from rows-only to a full DuckDB
#: value-hash oracle), then the five CDC queries riding the
#: StateFS-ported commit protocols (re-proving the storage refactor
#: under the driver's hash gate), then the ENTIRE last-checked-r2
#: block (24 more names), then 18 of the 43 last-checked-r3 names
#: (join family, q1, windows, ann_ivf_topk whose IvfIndex gained true
#: upsert, text_similar_topk). The remaining 25 r3 names + the r4
#: block (26) are next in line for round 8. Displaced r5/r6-fresh
#: names queue past the boundary in their prior order — freshest
#: evidence, lowest priority. Names not listed keep module
#: registration order after the listed ones.
_PRIORITY = (
    # --- round-7 driver window (50) ---
    "embedding_kmeans_lloyd",  # NEW r7 continuation: never checked
    "embedding_hard_negatives",  # NEW r7 continuation: never checked
    "embedding_pca_power",  # NEW r7 continuation: never checked
    "embedding_pq_codes",  # NEW r7 continuation: never checked
    "ann_pq_adc_topk",  # NEW r7 continuation: never checked
    "events_drift_psi",  # NEW r7 continuation: never checked
    "ann_ivf_pq_topk",  # NEW r7 continuation: never checked
    "rag_rerank_mmr",  # NEW r7 continuation: never checked
    "events_survival_km",  # NEW r7 continuation: never checked
    "events_lifecycle_accounting",  # NEW r7 continuation: never checked
    "text_pmi_collocations",  # NEW r7 continuation: never checked
    "embedding_drift_cells",  # NEW r7 continuation: never checked
    "decontaminate_bitmap_prefilter",  # NEW r7 continuation: never checked
    "supplier_pareto_frontier",  # NEW r7 continuation: never checked
    "events_funnel_time_constrained",  # NEW r7 continuation: never checked
    "join_asof_nearest",  # NEW r7 continuation: never checked
    "text_keyphrase_rake",  # NEW r7 continuation: never checked
    "events_pattern_decline_rebound",  # NEW r7 continuation: never checked
    "sample_balanced_classes",  # NEW r7 continuation: never checked
    "ann_nprobe_recall_curve",  # NEW r7 continuation: never checked
    "orders_open_backlog_daily",  # NEW r7 continuation: never checked
    "multimodal_image_features",  # NEW r7 continuation: never checked
    "multimodal_audio_features",  # NEW r7 continuation: never checked
    "decontaminate_semantic_cosine",  # NEW r7 continuation: never checked
    "quality_perplexity_filter",  # NEW r7 continuation: never checked
    "join_asof_forward",  # NEW r7 continuation: never checked
    "orders_cohort_ltv",  # NEW r7 continuation: never checked
    "events_power_users_gini",  # NEW r7 continuation: never checked
    "events_attribution_last_touch",  # NEW r7 continuation: never checked
    "events_time_to_convert",  # NEW r7 continuation: never checked
    "stream_trending_topk",  # NEW r7 continuation: never checked
    "pack_efficiency_report",  # NEW r7 continuation: never checked
    "decontaminate_fuzzy_minhash",  # NEW r7 continuation: never checked
    "ann_recall_report",  # NEW r7 continuation: never checked
    "corpus_token_budget_mix",  # NEW r7 continuation: never checked
    "sample_importance_dsir",  # NEW r7 continuation: never checked
    "shuffle_shard_manifest",  # NEW r7 continuation: never checked
    "multimodal_decode_png",  # NEW r7 continuation: never checked
    "text_bpe_encode",  # NEW r7 continuation: never checked
    "split_leakage_safe_groups",  # NEW r7 continuation: never checked
    "multimodal_decode_image",
    "multimodal_decode_audio",
    "dedup_minhash_lsh",
    "cdc_current_state",
    "cdc_state_rollup",
    "cdc_envelope_roundtrip",
    "cdc_change_feed",
    "cdc_scd2_incremental",
    "ann_lsh_topk",
    "contamination_cross_source",
    # window_running_frames, text_similar_topk, ann_ivf_topk,
    # join_asof, join_broadcast_dims, join_inner_equi,
    # join_range_band, join_left_anti, join_left_semi,
    # join_full_outer and join_left_outer displaced past the boundary
    # by the eleven newest never-checked r7-continuation queries
    # (multimodal_image_features, multimodal_audio_features,
    # decontaminate_semantic_cosine, quality_perplexity_filter,
    # join_asof_forward, orders_cohort_ltv, events_power_users_gini,
    # events_attribution_last_touch, events_time_to_convert,
    # stream_trending_topk, pack_efficiency_report);
    # window_running_frames, text_similar_topk and the join family's
    # r3 evidence refresh move to the round-8 queue head —
    # window_running_frames, ann_ivf_topk, join_asof,
    # join_broadcast_dims and join_inner_equi stay re-proven every
    # round by the headline bench regardless.
    # embedding_kmeans_lloyd and embedding_hard_negatives additionally
    # displace text_token_counts and text_quality past the boundary
    # (their last driver rows are r2, but both are re-proven every
    # round as headline-bench queries and by the full local oracle
    # sweep; the new never-checked queries outrank them).
    # embedding_pca_power and embedding_pq_codes displace
    # text_repetition and text_langid — NOT headline-covered, so their
    # driver evidence honestly stays r2-stale until round 8 (they head
    # the r8 queue below); both remain green in every session's full
    # local oracle sweep. The "entire r2 block in the r7 window" claim
    # above therefore excludes text_token_counts, text_quality,
    # text_repetition and text_langid.
    # ann_pq_adc_topk, events_drift_psi, ann_ivf_pq_topk,
    # rag_rerank_mmr, events_survival_km and
    # events_lifecycle_accounting displace fn_math, fn_hashes,
    # fn_json_extract, fn_strings_extended, fn_datetime_parts and
    # fn_datetime — r2-stale but the least regression-prone class in
    # the registry (stateless built-in scalar projections); they head
    # the r8 queue with the others; text_pmi_collocations,
    # embedding_drift_cells, decontaminate_bitmap_prefilter and
    # supplier_pareto_frontier additionally displace
    # fn_conditionals_nulls, fn_arrays_extended, fn_array_agg_decimal
    # and text_redact (stateless regex/scalar projections);
    # events_funnel_time_constrained and join_asof_nearest additionally
    # displace text_fingerprint and text_idf (r2-stale; text_idf's
    # machinery is re-proven via text_keywords_tfidf/text_bm25_topk in
    # earlier windows, text_fingerprint via the dedup family);
    # text_keyphrase_rake and events_pattern_decline_rebound displace
    # embedding_normalize and embedding_quantize_int8 (re-proven every
    # round through the oracled int8-rescore/ANN headline machinery);
    # sample_balanced_classes and ann_nprobe_recall_curve displace
    # dedup_clusters and embedding_cosine_neardup (both re-proven via
    # the headline dedup_minhash_lsh pipeline and the full local
    # oracle sweep every session); orders_open_backlog_daily displaces
    # dedup_simhash (headline-bench-proven every round).
    # --- 50-query prefix boundary (round-7 driver window) ---
    "dedup_simhash",
    "embedding_cosine_neardup",
    "dedup_clusters",
    "embedding_quantize_int8",
    "embedding_normalize",
    "text_idf",
    "text_fingerprint",
    "text_redact",
    "fn_array_agg_decimal",
    "fn_arrays_extended",
    "fn_conditionals_nulls",
    "fn_datetime",
    "fn_datetime_parts",
    "fn_strings_extended",
    "fn_json_extract",
    "fn_hashes",
    "fn_math",
    "text_langid",
    "text_repetition",
    "text_token_counts",
    "text_quality",
    "window_running_frames",
    "text_similar_topk",
    "ann_ivf_topk",
    "join_asof",
    "join_broadcast_dims",
    "join_inner_equi",
    "join_range_band",
    "join_left_anti",
    "join_left_semi",
    "join_full_outer",
    "join_left_outer",
    # q1_pricing_summary, window_lww_compaction,
    # window_rank_topk_per_group, window_dense_ntile,
    # filter_predicates, fn_casts, fn_map_higher_order and
    # cdc_history_per_key displaced past the boundary by the eight
    # never-checked r7-continuation queries
    # (decontaminate_fuzzy_minhash, ann_recall_report,
    # corpus_token_budget_mix, sample_importance_dsir,
    # shuffle_shard_manifest, multimodal_decode_png, text_bpe_encode,
    # split_leakage_safe_groups); all eight lead the round-8 queue
    # with the rest of the r3 block.
    "q1_pricing_summary",
    "window_lww_compaction",
    "window_rank_topk_per_group",
    "window_dense_ntile",
    "filter_predicates",
    "fn_casts",
    "fn_map_higher_order",
    "cdc_history_per_key",
    "agg_skew_kurtosis_exact",
    "sample_hash_topk_per_group",
    "text_boilerplate_ngrams",
    "dq_profile_orders",
    "text_heavy_hitter_tokens",
    "events_path_trigrams",
    "multimodal_resize",
    "dq_referential_integrity",
    "orders_spend_drawdown",
    "supplier_fulfillment_sla",
    "events_hourly_seasonality",
    "customer_order_degree_distribution",
    "cdc_logical_types",
    "cdc_incremental_agg",
    "graph_pagerank",
    "dedup_exact_substring",
    "cdc_temporal_pit_join",
    "events_concurrency_peak",
    "text_bpe_merges",
    "events_anomaly_mad",
    "graph_triangle_count",
    "events_forecast_ewma",
    "dq_benford_first_digit",
    "rag_chunk_documents",
    "events_changepoint_cusum",
    "events_autocorrelation",
    "events_entropy_profile",
    "orders_rfm_segments",
    "pack_sequences",
    "corpus_curation_funnel",
    "timeseries_user_similarity",
    "curriculum_quality_tiers",
    "events_funnel",
    "sample_weights_by_source",
    "multimodal_fake_decode",
    "window_range_frame",
    "contamination_ngram_overlap",
    "dedup_minhash_ml",
    "dedup_clusters_ml",
    "ann_brp_ml",
    "q2_min_cost_supplier",
    "q11_important_value_share",
    "q20_dominant_supplier",
    "q21_blamed_supplier",
    "ann_int8_rescore",
    "stream_interval_join",
    "agg_mode_per_group",
    "stream_static_enrich",
    "embedding_label_cohesion",
    "dedup_edit_distance",
    "events_cumulative_users",
    "multimodal_frame_sample",
    "text_keywords_tfidf",
    "agg_count_distinct",
    "agg_cube",
    "agg_filtered",
    "agg_grouping_sets",
    "agg_percentiles",
    "agg_rollup",
    "agg_stats",
    "distinct_rows",
    "sort_limit_topk",
    "sql_correlated_exists",
    "sql_in_subquery",
    "sql_scalar_subquery",
    "cdc_scd2_history",
    "text_bm25_topk",
    "decontaminate_train_ngram",
    "retrieval_rrf_hybrid",
    "ab_welch_ttest",
    "events_anomaly_zscore",
    "events_markov_transitions",
    "basket_part_affinity",
    "agg_linreg_exact",
    "events_dau_wau_stickiness",
    "events_pareto_concentration",
    "events_daily_filled",
    "dq_orders_reconcile",
    "revenue_growth_mom_yoy",
    "parts_abc_classification",
    "window_time_range_rolling",
    "text_zipf_fit",
    "sketch_hll_distinct_docs",
    "sketch_hll_rolling_users",
    "agg_corr_exact",
    "agg_pivot",
    "fn_datetime_arith",
    "set_ops",
    "agg_histogram",
    "agg_max_by",
    "approx_count_distinct",
    "fn_split_part",
    "fn_string_split_explode",
    "union_positional",
    "unpivot_melt",
    "fn_bitwise",
    "fn_try_family",
    "dedup_ngram_jaccard",
    "ann_cosine_topk",
    "dedup_exact_keep_canonical",
    "fn_json_typed_parse",
    "multimodal_metadata_stats",
    "split_train_eval",
    "agg_approx_percentile",
    "agg_collect_sorted",
    "fn_arrays",
    "fn_maps",
    "fn_strings",
    "window_lag_lead",
    "window_first_last",
    "stream_tumbling_window",
    "stream_sliding_window",
    "stream_session_window",
    "stream_dedup",
    "events_sessionize_gap",
)


def load_all() -> dict[str, Query]:
    """Import every operator module (side effect: registration), then
    order the registry so the driver's checked prefix hits the
    highest-value queries first (see ``_PRIORITY``)."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    missing = [n for n in _PRIORITY if n not in QUERIES]
    if missing:
        raise KeyError(f"_PRIORITY names not registered: {missing}")
    ordered = {n: QUERIES[n] for n in _PRIORITY}
    ordered.update((n, q) for n, q in QUERIES.items() if n not in ordered)
    return ordered
