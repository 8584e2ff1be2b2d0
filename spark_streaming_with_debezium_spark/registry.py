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
#: Evidence ledger entering round 6: 160/172 round-5 queries carry at
#: least one driver row; the TWELVE never-checked are the round-5 late
#: additions queued at last round's boundary (round 5 added FOURTEEN
#: new queries, of which the RRF hybrid and Welch t-test made that
#: window and these twelve queued past it). Round 6 leads with those
#: twelve (closing the ledger at every-query-ever-checked; two of them
#: — the MG heavy-hitter, now tree-reduced, and the path trigrams,
#: NULL-path fix — also changed behavior this round), then the TWO new
#: round-6 queries (Debezium logical-type decoding; the time-travel
#: change feed, which also sits on this round's changes_between
#: presence-flag fix), then the round-5 behavior-changed block kept in
#: window so those rewrites don't go evidence-stale (per the r5
#: verdict), then the stalest r3/r4 names (last checked ≥ 2 rounds
#: ago) filling the window. Names checked in the r5 window queue past
#: the boundary — freshest evidence, lowest priority. Names not listed
#: keep module registration order after these. The round-6 NEW block
#: grew to TEN (graph_pagerank, dedup_exact_substring,
#: cdc_temporal_pit_join, events_concurrency_peak, text_bpe_merges,
#: events_anomaly_mad, cdc_scd2_incremental landed after the first
#: three), then to SEVENTEEN (graph_triangle_count,
#: events_forecast_ewma, dq_benford_first_digit, rag_chunk_documents,
#: events_changepoint_cusum, events_autocorrelation,
#: events_entropy_profile), displacing the fourteen newest-evidence
#: r4 names (distinct_rows, sort_limit_topk, agg_rollup, agg_stats,
#: agg_percentiles, agg_grouping_sets, agg_filtered, agg_cube,
#: agg_count_distinct, text_keywords_tfidf, multimodal_frame_sample,
#: events_cumulative_users, dedup_edit_distance,
#: embedding_label_cohesion — all green r4) past the boundary so
#: every never-checked query sits inside the 50-query window.
_PRIORITY = (
    # --- never driver-checked (round-5 late additions) ---
    "agg_skew_kurtosis_exact",
    "sample_hash_topk_per_group",
    "text_boilerplate_ngrams",
    "dq_profile_orders",
    "text_heavy_hitter_tokens",  # also behavior-changed: MG tree-reduce
    "events_path_trigrams",  # also behavior-changed: NULL event_type filter
    "multimodal_resize",
    "dq_referential_integrity",
    "orders_spend_drawdown",
    "supplier_fulfillment_sla",
    "events_hourly_seasonality",
    "customer_order_degree_distribution",
    # --- NEW round-6 queries ---
    "cdc_logical_types",
    "cdc_change_feed",  # also rides the changes_between presence-flag fix
    "cdc_incremental_agg",  # materialized-view maintenance under the hash
    "graph_pagerank",  # iterative-loop pattern under the full hash gate
    "dedup_exact_substring",  # Lee-et-al span-level dedup, fully oracled
    "cdc_temporal_pit_join",  # SCD2 point-in-time feature lookup
    "events_concurrency_peak",  # sweep-line intervals on bucketed sums
    "text_bpe_merges",  # distributed BPE vocab induction, fully oracled
    "events_anomaly_mad",  # robust median/MAD outlier fence
    "cdc_scd2_incremental",  # incremental type-2 fold vs batch recompute
    "graph_triangle_count",  # degree-oriented exact triangle census
    "events_forecast_ewma",  # fixed-horizon EWMA backtest forecast
    "dq_benford_first_digit",  # forensic leading-digit audit
    "rag_chunk_documents",  # overlapping retrieval chunks, stable ids
    "events_changepoint_cusum",  # integer-exact CUSUM level-shift argmax
    "events_autocorrelation",  # lag-1..7 ACF, integer sufficient stats
    "events_entropy_profile",  # daily traffic-mix entropy + evenness
    # --- round-5 behavior-changed block (keep evidence fresh) ---
    "orders_rfm_segments",
    "pack_sequences",
    "corpus_curation_funnel",
    "timeseries_user_similarity",
    "curriculum_quality_tiers",
    # --- stalest r3/r4 evidence (not in the r5 window) ---
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
    # --- 50-query prefix boundary (round-6 driver window) ---
    "sql_correlated_exists",
    "sql_in_subquery",
    "sql_scalar_subquery",
    "cdc_current_state",
    "cdc_envelope_roundtrip",
    "cdc_state_rollup",
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
    "sketch_hll_distinct_docs",  # rows-only (sketch has no DuckDB dual)
    "sketch_hll_rolling_users",  # rows-only
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
