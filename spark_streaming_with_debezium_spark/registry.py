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
    "spark_streaming_with_debezium_spark.operators.joins",
    "spark_streaming_with_debezium_spark.operators.windows",
    "spark_streaming_with_debezium_spark.operators.cdc_queries",
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
#: Round 1 proved the relational/join/TPC-H block; round 2 proved the
#: CDC/streaming/dedup/text/fn block. Round 3 leads with the 17 queries
#: NEVER driver-checked in either round (12 already have oracles), then
#: the freshly-fixed ``fn_casts`` and every query whose code or oracle
#: changed this round, then back-fills with the round-1 greens most
#: worth re-confirming (TPC-H headliners, the join family, windows).
#: Names not listed keep their module registration order after these.
_PRIORITY = (
    # --- never driver-checked (r1+r2 union gap), oracles first ---
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "fn_map_higher_order",
    "text_corpus_stats",
    "text_token_rarity",
    "window_dist_functions",
    # --- never driver-checked, declared rows-only ---
    "ann_brp_ml",
    "dedup_minhash_ml",
    "dedup_clusters_ml",  # new this round: unified ml-LSH cluster face
    "dedup_semdedup_cells",
    "multimodal_fake_decode",
    "sample_stratified",
    # --- changed/new this round: verify ---
    "fn_casts",  # r2 hash-fail — decimal exterior now stringified
    "cdc_history_per_key",  # oracle tie-break hardened (event_type)
    "ann_ivf_topk",  # nearest_cells tie-break restored to lowest cent_id
    "contamination_ngram_overlap",  # new: 5-gram decontamination check
    "text_bigram_predictability",  # new: bigram-LM quality score
    "sample_weights_by_source",  # new: temperature source rebalancing
    "events_funnel",  # new: ordered-funnel conversion analysis
    "events_retention_cohorts",  # new: weekly cohort retention matrix
    "text_similar_topk",  # new: exact shingle-jaccard retrieval baseline
    # --- round-1 greens re-confirmed: TPC-H headliners ---
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_volume",
    "q10_returned_items",
    "q12_shipmode_priority",
    "q14_promo_ratio",
    "q16_supplier_part_counts",
    "q18_large_orders",
    "q19_disjunctive_predicates",
    "q22_global_sales_opportunity",
    # --- round-1 greens re-confirmed: join family ---
    "join_inner_equi",
    "join_left_anti",
    "join_left_semi",
    "join_left_outer",
    "join_full_outer",
    "join_cross",
    "join_broadcast_dims",
    "join_range_band",
    "join_asof",
    # --- round-1 greens re-confirmed: windows + core relational ---
    "window_lww_compaction",
    "window_rank_topk_per_group",
    "window_dense_ntile",
    "filter_predicates",
    # --- 50-query prefix boundary (round-3 driver window) ---
    "agg_count_distinct",
    "agg_rollup",
    "agg_cube",
    "agg_filtered",
    "agg_stats",
    "sort_limit_topk",
    "set_ops",
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
