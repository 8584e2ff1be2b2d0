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
#: checks a PREFIX of the registry (50 queries in round 1), so the
#: queries that most need a driver-verified row must register first:
#: round 1 proved the relational/join/TPC-H block green, so round 2
#: leads with the CDC kernel, streaming, the LLM-pipeline set, the
#: remaining window/function families, and the three queries whose
#: array outputs crashed the round-1 canonicalizer (now scalarized).
#: Names not listed keep their module registration order after these.
_PRIORITY = (
    # CDC kernel — the product's core (reference StreamingJobExecutor)
    "cdc_current_state",
    "cdc_state_rollup",
    "cdc_envelope_roundtrip",
    "cdc_history_per_key",
    # streaming batch-equivalents (T5-T8)
    "stream_tumbling_window",
    "stream_sliding_window",
    "stream_session_window",
    "stream_dedup",
    # dedup tier (LLM pipeline)
    "dedup_exact_groups",
    "dedup_exact_keep_canonical",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    # similarity / embeddings
    "ann_cosine_topk",
    "embedding_cosine_neardup",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_normalize",
    "embedding_quantize_int8",
    "text_idf",
    # text analysis
    "text_token_counts",
    "text_quality",
    "text_langid",
    "text_fingerprint",
    "text_redact",
    "text_repetition",
    # multimodal + dataset bookkeeping
    "multimodal_metadata_stats",
    "split_train_eval",
    "contamination_cross_source",
    # window family completion (W3-W5)
    "window_lag_lead",
    "window_running_frames",
    "window_first_last",
    "window_range_frame",
    # round-1 canonicalizer crashes, now scalar-only outputs
    "agg_collect_sorted",
    "agg_approx_percentile",
    # scalar-function families (F1-F10)
    "fn_json_extract",
    "fn_json_typed_parse",
    "fn_strings",
    "fn_strings_extended",
    "fn_conditionals_nulls",
    "fn_datetime",
    "fn_datetime_parts",
    "fn_math",
    "fn_arrays",
    "fn_array_agg_decimal",
    "fn_arrays_extended",
    "fn_maps",
    "fn_casts",
    "fn_hashes",
    # --- 50-query prefix boundary (round-1 driver window) ---
    # never-driver-checked stragglers next, ahead of the round-1 greens
    "fn_map_higher_order",
    "window_dist_functions",
    "text_corpus_stats",
    "multimodal_fake_decode",
    "dedup_minhash_ml",
    "ann_brp_ml",
    "sample_stratified",
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
