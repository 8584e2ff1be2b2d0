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


def load_all() -> dict[str, Query]:
    """Import every operator module (side effect: registration)."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return QUERIES
