"""Skewed-graph scale curve for pagerank_fixed (VERDICT r7 item 9).

Synthesizes a directed graph with a power-law-style HUB: 10% of all
edges point at node 0 (the worst shuffle key for the per-iteration
contribution aggregate), the rest connect hash-uniform endpoints.
Times 3-iteration PageRank at ×1 and ×5 edges and prints the ratio.

Why the design should already absorb this skew, which the curve
verifies empirically:
- the contribution aggregate groupBy(dst) does MAP-SIDE partial
  aggregation, so every task emits ONE partial row per distinct dst it
  holds — the hub's 10% of edges collapse to O(tasks) partials before
  the shuffle, never a single 10%-of-|E| reducer;
- the rank join keys on src with the rank vector BROADCAST (≤5M
  nodes), so hub out-degree never shuffles the edge side at all.

Run: python perf/pagerank_skew_curve.py [base_edges]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spark_streaming_with_debezium_spark.operators.graph import (  # noqa: E402
    pagerank_fixed,
)
from spark_streaming_with_debezium_spark.session import get_spark  # noqa: E402


def hub_graph(spark, n_edges: int, n_nodes: int):
    """10% of edges target the hub (node 0); endpoints otherwise
    hash-uniform. Deterministic (xxhash64 of the edge id)."""
    return spark.range(n_edges).select(
        (F.abs(F.xxhash64(F.col("id"))) % n_nodes).alias("src"),
        F.when(F.col("id") % 10 == 0, F.lit(0))
        .otherwise(F.abs(F.xxhash64(F.col("id") + 1_000_000_000)) % n_nodes)
        .alias("dst"),
    )


def timed(spark, n_edges: int, n_nodes: int) -> float:
    edges = hub_graph(spark, n_edges, n_nodes)
    t0 = time.perf_counter()
    pagerank_fixed(edges).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("pagerank-skew")
    spark.sparkContext.setLogLevel("ERROR")
    n_nodes = base // 10
    timed(spark, base // 10, max(n_nodes // 10, 10))  # warm
    t1 = min(timed(spark, base, n_nodes) for _ in range(2))
    t5 = min(timed(spark, 5 * base, n_nodes) for _ in range(2))
    print(
        json.dumps(
            {
                "metric": "pagerank_skew_curve",
                "hub_edge_share": 0.1,
                "base_edges": base,
                "n_nodes": n_nodes,
                "x1_sec": round(t1, 2),
                "x5_sec": round(t5, 2),
                "ratio": round(t5 / t1, 2),
                "ideal_ratio": 5.0,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
