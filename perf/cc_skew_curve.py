"""Connected-components skew curve (VERDICT r8 item 6).

The ×5 replicated-data curves for the CC family (1.41 / 1.34 in r8)
replicate DISJOINT subgraphs — they never stress the case that breaks
label propagation at scale: one giant component whose hub label is the
min for half the graph, concentrating every round's aggregation on a
single key. This harness builds that graph directly:

- hub component: a star — node 0 ↔ nodes 1..N/2 (50% of all nodes, one
  component, max-degree node 0),
- tail: the other 50% of nodes paired into 2-node components
  (N/4 disjoint edges), so component COUNT stays high.

and times ``cc_fixed`` at ×1, ×5 and ×25 total size. The skew question
is concrete: the per-round ``groupBy(dst).min(lab)`` receives N/2
contributions for dst=0 — does partial (map-side) aggregation absorb
the hot key, and does the broadcast-labels join avoid a skewed shuffle
join? Pass criteria (VERDICT): t(×5) / (5·t(×1)) ≤ 1.5 and
t(×25) / (25·t(×1)) ≤ 3 — if the curve bends, the fix is salting the
hot dst or a two-phase label exchange.

Why this SHOULD hold by design (then we measure): ``min`` is algebraic,
so every map partition pre-aggregates its own contributions to dst=0
into ONE row — the reducer for the hub key sees ≤ n_partitions rows,
not N/2; and with ≤ 5M nodes the label vector broadcasts, so the
edges×labels join never shuffles the (skewed) edge side at all.

Usage:
    python perf/cc_skew_curve.py              # base N = 150_000
    SPARK_GRAFT_CC_BASE_N=60000 python perf/cc_skew_curve.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spark_streaming_with_debezium_spark.operators.graph import (  # noqa: E402
    CC_ITERS,
    cc_fixed,
)
from spark_streaming_with_debezium_spark.session import get_spark  # noqa: E402


def hub_graph(spark, n_nodes: int):
    """(src, dst) edges: star component over nodes [0, n/2] (50% of
    nodes incl. the hub) + 2-node components over the rest."""
    half = n_nodes // 2
    # star component = nodes 0..half-1 (size half, hub node 0)
    star = spark.range(1, half).select(
        F.lit(0).cast("long").alias("src"), F.col("id").alias("dst")
    )
    # pair components (half+2k, half+2k+1) over the other half
    pairs = spark.range(0, (n_nodes - half) // 2).select(
        (F.lit(half) + F.col("id") * 2).alias("src"),
        (F.lit(half) + F.col("id") * 2 + 1).alias("dst"),
    )
    return star.unionByName(pairs)


def run_point(spark, n_nodes: int, runs: int = 3) -> tuple[float, dict]:
    edges = hub_graph(spark, n_nodes)
    # warm + correctness probe: the hub component must come out as ONE
    # label (0) holding half the nodes +1, every pair component size 2
    labs = cc_fixed(edges, CC_ITERS)
    sizes = (
        labs.groupBy("lab").count().orderBy(F.col("count").desc()).limit(2).collect()
    )
    check = {
        "giant_label": int(sizes[0]["lab"]),
        "giant_size": int(sizes[0]["count"]),
        "second_size": int(sizes[1]["count"]) if len(sizes) > 1 else 0,
    }
    assert check["giant_label"] == 0 and check["giant_size"] == n_nodes // 2, check
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        cc_fixed(edges, CC_ITERS).write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return round(ts[len(ts) // 2], 3), check


def main() -> None:
    base = int(os.environ.get("SPARK_GRAFT_CC_BASE_N", "150000"))
    spark = get_spark("cc_skew_curve")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"base_n": base, "points": {}}
    t1 = None
    for mult in (1, 5, 25):
        t, check = run_point(spark, base * mult)
        out["points"][f"x{mult}"] = {"sec": t, **check}
        if mult == 1:
            t1 = t
        else:
            out["points"][f"x{mult}"]["ratio_vs_linear"] = round(t / (mult * t1), 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
