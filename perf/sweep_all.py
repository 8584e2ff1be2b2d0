"""Time EVERY registered query once (warm) at a given scale dir.

The headline/extended bench (bench.py) tracks a curated set with 3-run
medians; this sweep is the wide net — one warm run + one timed run per
query across the whole registry, to surface pathological outliers that
never made the curated set. Output: one JSON line with per-query
seconds, sorted slowest-first, plus the total.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python perf/sweep_all.py
Optionally time a subset:
    python perf/sweep_all.py dedup_minhash_lsh text_bm25_topk
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_streaming_with_debezium_spark.registry import load_all  # noqa: E402
from spark_streaming_with_debezium_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("sweep_all")
    spark.sparkContext.setLogLevel("ERROR")
    queries = load_all()
    names = sys.argv[1:] or list(queries)
    timings: dict[str, float] = {}
    for name in names:
        q = queries[name]
        try:
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # keep sweeping; report the failure
            timings[name] = -1.0
            print(f"ERROR {name}: {exc}", file=sys.stderr)
    ordered = dict(sorted(timings.items(), key=lambda kv: -kv[1]))
    print(
        json.dumps(
            {
                "metric": "all_queries_warm_wall",
                "total_sec": round(sum(v for v in timings.values() if v > 0), 3),
                "n_queries": len(timings),
                "queries": ordered,
                "sf_dir": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
