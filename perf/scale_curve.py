"""Scaling-curve harness: does each flagship operator scale ~linearly?

The per-round bench (bench.py) measures one scale point (sf0.1). This
harness REPLICATES that data N× into a scratch dir — keys offset per
replica so referential integrity holds and per-replica structure is
disjoint — and times a representative operator set at ×1 vs ×N. The
ratio against the ideal N× answers the question the small-SF bench
cannot: is there a hidden fixed bottleneck (driver collect, single
reducer) that goes superlinear, or fixed overhead that amortizes?

Replication rules:
- Fact/dim keys get per-replica offsets (orderkey, custkey, partkey,
  suppkey, doc_id, event_id, user_id, vec_id), so joins stay valid and
  per-replica subgraphs are disjoint (graph/dedup outputs scale ~N).
- `documents.text` goes through a PER-REPLICA CHARACTER BIJECTION
  (vowel rotation via translate): within a replica every pairwise
  relation (jaccard, shingles, edit distance) is EXACTLY preserved —
  a bijection on characters is a bijection on words and shingles —
  while cross-replica twins of the same doc differ in ~40 % of
  characters, so near-dup pair counts scale ~N, not N².
- Embeddings replicate as-is with offset ids: ANN corpora grow N×,
  the query set (vec_id < N_QUERIES) stays fixed — the serving shape.

Usage:
    python perf/scale_curve.py            # N=5, default query set
    SPARK_GRAFT_SCALE_N=3 python perf/scale_curve.py q1_pricing_summary
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spark_streaming_with_debezium_spark.registry import load_all  # noqa: E402
from spark_streaming_with_debezium_spark.session import get_spark  # noqa: E402
from spark_streaming_with_debezium_spark.sources.tables import load_table  # noqa: E402

#: Key-offset constants comfortably above any real key at sf≤1.
_OFFSETS = {
    "o_orderkey": 100_000_000,
    "l_orderkey": 100_000_000,
    "o_custkey": 10_000_000,
    "c_custkey": 10_000_000,
    "l_partkey": 10_000_000,
    "p_partkey": 10_000_000,
    "l_suppkey": 1_000_000,
    "s_suppkey": 1_000_000,
    "doc_id": 10_000_000,
    "event_id": 100_000_000,
    "user_id": 10_000_000,
    "vec_id": 10_000_000,
}

#: Vowel bijections: replica i applies translate(text, 'aeiou', _rot(i)).
#: Any permutation of the vowels is a character bijection (within-
#: replica pairwise relations exactly preserved); itertools order is
#: deterministic and starts at the identity, giving 120 distinct
#: replicas — enough for ×25 and beyond (the original 8-entry literal
#: tuple made N>8 an IndexError). i >= 120 is a hard error (ADVICE
#: r10): wrapping with % 120 would silently reuse an earlier bijection
#: (replica 120 = identity), producing exact cross-replica duplicate
#: texts that corrupt dedup-face scale measurements.
def _rot(i: int) -> str:
    from itertools import islice, permutations

    if i >= 120:
        raise ValueError(
            f"replica {i}: only 120 distinct vowel bijections exist; "
            "extend the bijection alphabet before scaling past x120"
        )
    return "".join(next(islice(permutations("aeiou"), i, None)))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_QUERIES = (
    "q1_pricing_summary",        # scan + hash agg
    "join_inner_equi",           # fact-fact shuffle join
    "q18_large_orders",          # join + agg + having
    "dedup_exact_groups",        # hash-groupBy dedup
    "dedup_minhash_lsh",         # banded LSH near-dup
    "text_heavy_hitter_tokens",  # MG sketch + recount
    "text_bm25_topk",            # inverted retrieval
    "ann_cosine_topk",           # fixed queries, growing corpus
    "events_sessionize_gap",     # sessionization window
    "cdc_scd2_history",          # full-log SCD2 window pass
    "graph_triangle_count",      # oriented wedge join
)


#: Planted hot key for ``--hotkey`` mode (a low id, inside every
#: replica's un-offset key range) and the deterministic fraction of
#: rows remapped onto it.
_HOT_KEY = 1
_HOT_MOD = 5  # 1-in-5 rows → 20 % of the fact lands on one key


def build_scaled(
    spark, src_dir: str, dst_dir: str, n: int, hotkey: bool = False
) -> None:
    """Write the N×-replicated copy of ``src_dir`` into ``dst_dir``.

    ``hotkey=True`` additionally remaps a deterministic 1-in-
    ``_HOT_MOD`` slice of every replica's events (by event_id) and
    orders (by o_orderkey) onto the single key ``_HOT_KEY`` AFTER the
    replica offsets — so at ×N one key owns 20 % of the whole fact
    across the full N×35-day horizon. That is the pathology
    `join_asof_salted` exists for: the plain single-key carry window
    serializes that key's timeline through one task, while the salt
    grid splits it across time buckets. Plant in EVERY replica
    (including i=0) so a ×1-planted baseline isolates scaling from
    planting."""
    os.makedirs(dst_dir, exist_ok=True)
    for t in TABLES:
        df = load_table(spark, src_dir, t)
        if t in ("region", "nation"):  # true dims: never replicated
            out = df
        else:
            parts = []
            for i in range(n):
                rep = df
                for c in df.columns:
                    if c in _OFFSETS:
                        rep = rep.withColumn(c, F.col(c) + F.lit(i * _OFFSETS[c]))
                if hotkey and t == "events":
                    rep = rep.withColumn(
                        "user_id",
                        F.when(
                            F.col("event_id") % _HOT_MOD == 0, F.lit(_HOT_KEY)
                        ).otherwise(F.col("user_id")),
                    )
                if hotkey and t == "orders":
                    rep = rep.withColumn(
                        "o_custkey",
                        F.when(
                            F.col("o_orderkey") % _HOT_MOD == 0, F.lit(_HOT_KEY)
                        ).otherwise(F.col("o_custkey")),
                    )
                if t == "documents" and i > 0:
                    rep = rep.withColumn(
                        "text", F.translate(F.col("text"), "aeiou", _rot(i))
                    )
                if t == "events" and i > 0:
                    # Disjoint 35-day window per replica: N× data means
                    # a LONGER history, not N coexisting copies of the
                    # same month (which would make every cross-replica
                    # user pair a genuine correlate/session collision —
                    # quadratic OUTPUT by construction, not a plan
                    # property).
                    rep = rep.withColumn(
                        "ts", F.timestamp_add("DAY", F.lit(35 * i), F.col("ts"))
                    )
                parts.append(rep)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(dst_dir, f"{t}.parquet"))


def time_query(spark, fn, sf_dir: str, runs: int = 3):
    """(first_sec, warm_median_sec, all_warm_runs): the first run
    carries any cold build (Lloyd train, persist materialization)
    exactly like bench.py records first_run separately; the median of
    the following runs is the serving number the ratio is judged on.
    The raw run list is returned too — this box swings 10x
    intermittently, and a curve point is only interpretable when the
    outlier run is VISIBLE next to the median."""
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    first = round(time.perf_counter() - t0, 3)
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    s = sorted(times)
    return first, s[len(s) // 2], times


def calib_cpu(spark) -> float:
    """Fixed SF-independent CPU probe (same shape as bench.py's):
    this box stalls 10x intermittently — the SAME x5 occupancy run
    measured 119 s and 16.5 s in one session — so a curve without a
    bracketing calibration row is uninterpretable."""
    from pyspark.sql import functions as FF

    t0 = time.perf_counter()
    spark.range(0, 200_000_000, 1, 32).select(
        FF.sum(FF.col("id") % 7).alias("s")
    ).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def _occupancy_fn(name: str, n_rep: int):
    """Fixed-occupancy (k ∝ n) variant of a quantizer-celled query
    (VERDICT r10 item 3). Under the harness's replicate-as-is
    semantics at FIXED k, the N copies of every vector land in the
    SAME cell, so per-cell pair work grows N² — a harness artifact.
    Production sizes the coarse quantizer so cell occupancy stays
    bounded as the corpus grows (the `llm/ivf_index.py` cell-balance
    invariant); this mode demonstrates that rule: k scales with the
    replica count, occupancy stays ~constant, expected wall ≈ linear."""
    if name == "embedding_hard_negatives":
        from spark_streaming_with_debezium_spark.llm.cluster import (
            _KM_K,
            embedding_hard_negatives,
        )

        def fn(spark, sf_dir):
            return embedding_hard_negatives(spark, sf_dir, k=_KM_K * n_rep)

        return fn
    raise KeyError(f"no occupancy-scaled variant for {name}")


def main() -> None:
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("SPARK_GRAFT_SCALE_N", "5"))
    occupancy = "--occupancy" in sys.argv
    hotkey = "--hotkey" in sys.argv
    names = [a for a in sys.argv[1:] if not a.startswith("--")] or (
        ["join_asof", "join_asof_salted"] if hotkey else list(DEFAULT_QUERIES)
    )
    spark = get_spark("scale_curve")
    spark.sparkContext.setLogLevel("ERROR")
    queries = load_all()

    dst = tempfile.mkdtemp(prefix=f"scale_x{n}_")
    base_dir = src
    base_tmp = None
    try:
        t0 = time.perf_counter()
        build_scaled(spark, src, dst, n, hotkey=hotkey)
        if hotkey:
            # ×1 baseline gets the SAME planted skew, so the ratio
            # measures scaling, not planting.
            base_tmp = tempfile.mkdtemp(prefix="scale_x1_hot_")
            build_scaled(spark, src, base_tmp, 1, hotkey=True)
            base_dir = base_tmp
        build_sec = round(time.perf_counter() - t0, 3)
        cpu_pre = calib_cpu(spark)
        out = {}
        for name in names:
            if occupancy:
                base_fn, scaled_fn = _occupancy_fn(name, 1), _occupancy_fn(name, n)
            else:
                base_fn = scaled_fn = queries[name].fn
            base_first, base, base_runs = time_query(spark, base_fn, base_dir)
            scaled_first, scaled, scaled_runs = time_query(spark, scaled_fn, dst)
            out[name] = {
                "x1_sec": base,
                f"x{n}_sec": scaled,
                "x1_first_sec": base_first,
                f"x{n}_first_sec": scaled_first,
                "x1_runs": base_runs,
                f"x{n}_runs": scaled_runs,
                "ratio": round(scaled / base, 2) if base > 0 else None,
                # spread_small_scan's scale contract, asserted on the
                # REPLICATED (multi-file, multi-split) copy: the ×N
                # plan must NOT carry the local-regime round-robin
                # rebalance (VERDICT r13 item 9).
                f"x{n}_plan_roundrobin": (
                    "RoundRobinPartitioning"
                    in scaled_fn(spark, dst)._jdf.queryExecution().toString()
                ),
            }
        cpu_post = calib_cpu(spark)
        skew = None
        if hotkey:
            ev = load_table(spark, dst, "events")
            hot = ev.filter(F.col("user_id") == _HOT_KEY).count()
            total = ev.count()
            skew = {
                "hot_key": _HOT_KEY,
                "hot_events": int(hot),
                "total_events": int(total),
                "hot_share": round(hot / total, 4),
            }
        print(
            json.dumps(
                {
                    "metric": "scale_curve",
                    "mode": (
                        "hotkey_planted"
                        if hotkey
                        else "occupancy_k_prop_n" if occupancy else "fixed_k"
                    ),
                    "hot_skew": skew,
                    "replicas": n,
                    "ideal_ratio": float(n),
                    "build_sec": build_sec,
                    "calib_cpu_pre_sec": cpu_pre,
                    "calib_cpu_post_sec": cpu_post,
                    "queries": out,
                    "base_dir": base_dir,
                }
            )
        )
    finally:
        shutil.rmtree(dst, ignore_errors=True)
        if base_tmp:
            shutil.rmtree(base_tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
