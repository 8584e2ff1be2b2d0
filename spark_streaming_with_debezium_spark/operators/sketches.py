"""Mergeable-sketch aggregations (Apache DataSketches HLL via Spark's
built-in ``hll_sketch_agg`` / ``hll_union_agg``).

Why sketches are a first-class 100 TB operator: exact COUNT(DISTINCT)
does not re-aggregate — you cannot combine yesterday's per-partition
distinct counts into a weekly number. An HLL sketch DOES merge: each
partition/day/source builds a fixed-size (≈2^lgK bytes) sketch once,
and any rollup (rolling windows, region→global, backfill + increment)
is a cheap union of sketches instead of a re-scan of raw data. That
turns "distinct users, any time range" from an O(data) query into an
O(days) one. Both queries here are the two canonical shapes:

- pre-aggregate per group, merge to a grand total (scan once, answer
  per-group AND global from the same sketches);
- pre-aggregate per day, merge over a sliding range (re-aggregatable
  rolling distincts — the query exact distinct counting cannot serve
  incrementally at all).

The estimates are deterministic for a fixed input and lgConfigK (the
sketch is a pure hash-based state machine, no RNG), so the rows-only
driver check is stable; accuracy (±~1.6% at lgK=12) is asserted in
``tests/test_llm_ops.py`` against exact counts, as is the mergeability
identity union(per-source sketches) == sketch(all rows).

Reference parity: the reference delegates analytics to Spark SQL
(README.md:34-40); distinct-user/doc counting is the standard BI ask
on its CDC output. Beyond-reference scale operator per the brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_with_debezium_spark.llm.corpus_rules import normalize_text
from spark_streaming_with_debezium_spark.registry import query
from spark_streaming_with_debezium_spark.sources.tables import load_table

#: 2^12 registers ≈ 1.6% relative standard error, 4 KiB per sketch —
#: the size/accuracy point where a year of daily sketches for 1k
#: groups is still only ~1.5 GiB of state.
LG_CONFIG_K = 12


def normalized_content_hash(col: str = "text"):
    """64-bit hash of whitespace-normalized lowercased content — the
    same normalization the exact-dedup family uses (llm/dedup.py), so
    sketch estimates are comparable with exact dedup counts."""
    return F.xxhash64(normalize_text(col))


@query("sketch_hll_distinct_docs", oracle=None)  # approximate => rows-only
def sketch_hll_distinct_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-content estimate per source PLUS the global rollup from
    the SAME per-source sketches (one scan; the '__all__' row is a
    sketch union, not a second pass). At 100 TB the per-source sketches
    are O(sources × 4 KiB) — the grand total costs a broadcast-size
    merge no matter how big the corpus is."""
    d = load_table(spark, sf_dir, "documents")
    hashed = d.select("source", normalized_content_hash().alias("h"))
    per_src = hashed.groupBy("source").agg(
        F.hll_sketch_agg("h", F.lit(LG_CONFIG_K)).alias("sk")
    )
    est = per_src.select(
        "source", F.hll_sketch_estimate("sk").alias("est_distinct")
    )
    total = (
        per_src.agg(F.hll_union_agg("sk").alias("sk"))
        .select(
            F.lit("__all__").alias("source"),
            F.hll_sketch_estimate("sk").alias("est_distinct"),
        )
    )
    return est.unionByName(total)


@query("sketch_hll_rolling_users", oracle=None)  # approximate => rows-only
def sketch_hll_rolling_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users per day from merged DAILY sketches.
    Exact rolling distincts need the raw event stream for every window
    (30× re-scan for 30 days); here the events table is scanned ONCE
    into O(days) 4 KiB sketches, and each day's 7-day value is a union
    of ≤7 of them. The day×window expansion joins two O(days)-row
    frames — broadcast-sized at any corpus scale, so the whole rollup
    after the first shuffle is effectively free."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select(F.to_date("ts").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.hll_sketch_agg("user_id", F.lit(LG_CONFIG_K)).alias("sk"))
    )
    days = daily.select(F.col("day").alias("anchor"))
    window_members = days.join(
        F.broadcast(daily),
        (F.col("day") <= F.col("anchor"))
        & (F.col("day") >= F.date_sub(F.col("anchor"), 6)),
    )
    return (
        window_members.groupBy("anchor")
        .agg(F.hll_union_agg("sk").alias("sk"))
        .select(
            F.col("anchor").alias("day"),
            F.hll_sketch_estimate("sk").alias("est_users_7d"),
        )
    )
