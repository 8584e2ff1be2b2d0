"""Window-function surface: SURVEY §2.5 (W1–W5) + §2.6 O3.

All windows here partition by a key — at 100 TB these run as one
shuffle on the key then an in-partition sort. Never use a global
(unpartitioned) window at scale: it serializes the dataset through a
single task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_streaming_with_debezium_spark.registry import query
from spark_streaming_with_debezium_spark.sources.tables import load_table


@query(
    "window_lww_compaction",
    oracle="""
    SELECT user_id, event_id, event_type, value FROM (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1
    """,
)
def window_lww_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: last-write-wins dedup-to-latest — the CDC compaction kernel
    (same code as cdc.compact.compact_latest) exercised standalone."""
    from spark_streaming_with_debezium_spark.cdc.compact import compact_latest

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value"
    )
    return compact_latest(e, ["user_id"], order_cols=["event_id"])


@query(
    "window_rank_topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rnk FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             RANK() OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal DESC, c_custkey) AS rnk
      FROM customer) t
    WHERE rnk <= 3
    """,
)
def window_rank_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 + O3: per-group top-k via rank (tie-broken for determinism)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal", "rnk")
    )


@query(
    "window_dense_ntile",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           DENSE_RANK() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS drnk,
           NTILE(4) OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS quartile
    FROM orders
    """,
)
def window_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: dense_rank + ntile in one window (single sort, shared frame)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           LAG(value) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value,
           LEAD(value) OVER (PARTITION BY user_id ORDER BY event_id) AS next_value,
           value - COALESCE(LAG(value) OVER (PARTITION BY user_id ORDER BY event_id), 0)
             AS delta
    FROM events
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: lag/lead — before/after images per key (the Debezium
    before/after recomputation shape)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    prev = F.lag("value").over(w)
    return e.select(
        "event_id",
        "user_id",
        "value",
        prev.alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.coalesce(prev, F.lit(0.0))).alias("delta"),
    )


@query(
    "window_running_frames",
    oracle="""
    SELECT event_id, user_id, value,
           CAST(SUM(CAST(value AS DECIMAL(38,6)))
                OVER (PARTITION BY user_id ORDER BY event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_sum,
           CAST(SUM(CAST(value AS DECIMAL(38,6)))
                OVER (PARTITION BY user_id ORDER BY event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / COUNT(value) OVER (PARTITION BY user_id ORDER BY event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS moving_avg3
    FROM events
    """,
)
def window_running_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: frame-spec aggregates — running sum + 3-row moving average
    (decimal interior for cross-engine determinism)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    mov = w.rowsBetween(-2, 0)
    dec = F.col("value").cast("decimal(38,6)")
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.sum(dec).over(run).cast("double").alias("running_sum"),
        (F.sum(dec).over(mov).cast("double") / F.count("value").over(mov)).alias(
            "moving_avg3"
        ),
    )


@query(
    "window_first_last",
    oracle="""
    SELECT DISTINCT user_id,
           FIRST_VALUE(event_type) OVER
             (PARTITION BY user_id ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_type,
           LAST_VALUE(event_type) OVER
             (PARTITION BY user_id ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
    FROM events
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: first/last value per group — current-state extraction from an
    ordered event history. min_by/max_by on the order key gives ONE hash
    aggregate with map-side combine instead of window-over-all-rows +
    distinct (half the work, one fewer shuffle — same answer)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.min_by("event_type", "event_id").alias("first_type"),
        F.max_by("event_type", "event_id").alias("last_type"),
    )


@query(
    "window_dist_functions",
    oracle="""
    SELECT c_custkey, c_acctbal,
           round(PERCENT_RANK() OVER (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal, c_custkey), 6) AS pct_rank,
           round(CUME_DIST() OVER (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal, c_custkey), 6) AS cume
    FROM customer
    """,
)
def window_dist_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 completion: percent_rank + cume_dist (distribution ranks)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_acctbal",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT event_id, user_id, ts,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             AS events_last_hour
    FROM events
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 completion: RANGE frame over event time — 'how many events
    did this user produce in the trailing hour' (value-based frame,
    not row-count-based). Ordered by epoch MICROseconds on both sides:
    whole-second ordering makes same-truncated-second events frame
    peers and shifts the 1-hour boundary (the truncation class fixed
    across all time-RANGE queries in round 4 — this one reproduced a
    count mismatch at sf0.1)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("events_last_hour"),
    )


@query(
    "window_time_range_rolling",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_7d,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
             AS value_7d
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY epoch_us(ts)
      RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW
    )
    """,
)
def window_time_range_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: per user, each event's trailing-7-day
    event count and value sum — the event-time sibling of the numeric
    RANGE frame in ``window_running_frames``. RANGE (not ROWS) is the
    correct frame for event time: rows landing at the same timestamp
    are all in or all out together, so results don't depend on how
    ties happen to be ordered.

    Spark's rangeBetween needs a numeric ordering column, so the frame
    orders by epoch MICROseconds (unix_micros over a ts cast — NTZ
    needs the cast) with bounds [-604800000000, 0]; the oracle orders
    by epoch_us with the same numeric bounds. Whole-second ordering
    here is a real bug, not a style choice: two same-user events
    inside one truncated second become RANGE peers and each pulls the
    other into its frame (caught at sf0.1 by the oracle diff). The windowed sum accumulates in decimal — frame sums are
    order-of-evaluation-dependent in float, and a RANGE frame
    re-aggregates per row, so exactness matters doubly here. One
    shuffle on user_id."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-604_800_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_7d"),
        F.sum(F.col("value").cast("decimal(38,6)"))
        .over(w)
        .cast("double")
        .alias("value_7d"),
    )
