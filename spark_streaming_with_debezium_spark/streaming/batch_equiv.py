"""Streaming operators in batch form (SURVEY §2.9 T5–T8).

Structured Streaming's windowed aggregations are defined on event time,
so the SAME expressions run identically over a bounded DataFrame — that
makes them oracle-checkable here, while ``streaming.jobs`` runs the
identical plans as real streams (readStream + watermark + availableNow)
in the test suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_with_debezium_spark.functions.numeric import dsum, sql_dsum
from spark_streaming_with_debezium_spark.registry import query
from spark_streaming_with_debezium_spark.sources.tables import load_table


@query(
    "stream_tumbling_window",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6: tumbling event-time window — F.window(ts, '1 hour'). The
    identical expression runs under a watermark in streaming.jobs."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "stream_sliding_window",
    oracle=f"""
    WITH slides AS (
      -- an event at t belongs to the 2 two-hour windows whose starts are
      -- floor(t, 1h) and floor(t, 1h) - 1h (slide-aligned, Spark semantics)
      SELECT time_bucket(INTERVAL '1 hour', ts) - s.i * INTERVAL '1 hour'
               AS window_start,
             value
      FROM events, (SELECT unnest(range(0, 2)) AS i) s
    )
    SELECT window_start,
           COUNT(*) AS n,
           {sql_dsum('value')} AS total_value
    FROM slides
    GROUP BY 1
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6: sliding window (2h length, 1h slide) — each event lands in 2
    overlapping windows. Oracle replicates rows per slide then buckets.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
        .select(F.col("window.start").alias("window_start"), "n", "total_value")
    )


@query(
    "stream_session_window",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start,
           COUNT(*) AS n_events, {sql_dsum('value')} AS session_value
    FROM sessions GROUP BY user_id, session_id
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7: session windows (30-min gap) via F.session_window — the
    oracle reconstructs sessions with the classic lag/gap/cumsum idiom.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("session_value"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


@query(
    "stream_dedup",
    oracle="""
    SELECT user_id, event_type, COUNT(*) AS n_first_events
    FROM (
      SELECT user_id, event_type, ROW_NUMBER() OVER
        (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
      FROM events) t
    WHERE rn = 1
    GROUP BY user_id, event_type
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8: streaming dedup — dropDuplicates on (user_id, event_type);
    the duplicate-delivery guard the reference TODO'd
    (`DebeziumDeltaFormatter.scala:17`). Batch dropDuplicates keeps an
    arbitrary row, so the query aggregates to a count that is
    row-choice-independent; the oracle mirrors with rn=1.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.dropDuplicates(["user_id", "event_type"])
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n_first_events"))
    )


@query(
    "stream_interval_join",
    oracle="""
    SELECT v.user_id AS user_id,
           v.event_id AS view_id,
           c.event_id AS click_id,
           v.ts AS view_ts,
           c.ts AS click_ts,
           CAST(date_diff('second', v.ts, c.ts) AS BIGINT) AS gap_sec
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON v.user_id = c.user_id
     AND c.ts > v.ts
     AND c.ts <= v.ts + INTERVAL '30 minutes'
    """,
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join in batch form: every click within
    30 minutes AFTER a view by the same user (view-attribution, the
    canonical event-time interval join). The identical join condition
    runs as a genuine watermarked stream-stream join in
    ``streaming.jobs.interval_join_streams`` (tested
    stream-equals-batch in tests/test_streaming.py).

    Plan: equi join on user_id with the time band as a residual
    predicate — one shuffle per side on a uniform key; state at
    streaming runtime is bounded by the watermark (each side retains
    only 30 min + watermark of per-user history)."""
    e = load_table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return (
        v.join(
            c,
            (F.col("user_id") == F.col("c_user_id"))
            & (F.col("click_ts") > F.col("view_ts"))
            & (
                F.col("click_ts")
                <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")
            ),
        )
        .select(
            "user_id",
            "view_id",
            "click_id",
            "view_ts",
            "click_ts",
            (
                F.unix_timestamp("click_ts") - F.unix_timestamp("view_ts")
            ).alias("gap_sec"),
        )
    )


@query(
    "stream_static_enrich",
    oracle=f"""
    SELECT n.n_name AS nation, c.c_mktsegment AS segment,
           COUNT(*) AS n_events,
           {sql_dsum('e.value')} AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment in batch form: events joined to the
    static customer→nation dimensions, rolled up per (nation, segment).
    The identical join runs against a readStream side in
    ``streaming.jobs.enrich_stream_with_dim`` (stream-equals-batch in
    tests/test_streaming.py) — Structured Streaming re-plans the static
    side per micro-batch, so a refreshed dim snapshot is picked up
    without restarting the query.

    Plan: both dims are broadcast (customer is the FACT side's
    enrichment here, but at 100 TB the event stream is the big side and
    customer/nation remain broadcast-able dimension tables) — the
    stream side never shuffles for the join; the only exchange is the
    final rollup on (nation, segment), a low-cardinality uniform key."""
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    enriched = e.join(
        F.broadcast(c), e.user_id == c.c_custkey
    ).join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    return enriched.groupBy(
        F.col("n_name").alias("nation"), F.col("c_mktsegment").alias("segment")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("total_value"),
    )


@query(
    "stream_trending_topk",
    oracle="""
    WITH slides AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) - s.i * INTERVAL '1 hour'
               AS window_start,
             event_type
      FROM events, (SELECT unnest(range(0, 2)) AS i) s
    ),
    counted AS (
      SELECT window_start, event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM slides GROUP BY 1, 2
    )
    SELECT window_start, event_type, n,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY window_start ORDER BY n DESC, event_type
           ) AS BIGINT) AS rn
    FROM counted QUALIFY rn <= 3
    """,
)
def stream_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending top-k: the 3 most frequent event types per sliding
    2-hour window (1-hour hop) — the "what's hot right now" face every
    event pipeline ships. Batch form of a two-stage streaming plan:
    the windowed count runs under a watermark exactly like
    `stream_sliding_window`; the per-window rank is the foreachBatch
    stage (rank-over-append-stream isn't expressible inside a single
    streaming query, so the sink ranks each emitted window — same
    expressions, micro-batch scope).

    Rank ties break on event_type, so top-k membership is
    deterministic on both engines. Scale shape: the count is a
    map-side-combined aggregate on (window, type); the rank window
    partitions on window_start with at most |event_type| rows per
    partition — bounded, never a corpus sort."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    counted = e.groupBy(F.window("ts", "2 hours", "1 hour"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("window").orderBy(
        F.col("n").desc(), F.col("event_type")
    )
    return (
        counted.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "rn",
        )
    )
