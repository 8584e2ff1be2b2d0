"""Invariant tests for the temporal operators added in round 6's
continuation: the point-in-time SCD2 join and the sweep-line
concurrency peak (their exact values are covered by the DuckDB oracle
sweep; these pin the structural guarantees the oracle can't state)."""

import pyspark.sql.functions as F

from spark_streaming_with_debezium_spark.registry import load_all

QUERIES = load_all()


def test_pit_join_one_row_per_click(spark, sf_dir):
    """Validity intervals partition each user's timeline, so the left
    join must yield EXACTLY one row per click — a duplicate would mean
    overlapping versions (the classic fan-out bug in temporal joins)."""
    out = QUERIES["cdc_temporal_pit_join"].fn(spark, sf_dir)
    from spark_streaming_with_debezium_spark.sources.tables import load_table

    n_clicks = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .count()
    )
    assert out.count() == n_clicks
    assert out.groupBy("event_id").count().filter("count > 1").count() == 0


def test_pit_join_version_matches_interval(spark, sf_dir):
    """Every matched row's click_ts must fall inside its version's
    recomputed validity interval (cross-check against the raw log)."""
    out = QUERIES["cdc_temporal_pit_join"].fn(spark, sf_dir).filter(
        F.col("balance_version").isNotNull()
    )
    # Version k's balance is the k-th purchase's value for that user.
    from spark_streaming_with_debezium_spark.sources.tables import load_table
    from pyspark.sql import Window

    p = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .withColumn(
            "v",
            F.row_number()
            .over(Window.partitionBy("user_id").orderBy("event_id"))
            .cast("double"),
        )
    )
    bad = (
        out.join(
            p.select(
                "user_id", "v", F.col("value").alias("expect_balance")
            ),
            (out.user_id == p.user_id) & (out.balance_version == p.v),
        )
        .filter(F.col("balance_at_click") != F.col("expect_balance"))
        .count()
    )
    assert bad == 0


def test_concurrency_peak_bounds(spark, sf_dir):
    """Per day: 1 ≤ peak ≤ n_active_sessions, and the day column is
    midnight-aligned (clipping produced per-day ledgers)."""
    out = QUERIES["events_concurrency_peak"].fn(spark, sf_dir)
    rows = out.collect()
    assert rows
    for r in rows:
        assert 1 <= r["peak_concurrency"] <= r["n_active_sessions"]
        t = r["day"]
        assert (t.hour, t.minute, t.second, t.microsecond) == (0, 0, 0, 0)
