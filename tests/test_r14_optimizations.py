"""Focused tests for the round-14 optimization changes — each pins the
operator-internal behavior an optimization relies on, per the brief
("add a focused test when an optimization changes an operator's
internals")."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_with_debezium_spark.registry import load_all
from spark_streaming_with_debezium_spark.sources.tables import (
    load_table,
    scan_is_small,
    spread_small_scan,
)

QUERIES = load_all()


def test_spread_small_scan_skips_non_scan_frames(spark, sf_dir):
    """r13 advice (medium): probing ``df.rdd`` on a frame with a
    shuffle upstream MATERIALIZES the upstream query stages under AQE —
    on the streaming CDC dedup path that executed the whole
    parse+compact window once per micro-batch, result discarded. The
    guard must return non-scan-rooted frames unchanged, without
    probing."""
    agg = load_table(spark, sf_dir, "events").groupBy("user_id").count()
    assert spread_small_scan(agg) is agg
    from pyspark.sql import Window

    win = load_table(spark, sf_dir, "events").withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("user_id").orderBy("ts")),
    )
    assert spread_small_scan(win) is win


def test_spread_small_scan_noop_on_multisplit_input(spark, sf_dir, tmp_path):
    """The scale contract, asserted with a real multi-split copy: when
    the scan yields >= defaultParallelism splits the helper must not
    add an exchange (VERDICT r13 item 3's done-criterion)."""
    e = load_table(spark, sf_dir, "events")
    p = str(tmp_path / "events_multisplit")
    e.repartition(32).write.parquet(p)
    multi = spark.read.parquet(p).select("user_id", "event_id")
    assert spread_small_scan(multi) is multi
    assert not scan_is_small(multi)
    # ... and the single-split source still spreads (local regime)
    single = e.select("user_id", "event_id")
    spread = spread_small_scan(single)
    assert spread is not single
    assert "RoundRobinPartitioning" in spread._jdf.queryExecution().toString()
    assert scan_is_small(single)


def test_synthetic_envelope_faces_spread_is_guarded(spark, sf_dir):
    """cdc_envelope_roundtrip / cdc_logical_types swapped their
    unconditional repartition(defaultParallelism) for spread_small_scan
    (VERDICT r13 item 1): at the local single-split SF the plan must
    still carry exactly one round-robin exchange."""
    for name in ("cdc_envelope_roundtrip", "cdc_logical_types"):
        txt = QUERIES[name].fn(spark, sf_dir)._jdf.queryExecution().toString()
        assert txt.count("RoundRobinPartitioning") == 1, (name, txt)


def test_similarity_packed_candidates_match_unpacked(spark, sf_dir):
    """The packed single-long candidate-pair key (VERDICT r13 item 5)
    must produce the exact same (user_a, user_b) set and dtypes as the
    two-long form it replaces."""
    from spark_streaming_with_debezium_spark.operators.more_relational import (
        _similarity_candidates,
        _user_day_series,
    )

    ud = _user_day_series(spark, sf_dir)
    plain = _similarity_candidates(ud, min_days=5, pack_ids=False)
    packed = _similarity_candidates(ud, min_days=5, pack_ids=True)
    assert dict(plain.dtypes) == dict(packed.dtypes)
    a = {(r.user_a, r.user_b) for r in plain.collect()}
    b = {(r.user_a, r.user_b) for r in packed.collect()}
    assert a == b
    assert len(a) > 0  # vacuous otherwise — min_days=5 hits at sf0.001


def test_similarity_scale_flags_local_regime(spark, sf_dir):
    """On the shipped single-split testdata both guards must engage
    (spread on, ids provably < 2^31 so packing on)."""
    from spark_streaming_with_debezium_spark.operators.more_relational import (
        _similarity_scale_flags,
    )

    spread, pack = _similarity_scale_flags(spark, sf_dir)
    assert spread is True
    assert pack is True


def test_concurrency_bounds_single_sessionizer_evaluation(spark, sf_dir):
    """events_concurrency_peak's ±1 boundary rows now come from ONE
    explode instead of a union of two sessionizer subtrees (VERDICT r13
    item 6): the sessionizer must appear at most twice in the plan —
    once per grouped_ordered_running textual branch (within/totals ×
    bounds-agg/probe = 4, which the runtime exchange-reuses) — not
    eight times (× the 2 union legs, the r13 shape)."""
    from spark_streaming_with_debezium_spark.plans.explain import _single_plan

    txt = _single_plan(QUERIES["events_concurrency_peak"].fn(spark, sf_dir))
    assert txt.count("events.parquet") == 4, txt


def test_global_running_bounds_evaluated_once_at_runtime(spark):
    """r13 advice (low): global_ordered_running's inline
    percentile_approx bounds are planned under both the window branch
    and the totals branch; per-bucket offsets are only consistent
    because the runtime reuses ONE evaluation. Pin the invariant on the
    executed plan: the second bounds broadcast must be a
    ReusedExchange."""
    from spark_streaming_with_debezium_spark.operators.scalable_windows import (
        global_ordered_running,
    )
    from spark_streaming_with_debezium_spark.plans.explain import _single_plan

    df = spark.range(0, 10_000).select(
        "id", (F.col("id") % 97).alias("w")
    )
    out = global_ordered_running(
        df,
        key=F.col("id").cast("double"),
        order_cols=["id"],
        sums={"rs": F.col("w")},
        n_buckets=16,
    )
    out.collect()
    final = _single_plan(out)
    assert "ReusedExchange" in final, final
