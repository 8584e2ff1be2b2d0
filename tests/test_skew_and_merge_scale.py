"""Scale-mechanics tests: salted join exactness, bucketed-merge I/O
pruning (only touched buckets rewritten)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spark_streaming_with_debezium_spark.cdc.merge import ParquetStateTable
from spark_streaming_with_debezium_spark.operators.skew import salted_join
from spark_streaming_with_debezium_spark.sources.tables import load_table


def test_salted_join_exact(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    plain = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_join(
            o.withColumnRenamed("o_custkey", "k"),
            c.withColumnRenamed("c_custkey", "k"),
            on=["k"],
            n_salts=4,
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_rejects_outer(spark):
    """Right/full outer would duplicate unmatched small-side rows once
    per salt replica — salted_join must refuse those modes."""
    import pytest

    df = spark.range(4).withColumnRenamed("id", "k")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(df, df, on=["k"], how=how)
    # left stays allowed (unmatched BIG-side rows match no replica twice)
    left = salted_join(
        df, df.filter(F.col("k") < 2), on=["k"], n_salts=4, how="left"
    )
    assert left.count() == 4


def test_merge_rewrites_only_touched_buckets(spark, tmp_path):
    state = ParquetStateTable(spark, str(tmp_path / "st"), ["id"], n_buckets=16)
    snapshot = spark.createDataFrame(
        [(i, f"v{i}") for i in range(200)], "id long, val string"
    )
    state.init(snapshot)

    def mtimes():
        out = {}
        for d in os.listdir(state.path):
            if d.startswith("_bucket="):
                full = os.path.join(state.path, d)
                out[d] = max(
                    os.path.getmtime(os.path.join(full, f)) for f in os.listdir(full)
                )
        return out

    before = mtimes()
    changes = spark.createDataFrame(
        [(7, "v7b", False)], "id long, val string, deleted boolean"
    )
    state.merge(changes)
    after = mtimes()
    changed = {d for d in after if after[d] != before.get(d)}
    assert len(changed) == 1, f"expected 1 touched bucket, got {changed}"
    # and the data is correct
    vals = {r.id: r.val for r in state.read().collect()}
    assert vals[7] == "v7b" and vals[8] == "v8" and len(vals) == 200


def test_state_table_lookup_prunes_buckets(spark, tmp_path):
    """lookup(keys): exact point-lookup semantics, and the plan reads
    only the buckets the requested keys hash into (same pruning as
    merge — asserted via the partition filter in the scan)."""
    state = ParquetStateTable(spark, str(tmp_path / "st"), ["id"], n_buckets=16)
    state.init(
        spark.createDataFrame([(i, f"v{i}") for i in range(500)], "id long, val string")
    )
    keys = spark.createDataFrame([(3,), (250,), (499,), (9999,)], "id long")
    got = {r["id"]: r["val"] for r in state.lookup(keys).collect()}
    assert got == {3: "v3", 250: "v250", 499: "v499"}  # 9999 absent

    # pruning: the scan's plan must carry a _bucket IN (...) filter with
    # fewer buckets than the table has
    plan = state.lookup(keys)._jdf.queryExecution().executedPlan().toString()
    assert "_bucket" in plan
    empty = state.lookup(spark.createDataFrame([], "id long"))
    assert empty.count() == 0


def test_bucket_compaction(spark, tmp_path):
    """Fragmented buckets get rewritten to one file; data unchanged.

    Merges themselves never fragment (each touched bucket is swapped
    whole), so fragment one bucket by hand — split its file into
    per-row-group pieces the way an external appender would leave them.
    """
    import pyarrow.parquet as pq

    state = ParquetStateTable(spark, str(tmp_path / "st"), ["id"], n_buckets=2)
    state.init(
        spark.createDataFrame([(i, f"v{i}") for i in range(50)], "id long, v string")
    )
    before = sorted(map(tuple, state.read().collect()))

    bucket_dirs = [d for d in os.listdir(state.path) if d.startswith("_bucket=")]
    frag_dir = os.path.join(state.path, bucket_dirs[0])
    src_files = [f for f in os.listdir(frag_dir) if f.endswith(".parquet")]
    table = pq.read_table(os.path.join(frag_dir, src_files[0]))
    os.remove(os.path.join(frag_dir, src_files[0]))
    half = table.num_rows // 2
    pq.write_table(table.slice(0, half), os.path.join(frag_dir, "part-a.parquet"))
    pq.write_table(table.slice(half), os.path.join(frag_dir, "part-b.parquet"))
    pq.write_table(table.slice(0, 0), os.path.join(frag_dir, "part-c.parquet"))

    n = state.compact_buckets(min_files=2)
    assert n == 1
    after = sorted(map(tuple, state.read().collect()))
    assert after == before
    files = [f for f in os.listdir(frag_dir) if f.endswith(".parquet")]
    assert len(files) == 1


def test_rebucket_migrates_layout_and_persists_modulus(spark, tmp_path):
    """rebucket: all rows preserved under the new layout, later merges
    route by the STORED modulus even when a reader reopens with a stale
    constructor n_buckets, and the crash-parked old layout is either
    rolled back (live dir missing) or dropped (swap completed)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from spark_streaming_with_debezium_spark.cdc.merge import ParquetStateTable

    path = str(tmp_path / "state")
    st = ParquetStateTable(spark, path, ["id"], n_buckets=4)
    st.init(
        spark.range(200).select(
            F.col("id"), (F.col("id") * 2).alias("v")
        )
    )
    before = sorted(tuple(r) for r in st.read().collect())
    st.rebucket(16)
    assert st.n_buckets == 16
    dirs = [d for d in os.listdir(path) if d.startswith("_bucket=")]
    assert len(dirs) == 16
    assert sorted(tuple(r) for r in st.read().collect()) == before

    # Stale reader: constructor says 4, the meta sidecar says 16 — the
    # stored modulus must win or merges would route keys to wrong dirs.
    stale = ParquetStateTable(spark, path, ["id"], n_buckets=4)
    assert stale.n_buckets == 16
    changes = spark.createDataFrame(
        [(5, 999, False), (1000, 17, False)], "id long, v long, deleted boolean"
    )
    stale.merge(changes)
    got = {r["id"]: r["v"] for r in stale.read().collect()}
    assert got[5] == 999 and got[1000] == 17 and len(got) == 201

    # Crash between park and land: live dir gone, old parked → reopening
    # must roll the parked layout back.
    os.rename(path, path + "_rebucket_old")
    recovered = ParquetStateTable(spark, path, ["id"], n_buckets=4)
    assert recovered.n_buckets == 16
    assert {r["id"] for r in recovered.read().collect()} == set(got)
    assert not os.path.exists(path + "_rebucket_old")

    # Completed swap with leftover park: parked copy is garbage.
    shutil.copytree(path, path + "_rebucket_old")
    again = ParquetStateTable(spark, path, ["id"], n_buckets=4)
    assert again.n_buckets == 16
    assert not os.path.exists(path + "_rebucket_old")


def test_hot_key_batch_through_merge(spark, tmp_path):
    """Planted pathological skew (ONE key carries 50% of a 1M-event
    batch — the re-imported-row / null-key-default scenario) through
    LWW compaction + ParquetStateTable.merge:

    - the aggregate compaction (`compact_latest_agg`) must match the
      window compaction exactly (total order per key), and
    - its plan must show two-phase aggregation (map-side partial
      reduction), the property that makes the hot key a non-event at
      cluster scale, and
    - end-to-end wall for the hot batch must stay within 2× of a
      uniform batch of the same size.
    """
    import time

    from spark_streaming_with_debezium_spark.cdc.compact import (
        compact_latest,
        compact_latest_agg,
    )

    n = 1_000_000
    n_keys = 200_000

    def batch(hot: bool):
        df = spark.range(n)
        key = (
            F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(F.col("id") % n_keys)
            if hot
            else F.col("id") % n_keys
        )
        return df.select(
            key.alias("k"),
            F.col("id").alias("seq"),
            (F.col("id") * 3 % 1000).alias("v"),
            F.lit(False).alias("deleted"),
        )

    # Equivalence of the two compaction formulations on the hot batch.
    hot = batch(hot=True)
    agg_plan = compact_latest_agg(hot, ["k"], ["seq"])._jdf.queryExecution().executedPlan().toString()
    assert agg_plan.count("HashAggregate") >= 2 or "partial_max_by" in agg_plan.lower(), agg_plan[:2000]
    win_top = {
        r["k"]: (r["seq"], r["v"])
        for r in compact_latest(hot, ["k"], ["seq"]).filter(F.col("k") < 100).collect()
    }
    agg_top = {
        r["k"]: (r["seq"], r["v"])
        for r in compact_latest_agg(hot, ["k"], ["seq"]).filter(F.col("k") < 100).collect()
    }
    assert win_top == agg_top
    assert agg_top[0] == (n - 2, (n - 2) * 3 % 1000)  # the hot key's latest

    # End-to-end wall: compact_agg + merge, hot vs uniform.
    def run(tag: str, hot_flag: bool) -> float:
        state = ParquetStateTable(
            spark, str(tmp_path / f"st_{tag}"), ["k"], n_buckets=32
        )
        state.init(
            spark.range(n_keys).select(
                F.col("id").alias("k"),
                F.lit(-1).cast("long").alias("seq"),
                F.lit(0).cast("long").alias("v"),
            )
        )
        t0 = time.time()
        compacted = compact_latest_agg(batch(hot_flag), ["k"], ["seq"])
        state.merge(compacted, data_cols=["seq", "v"])
        wall = time.time() - t0
        # key 0's latest event: hot → last even id (n-2); uniform → the
        # last id congruent to 0 mod n_keys.
        last_seq = n - 2 if hot_flag else ((n - 1) // n_keys) * n_keys
        got = {r["k"]: (r["seq"], r["v"]) for r in state.read().filter(F.col("k") == 0).collect()}
        assert got[0] == (last_seq, last_seq * 3 % 1000)
        return wall

    t_uniform = run("uniform", False)
    t_hot = run("hot", True)
    assert t_hot <= 2.0 * t_uniform + 2.0, (
        f"hot-key batch {t_hot:.1f}s vs uniform {t_uniform:.1f}s — "
        "skewed compaction is not being reduced map-side"
    )


def test_init_preserves_bucket_meta_after_rebucket(spark, tmp_path):
    """Re-init after rebucket must re-land the bucket-count sidecar in
    BOTH init paths (data and empty-snapshot): losing it would let a
    later reader fall back to its constructor guess and prune/write
    buckets under the wrong modulus — silent key loss."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "state")
    st = ParquetStateTable(spark, path, ["id"], n_buckets=4)
    st.init(spark.range(100).select("id", (F.col("id") * 3).alias("v")))
    st.rebucket(16)

    # Non-empty re-init: a fresh handle (stale ctor guess) then a merge
    # must still route under the stored modulus 16.
    st.init(spark.range(50).select("id", (F.col("id") * 5).alias("v")))
    reader = ParquetStateTable(spark, path, ["id"], n_buckets=4)
    assert reader.n_buckets == 16
    reader.merge(
        spark.createDataFrame([(7, 777, False)], "id long, v long, deleted boolean")
    )
    got = {r["id"]: r["v"] for r in reader.read().collect()}
    assert got[7] == 777 and len(got) == 50

    # Empty-snapshot re-init (fast path) must also persist the modulus.
    st2 = ParquetStateTable(spark, path, ["id"], n_buckets=4)
    st2.init(spark.createDataFrame([], "id long, v long"))
    reader2 = ParquetStateTable(spark, path, ["id"], n_buckets=4)
    assert reader2.n_buckets == 16


def test_asof_salted_hot_key_boundaries(spark, tmp_path):
    """`join_asof_salted` must agree with `join_asof` on a PLANTED
    hot-key corpus hitting every decomposition boundary the sf data
    may never exercise: one user owning events across many salt
    buckets (the skew case the face exists for), events BEFORE any
    order (null carry-in), empty buckets between orders (carry-in must
    skip them), an order exactly AT an event's timestamp (>= match),
    two same-date orders (highest orderkey wins), and a user with
    orders but no events."""
    import datetime as dt

    from spark_streaming_with_debezium_spark.operators.joins import (
        join_asof,
        join_asof_salted,
    )

    day = dt.datetime(2000, 1, 1)

    def ts(days):
        return day + dt.timedelta(days=days)

    # hot user 7: events every 30 days over ~6 years (12+ salt buckets)
    events = [
        (100 + i, ts(30 * i), 7, "view", 1.0) for i in range(72)
    ]
    # cold user 8: one event before its only order, one exactly at it
    events += [(900, ts(10), 8, "view", 1.0), (901, ts(400), 8, "view", 1.0)]
    # user 7's orders: sparse — none before day 200 (null carry-in for
    # early events), then gaps > 1 bucket, two same-date orders at 700
    orders = [
        (1, 7, ts(200), 10.0),
        (2, 7, ts(700), 20.0),
        (3, 7, ts(700), 30.0),  # same date: orderkey 3 must win
        (4, 7, ts(1900), 40.0),
    ]
    # user 8: one order exactly at event 901's timestamp (>= matches)
    orders += [(5, 8, ts(400), 50.0)]
    # user 9: orders, no events (must not surface anywhere)
    orders += [(6, 9, ts(100), 60.0)]
    spark.createDataFrame(
        events, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    ).write.parquet(str(tmp_path / "events.parquet"))
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_totalprice double",
    ).write.parquet(str(tmp_path / "orders.parquet"))

    plain = sorted(map(tuple, join_asof(spark, str(tmp_path)).collect()))
    salted = sorted(
        map(tuple, join_asof_salted(spark, str(tmp_path)).collect())
    )
    assert salted == plain
    by_event = {r[0]: r for r in salted}
    assert by_event[100][3] is None  # before any order: null carry
    assert by_event[901][3] == 5  # order exactly at ts matches
    # after the same-date pair, the higher orderkey (3) is carried
    first_after_700 = min(k for k in by_event if by_event[k][2] >= ts(700) and by_event[k][1] == 7)
    assert by_event[first_after_700][3] == 3
