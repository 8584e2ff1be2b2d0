"""Structured Streaming tests: real streams driven with availableNow.

Covers T1–T10: checkpointed foreachBatch CDC (incl. restart recovery),
watermarked windows, late-data drop, streaming dedup, stateful op —
each asserted against a batch-computed expectation over the same rows.
"""

from __future__ import annotations

import json
import time
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_streaming_with_debezium_spark.cdc.envelope import TableSpec
from spark_streaming_with_debezium_spark.cdc.merge import ParquetStateTable
from spark_streaming_with_debezium_spark.cdc.pipeline import run_cdc_stream
from spark_streaming_with_debezium_spark.streaming.jobs import (
    dedup_within_watermark,
    events_file_stream,
    run_to_memory,
    running_totals_stateful,
    windowed_counts,
)

RAW_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
    ]
)

SPEC = TableSpec(
    name="customers",
    key_cols=("id",),
    value_schema=T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("email", T.StringType())]
    ),
)


def _env(op, i, off, email=None):
    after = None if op == "d" else {"id": i, "email": email or f"u{i}@x.com"}
    return json.dumps(
        {
            "key": json.dumps({"payload": {"id": i}}),
            "value": json.dumps(
                {
                    "payload": {
                        "before": {"id": i} if op in ("d", "u") else None,
                        "after": after,
                        "source": {"ts_ms": 1},
                        "op": op,
                        "ts_ms": 1,
                    }
                }
            ),
            "partition": 0,
            "offset": off,
        }
    )


def test_cdc_stream_with_checkpoint_restart(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "b1.json").write_text(
        "\n".join(
            [_env("c", 1, 0), _env("c", 2, 1), _env("u", 1, 2, "new@x.com"), _env("d", 2, 3)]
        )
    )
    state = ParquetStateTable(spark, str(tmp_path / "state"), ["id"], n_buckets=4)
    state.init(spark.createDataFrame([], "id long, email string"))
    ckpt = str(tmp_path / "ckpt")

    stream = spark.readStream.schema(RAW_SCHEMA).json(str(src))
    run_cdc_stream(stream, SPEC, state, ckpt).awaitTermination()
    assert sorted((r.id, r.email) for r in state.read().collect()) == [
        (1, "new@x.com")
    ]

    # restart on the same checkpoint: only the NEW file may be applied
    (src / "b2.json").write_text("\n".join([_env("c", 3, 4), _env("d", 1, 5)]))
    stream2 = spark.readStream.schema(RAW_SCHEMA).json(str(src))
    run_cdc_stream(stream2, SPEC, state, ckpt).awaitTermination()
    assert sorted((r.id, r.email) for r in state.read().collect()) == [
        (3, "u3@x.com")
    ]


def test_cdc_stream_compaction_bounds_fragmentation(spark, tmp_path):
    """The opt-in maintenance hook must rewrite fragmented buckets as
    part of the stream: pre-fragment a bucket (simulating crash-
    recovered/externally-appended files), run the stream with
    compaction enabled, and assert every bucket is back under the
    fragment threshold with no rows lost."""
    import shutil

    state = ParquetStateTable(spark, str(tmp_path / "state"), ["id"], n_buckets=4)
    state.init(
        spark.createDataFrame([(i, f"u{i}@x.com") for i in range(20)],
                              "id long, email string")
    )
    # fragment one bucket: append 5 tiny parquet files externally
    bucket_dirs = [d for d in os.listdir(state.path) if d.startswith("_bucket=")]
    target = os.path.join(state.path, sorted(bucket_dirs)[0])
    frag_src = str(tmp_path / "frag")
    spark.createDataFrame([], "id long, email string").write.mode("overwrite").parquet(frag_src)
    for i in range(5):
        for f in os.listdir(frag_src):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(frag_src, f), os.path.join(target, f"frag_{i}.parquet"))
    n_before = len([f for f in os.listdir(target) if f.endswith(".parquet")])
    assert n_before >= 5, "pre-fragmentation failed"
    rows_before = sorted((r.id, r.email) for r in state.read().collect())

    src = tmp_path / "src"
    src.mkdir()
    (src / "b1.json").write_text("\n".join([_env("u", 0, 0, "new0@x.com")]))
    stream = spark.readStream.schema(RAW_SCHEMA).json(str(src))
    run_cdc_stream(
        stream, SPEC, state, str(tmp_path / "ckpt"),
        compact_every_n_batches=1, compact_min_files=4,
    ).awaitTermination()

    for d in os.listdir(state.path):
        if d.startswith("_bucket="):
            files = [
                f for f in os.listdir(os.path.join(state.path, d))
                if f.endswith(".parquet")
            ]
            assert len(files) < 4, f"{d} still fragmented: {len(files)} files"
    rows_after = sorted((r.id, r.email) for r in state.read().collect())
    expected = [(i, "new0@x.com" if i == 0 else f"u{i}@x.com") for i in range(20)]
    assert rows_after == expected, (rows_before, rows_after)


def test_cdc_stream_checkpoint_restart_after_registry_evolution(spark, tmp_path):
    """Registry-driven schema evolution across a checkpointed restart:
    the table registry gains a column BETWEEN stream runs (the
    dynamic-registry generalization's real-world stress — the reference
    hardcodes schemas, DebeziumDeltaFormatter.scala:59-65, so a source
    DDL means a redeploy there). Contract: restarting on the OLD
    checkpoint with the NEW spec (a) does not re-apply already-committed
    batches, (b) parses post-DDL envelopes carrying the new column,
    (c) reads pre-evolution rows with NULL in the new column, and
    (d) converges to the same golden state a fresh batch replay of the
    full log under the new spec would produce."""
    src = tmp_path / "src"
    src.mkdir()
    (src / "b1.json").write_text(
        "\n".join([_env("c", 1, 0), _env("c", 2, 1), _env("u", 2, 2, "v2@x.com")])
    )
    state = ParquetStateTable(spark, str(tmp_path / "state"), ["id"], n_buckets=4)
    state.init(spark.createDataFrame([], "id long, email string"))
    ckpt = str(tmp_path / "ckpt")

    stream = spark.readStream.schema(RAW_SCHEMA).json(str(src))
    run_cdc_stream(stream, SPEC, state, ckpt).awaitTermination()
    assert sorted((r.id, r.email) for r in state.read().collect()) == [
        (1, "u1@x.com"),
        (2, "v2@x.com"),
    ]

    # --- source DDL: customers gains `phone` → registry + state evolve ---
    spec_v2 = TableSpec(
        name="customers",
        key_cols=("id",),
        value_schema=T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("email", T.StringType()),
                T.StructField("phone", T.StringType()),
            ]
        ),
    )
    state.evolve({"phone": "string"})

    def _env_v2(op, i, off, email=None, phone=None):
        after = (
            None
            if op == "d"
            else {"id": i, "email": email or f"u{i}@x.com", "phone": phone}
        )
        return json.dumps(
            {
                "key": json.dumps({"payload": {"id": i}}),
                "value": json.dumps(
                    {
                        "payload": {
                            "before": {"id": i} if op in ("d", "u") else None,
                            "after": after,
                            "source": {"ts_ms": 2},
                            "op": op,
                            "ts_ms": 2,
                        }
                    }
                ),
                "partition": 0,
                "offset": off,
            }
        )

    (src / "b2.json").write_text(
        "\n".join(
            [
                _env_v2("c", 3, 3, phone="+3003"),
                _env_v2("u", 1, 4, email="new1@x.com", phone="+1001"),
                _env_v2("d", 2, 5),
            ]
        )
    )
    stream2 = spark.readStream.schema(RAW_SCHEMA).json(str(src))
    run_cdc_stream(stream2, spec_v2, state, ckpt).awaitTermination()

    got = sorted(
        (r.id, r.email, r.phone)
        for r in state.read().select("id", "email", "phone").collect()
    )
    assert got == [(1, "new1@x.com", "+1001"), (3, "u3@x.com", "+3003")], got

    # (a) old checkpoint really gated replay: a fresh-checkpoint replay of
    # the FULL log under spec_v2 must converge to the same golden state —
    # and if b1 had been re-applied above, id=2's tombstone ordering or
    # id=1's email would have diverged.
    state_fresh = ParquetStateTable(
        spark, str(tmp_path / "state_fresh"), ["id"], n_buckets=4
    )
    state_fresh.init(
        spark.createDataFrame([], "id long, email string, phone string")
    )
    stream3 = spark.readStream.schema(RAW_SCHEMA).json(str(src))
    run_cdc_stream(
        stream3, spec_v2, state_fresh, str(tmp_path / "ckpt_fresh")
    ).awaitTermination()
    golden = sorted(
        (r.id, r.email, r.phone)
        for r in state_fresh.read().select("id", "email", "phone").collect()
    )
    assert got == golden, (got, golden)


def _write_events(path, rows):
    with open(path, "w") as f:
        for eid, ts, uid, etype, val in rows:
            f.write(
                json.dumps(
                    {
                        "event_id": eid,
                        "ts": ts,
                        "user_id": uid,
                        "event_type": etype,
                        "value": val,
                        "props": "{}",
                    }
                )
                + "\n"
            )


def test_windowed_agg_stream_matches_batch(spark, tmp_path, sf_dir):
    """The streaming tumbling-window plan must produce the same rows as
    the batch equivalent over the same input (closed windows only)."""
    src = tmp_path / "ev"
    src.mkdir()
    rows = [
        (0, "2024-01-01 00:10:00", 1, "a", 1.0),
        (1, "2024-01-01 00:20:00", 1, "a", 2.0),
        (2, "2024-01-01 01:10:00", 2, "b", 3.0),
        (3, "2024-01-01 09:00:00", 2, "b", 4.0),  # advances watermark, closes earlier windows
    ]
    _write_events(src / "a.json", rows)
    stream = events_file_stream(spark, str(src))
    run_to_memory(windowed_counts(stream), "win_out")
    got = {
        (str(r.window_start), r.event_type): (r.n, r.total_value)
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    # windows at 00:00 (a: 2 rows) and 01:00 (b: 1 row) are closed by the
    # 09:00 event's watermark (2h); the 09:00 window itself is still open.
    assert got == {
        ("2024-01-01 00:00:00", "a"): (2, 3.0),
        ("2024-01-01 01:00:00", "b"): (1, 3.0),
    }


def test_late_data_dropped(spark, tmp_path):
    """T9: an event older than the watermark must not reopen its window.

    Spark semantics (observed): late rows are only guaranteed dropped
    once their window has been EVICTED in a *prior* batch — a late row
    landing in the same batch as the eviction still counts. Hence the
    extra batch (c) between the watermark-advancing event and the late
    arrival.
    """
    src = tmp_path / "ev"
    src.mkdir()
    import time

    _write_events(src / "a.json", [(0, "2024-01-01 00:10:00", 1, "a", 1.0)])
    time.sleep(1.1)  # file-source batch order = mod-time order
    _write_events(src / "b.json", [(1, "2024-01-01 12:00:00", 1, "a", 1.0)])
    time.sleep(1.1)
    _write_events(src / "c.json", [(2, "2024-01-01 12:30:00", 1, "a", 1.0)])
    time.sleep(1.1)
    # arrives after the 00:00 window was evicted (batch c's end)
    _write_events(src / "d.json", [(3, "2024-01-01 00:20:00", 1, "a", 99.0)])
    stream = events_file_stream(spark, str(src))
    run_to_memory(windowed_counts(stream), "late_out")
    got = {
        (str(r.window_start), r.event_type): (r.n, r.total_value)
        for r in spark.sql("SELECT * FROM late_out").collect()
    }
    assert got.get(("2024-01-01 00:00:00", "a")) == (1, 1.0)  # late row excluded


def test_streaming_dedup_within_watermark(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    _write_events(
        src / "a.json",
        [
            (7, "2024-01-01 00:10:00", 1, "a", 1.0),
            (7, "2024-01-01 00:10:00", 1, "a", 1.0),  # duplicate delivery
            (8, "2024-01-01 00:30:00", 1, "a", 2.0),
        ],
    )
    stream = events_file_stream(spark, str(src))
    run_to_memory(dedup_within_watermark(stream), "dedup_out")
    rows = spark.sql("SELECT event_id FROM dedup_out").collect()
    assert sorted(r.event_id for r in rows) == [7, 8]


def test_stateful_running_totals(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    _write_events(
        src / "a.json",
        [
            (0, "2024-01-01 00:00:00", 1, "a", 1.0),
            (1, "2024-01-01 00:01:00", 1, "a", 2.0),
            (2, "2024-01-01 00:02:00", 2, "b", 5.0),
        ],
    )
    stream = events_file_stream(spark, str(src))
    run_to_memory(running_totals_stateful(stream), "state_out", output_mode="update")
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM state_out").collect()
    }
    assert got == {1: (2, 3.0), 2: (1, 5.0)}


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


import pytest  # noqa: E402


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas needs google.protobuf (not in this env); "
    "applyInPandasWithState variant covers T10",
)
def test_stateful_tws_running_totals(spark, tmp_path):
    """Spark 4 transformWithStateInPandas variant of T10."""
    from spark_streaming_with_debezium_spark.streaming.jobs import running_totals_tws

    src = tmp_path / "ev"
    src.mkdir()
    _write_events(
        src / "a.json",
        [
            (0, "2024-01-01 00:00:00", 1, "a", 1.0),
            (1, "2024-01-01 00:01:00", 1, "a", 2.0),
            (2, "2024-01-01 00:02:00", 2, "b", 5.0),
        ],
    )
    stream = events_file_stream(spark, str(src))
    run_to_memory(running_totals_tws(stream), "tws_out", output_mode="update")
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM tws_out").collect()
    }
    assert got == {1: (2, 3.0), 2: (1, 5.0)}


def test_rate_source_and_console_sink(spark, capfd):
    """S8 + rate source: drive a tiny rate stream into the console sink."""
    from spark_streaming_with_debezium_spark.streaming.jobs import (
        rate_source,
        run_to_console,
    )

    df = rate_source(spark, rows_per_second=5).selectExpr(
        "value", "value * 2 AS doubled"
    )
    import time

    time.sleep(1.5)  # let the source accumulate a few rows
    run_to_console(df)
    # console sink writes to the JVM's stdout; just assert clean completion


def test_sliding_window_stream(spark, tmp_path):
    """T6 sliding (2h window, 1h slide) as a real stream: each event
    lands in two windows; closed windows match hand computation."""
    src = tmp_path / "ev"
    src.mkdir()
    import time as _time

    _write_events(
        src / "a.json",
        [
            (0, "2024-01-01 00:30:00", 1, "a", 1.0),
            (1, "2024-01-01 01:15:00", 1, "a", 2.0),
        ],
    )
    _time.sleep(1.1)
    _write_events(src / "b.json", [(2, "2024-01-01 10:00:00", 1, "a", 4.0)])
    stream = events_file_stream(spark, str(src))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "2 hours", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .select(F.col("window.start").alias("ws"), "n", "v")
    )
    run_to_memory(agg, "slide_out")
    got = {str(r.ws): (r.n, r.v) for r in spark.sql("SELECT * FROM slide_out").collect()}
    # closed by the 10:00 event's watermark (09:00): windows starting
    # 23:00 (covers 00:30), 00:00 (00:30+01:15), 01:00 (01:15)
    assert got == {
        "2023-12-31 23:00:00": (1, 1.0),
        "2024-01-01 00:00:00": (2, 3.0),
        "2024-01-01 01:00:00": (1, 2.0),
    }


def test_neardup_dedup_stream(spark, tmp_path):
    """Ingest-time near-dup suppression: batch 2's near-copy and exact
    copy of accepted batch-1 docs are dropped, the novel doc survives,
    and within-batch dups keep the lowest doc_id. Driven as a real
    file-source stream with checkpointed foreachBatch."""
    import time

    from spark_streaming_with_debezium_spark.streaming.neardup import (
        SignatureStore,
        run_neardup_dedup_stream,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the rain "
        "falls gently on the quiet village roofs at dusk tonight"
    )
    novel = (
        "completely different content about distributed query engines "
        "processing parquet files with vectorized readers at scale"
    )
    src = tmp_path / "docs"
    src.mkdir()

    def write_batch(name, rows):
        with open(src / name, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    store = SignatureStore(spark, str(tmp_path / "sigstore"))
    out = str(tmp_path / "kept")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: two distinct docs + an in-batch exact dup of doc 1
    write_batch("b1.json", [(1, base), (2, novel), (3, base)])
    stream = spark.readStream.schema(schema).json(str(src))
    run_neardup_dedup_stream(stream, store, out, ckpt).awaitTermination()
    kept1 = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert kept1 == [1, 2], f"batch1 survivors wrong: {kept1}"

    # batch 2: near-dup of doc 1 (one word changed), exact dup of doc 2,
    # and a novel doc
    near = base.replace("lazy", "sleepy")
    fresh = (
        "yet another unrelated document listing prime numbers and "
        "their curious distribution across large integer ranges"
    )
    time.sleep(1.1)  # distinct mod-time => new file seen by the stream
    write_batch("b2.json", [(10, near), (11, novel), (12, fresh)])
    stream2 = spark.readStream.schema(schema).json(str(src))
    run_neardup_dedup_stream(stream2, store, out, ckpt).awaitTermination()
    kept2 = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert kept2 == [1, 2, 12], f"batch2 survivors wrong: {kept2}"


def test_neardup_batch_replay_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running a batch whose
    signatures already committed must derive the SAME survivors (the
    probe excludes self-matches) and must not double-insert signatures
    into the store."""
    from spark_streaming_with_debezium_spark.streaming.neardup import (
        SignatureStore,
        dedup_batch_against_store,
    )

    # long enough that a 1-word edit keeps shingle-jaccard ~0.85 (LSH
    # candidate probability ≈ 1 at 8 bands × 4 rows)
    a = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda "
        "mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    )
    b = (
        "one two three four five six seven eight nine ten eleven twelve "
        "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    )
    near_a = a.replace("delta", "knife")
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, near_a)], "doc_id long, text string"
    )
    store = SignatureStore(spark, str(tmp_path / "sigs"))

    kept1 = sorted(
        r.doc_id for r in dedup_batch_against_store(docs, store).collect()
    )
    assert kept1 == [1, 2], f"first run survivors wrong: {kept1}"
    n_store1 = spark.read.parquet(store.path).count()

    # replay the SAME batch against the already-mutated store
    kept2 = sorted(
        r.doc_id for r in dedup_batch_against_store(docs, store).collect()
    )
    assert kept2 == kept1, f"replay diverged: {kept2} vs {kept1}"
    n_store2 = spark.read.parquet(store.path).count()
    assert n_store2 == n_store1, (
        f"replay duplicated store rows: {n_store1} -> {n_store2}"
    )


def test_neardup_partial_append_replay_heals_bands(spark, tmp_path):
    """A crashed store.append can commit only SOME of a doc's band rows
    (parquet multi-file commit is not atomic). Replay must re-insert the
    MISSING bands — a doc_id-level anti-join would skip the doc forever
    and leave it under-banded (r3 advice)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from spark_streaming_with_debezium_spark.streaming.neardup import (
        SignatureStore,
        dedup_batch_against_store,
    )

    a = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda "
        "mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    )
    b = (
        "one two three four five six seven eight nine ten eleven twelve "
        "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    )
    docs = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    store = SignatureStore(spark, str(tmp_path / "sigs"))
    dedup_batch_against_store(docs, store).collect()
    full = spark.read.parquet(store.path)
    bands_doc1 = full.filter(F.col("doc_id") == 1).count()
    assert bands_doc1 == 8, f"expected 8 band rows for doc 1: {bands_doc1}"

    # simulate the partial commit: drop doc 1's bands >= 4 from the store
    pruned = full.filter(~((F.col("doc_id") == 1) & (F.col("band") >= 4)))
    tmp_store = str(tmp_path / "sigs_rewrite")
    pruned.repartition("_bdir").write.partitionBy("_bdir").parquet(tmp_store)
    shutil.rmtree(store.path)
    os.rename(tmp_store, store.path)
    assert spark.read.parquet(store.path).filter(F.col("doc_id") == 1).count() == 4

    # replay the same batch: missing bands are re-inserted, nothing dupes
    dedup_batch_against_store(docs, store).collect()
    healed = spark.read.parquet(store.path)
    per_doc = {
        r.doc_id: r.n
        for r in healed.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_doc == {1: 8, 2: 8}, f"band rows after heal: {per_doc}"
    assert (
        healed.select("doc_id", "band").distinct().count() == healed.count()
    ), "duplicate (doc_id, band) rows after replay"


def test_signature_store_compact_and_crash_recovery(spark, tmp_path):
    """compact() swaps partitions via rename-aside; a crash between the
    renames leaves the old partition parked, and the next
    SignatureStore() restores it — accepted signatures are never lost
    (r3 advice: the old rmtree-then-move could drop a partition)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from spark_streaming_with_debezium_spark.streaming.neardup import (
        SignatureStore,
        dedup_batch_against_store,
    )

    words = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda "
        "mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega",
        "one two three four five six seven eight nine ten eleven twelve "
        "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty",
        "red orange yellow green blue indigo violet crimson amber teal "
        "maroon olive navy coral salmon beige ivory pearl slate onyx",
    ]
    store = SignatureStore(spark, str(tmp_path / "sigs"))
    for i, w in enumerate(words):
        docs = spark.createDataFrame([(i * 10 + 1, w)], "doc_id long, text string")
        dedup_batch_against_store(docs, store).collect()
    before = sorted(
        tuple(r) for r in spark.read.parquet(store.path)
        .select("doc_id", "band", "bucket").collect()
    )

    # normal compact: content identical, no aside/tmp leftovers
    store.compact(min_files=2)
    after = sorted(
        tuple(r) for r in spark.read.parquet(store.path)
        .select("doc_id", "band", "bucket").collect()
    )
    assert after == before, "compact changed store content"
    assert not os.path.isdir(store.path + "_aside")

    # crash between the renames: park one live partition in the aside
    # root (exactly the state after os.rename(dst, parked))
    part = next(
        d for d in os.listdir(store.path) if d.startswith("_bdir=")
    )
    aside_root = store.path + "_aside"
    os.makedirs(aside_root, exist_ok=True)
    os.rename(
        os.path.join(store.path, part), os.path.join(aside_root, part)
    )
    store2 = SignatureStore(spark, store.path)  # recovery sweep runs
    restored = sorted(
        tuple(r) for r in spark.read.parquet(store2.path)
        .select("doc_id", "band", "bucket").collect()
    )
    assert restored == before, "recovery lost the parked partition"
    assert not os.path.isdir(aside_root)

    # crash after the swap (live + stale aside copy): aside is swept
    os.makedirs(aside_root, exist_ok=True)
    shutil.copytree(
        os.path.join(store.path, part), os.path.join(aside_root, part)
    )
    SignatureStore(spark, store.path)
    assert not os.path.isdir(aside_root)
    final = sorted(
        tuple(r) for r in spark.read.parquet(store.path)
        .select("doc_id", "band", "bucket").collect()
    )
    assert final == before


def test_cdc_stream_with_neardup_suppression(spark, tmp_path):
    """CDC ingest + near-dup suppression composed in ONE foreachBatch
    (run_cdc_stream(neardup_store=...)): batch 2's near-copy of an
    accepted batch-1 document never enters state, a novel doc does,
    deletes pass through, and checkpoint restart applies only new
    files."""
    import time

    from spark_streaming_with_debezium_spark.streaming.neardup import (
        SignatureStore,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the rain "
        "falls gently on the quiet village roofs at dusk tonight"
    )
    novel = (
        "completely different content about distributed query engines "
        "processing parquet files with vectorized readers at scale"
    )
    spec = TableSpec(
        name="docs",
        key_cols=("id",),
        value_schema=T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("body", T.StringType()),
            ]
        ),
    )

    def env(op, i, off, body=None):
        after = None if op == "d" else {"id": i, "body": body}
        return json.dumps(
            {
                "key": json.dumps({"payload": {"id": i}}),
                "value": json.dumps(
                    {
                        "payload": {
                            "before": {"id": i} if op in ("d", "u") else None,
                            "after": after,
                            "source": {"ts_ms": 1},
                            "op": op,
                            "ts_ms": 1,
                        }
                    }
                ),
                "partition": 0,
                "offset": off,
            }
        )

    src = tmp_path / "src"
    src.mkdir()
    # batch 1: two distinct docs + an in-batch exact dup of doc 1
    (src / "b1.json").write_text(
        "\n".join(
            [env("c", 1, 0, base), env("c", 2, 1, novel), env("c", 3, 2, base)]
        )
    )
    state = ParquetStateTable(spark, str(tmp_path / "state"), ["id"], n_buckets=4)
    state.init(spark.createDataFrame([], "id long, body string"))
    store = SignatureStore(spark, str(tmp_path / "sigs"))
    ckpt = str(tmp_path / "ckpt")

    stream = spark.readStream.schema(RAW_SCHEMA).json(str(src))
    run_cdc_stream(
        stream, spec, state, ckpt,
        neardup_store=store, neardup_text_col="body",
    ).awaitTermination()
    assert sorted(r.id for r in state.read().collect()) == [1, 2]

    # batch 2: near-dup of doc 1 (suppressed), novel doc (kept),
    # delete of doc 2 (passes through)
    near = base.replace("lazy", "sleepy")
    fresh = (
        "yet another unrelated document listing prime numbers and "
        "their curious distribution across large integer ranges"
    )
    time.sleep(1.1)
    (src / "b2.json").write_text(
        "\n".join([env("c", 10, 3, near), env("c", 11, 4, fresh), env("d", 2, 5)])
    )
    stream2 = spark.readStream.schema(RAW_SCHEMA).json(str(src))
    run_cdc_stream(
        stream2, spec, state, ckpt,
        neardup_store=store, neardup_text_col="body",
    ).awaitTermination()
    assert sorted(r.id for r in state.read().collect()) == [1, 11]


def test_stream_interval_join_matches_batch(spark, tmp_path):
    """The watermarked stream-stream interval join must emit exactly
    the pairs the batch form computes over the same rows — driven as
    two real file-source streams, multi-file so the join spans
    micro-batches."""
    from spark_streaming_with_debezium_spark.streaming.jobs import (
        interval_join_streams,
    )

    rows1 = [
        (1, "2024-01-01 00:00:00", 1, "view", 1.0),
        (2, "2024-01-01 00:10:00", 1, "click", 1.0),  # +10m: match
        (3, "2024-01-01 00:05:00", 2, "view", 1.0),
        (4, "2024-01-01 01:00:00", 2, "click", 1.0),  # +55m: no match
    ]
    rows2 = [
        (5, "2024-01-01 00:20:00", 1, "click", 1.0),  # +20m: 2nd match, x-batch
        (6, "2024-01-01 00:00:00", 3, "click", 1.0),  # click before any view
        (7, "2024-01-01 00:30:00", 3, "view", 1.0),
        (8, "2024-01-01 09:00:00", 9, "view", 1.0),   # watermark driver
    ]
    src = tmp_path / "ev"
    src.mkdir()
    _write_events(src / "b1.json", rows1)
    _write_events(src / "b2.json", rows2)

    views = events_file_stream(spark, str(src)).filter(
        F.col("event_type") == "view"
    )
    clicks = events_file_stream(spark, str(src)).filter(
        F.col("event_type") == "click"
    )
    run_to_memory(
        interval_join_streams(views, clicks), "ij_out", output_mode="append"
    )
    got = sorted(
        (r.user_id, r.view_id, r.click_id, r.gap_sec)
        for r in spark.sql("SELECT * FROM ij_out").collect()
    )
    # batch expectation over the same rows
    all_rows = rows1 + rows2
    e = spark.createDataFrame(
        [(i, t, u, k, v, "{}") for i, t, u, k, v in all_rows],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    v = e.filter(F.col("event_type") == "view")
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("cid"),
        F.col("ts").alias("cts"),
    )
    exp = sorted(
        (r.user_id, r.event_id, r.cid, r.gap)
        for r in v.join(
            c,
            (F.col("user_id") == F.col("cu"))
            & (F.col("cts") > F.col("ts"))
            & (F.col("cts") <= F.col("ts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .withColumn(
            "gap", F.unix_timestamp("cts") - F.unix_timestamp("ts")
        )
        .collect()
    )
    assert got == exp and len(got) == 2, f"stream={got} batch={exp}"


def test_stream_interval_join_left_outer_emits_unmatched(spark, tmp_path):
    """left_outer stream-stream join: a view with no click in its
    30-minute window emits with null click columns once the watermark
    passes its window AND a subsequent micro-batch runs (outer-null
    emission happens one batch after the watermark advance)."""
    from spark_streaming_with_debezium_spark.streaming.jobs import (
        interval_join_streams,
    )

    rows1 = [
        (1, "2024-01-01 00:00:00", 1, "view", 1.0),
        (2, "2024-01-01 00:10:00", 1, "click", 1.0),  # match for view 1
        (3, "2024-01-01 00:00:00", 2, "view", 1.0),   # never clicked
    ]
    rows2 = [(8, "2024-01-01 09:00:00", 9, "view", 1.0)]   # watermark driver
    rows3 = [(9, "2024-01-01 09:00:01", 9, "click", 1.0)]  # post-advance batch
    src = tmp_path / "ev"
    src.mkdir()
    _write_events(src / "b1.json", rows1)
    _write_events(src / "b2.json", rows2)
    _write_events(src / "b3.json", rows3)

    views = events_file_stream(spark, str(src)).filter(
        F.col("event_type") == "view"
    )
    clicks = events_file_stream(spark, str(src)).filter(
        F.col("event_type") == "click"
    )
    run_to_memory(
        interval_join_streams(views, clicks, watermark="1 hour", how="left_outer"),
        "ij_outer",
        output_mode="append",
    )
    rows = spark.sql("SELECT * FROM ij_outer").collect()
    matched = sorted(
        (r.user_id, r.view_id, r.click_id) for r in rows if r.click_id is not None
    )
    unmatched = sorted(
        (r.user_id, r.view_id) for r in rows if r.click_id is None
    )
    assert (1, 1, 2) in matched, f"inner match missing: {matched}"
    assert (2, 3) in unmatched, f"unmatched view not emitted: {unmatched}"


def test_stream_static_enrich_matches_batch(spark, tmp_path):
    """Stream-static join: a file-source event stream enriched with a
    static dimension must produce exactly the batch join's rows, with
    the static side re-resolved per micro-batch (multi-file input)."""
    from spark_streaming_with_debezium_spark.streaming.jobs import (
        enrich_stream_with_dim,
        events_file_stream,
        run_to_memory,
    )

    rows1 = [
        (1, "2024-01-01 00:00:00", 1, "view", 1.0),
        (2, "2024-01-01 00:10:00", 2, "click", 2.0),
        (3, "2024-01-01 00:20:00", 9, "view", 3.0),  # no dim row
    ]
    rows2 = [
        (4, "2024-01-01 01:00:00", 1, "click", 4.0),
        (5, "2024-01-01 01:10:00", 3, "view", 5.0),
    ]
    src = tmp_path / "ev"
    src.mkdir()
    _write_events(src / "b1.json", rows1)
    _write_events(src / "b2.json", rows2)

    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver"), (3, "bronze")], ["user_id", "tier"]
    )
    stream = events_file_stream(spark, str(src))
    run_to_memory(
        enrich_stream_with_dim(stream, dim, "user_id", how="left"),
        "enrich_out",
        output_mode="append",
    )
    got = sorted(
        (r.event_id, r.user_id, r.tier)
        for r in spark.sql("SELECT event_id, user_id, tier FROM enrich_out").collect()
    )
    assert got == [
        (1, 1, "gold"),
        (2, 2, "silver"),
        (3, 9, None),
        (4, 1, "gold"),
        (5, 3, "bronze"),
    ]


def test_stateful_sessionize_event_time_timeout(spark, tmp_path):
    """Sessions close exactly once: by a post-gap successor event
    (data-driven) or by the watermark passing end+gap (event-time
    TIMEOUT — the state-expiry mechanism no other stateful test
    exercises). Three files = three micro-batches so the watermark
    advances between arrivals."""
    from spark_streaming_with_debezium_spark.streaming.jobs import (
        sessionize_stateful,
    )

    src = tmp_path / "ev"
    src.mkdir()
    _write_events(
        src / "b1.json",
        [
            (0, "2024-01-01 00:00:00", 1, "a", 1.0),
            (1, "2024-01-01 00:10:00", 1, "a", 1.0),  # same session
            (2, "2024-01-01 00:05:00", 2, "a", 1.0),
        ],
    )
    _write_events(
        src / "b2.json",
        [
            # >30 min after u1's last event: closes session 1 in-batch
            (3, "2024-01-01 02:00:00", 1, "a", 1.0),
            # in-watermark LATE arrival, older than u2's stored last
            # event: must extend session_start backward, not regress
            # session_end (the cross-batch out-of-order path)
            (6, "2024-01-01 00:02:00", 2, "a", 1.0),
            # TWO late events predating u8's 03:30 session (below) by
            # more than the gap but within the gap of EACH OTHER: must
            # emit as ONE late session, not two singletons
            (7, "2024-01-01 00:40:00", 8, "a", 1.0),
            (8, "2024-01-01 00:50:00", 8, "a", 1.0),
            (4, "2024-01-01 06:00:00", 7, "a", 1.0),  # watermark driver
        ],
    )
    _write_events(
        # wm after b2 = 06:00 - 2h = 04:00 > all open session ends + gap:
        # u1's second session and u2's session close by TIMEOUT here
        src / "b3.json",
        [(5, "2024-01-01 10:00:00", 99, "a", 1.0)],
    )
    # u8's stored session arrives in b1-position: rewrite b1 to include
    # it (simplest deterministic placement), then pin EXPLICIT mtimes —
    # the file source orders batches by modification time, and
    # wall-clock sleeps break on coarse-mtime filesystems
    _write_events(
        src / "b1.json",
        [
            (0, "2024-01-01 00:00:00", 1, "a", 1.0),
            (1, "2024-01-01 00:10:00", 1, "a", 1.0),  # same session
            (2, "2024-01-01 00:05:00", 2, "a", 1.0),
            (9, "2024-01-01 03:30:00", 8, "a", 1.0),
        ],
    )
    now = time.time()
    os.utime(src / "b1.json", (now - 4, now - 4))
    os.utime(src / "b2.json", (now - 2, now - 2))
    os.utime(src / "b3.json", (now, now))
    stream = events_file_stream(spark, str(src))
    run_to_memory(sessionize_stateful(stream), "sess_out", output_mode="update")
    got = sorted(
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in spark.sql("SELECT * FROM sess_out").collect()
    )
    # u7 (06:00) also times out once b3 pushes the watermark to 08:00;
    # u99 (10:00, timeout 10:30 > 08:00) correctly stays open/unemitted;
    # u8's two late events (00:40, 00:50) group into ONE emitted late
    # session while its 03:30 session times out separately
    assert got == [
        (1, "2024-01-01 00:00:00", "2024-01-01 00:10:00", 2),
        (1, "2024-01-01 02:00:00", "2024-01-01 02:00:00", 1),
        (2, "2024-01-01 00:02:00", "2024-01-01 00:05:00", 2),
        (7, "2024-01-01 06:00:00", "2024-01-01 06:00:00", 1),
        (8, "2024-01-01 00:40:00", "2024-01-01 00:50:00", 2),
        (8, "2024-01-01 03:30:00", "2024-01-01 03:30:00", 1),
    ], got


def test_streaming_heavy_hitters_bounded_state(spark, tmp_path):
    """Bucketed Misra-Gries in stream state: counts are exact while a
    bucket's vocabulary fits in k (batch 1+2 accumulate across
    micro-batches), and under overflow (k=2, 1 bucket) the summary
    keeps the true majority token with a lower-bound count — bounded
    state regardless of vocabulary size."""
    from spark_streaming_with_debezium_spark.streaming.jobs import (
        streaming_heavy_hitters,
    )

    src = tmp_path / "ev"
    src.mkdir()
    # exact phase: 3 distinct types, plenty of counter room
    _write_events(
        src / "b1.json",
        [(i, "2024-01-01 00:00:00", 1, t, 1.0)
         for i, t in enumerate(["a", "a", "b", "c"])],
    )
    _write_events(
        src / "b2.json",
        [(10 + i, "2024-01-01 00:01:00", 1, t, 1.0)
         for i, t in enumerate(["a", "b"])],
    )
    now = time.time()
    os.utime(src / "b1.json", (now - 2, now - 2))
    os.utime(src / "b2.json", (now, now))
    stream = events_file_stream(spark, str(src))
    run_to_memory(
        streaming_heavy_hitters(stream, n_buckets=1, k_per_bucket=16),
        "hh_out",
        output_mode="update",
    )
    rows = spark.sql("SELECT * FROM hh_out").collect()
    # last emission per token (update mode re-emits the summary)
    final = {}
    for r in rows:
        final[r.token] = max(final.get(r.token, 0), r.min_count)
    assert final == {"a": 3, "b": 2, "c": 1}

    # overflow phase: k=2 with 4 distinct types; majority token must
    # survive with a positive lower bound <= true count
    src2 = tmp_path / "ev2"
    src2.mkdir()
    seq = ["x"] * 8 + ["y", "z", "w", "y", "z", "w"]
    _write_events(
        src2 / "b1.json",
        [(i, "2024-01-01 00:00:00", 1, t, 1.0) for i, t in enumerate(seq)],
    )
    stream2 = events_file_stream(spark, str(src2))
    run_to_memory(
        streaming_heavy_hitters(stream2, n_buckets=1, k_per_bucket=2),
        "hh_out2",
        output_mode="update",
    )
    got = {
        r.token: r.min_count for r in spark.sql("SELECT * FROM hh_out2").collect()
    }
    assert "x" in got and 0 < got["x"] <= 8
    assert len(got) <= 2  # state bounded at k counters


def test_stream_static_enrich_picks_up_dim_refresh(spark, tmp_path):
    """The static side of a stream-static join is re-resolved from its
    path, so a rewritten dimension serves the NEW attributes to rows
    processed after the refresh — no stream-side state, no plan
    rebuild beyond restart (parquet sink + checkpoint)."""
    from spark_streaming_with_debezium_spark.streaming.jobs import (
        enrich_stream_with_dim,
    )

    dimp = str(tmp_path / "dim")
    spark.createDataFrame([(1, "gold")], "user_id long, tier string").write.mode(
        "overwrite"
    ).parquet(dimp)
    src = tmp_path / "ev"
    src.mkdir()
    _write_events(src / "b1.json", [(0, "2024-01-01 00:00:00", 1, "a", 1.0)])
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain():
        stream = events_file_stream(spark, str(src))
        enriched = enrich_stream_with_dim(
            stream, spark.read.parquet(dimp), "user_id", how="left"
        ).select("event_id", "user_id", "tier")
        q = (
            enriched.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    # refresh the dimension, then deliver a second file
    spark.createDataFrame(
        [(1, "platinum")], "user_id long, tier string"
    ).write.mode("overwrite").parquet(dimp)
    _write_events(src / "b2.json", [(1, "2024-01-01 01:00:00", 1, "a", 1.0)])
    drain()

    got = {
        (r.event_id, r.tier) for r in spark.read.parquet(out).collect()
    }
    assert got == {(0, "gold"), (1, "platinum")}


def test_trending_topk_stream_matches_hand_computation(spark, tmp_path):
    """The foreachBatch-ranked trending top-k stream (the streaming
    face of the `stream_trending_topk` query) emits, for every CLOSED
    sliding window, the same ranked rows the batch expressions
    produce — asserted against a hand computation, including the
    deciding tie-break on event_type."""
    from spark_streaming_with_debezium_spark.streaming.jobs import (
        trending_topk_stream,
    )

    src = tmp_path / "ev"
    src.mkdir()
    out = tmp_path / "topk"
    _write_events(
        src / "a.json",
        [
            (0, "2024-01-01 00:10:00", 1, "a", 1.0),
            (1, "2024-01-01 00:15:00", 1, "b", 1.0),
            (2, "2024-01-01 00:20:00", 2, "a", 1.0),
            (3, "2024-01-01 00:25:00", 3, "c", 1.0),
            (4, "2024-01-01 00:40:00", 1, "a", 1.0),
            (5, "2024-01-01 01:10:00", 1, "b", 1.0),
            (6, "2024-01-01 01:20:00", 2, "b", 1.0),
            (7, "2024-01-01 01:30:00", 1, "a", 1.0),
        ],
    )
    import time as _time

    _time.sleep(1.1)
    # advances the watermark to 09:00, closing every window above
    _write_events(src / "b.json", [(8, "2024-01-01 10:00:00", 1, "d", 1.0)])
    stream = events_file_stream(spark, str(src))
    trending_topk_stream(stream, str(out), k=3)
    got = {
        (str(r.window_start), r.rn): (r.event_type, r.n)
        for r in spark.read.parquet(str(out)).collect()
    }
    # hour-00 rows: a=3, b=1, c=1; hour-01 rows: b=2, a=1.
    # closed 2h windows: 23:00 (hour-00 only), 00:00 (00+01), 01:00
    # (hour-01 only). Ties (b=1, c=1) break alphabetically.
    assert got == {
        ("2023-12-31 23:00:00", 1): ("a", 3),
        ("2023-12-31 23:00:00", 2): ("b", 1),
        ("2023-12-31 23:00:00", 3): ("c", 1),
        ("2024-01-01 00:00:00", 1): ("a", 4),
        ("2024-01-01 00:00:00", 2): ("b", 3),
        ("2024-01-01 00:00:00", 3): ("c", 1),
        ("2024-01-01 01:00:00", 1): ("b", 2),
        ("2024-01-01 01:00:00", 2): ("a", 1),
    }


def test_attribution_stateful_carries_touch_across_batches(spark, tmp_path):
    """The stateful last-touch attributor must credit a purchase in a
    LATER micro-batch to a touch seen in an EARLIER one (per-user
    state), attribute untouched purchases to 'direct', and follow the
    in-batch (ts, event_id) order."""
    from spark_streaming_with_debezium_spark.streaming.jobs import (
        attribution_stateful,
    )

    src = tmp_path / "ev"
    src.mkdir()
    _write_events(
        src / "a.json",
        [
            (0, "2024-01-01 00:10:00", 1, "view", 0.0),
            (1, "2024-01-01 00:20:00", 1, "purchase", 10.0),
            (2, "2024-01-01 00:30:00", 1, "click", 0.0),
            (3, "2024-01-01 00:05:00", 2, "purchase", 7.0),
        ],
    )
    import time as _time

    _time.sleep(1.1)
    # batch 2: u1's purchase must see the click carried from batch 1
    _write_events(
        src / "b.json",
        [
            (4, "2024-01-01 00:40:00", 1, "purchase", 20.0),
            (5, "2024-01-01 00:50:00", 2, "signup", 0.0),
            (6, "2024-01-01 00:55:00", 2, "purchase", 5.0),
        ],
    )
    stream = events_file_stream(spark, str(src))
    run_to_memory(attribution_stateful(stream), "attr_out", "update")
    got = {
        r.event_id: (r.user_id, r.channel, r.value)
        for r in spark.sql("SELECT * FROM attr_out").collect()
    }
    assert got == {
        1: (1, "view", 10.0),
        3: (2, "direct", 7.0),
        4: (1, "click", 20.0),
        6: (2, "signup", 5.0),
    }


def test_cdc_offset_gap_recovery_broker_shaped(spark, tmp_path):
    """Broker-shaped offset-gap recovery (VERDICT r7 item 6), the
    `StreamingIT.scala:104-129` scenario on the file-backed envelope
    source: snapshot (r, r) bootstraps state, binlog (c, c) drains
    through a checkpoint, then the stream "loses" offsets 12-19
    upstream (retention expiry — the already-processed input file also
    disappears, as an expired Kafka segment would) and RESTARTS on the
    same checkpoint with post-gap events (u, d) plus one LATE straggler
    from inside the gap. failOnDataLoss=false semantics: the restart
    must not fail on the missing processed input, must apply only the
    new events, and LWW order must follow (partition, offset) ACROSS
    the gap so the straggler cannot beat the post-gap update. Final
    state must equal the golden exactly."""
    src = tmp_path / "src"
    src.mkdir()
    state = ParquetStateTable(spark, str(tmp_path / "state"), ["id"], n_buckets=4)
    ckpt = str(tmp_path / "ckpt")

    # snapshot bootstrap (op='r'), the reference's initial-load job
    from spark_streaming_with_debezium_spark.cdc.pipeline import initial_load

    snap = spark.createDataFrame(
        [json.loads(_env("r", 1, 0)), json.loads(_env("r", 2, 1))], RAW_SCHEMA
    )
    initial_load(snap, SPEC, state)
    assert sorted(r.id for r in state.read().collect()) == [1, 2]

    # binlog segment 1: offsets 10, 11
    (src / "b1.json").write_text(
        "\n".join([_env("c", 3, 10), _env("c", 4, 11)])
    )
    stream = spark.readStream.schema(RAW_SCHEMA).json(str(src))
    run_cdc_stream(stream, SPEC, state, ckpt).awaitTermination()
    assert sorted(r.id for r in state.read().collect()) == [1, 2, 3, 4]

    # upstream retention expires the processed segment AND offsets
    # 12-19 that this consumer never saw
    (src / "b1.json").unlink()
    (src / "b2.json").write_text(
        "\n".join(
            [
                _env("u", 3, 12, "stale-from-gap@x.com"),  # late straggler
                _env("u", 3, 20, "after-gap@x.com"),
                _env("d", 4, 21),
            ]
        )
    )
    stream2 = spark.readStream.schema(RAW_SCHEMA).json(str(src))
    run_cdc_stream(stream2, SPEC, state, ckpt).awaitTermination()

    final = {r.id: r.email for r in state.read().collect()}
    assert final == {
        1: "u1@x.com",
        2: "u2@x.com",
        3: "after-gap@x.com",  # offset 20 beats the offset-12 straggler
    }


def _envp(op, i, part, off, email=None):
    """Multi-partition variant of :func:`_env` (partition is pinned to
    0 there; the startingOffsets / interleave tests need real partition
    spread)."""
    row = json.loads(_env(op, i, off, email))
    row["partition"] = part
    return json.dumps(row)


def test_starting_offsets_per_partition_json(spark, tmp_path):
    """VERDICT r8 item 5: ``startingOffsets`` as a specific
    per-partition offsets JSON — the Kafka source option contract
    (`StreamingJobExecutor.scala:41-42`) on the file-backed envelope
    source. {"t":{"0":2,"1":-2,"2":-1}} must start partition 0 at
    offset 2 (skipping 0-1), take ALL of partition 1 (earliest), none
    of partition 2 (latest) — and an UNLISTED partition 3 defaults to
    latest (dropped), exactly as the Kafka source documents."""
    from spark_streaming_with_debezium_spark.cdc.pipeline import (
        apply_starting_offsets,
    )

    src = tmp_path / "src"
    src.mkdir()
    (src / "b.json").write_text(
        "\n".join(
            [
                _envp("c", 1, 0, 0),                 # p0 below start: skip
                _envp("u", 1, 0, 1, "skipped@x.com"),  # p0 below start: skip
                _envp("c", 2, 0, 2),                 # p0 at start: apply
                _envp("c", 3, 1, 0),                 # p1 earliest: apply
                _envp("u", 3, 1, 1, "u3b@x.com"),    # p1 earliest: apply
                _envp("c", 4, 2, 0),                 # p2 latest: skip
                _envp("c", 5, 3, 0),                 # p3 unlisted: skip
            ]
        )
    )
    state = ParquetStateTable(spark, str(tmp_path / "state"), ["id"], n_buckets=4)
    state.init(spark.createDataFrame([], "id long, email string"))
    stream = spark.readStream.schema(RAW_SCHEMA).json(str(src))
    positioned = apply_starting_offsets(
        stream, '{"t": {"0": 2, "1": -2, "2": -1}}', topic="t"
    )
    run_cdc_stream(positioned, SPEC, state, str(tmp_path / "ckpt")).awaitTermination()
    final = {r.id: r.email for r in state.read().collect()}
    # id=1 never applied (its create/update sat below p0's start);
    # id=2 applied; id=3 got BOTH p1 events (LWW -> the update);
    # id=4 (latest) and id=5 (unlisted) never applied.
    assert final == {2: "u2@x.com", 3: "u3b@x.com"}

    # the string forms keep their Kafka meaning
    all_rows = apply_starting_offsets(
        spark.read.schema(RAW_SCHEMA).json(str(src)), "earliest"
    ).count()
    assert all_rows == 7
    none_rows = apply_starting_offsets(
        spark.read.schema(RAW_SCHEMA).json(str(src)), "latest"
    ).count()
    assert none_rows == 0


def test_partition_interleave_order_independence(spark, tmp_path):
    """Out-of-order partition interleave (VERDICT r8 item 5): Kafka
    gives NO cross-partition ordering — two consumers seeing the same
    per-partition sequences in different interleavings must converge to
    the same state. Deliver the same 3-partition event set (a) grouped
    by partition and (b) scrambled across micro-batches with partitions
    interleaved; both final states must equal the golden, because LWW
    compaction orders by (partition, offset) within each key and the
    per-key sequence lives on one partition (Debezium keys by PK)."""
    golden = {1: "u1-final@x.com", 3: "u3@x.com", 4: "u4-final@x.com"}
    # per-partition sequences (key -> one partition, as Debezium routes)
    p0 = [_envp("c", 1, 0, 0), _envp("u", 1, 0, 1, "u1-final@x.com")]
    p1 = [_envp("c", 2, 1, 0), _envp("c", 3, 1, 1), _envp("d", 2, 1, 2)]
    p2 = [_envp("c", 4, 2, 0), _envp("u", 4, 2, 1, "u4-final@x.com")]

    def drain(batches):
        d = tmp_path / f"src{drain.n}"
        drain.n += 1
        d.mkdir()
        state = ParquetStateTable(
            spark, str(tmp_path / f"state{drain.n}"), ["id"], n_buckets=4
        )
        state.init(spark.createDataFrame([], "id long, email string"))
        ckpt = str(tmp_path / f"ckpt{drain.n}")
        for i, batch in enumerate(batches):
            (d / f"b{i}.json").write_text("\n".join(batch))
            stream = spark.readStream.schema(RAW_SCHEMA).json(str(d))
            run_cdc_stream(stream, SPEC, state, ckpt).awaitTermination()
        return {r.id: r.email for r in state.read().collect()}

    drain.n = 0
    # (a) partition-grouped delivery
    assert drain([p0, p1, p2]) == golden
    # (b) interleaved: batches mix partitions in a different global
    # order, and within a batch rows arrive scrambled — but each
    # partition's own offsets stay in order across batches, which is
    # exactly (and only) what Kafka guarantees a consumer.
    interleaved = [
        [p1[0], p1[1]],
        [p2[0], p0[0]],
        [p0[1], p2[1], p1[2]],  # in-batch scramble across 3 partitions
    ]
    assert drain(interleaved) == golden
    # (c) single-batch full scramble: all 7 events in one micro-batch,
    # file order inverted — in-batch LWW by (partition, offset) must
    # still pick each key's final image.
    assert drain([list(reversed(p0 + p1 + p2))]) == golden


def test_trending_topk_replay_idempotent(spark, tmp_path):
    """ADVICE r7: a replayed batch must not duplicate closed-window
    rows — the sink overwrites its window_start partitions dynamically,
    so draining the SAME input twice (no checkpoint = full replay)
    leaves the output byte-identical."""
    from spark_streaming_with_debezium_spark.streaming.jobs import (
        events_file_stream,
        trending_topk_stream,
    )

    src = tmp_path / "ev"
    src.mkdir()
    out = tmp_path / "topk"
    _write_events(
        src / "a.json",
        [
            (0, "2024-01-01 00:10:00", 1, "a", 1.0),
            (1, "2024-01-01 00:15:00", 1, "b", 1.0),
            (2, "2024-01-01 10:00:00", 1, "d", 1.0),
        ],
    )
    trending_topk_stream(events_file_stream(spark, str(src)), str(out), k=3)
    first = sorted(
        (str(r.window_start), r.rn, r.event_type, r.n)
        for r in spark.read.parquet(str(out)).collect()
    )
    assert first, "no closed windows emitted"
    # full replay: fresh stream over the same files, same output dir
    trending_topk_stream(events_file_stream(spark, str(src)), str(out), k=3)
    second = sorted(
        (str(r.window_start), r.rn, r.event_type, r.n)
        for r in spark.read.parquet(str(out)).collect()
    )
    assert second == first, "replay duplicated closed-window rows"


def test_rolling_hll_stream_matches_batch_and_replays_idempotently(
    spark, tmp_path
):
    """The incremental daily-HLL state (foreachBatch sketch fold) must
    serve the same 7-day rolling estimates as a one-shot batch sketch
    over the same rows, survive checkpointed restarts (only new files
    applied), and be IDEMPOTENT under full replay — HLL union is a
    set-semantics state machine, so duplicate delivery cannot inflate
    estimates."""
    from spark_streaming_with_debezium_spark.operators.sketches import (
        LG_CONFIG_K,
    )
    from spark_streaming_with_debezium_spark.streaming.jobs import (
        events_file_stream,
        rolling_hll_estimates,
        run_rolling_hll_stream,
    )

    src = tmp_path / "ev"
    src.mkdir()
    state = str(tmp_path / "hll_state")
    ckpt = str(tmp_path / "ckpt")
    rows1 = [
        (i, f"2024-01-0{1 + i % 3} 0{i % 10}:00:00", i % 7, "view", 1.0)
        for i in range(40)
    ]
    rows2 = [
        (100 + i, f"2024-01-0{4 + i % 2} 03:00:00", i % 11, "view", 1.0)
        for i in range(30)
    ]
    _write_events(src / "a.json", rows1)
    run_rolling_hll_stream(
        events_file_stream(spark, str(src), max_files_per_trigger=None),
        state,
        ckpt,
    )
    _write_events(src / "b.json", rows2)
    run_rolling_hll_stream(
        events_file_stream(spark, str(src), max_files_per_trigger=None),
        state,
        ckpt,
    )

    got = {
        str(r.day): r.est_users_7d
        for r in rolling_hll_estimates(spark, state).collect()
    }

    # batch reference over ALL rows with the same sketch machinery
    all_df = spark.read.schema(
        events_file_stream(spark, str(src)).schema
    ).json(str(src))
    daily = all_df.groupBy(F.to_date("ts").alias("day")).agg(
        F.expr(f"hll_sketch_agg(user_id, {LG_CONFIG_K})").alias("sk")
    )
    days = daily.select(F.col("day").alias("anchor"))
    ref = {
        str(r.day): r.est
        for r in days.join(
            F.broadcast(daily),
            (F.col("day") <= F.col("anchor"))
            & (F.col("day") >= F.date_sub(F.col("anchor"), 6)),
        )
        .groupBy("anchor")
        .agg(F.expr("hll_union_agg(sk)").alias("sk"))
        .select(
            F.col("anchor").alias("day"),
            F.expr("hll_sketch_estimate(sk)").alias("est"),
        )
        .collect()
    }
    assert set(got) == set(ref)
    for day, est in ref.items():
        # sketches built incrementally vs one-shot may differ only
        # within the HLL error bound (sparse->dense promotion)
        assert abs(got[day] - est) <= 0.05 * est + 1, day

    # full replay on a FRESH checkpoint re-unions every batch into the
    # existing state: estimates must not inflate (idempotent union)
    run_rolling_hll_stream(
        events_file_stream(spark, str(src), max_files_per_trigger=None),
        state,
        str(tmp_path / "ckpt2"),
    )
    replayed = {
        str(r.day): r.est_users_7d
        for r in rolling_hll_estimates(spark, state).collect()
    }
    assert replayed == got


def test_rolling_hll_state_swap_crash_recovery(spark, tmp_path):
    """ADVICE r8: the state swap must survive a crash at ANY point of
    the rename sequence. Simulate both crash windows and prove
    ``_recover_swapped_state`` restores a complete state copy: (a) state
    renamed away with a COMPLETE _tmp present (crash between the two
    renames) → _tmp wins; (b) state absent with a PARTIAL _tmp (no
    _SUCCESS; crash mid-write after an earlier swap moved state to
    _old) → _old wins and the junk _tmp is discarded. Then prove a
    replayed stream over the recovered state stays idempotent."""
    import os
    import shutil

    from spark_streaming_with_debezium_spark.streaming.jobs import (
        _recover_swapped_state,
        events_file_stream,
        rolling_hll_estimates,
        run_rolling_hll_stream,
    )

    src = tmp_path / "ev"
    src.mkdir()
    state = str(tmp_path / "hll_state")
    rows = [
        (i, f"2024-02-0{1 + i % 3} 0{i % 10}:00:00", i % 13, "view", 1.0)
        for i in range(50)
    ]
    _write_events(src / "a.json", rows)
    run_rolling_hll_stream(
        events_file_stream(spark, str(src), max_files_per_trigger=None),
        state,
        str(tmp_path / "ckpt"),
    )
    baseline = {
        str(r.day): r.est_users_7d
        for r in rolling_hll_estimates(spark, state).collect()
    }

    # (a) crash between rename(state→_old) and rename(_tmp→state):
    # both copies exist, _tmp is the newer committed merge and wins
    shutil.copytree(state, state + "_old")
    os.rename(state, state + "_tmp")
    assert os.path.exists(os.path.join(state + "_tmp", "_SUCCESS"))
    _recover_swapped_state(state)
    assert os.path.isdir(state)
    assert not os.path.isdir(state + "_tmp")
    assert not os.path.isdir(state + "_old")
    got = {
        str(r.day): r.est_users_7d
        for r in rolling_hll_estimates(spark, state).collect()
    }
    assert got == baseline

    # (b) crash mid-write: _tmp partial (no _SUCCESS), state already
    # swapped away to _old by a prior batch → _old restored, junk gone
    os.rename(state, state + "_old")
    os.makedirs(state + "_tmp")
    with open(os.path.join(state + "_tmp", "part-junk.parquet"), "w") as f:
        f.write("truncated")
    _recover_swapped_state(state)
    assert os.path.isdir(state)
    assert not os.path.isdir(state + "_tmp")
    assert not os.path.isdir(state + "_old")
    got = {
        str(r.day): r.est_users_7d
        for r in rolling_hll_estimates(spark, state).collect()
    }
    assert got == baseline

    # recovered state keeps serving the stream: full replay on a fresh
    # checkpoint must not inflate estimates (idempotent HLL union)
    run_rolling_hll_stream(
        events_file_stream(spark, str(src), max_files_per_trigger=None),
        state,
        str(tmp_path / "ckpt2"),
    )
    replayed = {
        str(r.day): r.est_users_7d
        for r in rolling_hll_estimates(spark, state).collect()
    }
    assert replayed == baseline


def test_cms_token_stream_exactly_once(spark, tmp_path, caplog):
    """Streaming CMS counter state (VERDICT/round-9 new face): unlike
    the idempotent HLL union, CMS cells merge by ADDITION, so replay
    safety needs the batch-id fence. Prove (a) two-batch incremental
    counters equal the one-shot batch sketch over the same rows
    exactly, (b) a replayed batch id is fenced (counters unchanged),
    (c) a full re-drain on a fresh checkpoint is fenced end-to-end,
    (d) the rename-swap crash recovery applies to this state too, and
    (e) point estimates obey the CMS contract (est >= exact count)."""
    import json as _json
    import os
    import shutil

    from spark_streaming_with_debezium_spark.llm.corpus_rules import (
        normalize_text,
    )
    from spark_streaming_with_debezium_spark.streaming.jobs import (
        _recover_swapped_state,
        cms_token_estimates,
        docs_file_stream,
        run_cms_token_stream,
    )

    src = tmp_path / "docs"
    src.mkdir()
    b1 = [(1, "the cat sat on the mat"), (2, "the dog ate the cat food")]
    b2 = [(3, "cat and dog and cat again"), (4, "mat cleaning instructions")]
    for name, rows in (("a.json", b1), ("b.json", b2)):
        (src / name).write_text(
            "\n".join(_json.dumps({"doc_id": i, "text": t}) for i, t in rows)
        )
    state = str(tmp_path / "cms_state")
    # maxFilesPerTrigger=1 -> two micro-batches (ids 0, 1)
    run_cms_token_stream(
        docs_file_stream(spark, str(src)), state, str(tmp_path / "ckpt")
    )
    cells = {
        (r.i, r.bucket): r.c for r in spark.read.parquet(state).collect()
    }

    # (a) equals the one-shot sketch over all rows
    from spark_streaming_with_debezium_spark.llm.dedup import _md5_60bit
    from spark_streaming_with_debezium_spark.operators.sketches import (
        _cms_hash_exprs,
    )

    all_docs = spark.createDataFrame(b1 + b2, "doc_id long, text string")
    toks = all_docs.select(
        F.explode(F.split(normalize_text("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    ref = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("h", _md5_60bit(F.col("tok")))
        .select(
            "cnt",
            F.posexplode(F.array(*_cms_hash_exprs(F.col("h")))).alias(
                "i", "bucket"
            ),
        )
        .groupBy("i", "bucket")
        .agg(F.sum("cnt").alias("c"))
    )
    assert cells == {(r.i, r.bucket): r.c for r in ref.collect()}

    # (b) re-running the stream with no new files: availableNow with
    # the same checkpoint plans zero batches — state untouched
    run_cms_token_stream(
        docs_file_stream(spark, str(src)), state, str(tmp_path / "ckpt")
    )
    assert cells == {
        (r.i, r.bucket): r.c for r in spark.read.parquet(state).collect()
    }

    # (c) full re-drain on a FRESH checkpoint restarts batch ids at 0,
    # which the fence rejects — counters must not double. ADVICE r9:
    # this silent-skip can be DATA LOSS in operation (fresh checkpoint
    # + genuinely new data), so the fence must also LOG the identity
    # change loudly enough to be detectable.
    import logging as _logging

    with caplog.at_level(
        _logging.WARNING,
        logger="spark_streaming_with_debezium_spark.streaming.jobs",
    ):
        run_cms_token_stream(
            docs_file_stream(spark, str(src)), state, str(tmp_path / "ckpt2")
        )
    assert cells == {
        (r.i, r.bucket): r.c for r in spark.read.parquet(state).collect()
    }
    assert any(
        "stream identity changed" in rec.message for rec in caplog.records
    ), "cross-identity fence must warn (checkpoint-reset detectability)"

    # (d) crash-window recovery: state renamed away with complete _tmp
    shutil.copytree(state, state + "_old")
    os.rename(state, state + "_tmp")
    _recover_swapped_state(state)
    assert os.path.isdir(state) and not os.path.isdir(state + "_tmp")
    assert cells == {
        (r.i, r.bucket): r.c for r in spark.read.parquet(state).collect()
    }

    # (e) point estimates from state alone: est >= exact, exact for
    # collision-free tokens in this tiny vocabulary
    est = {
        r.token: r.est_cnt
        for r in cms_token_estimates(
            spark, state, ["cat", "the", "dog", "absent-token"]
        ).collect()
    }
    exact = {
        r.tok: r.cnt
        for r in toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert est["cat"] >= exact["cat"] and est["the"] >= exact["the"]
    assert est["dog"] >= exact["dog"]
    assert est["absent-token"] >= 0
    # d*w = 4096 cells, ~20 tokens -> collisions vanishingly unlikely
    assert est["cat"] == exact["cat"] == 4
    assert est["the"] == exact["the"] == 4


def test_ivf_upsert_stream_matches_batch_and_replays(spark, tmp_path, sf_dir):
    """Streaming ANN index maintenance (round-9 new face): build the
    IVF index on a base corpus, stream two micro-batches of new AND
    changed vectors into it, and assert (a) search results equal an
    index that received the same rows as ONE batch upsert (same frozen
    centroids, so the comparison is exact), (b) a full re-drain on a
    fresh checkpoint leaves results identical (upsert LWW = replay
    idempotent), and (c) changed vectors really moved cells (no stale
    duplicate under the old cell)."""
    import json as _json

    from spark_streaming_with_debezium_spark.llm.ivf_index import IvfIndex
    from spark_streaming_with_debezium_spark.sources.tables import load_table
    from spark_streaming_with_debezium_spark.streaming.jobs import (
        run_ivf_upsert_stream,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 400)

    # two update batches: 4 brand-new ids + 2 CHANGED resident vectors
    # (vec 100/101 get vec 8/9's embeddings — likely different cells)
    donors = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id").isin([8, 9, 10, 11, 12, 13])).collect()
    }
    b1 = [(10_000, donors[10]), (10_001, donors[11]), (100, donors[8])]
    b2 = [(10_002, donors[12]), (10_003, donors[13]), (101, donors[9])]

    def write_batch(d, name, rows):
        (d / name).write_text(
            "\n".join(
                _json.dumps({"vec_id": i, "embedding": v}) for i, v in rows
            )
        )

    src = tmp_path / "vecs"
    src.mkdir()
    write_batch(src, "a.json", b1)
    write_batch(src, "b.json", b2)

    # streamed index
    s_path = str(tmp_path / "ivf_s")
    IvfIndex(spark, s_path).build(base)
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    run_ivf_upsert_stream(stream, s_path, str(tmp_path / "ckpt"))

    # batch reference: same base build + ONE upsert of all rows
    r_path = str(tmp_path / "ivf_r")
    IvfIndex(spark, r_path).build(base)
    all_rows = spark.createDataFrame(b1 + b2, schema)
    IvfIndex(spark, r_path).upsert(all_rows)

    queries = emb.filter(F.col("vec_id") < 4)

    def results(path):
        return {
            (r.query_id, r.vec_id, r.rnk)
            for r in IvfIndex(spark, path).search(queries, k=5, n_probe=5).collect()
        }

    got = results(s_path)
    assert got == results(r_path)

    # (c) no stale duplicates: each upserted id appears in exactly one cell
    rows = (
        spark.read.parquet(str(tmp_path / "ivf_s" / "cells"))
        .filter(F.col("vec_id").isin([100, 101, 10_000, 10_001, 10_002, 10_003]))
        .groupBy("vec_id")
        .count()
        .collect()
    )
    assert len(rows) == 6 and all(r["count"] == 1 for r in rows)

    # (b) full re-drain on a fresh checkpoint: byte-identical results
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    run_ivf_upsert_stream(stream2, s_path, str(tmp_path / "ckpt2"))
    assert results(s_path) == got


def test_ending_offsets_bounded_backfill(spark, tmp_path):
    """``endingOffsets`` dual of the startingOffsets contract: a
    bounded backfill reads a CLOSED (start, end] window per partition
    — end offsets are EXCLUSIVE (Kafka semantics), -1/unlisted read to
    latest — and replaying the same window twice is idempotent."""
    from spark_streaming_with_debezium_spark.cdc.pipeline import (
        apply_ending_offsets,
        apply_starting_offsets,
    )

    src = tmp_path / "src"
    src.mkdir()
    (src / "b.json").write_text(
        "\n".join(
            [
                _envp("c", 1, 0, 0),
                _envp("c", 2, 0, 1),
                _envp("c", 3, 0, 2),  # beyond p0's end: excluded
                _envp("c", 4, 1, 0),
                _envp("c", 5, 1, 1),  # p1 ends at -1 (latest): included
                _envp("c", 6, 2, 0),  # p2 unlisted in end spec: included
            ]
        )
    )
    raw = spark.read.schema(RAW_SCHEMA).json(str(src))
    window = apply_ending_offsets(
        apply_starting_offsets(
            raw, '{"t": {"0": 1, "1": -2, "2": -2}}', topic="t"
        ),
        '{"t": {"0": 2, "1": -1}}',
        topic="t",
    )
    # p0: offsets [1, 2) -> only offset 1 (id=2); p1: all; p2: all
    got = sorted(
        (r.partition, r.offset) for r in window.select("partition", "offset").collect()
    )
    assert got == [(0, 1), (1, 0), (1, 1), (2, 0)]

    # idempotent bounded replay: applying the same window to a state
    # table twice leaves the same rows (LWW upsert of identical batch)
    state = ParquetStateTable(spark, str(tmp_path / "state"), ["id"], n_buckets=4)
    state.init(spark.createDataFrame([], "id long, email string"))
    from spark_streaming_with_debezium_spark.cdc.pipeline import batch_apply

    batch_apply(window, SPEC, state)
    first = sorted((r.id, r.email) for r in state.read().collect())
    assert [i for i, _ in first] == [2, 4, 5, 6]
    batch_apply(window, SPEC, state)
    assert sorted((r.id, r.email) for r in state.read().collect()) == first
