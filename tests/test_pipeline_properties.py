"""Property tests for the round-4 pipeline operators — independent
Python references, not the SQL oracles (those are mirrored in
test_oracle_equivalence; these check the SEMANTICS hold against a
from-scratch reimplementation)."""

from pyspark.sql import functions as F

from spark_streaming_with_debezium_spark.llm.pipeline_ops import pack_sequences
from spark_streaming_with_debezium_spark.operators.more_relational import (
    events_sessionize_gap,
)
from spark_streaming_with_debezium_spark.sources.tables import load_table


def test_pack_sequences_offsets_are_contiguous(spark, sf_dir):
    """Walking docs per source in doc_id order, each doc must start
    exactly where the previous one ended: seq_id*2048 + seq_offset ==
    running token total so far."""
    rows = pack_sequences(spark, sf_dir).collect()
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    assert by_source
    for source, docs in by_source.items():
        docs.sort(key=lambda r: r.doc_id)
        running = 0
        for r in docs:
            assert r.seq_id * 2048 + r.seq_offset == running, (source, r)
            running += r.n_tokens


def test_sessionize_gap_boundaries(spark, sf_dir):
    """Within a session, consecutive event gaps are <= 30 min; every
    session's first event either opens the user's history or follows a
    gap > 30 min; session indexes are 1..n_sessions contiguous."""
    e = load_table(spark, sf_dir, "events")
    events = sorted(
        e.select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("usec"),
        ).collect(),
        # mirror the operator's window ordering: (ts, event_id)
        key=lambda r: (r.user_id, r.usec, r.event_id),
    )
    sessions = events_sessionize_gap(spark, sf_dir).collect()

    # independent reference: assign sessions by walking the stream
    ref = {}
    last_sec, idx = {}, {}
    for r in events:
        u = r.user_id
        # microsecond-precise gap, matching the operator (a whole-second
        # reference truncates 1800.5s gaps to 1800 and misses boundaries)
        if u not in last_sec or r.usec - last_sec[u] > 1800 * 1_000_000:
            idx[u] = idx.get(u, 0) + 1
        last_sec[u] = r.usec
        key = (u, idx[u])
        start, n = ref.get(key, (r.usec, 0))
        ref[key] = (min(start, r.usec), n + 1)

    got = {(s.user_id, s.session_idx): (s.n_events, s.duration_sec) for s in sessions}
    assert set(got) == set(ref)
    for key, (n_events, duration) in got.items():
        assert n_events == ref[key][1], key
    # contiguous indexes per user
    by_user = {}
    for u, i in got:
        by_user.setdefault(u, []).append(i)
    for u, idxs in by_user.items():
        assert sorted(idxs) == list(range(1, len(idxs) + 1)), u
