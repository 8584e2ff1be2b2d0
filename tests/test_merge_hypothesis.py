"""Property-based merge semantics (Hypothesis): for ANY sequence of
keyed I/U/D events split into ANY batching, compact+merge must equal a
sequential dictionary replay (SURVEY §5.3)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_streaming_with_debezium_spark.cdc.compact import compact_latest
from spark_streaming_with_debezium_spark.cdc.merge import apply_changes

EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.sampled_from(["c", "u", "d"]),  # op
        st.integers(min_value=0, max_value=99),  # payload value
    ),
    min_size=0,
    max_size=25,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(events=EVENTS, n_batches=st.integers(min_value=1, max_value=3))
def test_merge_equals_sequential_replay(spark, events, n_batches):
    # expected: sequential replay
    expected: dict[int, int] = {}
    for k, op, v in events:
        if op == "d":
            expected.pop(k, None)
        else:
            expected[k] = v

    # actual: batched compact+merge over Spark
    state = spark.createDataFrame([], "k long, v long")
    size = max(1, len(events) // n_batches)
    batches = [events[i : i + size] for i in range(0, len(events), size)]
    for batch in batches:
        rows = [
            (k, None if op == "d" else v, op == "d", seq)
            for seq, (k, op, v) in enumerate(batch)
        ]
        changes = spark.createDataFrame(
            rows, "k long, v long, deleted boolean, seq long"
        )
        latest = compact_latest(changes, ["k"], order_cols=["seq"]).drop("seq")
        state = apply_changes(state, latest, ["k"])
    got = {r.k: r.v for r in state.collect()}
    assert got == expected
