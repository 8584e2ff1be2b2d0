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


VALS = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),  # sort key (dupes likely)
        st.integers(min_value=0, max_value=9),  # tiebreak id component
        st.integers(min_value=0, max_value=100),  # value to cumsum
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=VALS, n_buckets=st.integers(min_value=1, max_value=8), k=st.integers(min_value=2, max_value=5))
def test_scalable_window_equals_naive_any_data(spark, rows, n_buckets, k):
    """For ANY data (heavy duplicate sort keys, constant columns, tiny
    N, any bucket count): bucketed global running sum + rank must equal
    the naive global window, and ntile_from_rank must equal F.ntile."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spark_streaming_with_debezium_spark.operators.scalable_windows import (
        global_ordered_running,
        ntile_from_rank,
    )

    # unique row ids for a total order
    data = [(a, i, v) for i, (a, _t, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "a long, rid long, v long")
    order = ["a", "rid"]
    got = global_ordered_running(
        df,
        key=F.col("a"),
        order_cols=order,
        sums={"cum": F.col("v")},
        rank_name="rk",
        n_buckets=n_buckets,
    ).select("rid", "cum", "rk")
    w = Window.orderBy(*order)
    want = df.select(
        "rid",
        F.sum("v")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
        F.row_number().over(w).alias("rk"),
    )
    g = sorted(map(tuple, got.collect()))
    n = len(data)
    assert g == sorted(map(tuple, want.collect()))
    tiles = {
        r.rid: r.t
        for r in global_ordered_running(
            df, key=F.col("a"), order_cols=order, rank_name="rk",
            n_buckets=n_buckets,
        )
        .select("rid", ntile_from_rank(F.col("rk"), F.lit(n), k).alias("t"))
        .collect()
    }
    ref = {
        r.rid: r.t
        for r in df.select("rid", F.ntile(k).over(w).alias("t")).collect()
    }
    assert tiles == ref


UD = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),  # user
        st.integers(min_value=0, max_value=14),  # day ordinal
    ),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(pairs=UD, t=st.integers(min_value=1, max_value=5))
def test_prefix_filter_candidates_superset_any_data(spark, pairs, t):
    """SSJoin prefix-filtering completeness on ARBITRARY (user, day)
    sets: for any overlap threshold T, the candidate set must contain
    every user pair sharing >= T days (hot days, singleton users,
    duplicate rows and all)."""
    import datetime

    from pyspark.sql import functions as F

    from spark_streaming_with_debezium_spark.operators.more_relational import (
        _similarity_candidates,
    )

    base = datetime.date(2024, 1, 1)
    rows = sorted({(u, base + datetime.timedelta(days=d)) for u, d in pairs})
    ud = spark.createDataFrame(rows, "user_id long, day date").withColumn(
        "n", F.lit(1).cast("long")
    )
    cand = {
        (r.user_a, r.user_b)
        for r in _similarity_candidates(ud, min_days=t).collect()
    }
    from collections import defaultdict

    byu = defaultdict(set)
    for u, d in rows:
        byu[u].add(d)
    users = sorted(byu)
    expected = {
        (a, b)
        for i, a in enumerate(users)
        for b in users[i + 1 :]
        if len(byu[a] & byu[b]) >= t
    }
    assert expected <= cand


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=VALS, n_buckets=st.integers(min_value=1, max_value=6), k=st.integers(min_value=2, max_value=5))
def test_grouped_window_equals_naive_any_data(spark, rows, n_buckets, k):
    """grouped_ordered_running must equal the naive per-group window on
    ANY data (skewed groups, duplicate keys, singleton groups), and
    per-group ntile_from_rank must equal F.ntile over the group."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spark_streaming_with_debezium_spark.operators.scalable_windows import (
        grouped_ordered_running,
        ntile_from_rank,
    )

    data = [(a % 3, a, i, v) for i, (a, _t, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "g long, a long, rid long, v long")
    order = ["a", "rid"]
    got = grouped_ordered_running(
        df,
        group_cols=["g"],
        key=F.col("a"),
        order_cols=order,
        sums={"cum": F.col("v")},
        rank_name="rk",
        n_buckets=n_buckets,
    ).select("rid", "cum", "rk")
    w = Window.partitionBy("g").orderBy(*order)
    want = df.select(
        "rid",
        F.sum("v")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
        F.row_number().over(w).alias("rk"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    counts = F.broadcast(df.groupBy("g").agg(F.count(F.lit(1)).alias("_n")))
    tiles = {
        r.rid: r.t
        for r in grouped_ordered_running(
            df, group_cols=["g"], key=F.col("a"), order_cols=order,
            rank_name="rk", n_buckets=n_buckets,
        )
        .join(counts, "g")
        .select("rid", ntile_from_rank(F.col("rk"), F.col("_n"), k).alias("t"))
        .collect()
    }
    ref = {
        r.rid: r.t
        for r in df.select("rid", F.ntile(k).over(w).alias("t")).collect()
    }
    assert tiles == ref
