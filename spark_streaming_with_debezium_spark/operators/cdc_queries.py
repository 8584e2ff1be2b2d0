"""Flagship CDC queries: the reference's end-to-end capability as
oracle-checkable batch queries (SURVEY §7.1).

``events`` plays the change stream (event_id = Kafka offset, user_id =
key, event_type = op: 'error' → delete, anything else → upsert of the
account balance), ``customer`` plays the initial snapshot state — the
same merge semantics as `StreamingJobExecutor.scala:47-61`, driven by
the engine's compact+merge kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_streaming_with_debezium_spark.cdc.compact import compact_latest
from spark_streaming_with_debezium_spark.cdc.merge import apply_changes
from spark_streaming_with_debezium_spark.functions.numeric import dsum, sql_dsum
from spark_streaming_with_debezium_spark.registry import query
from spark_streaming_with_debezium_spark.sources.tables import (
    load_table,
    spread_small_scan,
    table_column_max,
)

#: Ceiling on the plan-statistics estimate of an iterative fold's WHOLE
#: input below which AQE may be pinned off around the fold's actions
#: (cdc_scd2_incremental). 256 MiB mirrors AQE's own skew-partition
#: threshold default: under it no exchange the fold produces can be
#: worth adaptive re-planning (each stage materialization is a
#: scheduled job of pure overhead — 38 → 12 jobs at sf0.1); over it,
#: AQE keeps its skew-split and broadcast-conversion rights.
_AQE_PIN_MAX_BYTES = 256 << 20


def _scratch_dir(prefix: str) -> str:
    """Per-invocation on-disk scratch for queries that build real state
    tables (change feed, materialized agg). Registered for removal at
    interpreter exit so repeated bench/driver invocations don't
    accumulate temp state; the returned DataFrames stay readable for
    the life of the process (collects happen before exit)."""
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


# Shared CTE: the merged current state, expressed in ANSI SQL for DuckDB.
_MERGED_STATE_SQL = """
    latest AS (
      SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        FROM events) t
      WHERE rn = 1
    ),
    merged AS (
      -- matched & not deleted -> update balance; unmatched target -> keep
      SELECT c.c_custkey, c.c_name, c.c_nationkey,
             CASE WHEN l.user_id IS NOT NULL THEN l.value
                  ELSE c.c_acctbal END AS c_acctbal
      FROM customer c LEFT JOIN latest l ON c.c_custkey = l.user_id
      WHERE l.user_id IS NULL OR l.event_type <> 'error'
      UNION ALL
      -- unmatched source & not deleted -> insert
      SELECT l.user_id AS c_custkey, 'cdc-insert' AS c_name,
             NULL AS c_nationkey, l.value AS c_acctbal
      FROM latest l LEFT JOIN customer c ON c.c_custkey = l.user_id
      WHERE c.c_custkey IS NULL AND l.event_type <> 'error'
    )
"""


def _current_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged current state via the engine's CDC kernel."""
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    changes = e.select(
        F.col("user_id").alias("c_custkey"),
        F.lit("cdc-insert").alias("c_name"),
        F.lit(None).cast("int").alias("c_nationkey"),
        F.col("value").alias("c_acctbal"),
        (F.col("event_type") == "error").alias("deleted"),
        F.col("event_id"),
    )
    latest = compact_latest(changes, ["c_custkey"], order_cols=["event_id"])
    target = c.select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    return apply_changes(
        target,
        latest.drop("event_id"),
        key_cols=["c_custkey"],
        data_cols=["c_acctbal"],  # upserts carry only the balance; name/
        # nationkey keep target values (null for fresh inserts)
    )


@query(
    "cdc_current_state",
    oracle=f"""
    WITH {_MERGED_STATE_SQL}
    SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM merged
    """,
)
def cdc_current_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 composite (W1 compaction + full-outer merge): the post-CDC
    current-state table itself.

    Note data_cols=[c_acctbal]: matched updates overwrite only the
    balance, keeping the customer's name/nation — while fresh inserts
    get the change row's values. The oracle mirrors this with its
    LEFT JOIN + UNION ALL split.
    """
    return _current_state(spark, sf_dir)


@query(
    "cdc_state_rollup",
    oracle=f"""
    WITH {_MERGED_STATE_SQL}
    SELECT r_name,
           COUNT(*) AS n_customers,
           {sql_dsum('m.c_acctbal')} AS total_balance
    FROM merged m
    JOIN nation ON m.c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def cdc_state_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SURVEY §7.1 flagship: CDC merge → broadcast dim join →
    aggregate. Exercises scan, projection, filter, W1 window dedup,
    anti/semi/outer join composition (inside apply_changes), and G1."""
    state = _current_state(spark, sf_dir)
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        state.join(n, state.c_nationkey == n.n_nationkey)  # inner: drops null-nation inserts
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("total_balance"),
        )
    )


@query(
    "cdc_envelope_roundtrip",
    oracle="""
    SELECT user_id AS id,
           CASE WHEN event_type = 'error' THEN NULL
                ELSE CAST(value AS DOUBLE) END AS val,  -- deletes: after image is null
           CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op,
           (event_type = 'error') AS deleted
    FROM events
    """,
)
def cdc_envelope_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The envelope parser itself under the t2 gate: synthesize Debezium
    envelope JSON from events (executor-side to_json), parse it back
    with cdc.envelope.parse_envelope, and emit the typed columns. The
    oracle computes the same rows directly — any parsing defect
    (schema, tombstone handling, op mapping, null discipline) breaks
    the hash match. Also the honest benchmark of the vectorized parse
    path that replaces DebeziumDeltaFormatter's driver loop.

    Synthetic-envelope plan discipline (same as cdc_logical_types):
    the sf0.1 events file is a single split, so the scan is
    repartitioned before the encode projection, and both the encode
    and parse aliases carry the non-deterministic identity taint
    (``pushdown_barrier=True``) so Catalyst cannot duplicate the
    to_json/from_json chains into parse_envelope's trailing filters
    (interleaved A/B at sf0.1: 1.88 s → 0.74 s median). Real sources
    store the envelope columns; neither pin applies there.
    """
    from pyspark.sql import types as T

    from spark_streaming_with_debezium_spark.cdc.envelope import (
        TableSpec,
        parse_envelope,
    )

    e = spread_small_scan(load_table(spark, sf_dir, "events"))
    is_del = F.col("event_type") == "error"
    after = F.when(
        ~is_del,
        F.struct(F.col("user_id").alias("id"), F.col("value").alias("val")),
    )
    raw = e.select(
        F.to_json(F.struct(F.struct(F.col("user_id").alias("id")).alias("payload"))).alias("key"),
        F.concat(
            F.to_json(
                F.struct(
                    F.struct(
                        after.alias("after"),
                        F.when(is_del, F.lit("d")).otherwise(F.lit("u")).alias("op"),
                        (F.unix_timestamp("ts") * 1000).alias("ts_ms"),
                    ).alias("payload")
                )
            ),
            F.when(F.spark_partition_id() >= 0, F.lit("")).otherwise(F.lit(None)),
        ).alias("value"),
    )
    spec = TableSpec(
        name="events_cdc",
        key_cols=("id",),
        value_schema=T.StructType(
            [T.StructField("id", T.LongType()), T.StructField("val", T.DoubleType())]
        ),
    )
    parsed = parse_envelope(raw, spec, pushdown_barrier=True)
    return parsed.select("id", "val", "op", "deleted")


@query(
    "cdc_scd2_history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, ts, event_type, value,
             lead(ts) OVER (PARTITION BY user_id ORDER BY event_id)
               AS valid_to,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id)
               AS version
      FROM events
    )
    SELECT user_id, CAST(version AS BIGINT) AS version,
           ts AS valid_from, valid_to, value AS balance,
           (valid_to IS NULL AND event_type <> 'error') AS is_current
    FROM ordered
    WHERE event_type <> 'error'
    """,
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 from the change stream: every
    upsert becomes a versioned row with a [valid_from, valid_to)
    interval, closed by the NEXT change for the same key (delete
    events close the prior interval without opening one — lead() runs
    over ALL events before deletes are filtered, which is what makes a
    post-delete interval finite). ``is_current`` marks open intervals.
    This is the history table the reference's Delta merge overwrites
    away — the generalization its README's analytics layer would need
    for as-of reporting, and the batch dual of ``cdc/timetravel.py``.

    One shuffle on user_id; lead, row_number, and the filter all ride
    the same hash partitioning (single window exchange, plan-shared),
    and event_id gives a total per-key order so versions are stable
    under re-partitioning."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("event_id")
    ordered = e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        "value",
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).cast("long").alias("version"),
    )
    return ordered.filter(F.col("event_type") != "error").select(
        "user_id",
        "version",
        F.col("ts").alias("valid_from"),
        "valid_to",
        F.col("value").alias("balance"),
        (F.col("valid_to").isNull() & (F.col("event_type") != "error")).alias(
            "is_current"
        ),
    )


@query(
    "cdc_logical_types",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey * 137 - 500000 AS DOUBLE) / 100 AS price,
           DATE '1970-01-01'
             + CAST(o_orderkey % 20000 AS INT) AS order_date,
           make_timestamp((o_orderkey * 1000003) % 2000000000000000)
             AS updated_at,
           make_timestamp(((o_orderkey * 997) % 1700000000000) * 1000)
             AS created_at
    FROM orders
    """,
)
def cdc_logical_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium LOGICAL TYPE decoding under the t2 gate: real MySQL
    tables ship DECIMAL as base64 Connect-Decimal bytes, DATE as epoch
    days (io.debezium.time.Date) and TIMESTAMP as epoch micro/millis
    (MicroTimestamp/Timestamp) — the reference never decodes these
    (its demo tables are int/varchar, `StreamingIT.scala:108`).

    Deterministic wire values are derived from o_orderkey (exact
    integer arithmetic — no float ties), ENCODED into a full Debezium
    envelope executor-side (the decimal as 8-byte big-endian two's
    complement via encode_connect_decimal, negatives included), parsed
    back through parse_envelope with logical annotations, and emitted
    typed. The oracle computes the same values directly, so any defect
    in the two's-complement limb math, epoch-day, or epoch-µs/ms paths
    breaks the hash. The decoded DECIMAL(18,2) is emitted as DOUBLE
    (both engines: nearest-double of the same exact value) because the
    driver hashes unscaled decimal text; the exact-decimal face is
    pinned by tests/test_cdc_golden.py's logical-type goldens.

    Whole plan: one scan → round-robin repartition (the sf0.1 orders
    file is a single split; without the exchange the whole encode+parse
    chain runs on ONE core of 32) → one projection (encode, alias
    tainted with a non-deterministic identity suffix) → cheap
    attribute filter → one projection (from_json + decode, pinned via
    ``pushdown_barrier=True``) → cheap attribute filter. The two pins
    matter: both envelope columns are COMPUTED here, so Catalyst's
    predicate pushdown would otherwise substitute the full encode+parse
    chain into parse_envelope's trailing filters and evaluate it 2-3x
    per row in the single-task scan stage. This was r12's unattributed
    bench gap (4.75 s at 2 jobs vs 0.24 s predicted); interleaved
    same-process A/B at sf0.1: old form 4.52 s median, repartition
    alone 2.46 s, repartition+pins 1.34 s — each chain now evaluated
    exactly once (plan-census-asserted in tests/test_plans.py). No UDF
    — at 100 TB a real source stores the envelope columns, so neither
    pin is needed there and per-core parse throughput equals the
    untyped envelope path."""
    from pyspark.sql import types as T

    from spark_streaming_with_debezium_spark.cdc.envelope import (
        TableSpec,
        encode_connect_decimal,
        parse_envelope,
    )

    o = spread_small_scan(load_table(spark, sf_dir, "orders"))
    k = F.col("o_orderkey")
    after = F.struct(
        k.alias("o_orderkey"),
        encode_connect_decimal(k * 137 - 500000).alias("price"),
        (k % 20000).cast("int").alias("order_date"),
        ((k * 1000003) % F.lit(2000000000000000)).alias("updated_at"),
        ((k * 997) % F.lit(1700000000000)).alias("created_at"),
    )
    raw = o.select(
        F.to_json(
            F.struct(F.struct(k.alias("o_orderkey")).alias("payload"))
        ).alias("key"),
        # Non-deterministic identity taint (always-empty suffix): keeps
        # parse_envelope's value-IS-NOT-NULL filter referencing the
        # materialized `value` attribute instead of a substituted copy
        # of the to_json chain pushed into the single-task scan stage
        # (see docstring; Spark 4 pushes any filter whose SUBSTITUTED
        # condition is deterministic).
        F.concat(
            F.to_json(
                F.struct(
                    F.struct(
                        after.alias("after"),
                        F.lit("r").alias("op"),
                        F.lit(0).cast("long").alias("ts_ms"),
                    ).alias("payload")
                )
            ),
            F.when(F.spark_partition_id() >= 0, F.lit("")).otherwise(F.lit(None)),
        ).alias("value"),
    )
    spec = TableSpec(
        name="orders_logical",
        key_cols=("o_orderkey",),
        value_schema=T.StructType(
            [
                T.StructField("o_orderkey", T.LongType()),
                T.StructField("price", T.DecimalType(18, 2)),
                T.StructField("order_date", T.DateType()),
                T.StructField("updated_at", T.TimestampType()),
                T.StructField("created_at", T.TimestampType()),
            ]
        ),
        logical=(
            ("price", "decimal(18,2)"),
            ("order_date", "io.debezium.time.Date"),
            ("updated_at", "io.debezium.time.MicroTimestamp"),
            ("created_at", "io.debezium.time.Timestamp"),
        ),
    )
    parsed = parse_envelope(raw, spec, pushdown_barrier=True)
    return parsed.select(
        "o_orderkey",
        F.col("price").cast("double").alias("price"),
        "order_date",
        "updated_at",
        "created_at",
    )


@query(
    "cdc_change_feed",
    oracle="""
    WITH b1 AS (
      -- batch 1 = the chronologically FIRST half of the stream (the
      -- split must be monotone in event_id so batch-seq LWW == global
      -- event_id LWW)
      SELECT user_id, event_type, value, event_id
      FROM events
      WHERE event_id * 2 <= (SELECT MAX(event_id) FROM events)
    ),
    l1 AS (
      SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY event_id DESC) AS rn
        FROM b1) t WHERE rn = 1
    ),
    s1 AS (
      SELECT c.c_custkey,
             CASE WHEN l.user_id IS NOT NULL THEN l.value
                  ELSE c.c_acctbal END AS c_acctbal
      FROM customer c LEFT JOIN l1 l ON c.c_custkey = l.user_id
      WHERE l.user_id IS NULL OR l.event_type <> 'error'
      UNION ALL
      SELECT l.user_id, l.value
      FROM l1 l LEFT JOIN customer c ON c.c_custkey = l.user_id
      WHERE c.c_custkey IS NULL AND l.event_type <> 'error'
    ),
    lA AS (
      SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY event_id DESC) AS rn
        FROM events) t WHERE rn = 1
    ),
    s2 AS (
      SELECT c.c_custkey,
             CASE WHEN l.user_id IS NOT NULL THEN l.value
                  ELSE c.c_acctbal END AS c_acctbal
      FROM customer c LEFT JOIN lA l ON c.c_custkey = l.user_id
      WHERE l.user_id IS NULL OR l.event_type <> 'error'
      UNION ALL
      SELECT l.user_id, l.value
      FROM lA l LEFT JOIN customer c ON c.c_custkey = l.user_id
      WHERE c.c_custkey IS NULL AND l.event_type <> 'error'
    )
    SELECT c_custkey, c_acctbal, _change_type FROM (
      SELECT COALESCE(s2.c_custkey, s1.c_custkey) AS c_custkey,
             CASE WHEN s2.c_custkey IS NOT NULL THEN s2.c_acctbal
                  ELSE s1.c_acctbal END AS c_acctbal,
             CASE WHEN s1.c_custkey IS NULL THEN 'insert'
                  WHEN s2.c_custkey IS NULL THEN 'delete'
                  WHEN s1.c_acctbal IS DISTINCT FROM s2.c_acctbal
                    THEN 'update' END AS _change_type
      FROM s1 FULL JOIN s2 ON s1.c_custkey = s2.c_custkey
    ) d WHERE _change_type IS NOT NULL
    """,
)
def cdc_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The time-travel change feed (Delta CDF shape) under the t2
    gate: build a real TimeTravelStateTable on disk (snapshot =
    customer balances; batch 1 = the chronologically first half of
    events by event_id, batch 2 = the second half — a MONOTONE split,
    so per-batch LWW + batch-seq ordering equals global event_id LWW —
    both LWW-compacted on event_id and merge_logged), then
    diff version 1 against version 2 via ``changes_between`` — one row
    per key whose state changed, tagged insert/update/delete, new
    image for upserts, old image for deletes.

    The oracle reconstructs both versions in plain SQL (snapshot +
    LWW-merge of the log prefix — exactly what ``as_of`` computes) and
    diffs them, so the whole time-travel stack (log partitioning,
    replay, eqNullSafe full-outer diff, presence flags) sits under the
    hash. deletes/inserts/updates all occur: error events delete,
    unseen user_ids insert.

    Scale: as_of is one window + one merge join over the pruned log
    prefix; the diff full-outer join co-partitions both sides on the
    same key. State lives in a per-invocation temp dir (tiny at test
    sf; the pattern at 100 TB is a lake path)."""
    from spark_streaming_with_debezium_spark.cdc.timetravel import (
        TimeTravelStateTable,
        changes_between,
    )

    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    tt = TimeTravelStateTable(
        spark,
        _scratch_dir("cdc_feed_"),
        ["c_custkey"],
        n_buckets=8,
    )
    tt.init(c.select("c_custkey", "c_acctbal"))
    changes = e.select(
        F.col("user_id").alias("c_custkey"),
        F.col("value").alias("c_acctbal"),
        (F.col("event_type") == "error").alias("deleted"),
        F.col("event_id"),
    )
    # Split point from parquet footer stats (zero data scan) — the
    # agg(max).collect() form cost one extra full events scan per run.
    mid = table_column_max(sf_dir, "events", "event_id")
    if mid is None:  # stats absent: fall back to the scan
        mid = e.agg(F.max("event_id")).collect()[0][0] or 0
    for pred in (
        F.col("event_id") * 2 <= F.lit(mid),
        F.col("event_id") * 2 > F.lit(mid),
    ):
        batch = compact_latest(
            changes.filter(pred), ["c_custkey"], order_cols=["event_id"]
        )
        tt.merge_logged(batch.drop("event_id"))
    return changes_between(tt, 1, 2)


@query(
    "cdc_incremental_agg",
    oracle="""
    WITH ev_last AS (
      SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY event_id DESC) AS rn
        FROM events) t WHERE rn = 1
    ),
    final AS (
      SELECT COALESCE(l.user_id, c.c_custkey) AS uid,
             CASE WHEN l.user_id IS NOT NULL THEN l.value
                  ELSE c.c_acctbal END AS bal,
             CASE WHEN l.user_id IS NOT NULL
                  THEN l.event_type <> 'error' ELSE TRUE END AS live
      FROM customer c FULL JOIN ev_last l ON c.c_custkey = l.user_id
    )
    SELECT uid % 10 AS grp,
           CAST(SUM(CAST(bal AS DECIMAL(38,6))) AS DOUBLE) AS agg_sum,
           CAST(COUNT(*) AS BIGINT) AS agg_count
    FROM final WHERE live GROUP BY 1
    """,
)
def cdc_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained materialized aggregate
    (streaming/materialized_agg.py) under the t2 gate: the events
    stream becomes per-event change rows with EXACT before-images
    (lag over the per-user sequence, falling back to the customer
    snapshot balance for a user's first event, and to 'no prior' right
    after a delete), folded as signed deltas (+after / −before) into
    an on-disk bucketed aggregate table across TWO ordered batches.

    The oracle recomputes the aggregate FROM SCRATCH over the final
    state — the maintained table must equal the recompute bit-for-bit
    (decimal accumulation makes the sum order-independent, and the
    per-user delta chain telescopes: init + Σdeltas = final). This is
    the O(batch)-per-refresh dashboard path that replaces an O(state)
    rescan; at 100 TB the additive merge touches only buckets whose
    groups changed.

    Covered transitions: insert (first event / post-delete event),
    update (−prior +new), delete (−prior), no-op delete (error for a
    user with no live prior — filtered in both engines), and
    untouched snapshot rows riding the init aggregate."""
    from pyspark.sql import Window

    from spark_streaming_with_debezium_spark.streaming.materialized_agg import (
        MaterializedAggregate,
        changes_to_deltas,
    )

    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = (
        e.select("user_id", "event_id", "event_type", "value")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("prior_val_evt", F.lag("value").over(w))
        .withColumn("prior_type", F.lag("event_type").over(w))
        .join(
            c.select(
                F.col("c_custkey").alias("user_id"),
                F.col("c_acctbal").alias("cust_bal"),
            ),
            "user_id",
            "left",
        )
    )
    prior = F.when(F.col("rn") == 1, F.col("cust_bal")).otherwise(
        F.when(F.col("prior_type") != "error", F.col("prior_val_evt"))
    )
    ch = seq.select(
        (F.col("user_id") % 10).alias("grp"),
        F.col("value").alias("bal"),
        (F.col("user_id") % 10).alias("before_grp"),
        prior.alias("before_bal"),
        F.when(F.col("event_type") == "error", "d")
        .when(prior.isNotNull(), "u")
        .otherwise("c")
        .alias("op"),
        (F.col("event_type") == "error").alias("deleted"),
        F.col("event_id"),
    ).filter(~((F.col("op") == "d") & F.col("before_bal").isNull()))

    agg = MaterializedAggregate(
        spark, _scratch_dir("matagg_"), ["grp"], n_buckets=4
    )
    agg.state.init(
        c.groupBy((F.col("c_custkey") % 10).alias("grp")).agg(
            F.sum(F.col("c_acctbal").cast("decimal(38,6)")).alias("agg_sum"),
            F.count(F.lit(1)).alias("agg_count"),
        )
    )
    # Split point from parquet footer stats (zero data scan) — the
    # agg(max).collect() form cost one extra full events scan per run.
    mid = table_column_max(sf_dir, "events", "event_id")
    if mid is None:  # stats absent: fall back to the scan
        mid = e.agg(F.max("event_id")).collect()[0][0] or 0
    for pred in (
        F.col("event_id") * 2 <= F.lit(mid),
        F.col("event_id") * 2 > F.lit(mid),
    ):
        agg.apply_deltas(
            changes_to_deltas(ch.filter(pred), ["grp"], "bal")
        )
    return agg.read().select(
        "grp", F.col("agg_sum").cast("double").alias("agg_sum"), "agg_count"
    )


@query(
    "cdc_temporal_pit_join",
    oracle="""
    WITH dim AS (
      SELECT user_id, value AS balance, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY event_id)
               AS valid_to,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id)
               AS version
      FROM events WHERE event_type = 'purchase'
    ), fact AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT f.event_id, f.user_id, f.ts AS click_ts,
           CAST(d.version AS DOUBLE) AS balance_version,
           d.balance AS balance_at_click
    FROM fact f LEFT JOIN dim d
      ON f.user_id = d.user_id
     AND f.ts >= d.valid_from
     AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    """,
)
def cdc_temporal_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal validity) join: enrich each click with
    the SCD2 dimension version that was valid AT THE CLICK'S event
    time — `join_asof` answers "latest value before t" against a raw
    change log; this is the same question asked of a versioned
    dimension with explicit [valid_from, valid_to) intervals, the
    canonical ML feature-store / audit-reporting lookup (training-time
    features must be the values known at event time, not today's).

    Dimension: balance versions per user from 'purchase' changes
    (the `cdc_scd2_history` shape). Fact: 'click' events. Clicks
    before a user's first version keep NULL (left join) — versions
    partition each user's timeline, so at most one row matches and
    the output is exactly one row per click.

    Scale: the interval predicate rides a plain EQUI-join on user_id
    (SortMergeJoin/shuffle-hash with a residual range filter) — never
    a broadcast-nested-loop range join, because the equality key is
    extracted first. Both sides pre-filter on event_type at the scan
    (predicate pushdown), and the dimension's one window shares the
    user_id hash partitioning the join needs — at 100 TB this is one
    shuffle of each side on a uniform key."""
    e = load_table(spark, sf_dir, "events")
    dim = (
        e.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("d_user"),
            F.col("value").alias("balance"),
            F.col("ts").alias("valid_from"),
            "event_id",
        )
        .select(
            "d_user",
            "balance",
            "valid_from",
            F.lead("valid_from").over(
                Window.partitionBy("d_user").orderBy("event_id")
            ).alias("valid_to"),
            # double, not long: the version is NULL for pre-first-
            # version clicks, and the driver's pandas fetch renders a
            # nullable int64 as float64 — emit double on BOTH sides.
            F.row_number()
            .over(Window.partitionBy("d_user").orderBy("event_id"))
            .cast("double")
            .alias("balance_version"),
        )
    )
    fact = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("click_ts")
    )
    joined = fact.join(
        dim,
        (F.col("user_id") == F.col("d_user"))
        & (F.col("click_ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("click_ts") < F.col("valid_to"))),
        "left",
    )
    return joined.select(
        "event_id",
        "user_id",
        "click_ts",
        "balance_version",
        F.col("balance").alias("balance_at_click"),
    )


@query(
    "cdc_scd2_incremental",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, value,
             epoch_us(ts) AS ts_us,
             (event_type = 'error') AS is_del,
             lead(epoch_us(ts)) OVER w AS next_us,
             SUM(CASE WHEN event_type = 'error' THEN 0 ELSE 1 END)
               OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS version
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    )
    SELECT user_id, CAST(version AS BIGINT) AS version,
           value AS balance,
           CAST(ts_us AS BIGINT) AS valid_from_us,
           CAST(next_us AS DOUBLE) AS valid_to_us,
           (next_us IS NULL) AS is_current
    FROM ordered WHERE NOT is_del
    """,
)
def cdc_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 maintenance under the value-hash gate: the
    events log splits into TWO micro-batches (by event_id median) that
    fold one after the other onto a real on-disk (key, version) state
    table via `cdc/scd2.scd2_apply`; the oracle recomputes the same
    type-2 history in one SQL pass over the whole log. Any divergence
    — a version mis-numbered across the batch boundary, an open row
    not closed by the next batch's first event, a delete consuming a
    version — breaks the hash. The batch dual of what the Hypothesis
    sweep in tests/test_scd2.py proves for arbitrary batchings.

    Versions number over NON-delete changes ('error' events act as
    deletes: they close the open version without opening one);
    validity bounds are event-time epoch microseconds."""
    from spark_streaming_with_debezium_spark.cdc.merge import ParquetStateTable
    from spark_streaming_with_debezium_spark.cdc.scd2 import (
        scd2_apply,
        scd2_schema_ddl,
    )

    e = load_table(spark, sf_dir, "events").select(
        F.col("user_id"),
        F.col("value"),
        F.when(F.col("event_type") == "error", "d").otherwise("u").alias("op"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_ms"),
        F.col("event_id").alias("offset"),
    )
    dim = ParquetStateTable(
        spark,
        _scratch_dir("scd2_inc_"),
        ["user_id", "version"],
        n_buckets=8,
    )
    dim.init(
        spark.createDataFrame(
            [], scd2_schema_ddl("user_id long", "value double")
        )
    )
    # offset aliases event_id — footer stats give its max scan-free.
    mid = table_column_max(sf_dir, "events", "event_id")
    if mid is None:
        mid = e.agg(F.max("offset")).collect()[0][0] or 0
    # Bare-column comparisons (offset ≤ ⌊mid/2⌋ ⟺ offset·2 ≤ mid for
    # integers) so each increment's predicate PUSHES DOWN to the
    # parquet scan — the arithmetic form read every row group twice.
    #
    # AQE is pinned OFF for the fold actions (restored in finally) —
    # the BPE-loop treatment: every exchange inside scd2_apply is
    # increment-sized by construction (one batch window, one touched-
    # bucket state aggregate, one bucket-partitioned write), so each
    # adaptive stage materialization is a separate scheduled job of
    # pure overhead. Measured at sf0.1: 38 → 12 jobs, wall 14.7 →
    # 12.5 s, hashes unchanged at 3 SFs — the r10-flagged scheduling
    # tail was AQE stage-materialization, not the fold itself.
    #
    # SIZE-GUARDED (r14, VERDICT r13 item 2): "increment-sized" is a
    # property of the batch window, not a law of nature — a 100 TB
    # replay can make one increment arbitrarily large, and then the
    # pin would forfeit AQE's skew-split / broadcast conversion inside
    # the fold (the same reasoning that rejected AQE-off for the
    # triangle census's edge-sized exchanges). Pin only when the WHOLE
    # source estimate (parquet-footer plan statistics, no job) is
    # under _AQE_PIN_MAX_BYTES; past it, AQE stays on and its stage
    # jobs are noise next to the increment work they adapt.
    est_bytes = int(
        str(e._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )
    pin_aqe = est_bytes <= _AQE_PIN_MAX_BYTES
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    if pin_aqe:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for pred in (
            F.col("offset") <= F.lit(mid // 2),
            F.col("offset") > F.lit(mid // 2),
        ):
            scd2_apply(
                dim,
                e.filter(pred),
                ["user_id"],
                ["value"],
                order_cols=("offset",),
            )
    finally:
        if pin_aqe:
            spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
    return dim.read().select(
        "user_id",
        "version",
        F.col("value").alias("balance"),
        F.col("valid_from_ms").alias("valid_from_us"),
        # double: nullable int64 renders float64 through the driver's
        # pandas fetch; epoch-µs < 2^53 stays exact in a double
        F.col("valid_to_ms").cast("double").alias("valid_to_us"),
        "is_current",
    )
