"""Join surface: SURVEY §2.3 (J1–J4, J6–J10).

Strategy notes (what Catalyst does with these plans, and why they hold
at 100 TB):
- Dimension joins (nation/region/supplier) are explicitly
  ``F.broadcast`` — no shuffle of the fact side, ever.
- Fact-fact equi joins shuffle both sides on the key; AQE re-plans to
  broadcast if a runtime side is small and splits skewed partitions.
- The theta/band join avoids a pure BNLJ by equi-joining on a
  bucketized range key first (the classic band-join trick), so the
  cross product is limited to neighboring buckets.
- The as-of join is a union+window plan: O(n log n) per key instead of
  a range BNLJ, and it reuses one shuffle on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_streaming_with_debezium_spark.functions.numeric import dsum, sql_dsum
from spark_streaming_with_debezium_spark.registry import query
from spark_streaming_with_debezium_spark.sources.tables import load_table


@query(
    "join_inner_equi",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: equi inner join orders⋈customer + aggregate."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("revenue"))
    )


@query(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: anti join — customers with no orders (the merge's
    whenNotMatched detection, `StreamingJobExecutor.scala:58-59`)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 30000)
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: semi join — EXISTS with a pushed predicate on the probe side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 30000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "join_left_outer",
    oracle=f"""
    SELECT c_custkey,
           COUNT(o_orderkey) AS n_orders,
           {sql_dsum('COALESCE(o_totalprice, 0)')} AS total_spent
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/J7: left outer join keeping order-less customers (count=0)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))).alias("total_spent"),
        )
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT COALESCE(cn.nationkey, sn.nationkey) AS nationkey,
           COALESCE(cn.n_cust, 0) AS n_cust,
           COALESCE(sn.n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
          FROM customer GROUP BY 1) cn
    FULL OUTER JOIN
         (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp
          FROM supplier GROUP BY 1) sn
    ON cn.nationkey = sn.nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: full outer join of two aggregates (the merge-emulation shape)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    j = c.alias("c").join(s.alias("s"), F.col("c.nationkey") == F.col("s.nationkey"), "full")
    return j.select(
        F.coalesce(F.col("c.nationkey"), F.col("s.nationkey")).alias("nationkey"),
        F.coalesce(F.col("c.n_cust"), F.lit(0)).alias("n_cust"),
        F.coalesce(F.col("s.n_supp"), F.lit(0)).alias("n_supp"),
    )


@query(
    "join_cross",
    oracle="""
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    WHERE r.r_regionkey <> n.n_regionkey
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: cross join (small dims only — a cross join of facts at scale
    is a design error; this one is 5×25 rows)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        r.crossJoin(n)
        .filter(F.col("r_regionkey") != F.col("n_regionkey"))
        .select("r_name", "n_name")
    )


@query(
    "join_broadcast_dims",
    oracle=f"""
    SELECT r_name, n_name,
           COUNT(*) AS n_customers,
           {sql_dsum('c_acctbal')} AS total_balance
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: star-schema dimension enrichment — both dims broadcast, zero
    shuffle of the fact side before aggregation (the cities.csv
    enrichment pattern at warehouse shape)."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("total_balance"),
        )
    )


@query(
    "join_range_band",
    oracle=f"""
    SELECT p_brand,
           COUNT(*) AS n_matches,
           {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
     AND l_quantity BETWEEN p_size - 2 AND p_size + 2
    GROUP BY p_brand
    """,
)
def join_range_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9: theta/band join — equi key plus a range predicate. The equi
    component keeps it a hash join (range applied as post-filter), so
    no BNLJ even at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (li.l_partkey == p.p_partkey)
        & (li.l_quantity >= p.p_size - 2)
        & (li.l_quantity <= p.p_size + 2)
    )
    return (
        li.join(p, cond)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_matches"), dsum("l_quantity").alias("sum_qty"))
    )


@query(
    "join_asof",
    oracle="""
    WITH ranked AS (
      SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice,
             row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
             ) AS rn
      FROM events e
      LEFT JOIN orders o
        ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    )
    SELECT event_id, user_id, ts, o_orderkey, o_totalprice
    FROM ranked WHERE rn = 1
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10: as-of join — for each event, the latest order of that user
    with o_orderdate <= event ts; same-date orders tie-break to the
    HIGHEST orderkey (explicit in both engines — DuckDB's native ASOF
    JOIN leaves duplicate right-side timestamps unspecified, which
    surfaced as a run-dependent sf0.1 mismatch in round 5, so the
    oracle pins the tie with a ranked LEFT JOIN instead).

    Spark lacks a native as-of join; this is the union+window plan:
    tag both sides, union on (key, time), window-carry the most recent
    order forward, keep event rows. ONE shuffle on the key, O(n log n)
    per key — versus a range BNLJ's O(n·m).
    """
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    left = e.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    right = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("bigint").alias("event_id"),
        "o_orderkey",
        "o_totalprice",
    )
    # Order: time asc; at equal time the order row sorts first so an
    # event at exactly o_orderdate matches it (ASOF >= semantics).
    # Among same-time orders the higher orderkey wins (deterministic,
    # matches DuckDB's last-in-order tie behavior via max).
    u = left.unionByName(right)
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("t"), F.col("is_event"), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "k",
        "t",
        "is_event",
        "event_id",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("o_orderkey"),
        F.last("o_totalprice", ignorenulls=True).over(w).alias("o_totalprice"),
    )
    return carried.filter(F.col("is_event") == 1).select(
        "event_id",
        F.col("k").alias("user_id"),
        F.col("t").alias("ts"),
        "o_orderkey",
        "o_totalprice",
    )


@query(
    "join_asof_forward",
    oracle="""
    WITH ranked AS (
      SELECT v.event_id, v.user_id, v.ts,
             p.event_id AS next_purchase_id, p.ts AS next_purchase_ts,
             row_number() OVER (
               PARTITION BY v.event_id ORDER BY p.ts, p.event_id
             ) AS rn
      FROM (SELECT * FROM events WHERE event_type = 'view') v
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON v.user_id = p.user_id AND p.ts >= v.ts
    )
    SELECT event_id, user_id, ts,
           -- sentinel, not NULL: a nullable BIGINT goes float64 through
           -- the driver's pandas fetch and would hash-mismatch
           COALESCE(next_purchase_id, -1) AS next_purchase_id,
           next_purchase_ts,
           -- integer seconds, not a rounded double: round(us/6e7, 6)
           -- straddles half-ulp boundaries differently per engine
           COALESCE((epoch_us(next_purchase_ts) - epoch_us(ts)) // 1000000,
                    -1) AS gap_seconds
    FROM ranked WHERE rn = 1
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10 forward face: for each 'view' event, the user's EARLIEST
    'purchase' at or after it (next-conversion lookup — the forward
    as-of join, where `join_asof` is the backward one). Same-timestamp
    purchases tie-break to the LOWEST event_id, pinned identically in
    both engines (same discipline as join_asof's round-5 fix; DuckDB
    ASOF JOIN has no forward mode at all, so the oracle is the ranked
    LEFT JOIN formulation).

    Same union+window plan as join_asof, mirrored: tag both sides,
    union on (key, time), and `first(..., ignorenulls)` over
    [currentRow, +∞) carries the NEXT purchase backward onto each
    view row. At equal t the view row sorts before the purchase row so
    an exactly-simultaneous purchase matches (>= semantics). ONE
    shuffle on user_id, bounded per-user partitions — versus the
    oracle's range join which explodes O(views x purchases) per user.
    The conversion gap is exact integer SECONDS from `unix_micros`
    bigints; ids and gaps are sentinel−1 (never NULL) because nullable
    BIGINTs turn float64 through the driver's pandas fetch."""
    e = load_table(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_view"),
        "event_id",
        F.lit(None).cast("bigint").alias("p_id"),
        F.lit(None).cast(e.schema["ts"].dataType).alias("p_ts"),
    )
    right = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(0).alias("is_view"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
    )
    u = left.unionByName(right)
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("t"), F.col("is_view").desc(), F.col("p_id"))
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carried = u.select(
        "k",
        "t",
        "is_view",
        "event_id",
        F.first("p_id", ignorenulls=True).over(w).alias("next_purchase_id"),
        F.first("p_ts", ignorenulls=True).over(w).alias("next_purchase_ts"),
    )
    gap_us = F.unix_micros(
        F.col("next_purchase_ts").cast("timestamp")
    ) - F.unix_micros(F.col("t").cast("timestamp"))
    # exact long arithmetic: (d - d % 1e6) / 1e6 is an integer < 2^53
    gap_seconds = ((gap_us - gap_us % 1000000) / 1000000).cast("long")
    return carried.filter(F.col("is_view") == 1).select(
        "event_id",
        F.col("k").alias("user_id"),
        F.col("t").alias("ts"),
        F.coalesce("next_purchase_id", F.lit(-1).cast("bigint")).alias(
            "next_purchase_id"
        ),
        "next_purchase_ts",
        F.coalesce(gap_seconds, F.lit(-1).cast("bigint")).alias(
            "gap_seconds"
        ),
    )


#: Max staleness for the bounded as-of join, in days. The synthetic
#: corpus puts events in 2024 and orders in 1995-2001, so every match
#: is ~8200-8800 days stale; 8400 sits at the median and exercises
#: BOTH branches (kept + tolerance-dropped) at every SF — 355/1000,
#: 5570/10000, 55533/100000 kept at sf0.001/0.01/0.1. A production
#: feature store would set this to its actual staleness SLA (e.g. 30).
_ASOF_TOLERANCE_DAYS = 8400


@query(
    "join_asof_tolerance",
    oracle=f"""
    WITH ranked AS (
      SELECT e.event_id, e.user_id, e.ts,
             o.o_orderkey, o.o_totalprice, o.o_orderdate,
             row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
             ) AS rn
      FROM events e LEFT JOIN orders o
        ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
    )
    SELECT event_id, user_id, ts,
           CASE WHEN o_orderkey IS NOT NULL
                 AND date_diff('day', o_orderdate, CAST(ts AS DATE))
                     <= {_ASOF_TOLERANCE_DAYS}
                THEN o_orderkey ELSE -1 END AS o_orderkey,
           CASE WHEN o_orderkey IS NOT NULL
                 AND date_diff('day', o_orderdate, CAST(ts AS DATE))
                     <= {_ASOF_TOLERANCE_DAYS}
                THEN date_diff('day', o_orderdate, CAST(ts AS DATE))
                ELSE -1 END AS staleness_days
    FROM ranked WHERE rn = 1
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10 bounded-staleness face: the backward as-of join of
    `join_asof` with a MAX-TOLERANCE knob — a match older than
    ``_ASOF_TOLERANCE_DAYS`` at the event's time is dropped (sentinel
    -1), exactly pandas ``merge_asof(tolerance=...)`` / a feature
    store's staleness SLA ("use the latest balance, but never one
    older than 30 days"). Tie-breaks pinned as in `join_asof`
    (same-date orders → highest orderkey); sentinels instead of NULLs
    so the nullable-int64→float64 pandas fetch cannot smear the hash.

    Same scale shape as `join_asof`: union+window carry — tag both
    sides, ONE shuffle on the key, carry the latest order row forward
    as a struct (its date rides along, which is what the tolerance
    check needs), filter to event rows, then a stateless projection
    applies the staleness gate. No second join, no range BNLJ; the
    tolerance is a post-carry filter, so the plan is IDENTICAL to the
    unbounded face plus one whole-stage-codegen expression."""
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    left = e.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(None)
        .cast("struct<od:timestamp,ok:bigint>")
        .alias("m"),
    )
    right = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("bigint").alias("event_id"),
        "o_orderkey",
        F.struct(
            F.col("o_orderdate").alias("od"), F.col("o_orderkey").alias("ok")
        ).alias("m"),
    )
    u = left.unionByName(right)
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("t"), F.col("is_event"), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "k",
        "t",
        "is_event",
        "event_id",
        F.last("m", ignorenulls=True).over(w).alias("m"),
    ).filter(F.col("is_event") == 1)
    stale = F.datediff(F.to_date("t"), F.to_date("m.od"))
    within = F.col("m").isNotNull() & (stale <= _ASOF_TOLERANCE_DAYS)
    return carried.select(
        "event_id",
        F.col("k").alias("user_id"),
        F.col("t").alias("ts"),
        F.when(within, F.col("m.ok"))
        .otherwise(F.lit(-1))
        .cast("bigint")
        .alias("o_orderkey"),
        F.when(within, stale)
        .otherwise(F.lit(-1))
        .cast("bigint")
        .alias("staleness_days"),
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH ranked AS (
      SELECT v.event_id, v.user_id, v.ts,
             p.event_id AS pid, p.ts AS pts,
             abs(epoch_us(p.ts) - epoch_us(v.ts)) AS d_us,
             row_number() OVER (
               PARTITION BY v.event_id
               ORDER BY abs(epoch_us(p.ts) - epoch_us(v.ts)), p.ts,
                        p.event_id
             ) AS rn
      FROM (SELECT * FROM events WHERE event_type = 'view') v
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON v.user_id = p.user_id
    )
    SELECT event_id, user_id, ts,
           COALESCE(pid, -1) AS nearest_purchase_id,
           pts AS nearest_purchase_ts,
           COALESCE(CAST(d_us AS BIGINT), -1) AS delta_us
    FROM ranked WHERE rn = 1
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-event as-of join — the bidirectional completion of the
    as-of family (J10 backward, `join_asof_forward` forward): for each
    view, the user's purchase CLOSEST in time in either direction
    (sensor-fusion / nearest-fill semantics). Ties pin to (smaller
    |Δ|, earlier purchase ts — i.e. backward wins an equidistant pair,
    smaller event_id); the no-purchase case carries the same -1
    sentinel as the forward face (nullable BIGINT would go float64
    through the driver's pandas fetch).

    The oracle ranks an unbounded per-user LEFT JOIN by |Δ| — O(n·m)
    per user, fine for a checker. The Spark plan is the union+window
    shape with ONE hash exchange on user and TWO sorts over it: a
    backward pass (order (us, purchase-first, id DESC), running `last`
    carry) yields the latest purchase ≤ ts with the SMALLEST id among
    same-microsecond purchases, a forward pass (order (us, view-first,
    id ASC), `first` over the following frame) the earliest ≥ ts — the
    final argmin over the two candidates is a stateless projection.
    All deltas are exact integer micros."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("k"), us.alias("t"),
        F.lit(1).alias("is_view"), "event_id", F.col("ts").alias("v_ts"),
        F.lit(None).cast("bigint").alias("p_id"),
        F.lit(None).cast("long").alias("p_us"),
        F.lit(None).cast(e.schema["ts"].dataType).alias("p_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("k"), us.alias("t"),
        F.lit(0).alias("is_view"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast(e.schema["ts"].dataType).alias("v_ts"),
        F.col("event_id").alias("p_id"), us.alias("p_us"),
        F.col("ts").alias("p_ts"),
    )
    u = v.unionByName(p)
    wb = (
        Window.partitionBy("k")
        .orderBy("t", "is_view", F.desc("p_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("k")
        .orderBy("t", F.desc("is_view"), "p_id")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carried = u.select(
        "is_view", "event_id", "k", "v_ts", F.col("t").alias("v_us"),
        F.last("p_id", ignorenulls=True).over(wb).alias("b_id"),
        F.last("p_us", ignorenulls=True).over(wb).alias("b_us"),
        F.last("p_ts", ignorenulls=True).over(wb).alias("b_ts"),
        F.first("p_id", ignorenulls=True).over(wf).alias("f_id"),
        F.first("p_us", ignorenulls=True).over(wf).alias("f_us"),
        F.first("p_ts", ignorenulls=True).over(wf).alias("f_ts"),
    ).filter(F.col("is_view") == 1)
    db = F.col("v_us") - F.col("b_us")
    df_ = F.col("f_us") - F.col("v_us")
    choose_b = F.col("b_id").isNotNull() & (
        F.col("f_id").isNull() | (db <= df_)
    )
    pick = lambda b, f: F.when(choose_b, F.col(b)).otherwise(F.col(f))  # noqa: E731
    return carried.select(
        "event_id",
        F.col("k").alias("user_id"),
        F.col("v_ts").alias("ts"),
        F.coalesce(pick("b_id", "f_id"), F.lit(-1)).alias(
            "nearest_purchase_id"
        ),
        pick("b_ts", "f_ts").alias("nearest_purchase_ts"),
        F.coalesce(
            F.when(choose_b, db).otherwise(df_).cast("long"), F.lit(-1)
        ).alias("delta_us"),
    )


@query(
    "join_asof_salted",
    oracle="""
    WITH ranked AS (
      SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice,
             row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
             ) AS rn
      FROM events e
      LEFT JOIN orders o
        ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    )
    SELECT event_id, user_id, ts, o_orderkey, o_totalprice
    FROM ranked WHERE rn = 1
    """,
)
def join_asof_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10 skew-hardened face: the SAME backward as-of semantics as
    `join_asof` (identical oracle, identical output), computed with
    the salted two-pass prefix-scan decomposition SCALING.md's
    round-12 section documents — the plan a deployment switches to
    when one pathological hot key would serialize the single-key
    carry window through one task.

    The running `last(..., ignorenulls)` carry is ASSOCIATIVE, so it
    decomposes exactly like a parallel prefix scan:

    1. salt every row by a fixed time grid (180-day buckets of `t` —
       data-independent, so no pre-pass) and run the union+window
       carry partitioned by (key, salt): a hot key's timeline now
       parallelizes across its buckets;
    2. per (key, salt), the bucket's FINAL order state is one
       `max(struct(t, o_orderkey, …))` aggregate (bucket = time range,
       so later bucket ⇒ strictly later t — the max IS the carry-out);
    3. a window over the TINY bucket-summary table (partitioned by
       key, ordered by salt, rows up to -1) gives each bucket its
       carry-IN from all prior buckets;
    4. event rows patch `coalesce(local_carry, carry_in)` via an
       equi-join on (key, salt) that REUSES the fact side's pass-1
       window partitioning — no forced broadcast: the carry table is
       keys × populated-salts rows (it grows with the key universe,
       not the hot key), so AQE picks broadcast only when it truly
       fits (the ×25 planted-hot-key run measured the forced form at
       55× the ×1 wall from the driver-side relation build alone).

    Tie-breaks are pinned exactly as in `join_asof` (order row sorts
    before an equal-time event; same-time orders resolve to the
    highest orderkey — step 2's struct max agrees because o_orderkey
    is the struct's second field). The fact table shuffles ONCE (the
    (k, salt) window exchange); everything after step 2 is
    bucket-summary-sized. `test_asof_salted_*` pins output equality
    with `join_asof` and the no-cartesian/no-BNLJ shape."""
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    left = e.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    right = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("bigint").alias("event_id"),
        "o_orderkey",
        "o_totalprice",
    )
    u = left.unionByName(right).withColumn(
        "salt",
        F.floor(F.unix_timestamp("t") / F.lit(180 * 86400)).cast("long"),
    )
    # pass 1: bucket-local carry (same ordering contract as join_asof)
    w_local = (
        Window.partitionBy("k", "salt")
        .orderBy(F.col("t"), F.col("is_event"), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = u.select(
        "k",
        "salt",
        "t",
        "is_event",
        "event_id",
        F.last("o_orderkey", ignorenulls=True).over(w_local).alias("lk"),
        F.last("o_totalprice", ignorenulls=True).over(w_local).alias("lp"),
    ).filter(F.col("is_event") == 1)
    # pass 2: carry-out per populated bucket (order rows only)
    summ = (
        u.filter(F.col("is_event") == 0)
        .groupBy("k", "salt")
        .agg(
            F.max(
                F.struct("t", "o_orderkey", "o_totalprice")
            ).alias("s")
        )
    )
    # pass 3: carry-in per bucket over the summary + event buckets
    buckets = u.select("k", "salt").distinct()
    w_prev = (
        Window.partitionBy("k")
        .orderBy("salt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = buckets.join(summ, ["k", "salt"], "left").select(
        "k",
        "salt",
        F.last("s", ignorenulls=True).over(w_prev).alias("prev"),
    )
    # pass 4: patch event rows whose bucket-local window saw no order.
    # LEFT join: a null-key event never equi-matches its own bucket
    # row, but the oracle's LEFT JOIN keeps it (with null order cols) —
    # an inner join would silently drop it.
    #
    # NO forced broadcast (r13 fix, caught by the ×25 planted-hot-key
    # scale run): `carry` is keys × populated-salts rows — "bucket-
    # summary-sized" grows with the KEY UNIVERSE, not the hot key, so
    # at ×25 a forced broadcast built a ~2M-row driver relation and
    # went 55× over the ×1 wall (83-105 s vs plain join_asof's 2.9 s).
    # The fact side is already hash-partitioned on (k, salt) by the
    # pass-1 window, so a plain equi-join reuses that exchange and
    # only carry shuffles; when carry IS small, AQE converts the join
    # to broadcast at runtime anyway (the right call at every scale).
    patched = local.join(carry, ["k", "salt"], "left")
    return patched.select(
        "event_id",
        F.col("k").alias("user_id"),
        F.col("t").alias("ts"),
        F.coalesce("lk", F.col("prev.o_orderkey")).alias("o_orderkey"),
        F.coalesce("lp", F.col("prev.o_totalprice")).alias("o_totalprice"),
    )
