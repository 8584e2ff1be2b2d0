"""Relational surface: filters, aggregations, sorts, set ops.

SURVEY §2.2 (P6/P7), §2.4 (G1–G5, G7), §2.6 (O1–O3), §2.7 (U1/U2) —
the query layer the reference delegates to spark-shell/Dremio/Superset
over its Delta output (`README.md:34-40`). Everything is declarative
DataFrame API: filters and projections reach the parquet scan
(PushedFilters), aggregates are partial+final HashAggregate inside
whole-stage codegen, top-k plans as TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_with_debezium_spark.functions.numeric import (
    davg,
    dstddev,
    dsum,
    sql_davg,
    sql_dstddev,
    sql_dsum,
)
from spark_streaming_with_debezium_spark.registry import query
from spark_streaming_with_debezium_spark.sources.tables import load_table


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analog (G1 + F7): filter → 8-agg groupBy.

    Flagship aggregate of the delegated BI layer. Decimal-interior sums
    keep results order-independent (scale + oracle determinism).
    """
    from spark_streaming_with_debezium_spark.sources.tables import (
        spread_small_scan,
    )

    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    # Spread the filtered, projected scan before the 8-aggregate
    # decimal groupBy: the single-row-group local file pins the whole
    # partial aggregation to one core otherwise (1.44-1.76 s ->
    # 1.08-1.25 s interleaved A/B at sf0.1; no-op on multi-split
    # scans, filter still pushed to the parquet footer).
    return (
        spread_small_scan(
            li.filter(
                F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
            ).select(
                "l_returnflag",
                "l_linestatus",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_tax",
            )
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "filter_predicates",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('F', 'O')
      AND o_totalprice BETWEEN 1000 AND 50000
      AND o_orderpriority LIKE '%URGENT%'
      AND NOT (o_custkey IS NULL)
      AND o_orderdate >= TIMESTAMP '2020-06-01 00:00:00'
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/P7: equality, range, IN, BETWEEN, LIKE, IS NULL, AND/OR/NOT —
    all pushed to the parquet scan (verified in tests via PushedFilters)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("F", "O")
        & F.col("o_totalprice").between(1000, 50000)
        & F.col("o_orderpriority").like("%URGENT%")
        & ~F.col("o_custkey").isNull()
        & (F.col("o_orderdate") >= F.lit("2020-06-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")


@query(
    "agg_count_distinct",
    oracle="""
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(*) AS n_customers
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2: distinct aggregation (two-phase partial distinct at scale)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           {s} AS total
    FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """.format(s=sql_dsum("o_totalprice")),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4: ROLLUP — multi-dim BI aggregate (grouping-sets expansion is a
    single shuffle in Spark's Expand operator)."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total")
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4: CUBE over the classic flag/status pair."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n"))


@query(
    "agg_filtered",
    oracle=f"""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
           {sql_dsum("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")}
             AS purchase_value
    FROM events GROUP BY user_id
    """,
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5: conditional aggregation (count/sum over predicates) — the
    'deletes vs upserts per batch' CDC-metrics shape."""
    e = load_table(spark, sf_dir, "events")
    is_p = F.col("event_type") == "purchase"
    return e.groupBy("user_id").agg(
        F.count(F.when(is_p, 1)).alias("n_purchase"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_error"),
        dsum(F.when(is_p, F.col("value")).otherwise(F.lit(0.0))).alias(
            "purchase_value"
        ),
    )


@query(
    "agg_stats",
    oracle=f"""
    SELECT l_returnflag,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           round({sql_dstddev('l_extendedprice')}, 2) AS std_price,
           {sql_davg('l_extendedprice')} AS avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G7: min/max/stddev/avg — stddev via exact decimal moments so both
    engines agree bitwise."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        # rounded: the variance subtraction amplifies decimal→double
        # conversion ulps differently per engine; 1e-10 relative error
        # vs a 0.005 rounding boundary is safe.
        F.round(dstddev("l_extendedprice"), 2).alias("std_price"),
        davg("l_extendedprice").alias("avg_price"),
    )


@query(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O2: global top-k. Plans as TakeOrderedAndProject — each
    partition keeps k rows, driver merges; no global sort at scale.
    Tie-broken on the key for determinism."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


@query(
    "set_ops",
    oracle="""
    WITH cust_nations AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
         supp_nations AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
    SELECT 'both' AS tag, nationkey FROM cust_nations
      INTERSECT SELECT 'both', nationkey FROM supp_nations
    UNION ALL
    SELECT 'cust_only' AS tag, nationkey FROM
      (SELECT nationkey FROM cust_nations EXCEPT SELECT nationkey FROM supp_nations)
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/U2: UNION ALL / INTERSECT / EXCEPT over nation keysets."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cn = c.select(F.col("c_nationkey").alias("nationkey")).distinct()
    sn = s.select(F.col("s_nationkey").alias("nationkey")).distinct()
    both = cn.intersect(sn).select(F.lit("both").alias("tag"), "nationkey")
    cust_only = cn.exceptAll(sn).select(F.lit("cust_only").alias("tag"), "nationkey")
    return both.unionByName(cust_only)


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2: DISTINCT (hash-aggregate without agg functions)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").distinct()


@query(
    "approx_count_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_orderkey) AS exact_orders,
           CAST(1 AS BIGINT) AS within_bound
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3: HyperLogLog++ cardinality — the 100 TB substitute for exact
    COUNT(DISTINCT) (no giant shuffle of distinct keys). Bound-check
    face (VERDICT r7 item 2): the estimate's value is engine-specific,
    so instead of a rows-only check the query emits the exact count
    plus ``within_bound`` = 1 iff |approx − exact| ≤ 3·rsd·exact + 1
    (rsd=0.01 requested ⇒ ±3σ = 3%); the oracle emits exact + literal
    1, so the driver's value hash certifies the published HLL++ bound
    deterministically. BIGINT 0/1 rather than BOOLEAN — integers are
    the hardest-tested class in the driver's pandas canonicalizer."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
    )
    return agg.select(
        "l_returnflag",
        "exact_orders",
        (
            F.abs(F.col("approx_orders") - F.col("exact_orders"))
            <= 0.03 * F.col("exact_orders") + F.lit(1.0)
        )
        .cast("long")
        .alias("within_bound"),
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT c_mktsegment,
           array_to_string(list(DISTINCT c_nationkey ORDER BY c_nationkey), ',')
             AS nations
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6: collect_set sorted for determinism (never rely on
    collect_list order — SURVEY §7.3). Output is the joined string —
    registered queries never emit array columns (the driver's
    canonicalizer can't hash them)."""
    c = load_table(spark, sf_dir, "customer")
    nations = F.array_sort(F.collect_set("c_nationkey"))
    return c.groupBy("c_mktsegment").agg(
        F.array_join(
            F.transform(nations, lambda x: x.cast("string")), ","
        ).alias("nations")
    )


@query(
    "agg_histogram",
    oracle=f"""
    SELECT CAST(floor(o_totalprice / 10000) AS BIGINT) AS price_bucket,
           COUNT(*) AS n,
           {sql_dsum('o_totalprice')} AS bucket_total
    FROM orders
    GROUP BY 1
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-family: value histogram via arithmetic bucketing (the portable
    width_bucket) — one hash aggregate, no sort."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 10000)
    return o.groupBy(bucket.alias("price_bucket")).agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("bucket_total")
    )
