"""Classic warehouse queries (TPC-H shapes) over the synthetic star
schema — the concrete form of the reference's delegated BI layer
(`README.md:34-40`): multi-join + filter + aggregate + top-k plans that
Catalyst compiles to broadcast joins over pruned scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_with_debezium_spark.functions.numeric import dsum, sql_davg, sql_dsum
from spark_streaming_with_debezium_spark.registry import query
from spark_streaming_with_debezium_spark.sources.tables import load_table

def _revenue() -> F.Column:
    # built lazily: composing Columns needs an active SparkContext,
    # which doesn't exist at import time
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_REVENUE_SQL = "l_extendedprice * (1 - l_discount)"


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum(_REVENUE_SQL)} AS revenue,
           CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
           o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, selective filters on both fact and
    dim sides, aggregate, top-10. Customer filter broadcast into the
    orders join; revenue decimal-exact for the oracle."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(_revenue()).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q5_region_volume",
    oracle=f"""
    SELECT n_name, {sql_dsum(_REVENUE_SQL)} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way snowflake join with a same-nation
    constraint (customer and supplier co-located), per-nation revenue."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(_revenue()).alias("revenue"))
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, {sql_dsum(_REVENUE_SQL)} AS revenue, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top-20."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(_revenue()).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           GROUPING(o_orderstatus) + 2 * GROUPING(o_orderpriority) AS gid
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4: explicit GROUPING SETS with grouping_id disambiguation (the
    SQL entry point — Spark's Expand operator under the hood)."""
    from spark_streaming_with_debezium_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               GROUPING(o_orderstatus) + 2 * GROUPING(o_orderpriority) AS gid
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "unpivot_melt",
    oracle="""
    SELECT c_custkey, metric, CAST(val AS DOUBLE) AS val
    FROM (
      SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer)
    """,
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide→long) via df.unpivot — the inverse of pivot;
    oracle is the portable UNION ALL form."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    ).unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "val")


def _rank_ok(le, lt, p: float, n):
    """1 iff an approx-percentile value whose occupied ranks are
    [lt+1, le] overlaps the guaranteed rank interval p·n ± ε·n
    (ε = 1/accuracy = 1e-4; ±2 rows of slack absorb floor/ceil
    boundary effects so the gate never flakes on exact multiples)."""
    eps = 1.0e-4
    lo = F.ceil((p - eps) * n) - F.lit(2)
    hi = F.floor((p + eps) * n) + F.lit(2)
    return ((le >= lo) & (lt <= hi)).cast("long")


@query(
    "agg_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_rows,
           CAST(1 AS BIGINT) AS median_ok,
           CAST(1 AS BIGINT) AS q1_ok,
           CAST(1 AS BIGINT) AS q3_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G7 approx path: percentile_approx — the 100 TB substitute for
    exact percentiles (Greenwald-Khanna-style sketch, no per-group
    sort). Bound-check face (VERDICT r7 item 2): the sketch guarantees
    a returned value whose RANK is within ±1/accuracy of the target
    quantile, so the query re-ranks each approx value in its group
    (one broadcast join of the 3-row-per-group result back to
    lineitem, one conditional-count pass) and emits 0/1 gates the
    DuckDB oracle mirrors with literal 1s — the driver hash then
    certifies the published rank bound deterministically instead of
    settling for a rows-only check."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    iqr = F.percentile_approx("l_extendedprice", [0.25, 0.75], 10000)
    ap = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("am"),
        iqr.getItem(0).alias("a1"),
        iqr.getItem(1).alias("a3"),
    )
    p = F.col("l_extendedprice")

    def _le(bound):
        return F.sum((p <= F.col(bound)).cast("long"))

    def _lt(bound):
        return F.sum((p < F.col(bound)).cast("long"))

    ranked = (
        li.join(F.broadcast(ap), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            _le("am").alias("le_m"),
            _lt("am").alias("lt_m"),
            _le("a1").alias("le_1"),
            _lt("a1").alias("lt_1"),
            _le("a3").alias("le_3"),
            _lt("a3").alias("lt_3"),
        )
    )
    n = F.col("n_rows")
    return ranked.select(
        "l_returnflag",
        "n_rows",
        _rank_ok(F.col("le_m"), F.col("lt_m"), 0.5, n).alias("median_ok"),
        _rank_ok(F.col("le_1"), F.col("lt_1"), 0.25, n).alias("q1_ok"),
        _rank_ok(F.col("le_3"), F.col("lt_3"), 0.75, n).alias("q3_ok"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           xor(o_orderkey, 255) AS xkey,
           o_orderkey & 15 AS low_bits,
           o_orderkey >> 4 AS shifted,
           o_orderkey | 1 AS odd_key
    FROM orders
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-family extension: bitwise ops (the LSH/bucketing primitives as
    a user-facing surface)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").bitwiseXOR(255).alias("xkey"),
        F.col("o_orderkey").bitwiseAND(15).alias("low_bits"),
        F.shiftright("o_orderkey", 4).alias("shifted"),
        F.col("o_orderkey").bitwiseOR(1).alias("odd_key"),
    )


@query(
    "q18_large_orders",
    oracle=f"""
    SELECT c_custkey, o_orderkey,
           CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
           {sql_dsum('l_quantity')} AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_custkey, o_orderkey, o_orderdate
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate subquery (large-volume
    orders) semi-joined back to the facts. Exercises agg → filter →
    semi join → re-aggregate; the HAVING sum is a plain long comparison
    (sum of halves-free doubles is engine-stable far from 150.0 —
    quantities are x.5-grained, so boundary sits at .5 exactly only if a
    sum equals 150.0, which both engines then exclude identically)."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("tq"))
        .filter(F.col("tq") > 150)
        .select("l_orderkey")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate")
        .agg(dsum("l_quantity").alias("total_qty"))
        .select("c_custkey", "o_orderkey", "o_orderdate", "total_qty")
    )


@query(
    "q12_shipmode_priority",
    oracle="""
    SELECT l_linestatus,
           COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
             AS high_line_count,
           COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
             AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate < o_orderdate + INTERVAL 90 DAY
    GROUP BY l_linestatus
    """,
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + date-arithmetic predicate + conditional
    counts by priority class."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_ratio",
    oracle=f"""
    SELECT round(
             100.0 * {sql_dsum("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
             / {sql_dsum('l_extendedprice * (1 - l_discount)')}, 6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
)
def q14_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: global ratio of conditional revenue (promo share)
    — both numerator and denominator decimal-exact, one final IEEE
    division + round."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = _revenue()
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    j = li.join(p, li.l_partkey == p.p_partkey)
    return j.agg(
        F.round(100.0 * dsum(promo) / dsum(rev), 6).alias("promo_revenue_pct")
    )


@query(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
       OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
       OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides — the
    optimizer must still push the common join key and per-side
    implied filters."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    c1 = (F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 11) & F.col("p_size").between(1, 5)
    c2 = (F.col("p_brand") == "Brand#2") & F.col("l_quantity").between(10, 20) & F.col("p_size").between(1, 10)
    c3 = (F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 30) & F.col("p_size").between(1, 15)
    return j.filter(c1 | c2 | c3).agg(
        dsum(_revenue()).alias("revenue"), F.count(F.lit(1)).alias("n")
    )


@query(
    "q22_global_sales_opportunity",
    oracle=f"""
    WITH avg_bal AS (
      SELECT {sql_davg('c_acctbal')} AS ab FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey,
           COUNT(*) AS n_cust,
           {sql_dsum('c_acctbal')} AS total_bal
    FROM customer
    WHERE c_acctbal > (SELECT ab FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold + NOT EXISTS anti
    join + aggregate — rich-but-inactive customers per nation. The
    threshold is a decimal-exact average so both engines agree on the
    exact comparison boundary."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    from spark_streaming_with_debezium_spark.functions.numeric import davg

    # Lazy scalar threshold: broadcast the 1-row aggregate and cross-join
    # it in, instead of an eager driver-side .collect() (keeps the whole
    # query one lazy plan and saves a job).
    threshold = c.filter(F.col("c_acctbal") > 0).agg(davg("c_acctbal").alias("ab"))
    return (
        c.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"), dsum("c_acctbal").alias("total_bal"))
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (5, 10, 15, 20)
    GROUP BY p_brand, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-count of suppliers per part attribute
    slice (two-phase distinct aggregation after a filtered join)."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(5, 10, 15, 20)
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + global aggregate — the scan-bound
    query every column store is judged on. All three predicates reach
    the parquet scan (PushedFilters); no shuffle except the final
    1-row partial/final aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS (semi join with a cross-side predicate) +
    aggregate. The schema has no commit/receipt dates, so "late" =
    shipped >60 days after order date — same correlated-EXISTS plan.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
           {sql_dsum(_REVENUE_SQL)} AS revenue
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      AND c_custkey = o_custkey
      AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by year.
    Both nation dims broadcast; the pair disjunction is applied after
    the cheap dim joins, never as a join condition on the fact side."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("n1_key"),
                              F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("n2_key"),
                              F.col("n_name").alias("cust_nation")))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(n1, s.s_nationkey == F.col("n1_key"))
        .join(n2, c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(dsum(_revenue()).alias("revenue"))
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey) t
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count histogram INCLUDING zero-order
    customers (left outer + COUNT(col) null semantics) — two stacked
    aggregations, the second one tiny."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # count(col): nulls excluded
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no, {sql_dsum(_REVENUE_SQL)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        AND l_suppkey IS NOT NULL  -- mirrors the Spark side's explicit filter
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, rev
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue view + scalar-max filter (ties kept).
    The max is a broadcast 1-row aggregate cross-joined in — lazy, no
    driver-side collect; exact-decimal revenue makes the equality
    comparison engine-stable. The explicit ``l_suppkey IS NOT NULL``
    matches the predicate the supplier join pushes into the other
    consumer of ``rev``, making both aggregate subtrees byte-identical
    so Catalyst's ReuseExchange scans lineitem ONCE (plan-asserted in
    tests/test_plans.py) — without it the max side re-scans and
    re-shuffles the fact table."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        & F.col("l_suppkey").isNotNull()
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(_revenue()).alias("total_revenue")
    )
    mx = F.broadcast(rev.agg(F.max("total_revenue").alias("_max_rev")))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(mx)
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND p_brand = 'Brand#3'
      AND l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average threshold.
    De-correlated the standard way: one aggregate per part joined back
    (Catalyst does the same rewrite for the SQL form). The correlation
    is only ever evaluated for BRANDED parts, so the per-part average
    semi-joins lineitem to the branded part keys first — the aggregate
    is O(branded lineitems), not O(all lineitems), and no |part|-sized
    table is force-broadcast (AQE picks the strategy; at 100 TB a
    brand's parts can exceed any broadcast threshold)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    # No forced broadcasts anywhere: a brand's parts are small at test
    # scale (AQE broadcasts them) but NOT provably broadcast-able at
    # 100 TB — forcing it would build an unbounded driver-side relation.
    branded = li.join(p, li.l_partkey == p.p_partkey)
    # per-part avg over ALL lineitems of that part (not just branded rows
    # — the subquery correlates on p_partkey only), restricted to the
    # branded part keys the outer query can actually reference
    branded_keys = p.select("p_partkey")
    avgq = (
        li.join(branded_keys, li.l_partkey == branded_keys.p_partkey, "left_semi")
        .groupBy(F.col("l_partkey").alias("_avg_part"))
        .agg(F.avg("l_quantity").alias("_avg_qty"))
    )
    return (
        branded.join(avgq, branded.l_partkey == F.col("_avg_part"))
        .filter(F.col("l_quantity") < 0.2 * F.col("_avg_qty"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double") / 7.0
             ).alias("avg_yearly")
        )
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           round(CAST(SUM(CAST(CASE WHEN nation = 'NATION_2' THEN volume ELSE 0 END
                         AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE), 6)
             AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             {_REVENUE_SQL} AS volume,
             n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2,
           region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND s_nationkey = n2.n_nationkey
        AND r_name = 'ASIA' AND p_type = 'PROMO'
    ) t
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of a region's PROMO
    volume per year — conditional sum over total sum, both with exact
    decimal interiors, rounded once at the end."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = F.broadcast(
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
            F.col("n_nationkey").alias("cust_nkey")
        )
    )
    n2 = F.broadcast(
        n.select(F.col("n_nationkey").alias("supp_nkey"), F.col("n_name").alias("nation"))
    )
    volume = _revenue().cast("decimal(38,6)")
    national = F.when(F.col("nation") == "NATION_2", volume).otherwise(
        F.lit(0).cast("decimal(38,6)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(n1, c.c_nationkey == F.col("cust_nkey"))
        .join(n2, s.s_nationkey == F.col("supp_nkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(national).cast("double") / F.sum(volume).cast("double"), 6
            ).alias("mkt_share")
        )
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT nation, o_year, {sql_dsum('amount')} AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             {_REVENUE_SQL} - p_retailprice * l_quantity AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%5%'
    ) t
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue − cost proxy) per nation-year for
    a part-name slice. Per-row double arithmetic is IEEE-identical in
    both engines; the sum is decimal-exact."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%5%"))
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    amount = _revenue() - F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(dsum(amount).alias("sum_profit"))
    )
