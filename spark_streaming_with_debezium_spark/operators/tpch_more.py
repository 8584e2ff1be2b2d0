"""The remaining classic TPC-H shapes (Q2/Q11/Q20/Q21), adapted to the
synthetic star schema — the last gaps in the BI layer the reference
delegates wholesale to Spark SQL (`README.md:34-40`).

The testdata has no ``partsupp`` table and lineitem carries no
receipt/commit dates, so each query keeps its CANONICAL PLAN SHAPE —
argmin-per-group over a region-filtered join (Q2), value share against
a scalar-subquery threshold (Q11), dominant-share semi-join (Q20),
multi-supplier blame attribution via exists/not-exists semantics
(Q21) — with the availability/lateness predicates re-expressed over
lineitem facts.

Determinism discipline (see functions/numeric.py): every aggregate a
comparison or ratio depends on accumulates in DECIMAL(38,6) and casts
to double once, so Spark and DuckDB rank/filter on bit-identical
values; ratios are single IEEE divisions of those identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_streaming_with_debezium_spark.functions.numeric import dsum, sql_dsum
from spark_streaming_with_debezium_spark.registry import query
from spark_streaming_with_debezium_spark.sources.tables import load_table

_REVENUE_SQL = "l_extendedprice * (1 - l_discount)"


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH costs AS (
      SELECT l.l_partkey, l.l_suppkey, s.s_name, n.n_name,
             {sql_dsum('l.l_extendedprice')}
               / {sql_dsum('l.l_quantity')} AS unit_cost
      FROM lineitem l, supplier s, nation n, region r
      WHERE l.l_suppkey = s.s_suppkey
        AND s.s_nationkey = n.n_nationkey
        AND n.n_regionkey = r.r_regionkey
        AND r.r_name = 'EUROPE'
      GROUP BY 1, 2, 3, 4
    ), ranked AS (
      SELECT c.*, p.p_type,
             ROW_NUMBER() OVER (
               PARTITION BY c.l_partkey
               ORDER BY c.unit_cost, c.l_suppkey
             ) AS rk
      FROM costs c JOIN part p ON c.l_partkey = p.p_partkey
      WHERE p.p_type = 'STANDARD'
    )
    SELECT l_partkey AS p_partkey, p_type, s_name, n_name,
           round(unit_cost, 6) AS unit_cost
    FROM ranked WHERE rk = 1
    ORDER BY unit_cost, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier per part within a region),
    re-based on observed lineitem unit cost since the schema has no
    partsupp: per (part, supplier) the decimal-exact avg unit price,
    then argmin-per-part via ROW_NUMBER with a suppkey tie-break.

    Plan: region/nation broadcast into the supplier dim, supplier
    broadcast into the lineitem scan, ONE shuffle on the
    (partkey, suppkey) group, window over partkey rides the same hash
    partitioning, part dim broadcast for the type filter. TakeOrdered
    for the top-100. At 100 TB the only full-fact shuffle is the
    2-key aggregate — uniform keys, map-side combined."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    eu_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )
    costs = (
        li.join(F.broadcast(eu_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey", "s_name", "n_name")
        .agg(
            (dsum("l_extendedprice") / dsum("l_quantity")).alias("unit_cost")
        )
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_cost", "l_suppkey")
    return (
        costs.join(F.broadcast(p), costs.l_partkey == p.p_partkey)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_type",
            "s_name",
            "n_name",
            F.round("unit_cost", 6).alias("unit_cost"),
        )
        .orderBy("unit_cost", "p_partkey")
        .limit(100)
    )


@query(
    "q11_important_value_share",
    oracle=f"""
    WITH per_part AS (
      SELECT l.l_partkey, {sql_dsum(_REVENUE_SQL)} AS value
      FROM lineitem l, supplier s, nation n
      WHERE l.l_suppkey = s.s_suppkey
        AND s.s_nationkey = n.n_nationkey
        AND n.n_name = 'NATION_3'
      GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
      FROM per_part
    )
    SELECT l_partkey, round(value, 6) AS value,
           round(value / total, 6) AS share
    FROM per_part, tot
    WHERE value > 0.0005 * total
    ORDER BY value DESC, l_partkey
    """,
)
def q11_important_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (parts holding a significant share of one
    nation's supplied value, threshold from a scalar subquery),
    re-based on shipped revenue since the schema has no partsupp.

    Plan: nation filter broadcast into supplier, supplier broadcast
    into lineitem, one shuffle on partkey, then the scalar total
    re-aggregated FROM the per-part result (exact decimal sums are
    associative, so sum-of-group-sums equals the direct sum) and
    broadcast back as a 1-row cross join. The two consumers of the
    per-part aggregate are byte-identical subtrees, so AQE's runtime
    exchange reuse collapses them to ONE lineitem scan — asserted
    post-execution in tests/test_plans.py (same discipline as q15's
    revenue exchange)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    nat_supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey"
    )
    per_part = (
        li.join(F.broadcast(nat_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(dsum(_revenue()).alias("value"))
    )
    tot = F.broadcast(
        per_part.agg(
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("total")
        )
    )
    return (
        per_part.crossJoin(tot)
        .filter(F.col("value") > 0.0005 * F.col("total"))
        .select(
            "l_partkey",
            F.round("value", 6).alias("value"),
            F.round(F.col("value") / F.col("total"), 6).alias("share"),
        )
        .orderBy(F.col("value").desc(), "l_partkey")
    )


@query(
    "q20_dominant_supplier",
    oracle=f"""
    WITH per_ps AS (
      SELECT l_partkey, l_suppkey, {sql_dsum('l_quantity')} AS supp_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1, 2
    ), per_part AS (
      SELECT l_partkey,
             CAST(SUM(CAST(supp_qty AS DECIMAL(38,6))) AS DOUBLE) AS part_qty
      FROM per_ps GROUP BY 1
    )
    SELECT DISTINCT s.s_name, s.s_acctbal
    FROM per_ps ps
    JOIN per_part pp ON ps.l_partkey = pp.l_partkey
    JOIN supplier s ON ps.l_suppkey = s.s_suppkey
    WHERE ps.supp_qty > 0.5 * pp.part_qty
    ORDER BY s.s_name
    """,
)
def q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (suppliers holding excess availability of a
    part), re-based on shipped quantity: a supplier qualifies when it
    shipped more than half of some part's total 1997 volume — the
    same two-level aggregate + threshold-join + supplier semi-join
    plan as canonical Q20's partsupp/available-quantity form.

    Plan: ONE filtered fact scan (date filter pushed to parquet),
    shuffle on (partkey, suppkey), then the per-part total as a WINDOW
    sum over partkey rather than a groupBy + join-back — the join-back
    formulation recomputes the whole aggregate lineage for the second
    consumer (the fact would be scanned twice; verified via
    .explain). One extra exchange partkey-only for the window, then a
    broadcast supplier dim lookup and distinct."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        dsum("l_quantity").alias("supp_qty")
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        per_ps.withColumn(
            "part_qty",
            F.sum(F.col("supp_qty").cast("decimal(38,6)"))
            .over(w)
            .cast("double"),
        )
        .filter(F.col("supp_qty") > 0.5 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        dominant.join(F.broadcast(s), dominant.l_suppkey == s.s_suppkey)
        .select("s_name", "s_acctbal")
        .distinct()
        .orderBy("s_name")
    )


@query(
    "q21_blamed_supplier",
    oracle="""
    WITH fl AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey, l.l_returnflag
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
    ), per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN l_returnflag = 'R'
                                 THEN l_suppkey END) AS n_ret
      FROM fl GROUP BY 1
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS n_blamed
    FROM fl
    JOIN per_order po ON fl.l_orderkey = po.l_orderkey
    JOIN supplier s ON fl.l_suppkey = s.s_suppkey
    WHERE fl.l_returnflag = 'R' AND po.n_supp >= 2 AND po.n_ret = 1
    GROUP BY s.s_name
    ORDER BY n_blamed DESC, s_name
    LIMIT 100
    """,
)
def q21_blamed_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who alone held up multi-supplier
    orders). The schema has no receipt/commit dates, so "kept waiting"
    is re-expressed as: in a finished ('F') order involving >= 2
    suppliers, exactly ONE supplier's items came back returned ('R') —
    that supplier is blamed. Canonical Q21's correlated
    EXISTS (another supplier) / NOT EXISTS (another late supplier)
    pair is the same predicate as the per-order (n_supp >= 2,
    n_ret = 1) counts — but the count formulation scans the fact ONCE
    and shuffles on orderkey once, where the textbook
    exists/not-exists plan self-joins lineitem twice.

    Plan: fact join to 'F' orders, distinct (order, supplier, flag)
    triples, per-order counts as WINDOW collect_sets over orderkey
    (a groupBy + join-back would recompute the whole triple lineage
    for the second consumer — fact scanned twice, verified via
    .explain), broadcast supplier dim for names, TakeOrdered top-100.
    The window arrays are bounded by the distinct suppliers of one
    order (single-digit), never by order size."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    s = load_table(spark, sf_dir, "supplier")
    fl = (
        li.join(o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey", "l_returnflag")
        .distinct()
    )
    wo = Window.partitionBy("l_orderkey")
    blamed = (
        fl.withColumn(
            "n_supp", F.size(F.collect_set("l_suppkey").over(wo))
        )
        .withColumn(
            "n_ret",
            F.size(
                F.collect_set(
                    F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
                ).over(wo)
            ),
        )
        .filter(
            (F.col("l_returnflag") == "R")
            & (F.col("n_supp") >= 2)
            & (F.col("n_ret") == 1)
        )
    )
    return (
        blamed.join(F.broadcast(s), blamed.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n_blamed"))
        .orderBy(F.col("n_blamed").desc(), "s_name")
        .limit(100)
    )
