"""A/B: round-5 bucketed global-window rewrites vs their naive
single-task duals, at sf0.1 in one fresh JVM. The rewrites exist for
100 TB (a naive global window is a single-reducer wall at 10^8+ keys);
this run checks the price paid at SMALL scale, where the naive plan's
one-partition sort is cheap and the bucketed plan adds an
approxQuantile pass + a broadcast join. Prints one JSON line."""
import json
import sys
import time

sys.path.insert(0, sys.argv[1] if len(sys.argv) > 1 else "/root/repo")

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from spark_streaming_with_debezium_spark.registry import load_all
from spark_streaming_with_debezium_spark.sources.tables import load_table

SF = "/root/testdata/sf0.1"
qs = load_all()


def naive_pareto(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    tot = F.broadcast(
        per_user.agg(
            F.sum("n_events").cast("double").alias("total"),
            F.count(F.lit(1)).alias("n_users"),
        )
    )
    w = Window.orderBy(F.col("n_events").desc(), "user_id")
    ranked = per_user.select(
        "user_id",
        "n_events",
        F.sum("n_events")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("cum_events"),
        F.row_number().over(w).alias("rnk"),
    ).crossJoin(tot)
    share = F.col("cum_events") / F.col("total")
    return ranked.groupBy("n_users").agg(
        F.min(F.when(share >= 0.5, F.col("rnk"))).cast("long").alias("a"),
        F.min(F.when(share >= 0.8, F.col("rnk"))).cast("long").alias("b"),
        F.min(F.when(share >= 0.95, F.col("rnk"))).cast("long").alias("c"),
    )


def naive_abc(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(38,6)"
            )
        ).alias("revenue")
    )
    w_cum = Window.orderBy(F.col("revenue").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = per_part.select(
        "revenue",
        F.sum("revenue").over(w_cum).alias("cum_rev"),
        F.sum("revenue").over(Window.partitionBy()).alias("total_rev"),
    )
    share = F.col("cum_rev").cast("double") / F.col("total_rev").cast("double")
    classed = ranked.withColumn(
        "cls", F.when(share <= 0.8, "A").when(share <= 0.95, "B").otherwise("C")
    )
    return classed.groupBy("cls").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("revenue").cast("double"), 2).alias("rev"),
    )


def naive_rfm(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    ref = F.broadcast(o.agg(F.to_date(F.max("o_orderdate")).alias("ref_day")))
    per_cust = (
        o.crossJoin(ref)
        .groupBy("o_custkey", "ref_day")
        .agg(
            F.datediff("ref_day", F.to_date(F.max("o_orderdate"))).alias("r"),
            F.count(F.lit(1)).alias("f"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("m"),
        )
    )
    tiled = per_cust.select(
        "m",
        F.ntile(4).over(Window.orderBy("r", "o_custkey")).alias("rt"),
        F.ntile(4).over(Window.orderBy(F.col("f").desc(), "o_custkey")).alias("ft"),
        F.ntile(4).over(Window.orderBy(F.col("m").desc(), "o_custkey")).alias("mt"),
    )
    return tiled.groupBy("rt", "ft", "mt").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("m").cast("double"), 2).alias("tm"),
    )


PAIRS = [
    ("events_pareto_concentration", naive_pareto),
    ("parts_abc_classification", naive_abc),
    ("orders_rfm_segments", naive_rfm),
]

# warm both sides
for name, naive in PAIRS:
    qs[name].fn(spark, SF).count()
    naive(spark, SF).count()

out = {}
for name, naive in PAIRS:
    runs = {"bucketed": [], "naive": []}
    for _ in range(3):
        t0 = time.monotonic()
        qs[name].fn(spark, SF).count()
        runs["bucketed"].append(time.monotonic() - t0)
        t0 = time.monotonic()
        naive(spark, SF).count()
        runs["naive"].append(time.monotonic() - t0)
    out[name] = {k: round(sorted(v)[1], 3) for k, v in runs.items()}
print(json.dumps(out))
