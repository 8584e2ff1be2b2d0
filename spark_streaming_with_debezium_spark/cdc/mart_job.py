"""CDC-to-marts build job — the reference's end use, composed.

The reference exists to land Debezium CDC into a queryable table that
downstream Spark SQL consumes (README.md:34-40, query1-5.sql). This
job is that consumption step as one runnable artifact: replay the CDC
change stream onto the customer snapshot (the same merge lineage the
oracle-checked ``cdc_current_state`` query verifies), then materialize
the standard marts a warehouse serves from it:

- ``customer_360``: current state enriched with nation/region
  (broadcast dims), partitioned by region — the lookup mart.
- ``region_balance``: the flagship per-region rollup
  (``cdc_state_rollup`` semantics — that query IS this mart's unit
  test).
- ``nation_top_customers``: top-5 customers by balance per nation —
  rank ≤ k per group, which plans with WindowGroupLimit (k rows per
  group per mapper; plan-asserted for this family in
  tests/test_plans.py).

Idempotence/scale: every mart is deterministic from its inputs and
written with dynamic partition overwrite (re-runs replace, never
double); the state merge shuffles once on the key; dims broadcast; no
mart adds a corpus-scale shuffle beyond its own group-by.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_streaming_with_debezium_spark.operators.cdc_queries import (
    _current_state,
)
from spark_streaming_with_debezium_spark.sources.partitioned import (
    write_partitioned,
)
from spark_streaming_with_debezium_spark.sources.tables import load_table


@dataclass(frozen=True)
class MartStats:
    n_state_rows: int
    n_customer_360: int
    n_region_rows: int
    n_top_customers: int


def build_customer_360(spark: SparkSession, sf_dir: str) -> DataFrame:
    state = _current_state(spark, sf_dir)
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        state.join(n, state.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select(
            "c_custkey",
            "c_name",
            "c_acctbal",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
    )


def build_nation_top_customers(
    spark: SparkSession, sf_dir: str, k: int = 5
) -> DataFrame:
    state = _current_state(spark, sf_dir)
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    w = Window.partitionBy("n_name").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    return (
        state.join(n, state.c_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= k)
    )


def run_mart_job(spark: SparkSession, sf_dir: str, out_dir: str) -> MartStats:
    """Materialize all marts under ``out_dir`` and return row counts."""
    from spark_streaming_with_debezium_spark.operators.cdc_queries import (
        cdc_state_rollup,
    )

    c360 = build_customer_360(spark, sf_dir)
    write_partitioned(c360, os.path.join(out_dir, "customer_360"), ["region"])
    rollup = cdc_state_rollup(spark, sf_dir)
    rollup.write.mode("overwrite").parquet(
        os.path.join(out_dir, "region_balance")
    )
    topc = build_nation_top_customers(spark, sf_dir)
    topc.write.mode("overwrite").parquet(
        os.path.join(out_dir, "nation_top_customers")
    )
    back_c360 = spark.read.parquet(os.path.join(out_dir, "customer_360"))
    return MartStats(
        n_state_rows=_current_state(spark, sf_dir).count(),
        n_customer_360=back_c360.count(),
        n_region_rows=spark.read.parquet(
            os.path.join(out_dir, "region_balance")
        ).count(),
        n_top_customers=spark.read.parquet(
            os.path.join(out_dir, "nation_top_customers")
        ).count(),
    )


def main(argv: list[str] | None = None) -> MartStats:
    """spark-submit-able entry (same pattern as llm.curation_job)."""
    import argparse

    from spark_streaming_with_debezium_spark.session import get_spark

    p = argparse.ArgumentParser(description="CDC-to-marts build")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    args = p.parse_args(argv)
    spark = get_spark("mart-job")
    try:
        stats = run_mart_job(spark, args.input, args.output)
        print(
            f"marts done: state={stats.n_state_rows} "
            f"c360={stats.n_customer_360} regions={stats.n_region_rows} "
            f"top={stats.n_top_customers}"
        )
        return stats
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
