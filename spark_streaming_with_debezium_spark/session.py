"""SparkSession factory with scale-aware defaults.

The reference builds its session in SparkSessionWrapper.scala:13-19
(`local[*]`, no tuning). Here every conf is chosen for the 100 TB
target and merely *scaled down* for local testing:

- AQE on (runtime join re-selection, skew-join splitting, partition
  coalescing) — the knob that makes one logical plan survive a 1000×
  scale-up.
- ``spark.sql.shuffle.partitions`` ≈ cores locally; on a real cluster
  this should be 2-3× total executor cores (AQE coalesces down).
- Session timezone pinned to UTC so timestamps compare bit-for-bit
  against UTC-naive parquet readers (DuckDB oracle).
- Arrow enabled: every Pandas-UDF hop is vectorized batch transfer.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_SHUFFLE_PARTITIONS = max(8, os.cpu_count() or 8)


def get_spark(
    app_name: str = "spark_streaming_with_debezium_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    cluster, leave it unset and let spark-submit decide.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", _DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
