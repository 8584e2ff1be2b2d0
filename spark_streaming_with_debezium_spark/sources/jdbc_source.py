"""JDBC source/sink (SURVEY §2.1 S4).

The reference threads a ``jdbcConfig`` (Postgres) through both jobs but
never uses it (`StreamingUtils.scala:3`, dead per its README:50). Here
the connector is a real, usable wrapper — but partition-aware, because
an unpartitioned JDBC read is a single-task scan:

- ``read_jdbc`` splits the scan into ``num_partitions`` range slices on
  a numeric column, so a large table loads in parallel.
- ``write_jdbc`` batches inserts.

No Postgres/MySQL driver jar ships in this environment (calls fail
with Spark's own driver-not-found error, which tests assert), but the
Spark JVM bundles Apache Derby — ``tests/test_jdbc_roundtrip.py``
round-trips through an EMBEDDED ``jdbc:derby:memory:`` database,
asserting write → partitioned parallel read → predicate pushdown into
the JDBC relation, closing the reference's live-database-assert gap
(StreamingIT.scala:42) inside the sandbox.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    user: str = "",
    password: str = "",
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    driver: str | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
    )
    if driver is not None:
        reader = reader.option("driver", driver)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound or 0))
            .option("upperBound", str(upper_bound or 1_000_000))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    user: str = "",
    password: str = "",
    batch_size: int = 10_000,
    driver: str | None = None,
    options: dict[str, str] | None = None,
) -> None:
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("batchsize", str(batch_size))
    )
    if driver is not None:
        writer = writer.option("driver", driver)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.mode(mode).save()
