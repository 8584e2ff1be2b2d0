"""Partitioned parquet layout — partition pruning, the first-line
scale mechanism.

At 100 TB the cheapest byte is the one never read: laying the fact
out as ``.../day=2024-01-05/part-*.parquet`` turns any day-ranged
predicate into directory pruning — the scan lists only matching
partitions, so a one-day query over a three-year table touches
~0.1% of the files BEFORE any row-group or filter pushdown applies.
Asserted in tests/test_plans.py::test_partitioned_write_prunes: the
physical scan must show the predicate under PartitionFilters (not
just PushedFilters) and read only the matching partition's files.

Policy encoded here:
- partition by LOW-cardinality, query-aligned keys (day, source,
  lang — never doc_id); aim for partitions ≥ 100 MB at target scale
  so the layout doesn't shatter into small files.
- combine with bucketing (sources/bucketed.py) inside partitions
  when the join key differs from the partition key.
- dynamic partition overwrite (set in the writer) replaces ONLY the
  partitions present in the incoming batch — the idempotent-replay
  primitive the streaming near-dup store relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: str | list[str],
    mode: str = "overwrite",
    dynamic: bool = True,
) -> None:
    """Write ``df`` as parquet partitioned by ``partition_cols``."""
    cols = [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
    writer = df.write.format("parquet").mode(mode).partitionBy(*cols)
    if dynamic and mode == "overwrite":
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.save(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout (partition columns come back as
    regular columns, usable in pruning predicates)."""
    return spark.read.parquet(path)
