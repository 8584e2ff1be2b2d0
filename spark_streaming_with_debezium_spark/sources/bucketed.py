"""Bucketed table layout — shuffle-free co-located joins.

The single biggest shuffle at 100 TB is the fact-to-fact equi join
(orders ⋈ lineitem on orderkey): both sides move over the network
every time the query runs. Bucketing pays that shuffle ONCE at write
time: each table is hash-partitioned into a fixed number of buckets by
the join key and the layout is recorded in the catalog, so every later
join (or groupBy) on that key reads matching buckets side-by-side —
Catalyst plans a SortMergeJoin with NO Exchange on either side
(asserted in tests/test_plans.py::test_bucketed_join_is_shuffle_free).

Scale rules encoded here:
- bucket count must MATCH across tables meant to join (Spark only
  elides the shuffle when both sides have the same bucketing); pick it
  once per subject area, sized so one bucket ≈ 100–500 MB at target
  scale (100 TB fact / 512 buckets ≈ 200 GB per bucket is too big;
  think 16k–64k buckets there — the count scales with data, the
  mechanism doesn't change).
- ``sortBy`` the bucket key so merge-join needs no sort at read time
  beyond a cheap per-file merge.
- bucketed output requires the session catalog (``saveAsTable``);
  pass ``path`` to keep the data external/relocatable.

Reference parity: the reference hands analytics to Spark SQL with
default layouts (README.md:34-40); this module is the layout policy a
100 TB deployment of the same pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    num_buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) parquet table."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, *keys)
        .sortBy(*keys)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left: str, right: str, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on the bucket key. With
    matching bucket counts this plans with zero Exchange operators —
    the point of the layout."""
    return spark.table(left).join(spark.table(right), on, how)
