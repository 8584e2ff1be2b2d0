"""Scale-mechanics tests: salted join exactness, bucketed-merge I/O
pruning (only touched buckets rewritten)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spark_streaming_with_debezium_spark.cdc.merge import ParquetStateTable
from spark_streaming_with_debezium_spark.operators.skew import salted_join
from spark_streaming_with_debezium_spark.sources.tables import load_table


def test_salted_join_exact(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    plain = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_join(
            o.withColumnRenamed("o_custkey", "k"),
            c.withColumnRenamed("c_custkey", "k"),
            on=["k"],
            n_salts=4,
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_rejects_outer(spark):
    """Right/full outer would duplicate unmatched small-side rows once
    per salt replica — salted_join must refuse those modes."""
    import pytest

    df = spark.range(4).withColumnRenamed("id", "k")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(df, df, on=["k"], how=how)
    # left stays allowed (unmatched BIG-side rows match no replica twice)
    left = salted_join(
        df, df.filter(F.col("k") < 2), on=["k"], n_salts=4, how="left"
    )
    assert left.count() == 4


def test_merge_rewrites_only_touched_buckets(spark, tmp_path):
    state = ParquetStateTable(spark, str(tmp_path / "st"), ["id"], n_buckets=16)
    snapshot = spark.createDataFrame(
        [(i, f"v{i}") for i in range(200)], "id long, val string"
    )
    state.init(snapshot)

    def mtimes():
        out = {}
        for d in os.listdir(state.path):
            if d.startswith("_bucket="):
                full = os.path.join(state.path, d)
                out[d] = max(
                    os.path.getmtime(os.path.join(full, f)) for f in os.listdir(full)
                )
        return out

    before = mtimes()
    changes = spark.createDataFrame(
        [(7, "v7b", False)], "id long, val string, deleted boolean"
    )
    state.merge(changes)
    after = mtimes()
    changed = {d for d in after if after[d] != before.get(d)}
    assert len(changed) == 1, f"expected 1 touched bucket, got {changed}"
    # and the data is correct
    vals = {r.id: r.val for r in state.read().collect()}
    assert vals[7] == "v7b" and vals[8] == "v8" and len(vals) == 200


def test_bucket_compaction(spark, tmp_path):
    """Fragmented buckets get rewritten to one file; data unchanged.

    Merges themselves never fragment (each touched bucket is swapped
    whole), so fragment one bucket by hand — split its file into
    per-row-group pieces the way an external appender would leave them.
    """
    import pyarrow.parquet as pq

    state = ParquetStateTable(spark, str(tmp_path / "st"), ["id"], n_buckets=2)
    state.init(
        spark.createDataFrame([(i, f"v{i}") for i in range(50)], "id long, v string")
    )
    before = sorted(map(tuple, state.read().collect()))

    bucket_dirs = [d for d in os.listdir(state.path) if d.startswith("_bucket=")]
    frag_dir = os.path.join(state.path, bucket_dirs[0])
    src_files = [f for f in os.listdir(frag_dir) if f.endswith(".parquet")]
    table = pq.read_table(os.path.join(frag_dir, src_files[0]))
    os.remove(os.path.join(frag_dir, src_files[0]))
    half = table.num_rows // 2
    pq.write_table(table.slice(0, half), os.path.join(frag_dir, "part-a.parquet"))
    pq.write_table(table.slice(half), os.path.join(frag_dir, "part-b.parquet"))
    pq.write_table(table.slice(0, 0), os.path.join(frag_dir, "part-c.parquet"))

    n = state.compact_buckets(min_files=2)
    assert n == 1
    after = sorted(map(tuple, state.read().collect()))
    assert after == before
    files = [f for f in os.listdir(frag_dir) if f.endswith(".parquet")]
    assert len(files) == 1
