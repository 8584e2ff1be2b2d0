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
