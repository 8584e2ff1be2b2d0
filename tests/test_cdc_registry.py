"""Multi-table topic routing: one stream, two tables, independent state."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from spark_streaming_with_debezium_spark.cdc.envelope import TableSpec
from spark_streaming_with_debezium_spark.cdc.registry import CdcRegistry

RAW_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
    ]
)

CUSTOMERS = TableSpec(
    name="customers",
    key_cols=("id",),
    topic="dbserver1.inventory.customers",
    value_schema=T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("email", T.StringType())]
    ),
)
ORDERS = TableSpec(
    name="orders",
    key_cols=("id",),
    topic="dbserver1.inventory.orders",
    value_schema=T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("title", T.StringType())]
    ),
)


def env(spec, op, i, off, **fields):
    after = None if op == "d" else {"id": i, **fields}
    return (
        json.dumps({"payload": {"id": i}}),
        json.dumps(
            {
                "payload": {
                    "before": {"id": i} if op in ("d", "u") else None,
                    "after": after,
                    "source": {"ts_ms": 1},
                    "op": op,
                    "ts_ms": 1,
                }
            }
        ),
        spec.topic,
        0,
        off,
    )


def test_two_tables_one_stream(spark, tmp_path):
    reg = CdcRegistry(spark, str(tmp_path / "state"), n_buckets=4)
    cust_state = reg.register(CUSTOMERS)
    ord_state = reg.register(ORDERS)
    cust_state.init(spark.createDataFrame([], "id long, email string"))
    ord_state.init(spark.createDataFrame([], "id long, title string"))

    batch = [
        env(CUSTOMERS, "c", 1, 0, email="a@x.com"),
        env(ORDERS, "c", 1, 1, title="t-shirt"),  # same key, different table
        env(CUSTOMERS, "u", 1, 2, email="b@x.com"),
        env(ORDERS, "c", 2, 3, title="mug"),
        env(ORDERS, "d", 1, 4),
        ("{}", None, "dbserver1.inventory.orders", 0, 5),  # tombstone
        env(CUSTOMERS, "c", 9, 6, email="z@x.com"),
    ]
    reg.apply_batch(spark.createDataFrame(batch, RAW_SCHEMA))

    cust = {r.id: r.email for r in cust_state.read().collect()}
    orders = {r.id: r.title for r in ord_state.read().collect()}
    assert cust == {1: "b@x.com", 9: "z@x.com"}
    assert orders == {2: "mug"}


def test_registry_streaming_end_to_end(spark, tmp_path):
    import os

    reg = CdcRegistry(spark, str(tmp_path / "state"), n_buckets=4)
    cust_state = reg.register(CUSTOMERS)
    cust_state.init(spark.createDataFrame([], "id long, email string"))
    src = tmp_path / "src"
    src.mkdir()
    rows = [env(CUSTOMERS, "c", 5, 0, email="s@x.com")]
    with open(src / "b1.json", "w") as f:
        for key, value, topic, part, off in rows:
            f.write(
                json.dumps(
                    {"key": key, "value": value, "topic": topic,
                     "partition": part, "offset": off}
                )
                + "\n"
            )
    stream = spark.readStream.schema(RAW_SCHEMA).json(str(src))
    q = reg.run_stream(stream, os.path.join(str(tmp_path), "ckpt"))
    q.awaitTermination()
    assert {r.id: r.email for r in cust_state.read().collect()} == {5: "s@x.com"}


def test_unknown_topic_ignored(spark, tmp_path):
    reg = CdcRegistry(spark, str(tmp_path / "state"), n_buckets=4)
    cust_state = reg.register(CUSTOMERS)
    cust_state.init(spark.createDataFrame([], "id long, email string"))
    batch = [
        env(CUSTOMERS, "c", 1, 0, email="a@x.com"),
        ("{}", "{}", "dbserver1.inventory.unknown", 0, 1),
    ]
    reg.apply_batch(spark.createDataFrame(batch, RAW_SCHEMA))
    assert {r.id for r in cust_state.read().collect()} == {1}


def test_cli_runner_end_to_end(spark, tmp_path):
    """The spark-submit-able jobs: initial load then streaming upsert,
    driven through the argparse surface (the reference's two mains)."""
    import json as _json

    from spark_streaming_with_debezium_spark.cdc.run import build_parser, run

    snap_dir = tmp_path / "snap"
    snap_dir.mkdir()
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()

    def w(path, rows):
        with open(path, "w") as f:
            for key, value, topic, part, off in rows:
                f.write(
                    _json.dumps(
                        {"key": key, "value": value, "topic": topic,
                         "partition": part, "offset": off}
                    )
                    + "\n"
                )

    w(snap_dir / "s.json", [env(CUSTOMERS, "r", 1, 0, email="a@x.com"),
                            env(CUSTOMERS, "r", 2, 1, email="b@x.com")])
    w(stream_dir / "b1.json", [env(CUSTOMERS, "u", 1, 2, email="new@x.com"),
                               env(CUSTOMERS, "d", 2, 3)])

    common = [
        "--table", "customers", "--keys", "id",
        "--schema", "id long, email string",
        "--state", str(tmp_path / "state"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--n-buckets", "4",
    ]
    p = build_parser()
    run(p.parse_args(["--mode", "initial", "--source", "file",
                      "--input", str(snap_dir), *common]), spark=spark)
    run(p.parse_args(["--mode", "stream", "--source", "file",
                      "--input", str(stream_dir), *common]), spark=spark)

    from spark_streaming_with_debezium_spark.cdc.merge import ParquetStateTable

    state = ParquetStateTable(spark, str(tmp_path / "state" / "customers"), ["id"], 4)
    assert {(r.id, r.email) for r in state.read().collect()} == {(1, "new@x.com")}


def test_unknown_topic_dead_letter(spark, tmp_path):
    """Events on unregistered topics append to unknown_topic_dir (with
    the batch id) instead of silently vanishing; registered topics are
    unaffected."""
    import json

    from pyspark.sql import types as T

    from spark_streaming_with_debezium_spark.cdc.envelope import TableSpec
    from spark_streaming_with_debezium_spark.cdc.registry import CdcRegistry

    unk = str(tmp_path / "unknown")
    reg = CdcRegistry(
        spark, str(tmp_path / "state"), n_buckets=2, unknown_topic_dir=unk
    )
    spec = TableSpec(
        name="t1",
        key_cols=("id",),
        value_schema=T.StructType([T.StructField("id", T.LongType())]),
        topic="srv.db.t1",
    )
    st = reg.register(spec)
    st.init(spark.createDataFrame([], "id long"))

    def env(topic, i, off):
        return (
            topic,
            json.dumps({"payload": {"id": i}}),
            json.dumps(
                {
                    "payload": {
                        "before": None,
                        "after": {"id": i},
                        "source": {"ts_ms": 1},
                        "op": "c",
                        "ts_ms": 1,
                    }
                }
            ),
            0,
            off,
        )

    batch = spark.createDataFrame(
        [env("srv.db.t1", 1, 0), env("srv.db.NEWTABLE", 9, 1)],
        "topic string, key string, value string, partition int, offset long",
    )
    reg.apply_batch(batch, batch_id=7)
    assert [r["id"] for r in st.read().collect()] == [1]
    dead = spark.read.parquet(unk)
    rows = dead.collect()
    assert len(rows) == 1
    assert rows[0]["topic"] == "srv.db.NEWTABLE"
    assert rows[0]["batch_id"] == 7

    # Crash-replay of the SAME batch_id must not duplicate quarantined
    # rows (batch_id-partitioned dynamic overwrite, not blind append) —
    # while a genuinely new batch lands alongside the old one.
    reg.apply_batch(batch, batch_id=7)
    assert spark.read.parquet(unk).count() == 1
    reg.apply_batch(batch, batch_id=8)
    dead = spark.read.parquet(unk)
    assert dead.count() == 2
    assert {r["batch_id"] for r in dead.collect()} == {7, 8}
