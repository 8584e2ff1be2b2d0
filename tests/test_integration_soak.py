"""Brokerless analog of the reference's StreamingIT: ONE pipeline
combining every CDC subsystem — multi-table topic routing, transaction
atomicity across tables and micro-batches, crash-replay idempotency,
unknown-topic dead-lettering, and in-band schema drift with state
evolution — asserted batch by batch against exact expected states.

The reference's integration test (`StreamingIT.scala:19-33`) runs
Kafka+MySQL+Debezium containers to produce this event flow; here the
same wire-format batches are synthesized and pushed through the same
foreachBatch body the stream would invoke, which exercises every
engine-side path the containers would (the broker subscription itself
stays env-bound, per README)."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from spark_streaming_with_debezium_spark.cdc.envelope import TableSpec
from spark_streaming_with_debezium_spark.cdc.registry import CdcRegistry
from spark_streaming_with_debezium_spark.cdc.transactions import (
    TxnBuffer,
    apply_batch_transactional,
)

RAW_COLS = "topic string, key string, value string, partition int, offset long"
TXN_TOPIC = "srv.transaction"

ORDER_FIELDS = [
    {"type": "int64", "optional": False, "field": "id"},
    {"type": "int64", "optional": True, "field": "total"},
]
CUST_FIELDS = [
    {"type": "int64", "optional": False, "field": "id"},
    {"type": "string", "optional": True, "field": "email"},
]


def _connect_schema(fields):
    row = {"type": "struct", "fields": fields, "optional": True}
    return {
        "type": "struct",
        "fields": [
            {**row, "field": "before"},
            {**row, "field": "after"},
            {"type": "string", "optional": False, "field": "op"},
            {"type": "int64", "optional": True, "field": "ts_ms"},
        ],
        "name": "srv.db.Envelope",
    }


def _env(topic, op, key_id, off, fields, txn=None, schema_fields=None):
    payload = {
        "before": {"id": key_id} if op in ("d", "u") else None,
        "after": None if op == "d" else {"id": key_id, **fields},
        "source": {"ts_ms": 1000 + off},
        "op": op,
        "ts_ms": 1000 + off,
    }
    if txn is not None:
        payload["transaction"] = {"id": txn, "total_order": off}
    value = {"payload": payload}
    if schema_fields is not None:
        value["schema"] = _connect_schema(schema_fields)
    return (
        topic,
        json.dumps({"payload": {"id": key_id}}),
        json.dumps(value),
        0,
        off,
    )


def _end(txn, n, off):
    return (
        TXN_TOPIC,
        json.dumps({"payload": {"id": txn}}),
        json.dumps({"payload": {"status": "END", "id": txn, "event_count": n}}),
        0,
        off,
    )


def test_full_cdc_soak(spark, tmp_path):
    unk = str(tmp_path / "unknown")
    reg = CdcRegistry(
        spark,
        str(tmp_path / "state"),
        n_buckets=4,
        drift_policy="evolve",
        unknown_topic_dir=unk,
    )
    orders_spec = TableSpec(
        name="orders",
        key_cols=("id",),
        value_schema=T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("total", T.LongType()),
            ]
        ),
        topic="srv.db.orders",
    )
    cust_spec = TableSpec(
        name="customers",
        key_cols=("id",),
        value_schema=T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("email", T.StringType()),
            ]
        ),
        topic="srv.db.customers",
    )
    so = reg.register(orders_spec)
    sc = reg.register(cust_spec)
    so.init(spark.createDataFrame([(1, 10)], "id long, total long"))
    sc.init(spark.createDataFrame([(1, "a@x")], "id long, email string"))
    buf = TxnBuffer(spark, str(tmp_path / "txnbuf"))

    def orders_state():
        return {r["id"]: tuple(r)[1:] for r in so.read().collect()}

    def cust_state():
        return {r["id"]: tuple(r)[1:] for r in sc.read().collect()}

    # --- batch 0: plain (non-txn) traffic + an unknown topic ---------
    b0 = spark.createDataFrame(
        [
            _env("srv.db.orders", "u", 1, 0, {"total": 11}),
            _env("srv.db.orders", "c", 2, 1, {"total": 20}),
            _env("srv.db.customers", "c", 2, 2, {"email": "b@x"}),
            _env("srv.db.NEWTABLE", "c", 9, 3, {"total": 9}),
        ],
        RAW_COLS,
    )
    apply_batch_transactional(reg, buf, b0, TXN_TOPIC, batch_id=0)
    assert orders_state() == {1: (11,), 2: (20,)}
    assert cust_state() == {1: ("a@x",), 2: ("b@x",)}
    assert spark.read.parquet(unk).count() == 1

    # --- crash-replay of batch 0: everything idempotent --------------
    apply_batch_transactional(reg, buf, b0, TXN_TOPIC, batch_id=0)
    assert orders_state() == {1: (11,), 2: (20,)}
    assert cust_state() == {1: ("a@x",), 2: ("b@x",)}
    assert spark.read.parquet(unk).count() == 1, "dead-letter re-appended"

    # --- batch 1: HALF of a cross-table transaction (no END yet) -----
    b1 = spark.createDataFrame(
        [
            _env("srv.db.orders", "u", 2, 10, {"total": 99}, txn="tx1"),
        ],
        RAW_COLS,
    )
    apply_batch_transactional(reg, buf, b1, TXN_TOPIC, batch_id=1)
    # torn-transaction guard: NOTHING visible yet
    assert orders_state() == {1: (11,), 2: (20,)}
    ev, _ends, _applied = buf.read()
    assert ev.count() == 1  # buffered, not applied

    # --- batch 2: rest of tx1 + END → atomic across both tables ------
    b2 = spark.createDataFrame(
        [
            _env("srv.db.customers", "u", 2, 11, {"email": "paid@x"}, txn="tx1"),
            _end("tx1", 2, 12),
        ],
        RAW_COLS,
    )
    apply_batch_transactional(reg, buf, b2, TXN_TOPIC, batch_id=2)
    assert orders_state() == {1: (11,), 2: (99,)}
    assert cust_state() == {1: ("a@x",), 2: ("paid@x",)}
    ev, ends, _applied = buf.read()
    assert ev.count() == 0 and ends.count() == 0, "buffer must drain"

    # --- batch 3: schema drift (customers gains loyalty_tier) --------
    drifted = CUST_FIELDS + [
        {"type": "string", "optional": True, "field": "loyalty_tier"}
    ]
    b3 = spark.createDataFrame(
        [
            _env(
                "srv.db.customers", "c", 3, 20,
                {"email": "c@x", "loyalty_tier": "gold"},
                schema_fields=drifted,
            ),
        ],
        RAW_COLS,
    )
    apply_batch_transactional(reg, buf, b3, TXN_TOPIC, batch_id=3)
    got = {r["id"]: (r["email"], r["loyalty_tier"]) for r in sc.read().collect()}
    # pre-drift rows read NULL-filled; the drifted row carries its value
    assert got == {1: ("a@x", None), 2: ("paid@x", None), 3: ("c@x", "gold")}
    # orders untouched by the customers drift
    assert orders_state() == {1: (11,), 2: (99,)}

    # --- batch 4: post-drift traffic uses the evolved spec -----------
    b4 = spark.createDataFrame(
        [
            _env(
                "srv.db.customers", "u", 1, 30,
                {"email": "a@x", "loyalty_tier": "silver"},
                schema_fields=drifted,
            ),
            _env("srv.db.orders", "d", 1, 31, {}),
        ],
        RAW_COLS,
    )
    apply_batch_transactional(reg, buf, b4, TXN_TOPIC, batch_id=4)
    got = {r["id"]: (r["email"], r["loyalty_tier"]) for r in sc.read().collect()}
    assert got[1] == ("a@x", "silver")
    assert orders_state() == {2: (99,)}  # id=1 deleted
