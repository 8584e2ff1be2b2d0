"""Debezium logical-type decoding (Connect Decimal bytes, epoch-day
Date, Micro/Milli Timestamp) — the wire formats a real MySQL
`orders(price DECIMAL, order_date DATE)` table ships that the
reference never decodes (its demo tables are int/varchar only,
`StreamingIT.scala:108`; envelope parsing at
`DebeziumDeltaFormatter.scala:32-74` types columns directly).

Fixtures here are REAL Debezium 1.x encodings produced with Python's
int.to_bytes (the same minimal big-endian two's complement Java's
BigInteger.toByteArray emits), not the repo's own Catalyst encoder —
so the decoder is checked against an independent ground truth.
"""

from __future__ import annotations

import base64
import datetime as dt
import json
from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_streaming_with_debezium_spark.cdc.compact import compact_latest
from spark_streaming_with_debezium_spark.cdc.envelope import (
    TableSpec,
    connect_decimal,
    decode_logical,
    encode_connect_decimal,
    normalize_logical,
    parse_envelope,
    wire_type,
)
from spark_streaming_with_debezium_spark.cdc.merge import apply_changes


def _minimal_bytes(v: int) -> bytes:
    """Java BigInteger.toByteArray: minimal big-endian two's complement."""
    n = max(1, (v.bit_length() + 8) // 8)
    return v.to_bytes(n, "big", signed=True)


def _b64(v: int, width: int | None = None) -> str:
    b = (
        v.to_bytes(width, "big", signed=True)
        if width is not None
        else _minimal_bytes(v)
    )
    return base64.b64encode(b).decode()


# ---------------------------------------------------------------------------
# connect_decimal kernel
# ---------------------------------------------------------------------------


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.integers(min_value=-(10**38) + 1, max_value=10**38 - 1),
        min_size=1,
        max_size=40,
    )
)
def test_connect_decimal_matches_python(spark, vals):
    """Decode(minimal two's complement bytes) == the Python integer,
    across the FULL DECIMAL(38) unscaled range, negatives included."""
    rows = [(i, _b64(v), str(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "i int, b64 string, expect string")
    out = df.select(
        "expect", connect_decimal(F.col("b64"), 38, 0).cast("string").alias("got")
    ).collect()
    assert all(r.got == r.expect for r in out), [
        (r.expect, r.got) for r in out if r.got != r.expect
    ][:5]


def test_connect_decimal_padded_encodings(spark):
    """Non-minimal (sign-extended) encodings are legal Connect wire
    values and must decode identically — 0x00FF == 0xFF as +255 vs -1
    is exactly the distinction the sign-extension path must keep."""
    cases = [
        (255, 2),  # 0x00FF → +255 (minimal 0xFF would be -1)
        (-1, 4),  # 0xFFFFFFFF → -1
        (-129, 8),  # full sign-extended long width
        (0, 3),
        (12345678, 8),  # the repo encoder's fixed-8-byte form
    ]
    rows = [(str(v), _b64(v, w)) for v, w in cases]
    df = spark.createDataFrame(rows, "expect string, b64 string")
    out = df.select(
        "expect", connect_decimal(F.col("b64"), 38, 0).cast("string").alias("got")
    ).collect()
    assert all(r.got == r.expect for r in out), out


def test_connect_decimal_scale_and_bounds(spark):
    got = (
        spark.createDataFrame(
            [
                (_b64(-1050),),  # → -10.50
                (_b64(999),),  # → 9.99
                (_b64(10**40, 18),),  # corrupt: 41-digit magnitude → NULL
                (None,),  # NULL wire value → NULL
                (_b64(7, 22),),  # 22-byte padding: beyond bound → NULL
            ],
            "b64 string",
        )
        .select(connect_decimal(F.col("b64"), 10, 2).alias("d"))
        .collect()
    )
    assert got[0].d == Decimal("-10.50")
    assert got[1].d == Decimal("9.99")
    assert got[2].d is None
    assert got[3].d is None
    assert got[4].d is None


def test_connect_decimal_full_38_digit_range(spark):
    """DECIMAL(38) extremes (16-byte minimal encodings) and padded
    variants decode exactly; values one digit beyond 38 go NULL."""
    hi = 10**38 - 1
    cases = [
        (str(hi), _b64(hi)),  # 16 bytes minimal
        (str(-hi), _b64(-hi)),
        (str(hi), _b64(hi, 20)),  # zero-padded
        (str(-hi), _b64(-hi, 20)),  # FF-sign-padded
        (None, _b64(10**38)),  # 39 digits → overflow → NULL
        (None, _b64(-(10**38))),
    ]
    df = spark.createDataFrame(cases, "expect string, b64 string")
    out = df.select(
        "expect", connect_decimal(F.col("b64"), 38, 0).cast("string").alias("got")
    ).collect()
    assert all(r.got == r.expect for r in out), [
        (r.expect, r.got) for r in out if r.got != r.expect
    ]


def test_encoder_decoder_roundtrip_hypothesis(spark):
    vals = [0, 1, -1, 10**17, -(10**17), 2**55, -(2**55), 42]
    df = spark.createDataFrame([(v,) for v in vals], "u long")
    out = df.select(
        "u", connect_decimal(encode_connect_decimal(F.col("u")), 20, 2).alias("d")
    ).collect()
    assert all(Decimal(r.u).scaleb(-2) == r.d for r in out)


# ---------------------------------------------------------------------------
# temporal decoders + annotation plumbing
# ---------------------------------------------------------------------------


def test_temporal_decoders(spark):
    r = (
        spark.range(1)
        .select(
            decode_logical(F.lit(19000).cast("int"), "date").alias("d"),
            decode_logical(F.lit(-365).cast("int"), "date").alias("d_neg"),
            decode_logical(
                F.lit(1700000000123456).cast("long"), "timestamp-micros"
            ).alias("us"),
            decode_logical(
                F.lit(1700000000123).cast("long"), "timestamp-millis"
            ).alias("ms"),
            decode_logical(
                F.lit("2024-03-01T12:34:56.789Z"), "zoned-timestamp"
            ).alias("z"),
            decode_logical(F.lit(3723000000).cast("long"), "time-micros").alias(
                "tod"
            ),
        )
        .collect()[0]
    )
    assert r.d == dt.date(2022, 1, 8)
    assert r.d_neg == dt.date(1969, 1, 1)
    assert r.us == dt.datetime(2023, 11, 14, 22, 13, 20, 123456)
    assert r.ms == dt.datetime(2023, 11, 14, 22, 13, 20, 123000)
    assert r.z == dt.datetime(2024, 3, 1, 12, 34, 56, 789000)
    assert r.tod == 3723000000  # 01:02:03, passes through (no TIME type)


def test_debezium_class_name_aliases():
    assert normalize_logical("io.debezium.time.Date") == "date"
    assert normalize_logical("io.debezium.time.MicroTimestamp") == "timestamp-micros"
    assert normalize_logical("io.debezium.time.Timestamp") == "timestamp-millis"
    assert normalize_logical("io.debezium.time.ZonedTimestamp") == "zoned-timestamp"
    assert normalize_logical("DECIMAL(10, 2)") == "decimal(10,2)"
    assert wire_type("decimal(10,2)") == T.StringType()
    assert wire_type("date") == T.IntegerType()
    assert wire_type("io.debezium.time.MicroTimestamp") == T.LongType()
    with pytest.raises(ValueError):
        normalize_logical("io.debezium.time.NanoDuration")


# ---------------------------------------------------------------------------
# golden: a DECIMAL/DATE orders table through envelope → merge
# ---------------------------------------------------------------------------

_ORDERS_SPEC = TableSpec(
    name="orders",
    key_cols=("order_id",),
    value_schema=T.StructType(
        [
            T.StructField("order_id", T.LongType()),
            T.StructField("price", T.DecimalType(10, 2)),
            T.StructField("order_date", T.DateType()),
            T.StructField("updated_at", T.TimestampType()),
        ]
    ),
    logical=(
        ("price", "org.apache.kafka.connect.data.Decimal"),
        ("order_date", "io.debezium.time.Date"),
        ("updated_at", "io.debezium.time.MicroTimestamp"),
    ),
)


def _env(op, order_id, price_cents, epoch_day, micros, offset, before=None):
    """A Debezium 1.x value envelope with REAL wire encodings.
    ``before`` = (price_cents, epoch_day, micros) for update/delete."""

    def row(cents, day, us):
        return {
            "order_id": order_id,
            "price": _b64(cents),
            "order_date": day,
            "updated_at": us,
        }

    payload = {
        "before": row(*before) if before else None,
        "after": None if op == "d" else row(price_cents, epoch_day, micros),
        "op": op,
        "ts_ms": 1000 + offset,
    }
    return (
        json.dumps({"payload": {"order_id": order_id}}),
        json.dumps({"payload": payload}),
        offset,
    )


def test_logical_types_through_envelope_and_merge(spark):
    """Snapshot read + update + delete on a DECIMAL/DATE/TIMESTAMP
    table: parse decodes every wire format, and the decoded DECIMAL
    survives compact+merge exactly (no double rounding anywhere)."""
    events = [
        _env("r", 1, 1999, 19000, 1_700_000_000_000_000, 0),  # $19.99
        _env("r", 2, -250, 19001, 1_700_000_000_000_001, 1),  # -$2.50 (credit)
        _env("u", 1, 2049, 19000, 1_700_000_100_000_000, 2),  # → $20.49
        _env("c", 3, 123456789, 19002, 1_700_000_200_000_000, 3),  # $1,234,567.89
        _env("d", 2, -250, 19001, 1_700_000_000_000_001, 4),  # delete credit
    ]
    raw = spark.createDataFrame(events, "key string, value string, offset long")
    parsed = parse_envelope(raw, _ORDERS_SPEC, seq_cols=("offset",))
    # decoded schema is the LOGICAL schema
    by_name = {f.name: f.dataType for f in parsed.schema.fields}
    assert by_name["price"] == T.DecimalType(10, 2)
    assert by_name["order_date"] == T.DateType()
    assert by_name["updated_at"] == T.TimestampType()

    latest = compact_latest(parsed, ["order_id"], order_cols=["offset"])
    empty = spark.createDataFrame([], _ORDERS_SPEC.value_schema)
    state = apply_changes(empty, latest, ["order_id"])
    rows = {r.order_id: r for r in state.collect()}
    assert set(rows) == {1, 3}  # 2 deleted
    assert rows[1].price == Decimal("20.49")
    assert rows[1].order_date == dt.date(2022, 1, 8)
    assert rows[1].updated_at == dt.datetime(2023, 11, 14, 22, 15)
    assert rows[3].price == Decimal("1234567.89")
    assert rows[3].order_date == dt.date(2022, 1, 10)


def test_logical_types_before_image_and_keys(spark):
    """include_before decodes the before-image too, and a delete's key
    resolves from the key envelope even though after is null."""
    events = [
        _env("r", 7, 700, 19007, 1_700_000_000_000_000, 0),
        _env(
            "u", 7, 707, 19007, 1_700_000_111_000_000, 1,
            before=(700, 19007, 1_700_000_000_000_000),
        ),
        _env(
            "d", 7, None, None, None, 2,
            before=(707, 19007, 1_700_000_111_000_000),
        ),
    ]
    raw = spark.createDataFrame(events, "key string, value string, offset long")
    parsed = parse_envelope(
        raw, _ORDERS_SPEC, seq_cols=("offset",), include_before=True
    ).orderBy("offset")
    got = parsed.collect()
    assert [r.op for r in got] == ["r", "u", "d"]
    assert got[1].before_price == Decimal("7.00")
    assert got[1].price == Decimal("7.07")
    assert got[2].order_id == 7  # key from key envelope on delete
    assert got[2].price is None  # after image null on delete
    assert got[2].before_price == Decimal("7.07")


def test_logical_decode_stays_codegen(spark):
    """The decode path must remain pure Catalyst: no BatchEvalPython /
    ArrowEvalPython node may appear in the physical plan."""
    raw = spark.createDataFrame(
        [_env("r", 1, 1999, 19000, 1_700_000_000_000_000, 0)],
        "key string, value string, offset long",
    )
    plan = (
        parse_envelope(raw, _ORDERS_SPEC)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def test_annotation_for_unknown_column_raises():
    spec = TableSpec(
        name="t",
        key_cols=("id",),
        value_schema=T.StructType([T.StructField("id", T.LongType())]),
        logical=(("prize", "decimal(10,2)"),),  # typo: no such column
    )
    with pytest.raises(ValueError, match="unknown column 'prize'"):
        spec.logical_map


# ---------------------------------------------------------------------------
# VariableScaleDecimal (io.debezium.data.VariableScaleDecimal)
# ---------------------------------------------------------------------------


def _expect_vsd(u: int, s: int | None) -> str:
    s = s or 0
    sign = "-" if u < 0 else ""
    d = str(abs(u))
    if s <= 0:
        return sign + d + "0" * (-s)
    d = d.rjust(s + 1, "0")
    return sign + d[:-s] + "." + d[-s:]


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(10**38) + 1, max_value=10**38 - 1),
            st.integers(min_value=-5, max_value=25),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_variable_scale_decimal_matches_python(spark, pairs):
    """Per-row-scale NUMERIC decode: exact decimal string for any
    (unscaled, scale) across the full DECIMAL(38) range, negative
    scales included."""
    from spark_streaming_with_debezium_spark.cdc.envelope import (
        connect_variable_decimal,
    )

    df = spark.createDataFrame(
        [(s, _b64(u)) for u, s in pairs], "scale int, value string"
    )
    got = [
        r["out"]
        for r in df.select(
            connect_variable_decimal(F.struct("scale", "value")).alias("out")
        ).collect()
    ]
    assert got == [_expect_vsd(u, s) for u, s in pairs]


def test_variable_scale_decimal_through_envelope(spark):
    """End-to-end: a NUMERIC column annotated as
    io.debezium.data.VariableScaleDecimal parses from the wire struct
    and lands as the exact string; corrupt payloads land NULL."""
    spec = TableSpec(
        name="accounts",
        key_cols=("id",),
        value_schema=T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("balance", T.StringType()),
            ]
        ),
        logical=(("balance", "io.debezium.data.VariableScaleDecimal"),),
    )

    def env(i, off, scale, b64):
        return (
            json.dumps({"payload": {"id": i}}),
            json.dumps(
                {
                    "payload": {
                        "before": None,
                        "after": {
                            "id": i,
                            "balance": {"scale": scale, "value": b64},
                        },
                        "source": {"ts_ms": 1},
                        "op": "c",
                        "ts_ms": 1,
                    }
                }
            ),
            0,
            off,
        )

    raw = spark.createDataFrame(
        [
            env(1, 0, 4, _b64(987654321)),
            env(2, 1, 0, _b64(-42)),
            env(3, 2, 2, _b64(10**60)),  # 26-byte payload: over the
            # decoder's 21-byte bound -> NULL (unbase64 is lenient with
            # malformed text, so byte-width is the reliable corruption)
        ],
        "key string, value string, partition int, offset long",
    )
    rows = {
        r["id"]: r["balance"]
        for r in parse_envelope(raw, spec, seq_cols=("partition", "offset"))
        .select("id", "balance")
        .collect()
    }
    assert rows[1] == "98765.4321"
    assert rows[2] == "-42"
    assert rows[3] is None
