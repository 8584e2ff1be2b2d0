"""Debezium change-event envelope parsing — distributed, vectorized.

The reference parses envelopes on the DRIVER, one row at a time
(`DebeziumDeltaFormatter.scala:14-26,34-43`: ``toLocalIterator`` +
``JSON.parseFull`` + one ``parallelize`` per event). That serializes
every micro-batch through one process and defeats codegen.

Here the same semantics are a single Catalyst projection: ``from_json``
against a typed envelope ``StructType`` runs executor-side inside
whole-stage codegen, so a 100 TB backfill parses in parallel across
every core of the cluster.

Envelope shape (Debezium 1.x, schemas enabled —
`ContainerTestWrapper.scala:21-22`):

    key   = {"schema": …, "payload": {<key cols>}}
    value = {"schema": …, "payload": {"before": <row|null>,
             "after": <row|null>, "source": {…}, "op": "c|u|d|r",
             "ts_ms": <epoch millis>}}
    value IS NULL           -- tombstone after a delete; dropped
                            -- (reference: DebeziumDeltaFormatter.scala:18)

The reference hardcodes one table's schema
(`DebeziumDeltaFormatter.scala:59-65`, acknowledged as a TODO in its
README:51); ``TableSpec`` is the dynamic registry it never built.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Debezium operation codes: create / update / delete / snapshot-read.
OPS = ("c", "u", "d", "r")


@dataclass(frozen=True)
class TableSpec:
    """Registry entry driving envelope parsing + merge dynamically.

    The generalization the reference lists as future work (README.md:51
    "Create a model to use DebeziumDeltaFormatter and
    StreamingJobExecutor.upsertToDelta dynamically").
    """

    name: str
    key_cols: tuple[str, ...]
    value_schema: T.StructType
    #: Kafka topic carrying this table's change events.
    topic: str = ""
    #: Columns whose change should be ignored when merging (audit cols).
    exclude_cols: tuple[str, ...] = field(default=())

    @property
    def data_cols(self) -> tuple[str, ...]:
        return tuple(f.name for f in self.value_schema.fields)


def envelope_value_schema(row_schema: T.StructType) -> T.StructType:
    """Typed StructType for the Debezium value envelope of ``row_schema``."""
    source_schema = T.StructType(
        [
            T.StructField("version", T.StringType()),
            T.StructField("connector", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("snapshot", T.StringType()),
            T.StructField("db", T.StringType()),
            T.StructField("table", T.StringType()),
        ]
    )
    payload = T.StructType(
        [
            T.StructField("before", row_schema),
            T.StructField("after", row_schema),
            T.StructField("source", source_schema),
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
        ]
    )
    return T.StructType([T.StructField("payload", payload)])


def envelope_key_schema(key_schema: T.StructType) -> T.StructType:
    return T.StructType([T.StructField("payload", key_schema)])


def _key_schema_of(spec: TableSpec) -> T.StructType:
    fields = [f for f in spec.value_schema.fields if f.name in spec.key_cols]
    return T.StructType([T.StructField(f.name, f.dataType) for f in fields])


def dead_letters(
    raw: DataFrame,
    spec: TableSpec,
    value_col: str = "value",
) -> DataFrame:
    """Malformed change events: value present but the envelope failed to
    parse (no payload.op). These rows are silently DROPPED by the merge
    path; route this DataFrame to a quarantine sink so a poison message
    never stalls the stream (the at-scale alternative to failing the
    job on one bad record)."""
    val_schema = envelope_value_schema(spec.value_schema)
    parsed = raw.filter(F.col(value_col).isNotNull()).withColumn(
        "_v", F.from_json(F.col(value_col).cast("string"), val_schema)
    )
    return parsed.filter(
        F.col("_v").isNull() | F.col("_v.payload.op").isNull()
    ).drop("_v")


def parse_envelope(
    raw: DataFrame,
    spec: TableSpec,
    value_col: str = "value",
    key_col: str = "key",
    seq_cols: tuple[str, ...] = (),
    include_before: bool = False,
) -> DataFrame:
    """Parse raw Kafka records into typed change rows.

    Output columns: ``<key cols>`` (from the key envelope, falling back
    to after/before images), ``<data cols>`` (after-image; null for
    deletes), ``op``, ``ts_ms``, ``deleted`` (op = 'd' — the flag the
    reference synthesizes at DebeziumDeltaFormatter.scala:42), plus any
    ``seq_cols`` passed through for in-batch ordering (Kafka
    ``partition``/``offset``). With ``include_before=True`` the
    before-image data columns are emitted as ``before_<col>`` — needed
    by delta-based consumers (incremental aggregate maintenance).

    Tombstones (value IS NULL) are dropped, matching
    DebeziumDeltaFormatter.scala:17-18.
    """
    val_schema = envelope_value_schema(spec.value_schema)
    key_schema = envelope_key_schema(_key_schema_of(spec))

    df = raw.filter(F.col(value_col).isNotNull())
    df = df.withColumn("_v", F.from_json(F.col(value_col).cast("string"), val_schema))
    df = df.withColumn("_k", F.from_json(F.col(key_col).cast("string"), key_schema))

    def key_expr(k: str) -> Column:
        # Key envelope wins; fall back to after (upserts) then before
        # (deletes), so keyless producers still resolve the merge key.
        return F.coalesce(
            F.col(f"_k.payload.{k}"),
            F.col(f"_v.payload.after.{k}"),
            F.col(f"_v.payload.before.{k}"),
        ).alias(k)

    cols: list[Column] = [key_expr(k) for k in spec.key_cols]
    cols += [
        F.col(f"_v.payload.after.{c}").alias(c)
        for c in spec.data_cols
        if c not in spec.key_cols
    ]
    if include_before:
        cols += [
            F.col(f"_v.payload.before.{c}").alias(f"before_{c}")
            for c in spec.data_cols
            if c not in spec.key_cols
        ]
    cols += [
        F.col("_v.payload.op").alias("op"),
        F.col("_v.payload.ts_ms").alias("ts_ms"),
        F.timestamp_millis(F.col("_v.payload.ts_ms")).alias("ts"),
        (F.col("_v.payload.op") == F.lit("d")).alias("deleted"),
    ]
    cols += [F.col(c) for c in seq_cols]
    # Drop rows the envelope parser couldn't type (op missing): they are
    # surfaced separately by :func:`dead_letters`, never merged.
    return df.select(*cols).filter(F.col("op").isNotNull())
