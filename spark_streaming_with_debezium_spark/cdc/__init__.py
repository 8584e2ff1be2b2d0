from spark_streaming_with_debezium_spark.cdc.compact import compact_latest
from spark_streaming_with_debezium_spark.cdc.envelope import (
    TableSpec,
    envelope_value_schema,
    parse_envelope,
)
from spark_streaming_with_debezium_spark.cdc.merge import apply_changes

__all__ = [
    "TableSpec",
    "envelope_value_schema",
    "parse_envelope",
    "compact_latest",
    "apply_changes",
]
