"""JSON-lines document source with corrupt-record dead-lettering.

Training-data lakes land raw documents as JSONL long before they are
parquet (crawl dumps, API exports, annotation tool output). This reader
generalizes SURVEY §2.1's source row the same way `csv_source` does for
dimensions: schema-ON-READ with an explicit contract instead of
inference, and malformed lines routed to a dead-letter frame rather
than crashing the load or being silently nulled — the same
quarantine-don't-drop discipline as the CDC envelope parser
(`cdc/envelope.py` dead_letters) and the drift policy (`cdc/drift.py`).

Scale notes:
- An EXPLICIT schema is mandatory. Schema inference reads the whole
  input once before the real scan — at 100 TB that is a full extra
  pass; with a declared schema the load is one streaming-decode pass
  and unreferenced JSON fields are never materialized.
- JSONL splits by line, so a single file parallelizes across tasks
  (unlike multiline JSON, which is one task per file — never land
  multiline at scale).
- PERMISSIVE + `columnNameOfCorruptRecord` keeps decode vectorized;
  the corrupt frame is a filter over the same scan, not a second
  parse. `split_corrupt` shares one cached pass when both halves are
  consumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Column collecting the raw line for unparseable records.
CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
) -> DataFrame:
    """Read line-delimited JSON under an explicit schema, keeping
    malformed lines in ``CORRUPT_COL`` instead of erroring (FAILFAST)
    or silently nulling fields with no trace (plain PERMISSIVE)."""
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    if CORRUPT_COL not in [f.name for f in schema.fields]:
        schema = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
        )
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, dead_letter_rows).

    Spark refuses to filter on the corrupt column of an unmaterialized
    JSON scan (it is populated during parsing), so the split runs over
    one cached pass — the cache holds parsed rows, not raw text, and
    both halves reuse it.
    """
    raw = raw.cache()
    clean = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    dead = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, dead
