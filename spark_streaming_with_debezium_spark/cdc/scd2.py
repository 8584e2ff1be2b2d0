"""Incremental SCD2 dimension maintenance from a CDC change stream.

`operators/cdc_queries.py:cdc_scd2_history` computes the type-2 history
as a BATCH window over the full log; this module maintains the same
table INCREMENTALLY — each micro-batch folds its changes onto the
stored history, so the dimension is always current without rescanning
the log (the log can be 100 TB; a batch is megabytes). The core
invariant, property-tested over arbitrary batchings: incremental
application ≡ the batch recompute over the concatenated log.

Per-key semantics (the standard type-2 contract):

- every upsert ('c'/'u'/'r') OPENS a new version row
  ``[valid_from = event ts, valid_to = next change's ts | NULL)``;
- the previous OPEN version (if any) is CLOSED at the new event's ts;
- a delete ('d') closes the open version without opening one — the key
  has no current row until a later insert starts version v+1;
- versions number consecutively over the key's lifetime (deletes don't
  consume a version number).

Storage: a :class:`ParquetStateTable` keyed ``(key, version)`` — the
close-old + insert-new step is ONE merge of (updated previous row ∪
new rows), riding the same touched-bucket rewrite as every other
state table.

Scale: per batch the work is O(batch + touched keys): changes window
on the key (one shuffle), the resident max-version/open-row lookup is
a semi-join-pruned read of touched buckets only, and the merge
rewrites touched buckets only. Nothing scans history.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_streaming_with_debezium_spark.cdc.merge import ParquetStateTable

#: History-table bookkeeping columns added to the dimension schema.
SCD2_COLS = ("version", "valid_from_ms", "valid_to_ms", "is_current")


def scd2_schema_ddl(key_ddl: str, attr_ddl: str) -> str:
    """DDL string for an SCD2 store of the given key/attr columns."""
    return (
        f"{key_ddl}, {attr_ddl}, version long, valid_from_ms long, "
        "valid_to_ms long, is_current boolean"
    )


def scd2_apply(
    dim: ParquetStateTable,
    changes: DataFrame,
    key_cols: Sequence[str],
    data_cols: Sequence[str],
    ts_col: str = "ts_ms",
    order_cols: Sequence[str] = ("ts_ms", "offset"),
    op_col: str = "op",
) -> None:
    """Fold one micro-batch of parsed changes (``key_cols`` +
    ``data_cols`` + ``op`` + ``ts_col`` [+ order cols]) onto the SCD2
    store. ``dim`` must be keyed ``key_cols + ['version']``."""
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_cols])
    # One window pass computes EVERYTHING per-key-ordered the fold
    # needs — next ts, last flag, version step, AND the batch's first
    # ts per key (row_number() == 1 marks it; a separate groupBy would
    # re-shuffle the same rows the window already key-partitioned).
    ch = (
        changes.withColumn("_ts", F.col(ts_col).cast("long"))
        .withColumn("_is_del", F.col(op_col) == F.lit("d"))
        .withColumn("_next_ts", F.lead("_ts").over(w))
        .withColumn("_last", F.lead("_ts").over(w).isNull())
        .withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "_vstep",
            F.sum(F.when(F.col("_is_del"), 0).otherwise(1)).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .persist()
    )
    try:
        touched = ch.select(*keys).distinct()
        resident = dim.read().join(touched, keys, "left_semi")
        # ONE aggregate over the resident history yields both facts the
        # fold needs per key — the high-water version number and the
        # currently-open row (≤ 1 per key by invariant, so max(when(
        # is_current, struct)) IS that row). The previous shape read
        # `resident` twice (a max-version groupBy AND an is_current
        # filter+join), paying a second state scan + shuffle per
        # increment — half the state-side AQE stages for the same rows.
        res_agg = resident.groupBy(*keys).agg(
            F.max("version").alias("_v0"),
            F.max(
                F.when(
                    F.col("is_current"),
                    F.struct("version", "valid_from_ms", *data_cols),
                )
            ).alias("_open"),
        )
        first_ts = ch.filter(F.col("_rn") == 1).select(
            *keys, F.col("_ts").alias("_first_ts")
        )
        # 1) close the currently-open version (if any) at the batch's
        #    first event for that key
        closed_prev = (
            res_agg.filter(F.col("_open").isNotNull())
            .join(first_ts, keys)
            .select(
                *keys,
                *[F.col(f"_open.{c}").alias(c) for c in data_cols],
                F.col("_open.version").alias("version"),
                F.col("_open.valid_from_ms").alias("valid_from_ms"),
                F.col("_first_ts").alias("valid_to_ms"),
                F.lit(False).alias("is_current"),
            )
        )
        # 2) new version rows: non-delete events; valid_to = next event
        #    in THIS batch (deletes close too), NULL when last
        new_rows = (
            ch.filter(~F.col("_is_del"))
            .join(res_agg.select(*keys, "_v0"), keys, "left")
            .select(
                *keys,
                *data_cols,
                (F.coalesce(F.col("_v0"), F.lit(0)) + F.col("_vstep")).alias(
                    "version"
                ),
                F.col("_ts").alias("valid_from_ms"),
                F.col("_next_ts").alias("valid_to_ms"),
                (F.col("_last") & ~F.col("_is_del")).alias("is_current"),
            )
        )
        upserts = closed_prev.unionByName(new_rows).withColumn(
            "deleted", F.lit(False)
        )
        dim.merge(
            upserts,
            data_cols=[*data_cols, "valid_from_ms", "valid_to_ms", "is_current"],
        )
    finally:
        ch.unpersist()
