"""Time travel for the CDC state table: reconstruct the keyed state as
of any past batch from an append-only change log.

Delta gets this from its transaction log; on plain parquet we keep:

- ``snapshot0/``  — the initial state (written once at init)
- ``log/``        — every compacted change batch, appended with its
                    ``_batch_seq`` (partition column → pruned reads)

``as_of(seq)`` = LWW-compact the log restricted to ``_batch_seq <= seq``
and apply it to snapshot0 — one window + one merge join, O(log size up
to seq), no stored per-version copies. The audit/"what did the
dashboard say on Tuesday" capability CDC pipelines are asked for.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_with_debezium_spark.cdc.compact import compact_latest
from spark_streaming_with_debezium_spark.cdc.merge import (
    ParquetStateTable,
    apply_changes,
)


class TimeTravelStateTable:
    """ParquetStateTable + retained change log + as_of reconstruction."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: Sequence[str],
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.current = ParquetStateTable(
            spark, os.path.join(path, "current"), key_cols, n_buckets
        )
        self._snap_dir = os.path.join(path, "snapshot0")
        self._log_dir = os.path.join(path, "log")
        self._seq = 0

    def init(self, snapshot: DataFrame) -> None:
        snapshot.write.mode("overwrite").parquet(self._snap_dir)
        self.current.init(self.spark.read.parquet(self._snap_dir))
        self._seq = 0

    def merge_logged(
        self, changes: DataFrame, data_cols: Sequence[str] | None = None
    ) -> int:
        """Merge into current state AND append the (compacted) batch to
        the log. Returns the batch sequence number."""
        self._seq += 1
        logged = changes.withColumn("_batch_seq", F.lit(self._seq))
        logged.write.mode("append").partitionBy("_batch_seq").parquet(self._log_dir)
        # replay from what was durably logged (exactly-once even if the
        # caller's DataFrame is non-deterministic)
        replay = (
            self.spark.read.parquet(self._log_dir)
            .filter(F.col("_batch_seq") == self._seq)
            .drop("_batch_seq")
        )
        self.current.merge(replay, data_cols=data_cols)
        return self._seq

    def read(self) -> DataFrame:
        return self.current.read()

    def as_of(self, seq: int) -> DataFrame:
        """State as of (and including) batch ``seq``; seq=0 → snapshot."""
        snapshot = self.spark.read.parquet(self._snap_dir)
        if seq <= 0 or not os.path.exists(self._log_dir):
            return snapshot
        log = self.spark.read.parquet(self._log_dir).filter(
            F.col("_batch_seq") <= seq
        )
        latest = compact_latest(
            log, self.key_cols, order_cols=["_batch_seq"]
        ).drop("_batch_seq")
        return apply_changes(snapshot, latest, self.key_cols)
