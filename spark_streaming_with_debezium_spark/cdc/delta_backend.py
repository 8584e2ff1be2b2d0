"""Optional Delta Lake backend for the CDC state table.

The reference merges into Delta (`StreamingJobExecutor.scala:47-61`).
This environment has no delta-spark, so the engine's default state
backend is the bucketed-parquet ``ParquetStateTable`` (cdc.merge). When
delta-spark IS on the classpath, ``DeltaStateTable`` provides the same
interface on a real Delta table — MERGE INTO gives file-level skipping,
ACID, and time travel for free.

Import is lazy and failure is explicit: constructing the class without
delta-spark raises ImportError with guidance, nothing else in the
engine depends on it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


class DeltaStateTable:
    """Keyed mutable state on Delta Lake — same interface as
    ParquetStateTable (init / merge / read)."""

    def __init__(self, spark: SparkSession, path: str, key_cols: Sequence[str]):
        if not delta_available():
            raise ImportError(
                "delta-spark is not installed; use cdc.merge.ParquetStateTable "
                "(the default backend) or add delta-spark to the cluster"
            )
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)

    def init(self, snapshot: DataFrame) -> None:
        snapshot.write.format("delta").mode("overwrite").save(self.path)

    def read(self) -> DataFrame:
        return self.spark.read.format("delta").load(self.path)

    def merge(self, changes: DataFrame, data_cols: Sequence[str] | None = None) -> None:
        """MERGE INTO with the reference's clause structure, but dedup-safe
        (caller must compact first) and without defect §2.11-6 (inserts
        are gated on NOT deleted)."""
        from delta.tables import DeltaTable

        tgt = DeltaTable.forPath(self.spark, self.path)
        cond = " AND ".join(f"t.{k} = s.{k}" for k in self.key_cols)
        cols = data_cols or [
            c for c in changes.columns if c not in (*self.key_cols, "deleted")
        ]
        updates = {c: f"s.{c}" for c in cols}
        inserts = {
            **{k: f"s.{k}" for k in self.key_cols},
            **updates,
        }
        (
            tgt.alias("t")
            .merge(changes.alias("s"), cond)
            .whenMatchedDelete(condition=F.expr("s.deleted = true"))
            .whenMatchedUpdate(set=updates)
            .whenNotMatchedInsert(
                condition=F.expr("s.deleted = false"), values=inserts
            )
            .execute()
        )
