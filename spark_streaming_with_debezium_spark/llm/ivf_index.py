"""Persistent IVF index: the at-rest form of ann_ivf_topk.

``build`` trains a BOUNDED-k centroid set (sampled KMeans — centroid
count independent of corpus size, so the centroid table broadcasts at
any scale), assigns every vector to its nearest centroid with a
shuffle-free higher-order projection, and writes the assignment
PARTITIONED BY CELL; ``search`` reads only the ``n_probe`` cells
nearest each query — a partition-pruned scan, the same
touched-partitions idea as the CDC state table. At 100 TB the probe
I/O is (probes / cells) of the corpus instead of all of it, and the
index is just parquet — rebuildable, no serving infra.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_streaming_with_debezium_spark.llm.similarity import (
    IVF_K,
    IVF_TRAIN_CAP,
    cosine_prenormed,
    nearest_cells,
    norm,
    train_centroids,
)
from spark_streaming_with_debezium_spark.storage.fs import StateFS, fs_for_path


class IvfIndex:
    def __init__(self, spark: SparkSession, path: str, fs: StateFS | None = None):
        self.spark = spark
        self.path = path
        self.fs = fs if fs is not None else fs_for_path(spark, path)
        self._data_dir = os.path.join(path, "cells")
        self._cent_dir = os.path.join(path, "centroids")
        self._idmap_dir = os.path.join(path, "idmap")

    def _idmap(self):
        """vec_id → cell sidecar as a bucketed state table: upsert's
        supersede lookup reads only the id-hash buckets the batch
        touches instead of column-scanning the whole index. The same
        machinery as the CDC state table — one protocol, two uses."""
        from spark_streaming_with_debezium_spark.cdc.merge import (
            ParquetStateTable,
        )

        return ParquetStateTable(
            self.spark, self._idmap_dir, ["vec_id"], n_buckets=64, fs=self.fs
        )

    def build(self, vectors: DataFrame, id_col: str = "vec_id",
              vec_col: str = "embedding", k: int = IVF_K,
              train_cap: int = IVF_TRAIN_CAP) -> None:
        v = vectors.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
        ).withColumn("nrm", norm(F.col("embedding")))
        cents = train_centroids(
            self.spark, v, id_col="vec_id", vec_col="embedding",
            k=k, train_cap=train_cap,
        )
        cents.write.mode("overwrite").parquet(self._cent_dir)
        cents_r = self.spark.read.parquet(self._cent_dir)
        assigned = nearest_cells(v, cents_r, "embedding", "nrm", 1, "cell")
        (
            assigned.repartition(F.col("cell"))
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(self._data_dir)
        )
        # id→cell sidecar (read back from the written cells so the map
        # reflects exactly what landed on disk)
        self._idmap().init(
            self.spark.read.parquet(self._data_dir).select("vec_id", "cell")
        )

    def search(self, queries: DataFrame, k: int = 5, n_probe: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
        """Top-k cosine neighbors per query, probing n_probe cells."""
        q = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe")
        ).withColumn("qnrm", norm(F.col("qe")))
        cents = self.spark.read.parquet(self._cent_dir)
        probes = nearest_cells(q, cents, "qe", "qnrm", n_probe, "cell")
        cells = [r.cell for r in probes.select("cell").distinct().collect()]
        # partition-pruned read: only the probed cells' files are scanned
        data = self.spark.read.parquet(self._data_dir).filter(
            F.col("cell").isin(cells)
        )
        # no distinct: one cell per vector, unique (query, cell) probes
        cands = data.join(F.broadcast(probes), "cell").filter(
            F.col("vec_id") != F.col("query_id")
        )
        scored = cands.withColumn(
            "cos",
            cosine_prenormed(
                F.col("qe"), F.col("embedding"), F.col("qnrm"), F.col("nrm")
            ),
        ).select("query_id", "vec_id", "cos")
        w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", "vec_id", F.round("cos", 6).alias("cos_sim"), "rnk")
        )

    def upsert(self, vectors: DataFrame, id_col: str = "vec_id",
               vec_col: str = "embedding") -> None:
        """Incremental maintenance with TRUE upsert semantics: assign
        the batch to the EXISTING centroids (no re-clustering), replace
        any resident row carrying the same ``vec_id`` — including rows
        living in a DIFFERENT cell because the embedding changed — and
        land the batch with the same touched-partition swap as
        ``ParquetStateTable.merge``. A batch id always wins over the
        resident row (last-writer-wins), so re-delivery is idempotent
        and a changed embedding never leaves a stale duplicate behind.

        Cost: O(batch) assignment + an id-hash-bucket-pruned lookup of
        the id→cell sidecar (``ParquetStateTable.lookup`` — reads only
        the sidecar buckets the batch ids hash into, NOT the index) to
        locate superseded rows + a rewrite of only the touched cells.
        Indexes built before the sidecar existed fall back to a
        column-pruned (cell, vec_id) scan. Rebuild (`build`) when
        `cell_balance` reports drift — the standard IVF re-train
        policy, a measured signal instead of a guess."""
        v = vectors.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
        ).withColumn("nrm", norm(F.col("embedding")))
        cents = self.spark.read.parquet(self._cent_dir)
        assigned = nearest_cells(v, cents, "embedding", "nrm", 1, "cell").cache()
        try:
            batch_ids = assigned.select("vec_id").distinct()
            idmap = self._idmap()
            if idmap.exists():
                # Partition-pruned: only id-hash buckets holding batch
                # ids are read; O(batch), independent of index size.
                stale_cells = idmap.lookup(batch_ids).select("cell")
            else:
                # Pre-sidecar layout: column-pruned projection of the
                # whole index — ONLY (cell, vec_id) is read.
                locations = self.spark.read.parquet(self._data_dir).select(
                    "cell", "vec_id"
                )
                stale_cells = (
                    locations.join(F.broadcast(batch_ids), "vec_id", "left_semi")
                    .select("cell")
                )
            touched = [
                r.cell
                for r in assigned.select("cell")
                .union(stale_cells)
                .distinct()
                .collect()
            ]
            if not touched:
                return
            resident = self.spark.read.parquet(self._data_dir).filter(
                F.col("cell").isin(touched)
            )
            kept = resident.join(F.broadcast(batch_ids), "vec_id", "left_anti")
            out = kept.select("vec_id", "embedding", "nrm", "cell").unionByName(
                assigned.select("vec_id", "embedding", "nrm", "cell")
            )
            # Touched-partition swap (scratch write + per-cell rename):
            # handles the cell-emptied-out case (all resident rows
            # superseded away, nothing new assigned) that a dynamic
            # partition overwrite would silently leave stale.
            tmp = self._data_dir + "_upsert_tmp"
            self.fs.delete(tmp)
            try:
                out.repartition(len(touched), F.col("cell")).write.mode(
                    "overwrite"
                ).partitionBy("cell").parquet(tmp)
                for c in touched:
                    src = os.path.join(tmp, f"cell={c}")
                    dst = os.path.join(self._data_dir, f"cell={c}")
                    if self.fs.exists(dst):
                        self.fs.delete(dst)
                    if self.fs.exists(src):
                        self.fs.rename(src, dst)
            finally:
                self.fs.delete(tmp)
            if idmap.exists():
                # Keep the sidecar in lockstep: batch ids map to their
                # (possibly new) cells; LWW merge is replay-idempotent.
                idmap.merge(
                    assigned.select(
                        "vec_id", "cell", F.lit(False).alias("deleted")
                    )
                )
        finally:
            assigned.unpersist()

    def cell_balance(self) -> DataFrame:
        """Index-health report: per-cell row counts plus the skew ratio
        (max/mean) — the re-train trigger. After heavy upserting, new
        data concentrating in few cells degrades probe selectivity;
        rebuild when the ratio drifts well past its post-build value."""
        counts = (
            self.spark.read.parquet(self._data_dir)
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n_vectors"))
        )
        stats = counts.agg(
            F.max("n_vectors").alias("mx"), F.avg("n_vectors").alias("mean")
        )
        return counts.crossJoin(F.broadcast(stats)).select(
            "cell",
            "n_vectors",
            F.round(F.col("mx") / F.col("mean"), 6).alias("skew_ratio"),
        )
