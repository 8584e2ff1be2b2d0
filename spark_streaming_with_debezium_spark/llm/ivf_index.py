"""Persistent IVF index: the at-rest form of ann_ivf_topk.

``build`` assigns every vector to its nearest (hash-sampled) centroid
and writes the assignment PARTITIONED BY CELL; ``search`` reads only
the ``n_probe`` cells nearest each query — a partition-pruned scan, the
same touched-partitions idea as the CDC state table. At 100 TB the
probe I/O is (probes / cells) of the corpus instead of all of it, and
the index is just parquet — rebuildable, no serving infra.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_streaming_with_debezium_spark.llm.similarity import (
    cosine_prenormed,
    norm,
)


class IvfIndex:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._data_dir = os.path.join(path, "cells")
        self._cent_dir = os.path.join(path, "centroids")

    def build(self, vectors: DataFrame, id_col: str = "vec_id",
              vec_col: str = "embedding", sample_mod: int = 31) -> None:
        v = vectors.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
        ).withColumn("nrm", norm(F.col("embedding")))
        cents = v.filter(F.pmod(F.xxhash64("vec_id"), F.lit(sample_mod)) == 0).select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("ce"),
            F.col("nrm").alias("cnrm"),
        )
        cents.write.mode("overwrite").parquet(self._cent_dir)
        cents_b = F.broadcast(self.spark.read.parquet(self._cent_dir))
        scored = v.join(cents_b).withColumn(
            "cs",
            cosine_prenormed(F.col("embedding"), F.col("ce"), F.col("nrm"), F.col("cnrm")),
        )
        w = Window.partitionBy("vec_id").orderBy(F.col("cs").desc(), F.col("cent_id"))
        assigned = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "embedding", "nrm", F.col("cent_id").alias("cell"))
        )
        (
            assigned.repartition(F.col("cell"))
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(self._data_dir)
        )

    def search(self, queries: DataFrame, k: int = 5, n_probe: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
        """Top-k cosine neighbors per query, probing n_probe cells."""
        q = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe")
        ).withColumn("qnrm", norm(F.col("qe")))
        cents = F.broadcast(self.spark.read.parquet(self._cent_dir))
        q_scored = q.join(cents).withColumn(
            "cs", cosine_prenormed(F.col("qe"), F.col("ce"), F.col("qnrm"), F.col("cnrm"))
        )
        wq = Window.partitionBy("query_id").orderBy(
            F.col("cs").desc(), F.col("cent_id")
        )
        probes = (
            q_scored.withColumn("rn", F.row_number().over(wq))
            .filter(F.col("rn") <= n_probe)
            .select("query_id", "qe", "qnrm", F.col("cent_id").alias("cell"))
        )
        cells = [r.cell for r in probes.select("cell").distinct().collect()]
        # partition-pruned read: only the probed cells' files are scanned
        data = self.spark.read.parquet(self._data_dir).filter(
            F.col("cell").isin(cells)
        )
        cands = data.join(F.broadcast(probes), "cell").filter(
            F.col("vec_id") != F.col("query_id")
        )
        scored = (
            cands.withColumn(
                "cos",
                cosine_prenormed(
                    F.col("qe"), F.col("embedding"), F.col("qnrm"), F.col("nrm")
                ),
            )
            .select("query_id", "vec_id", "cos")
            .distinct()
        )
        w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", "vec_id", F.round("cos", 6).alias("cos_sim"), "rnk")
        )
