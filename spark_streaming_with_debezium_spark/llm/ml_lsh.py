"""pyspark.ml LSH variants (SURVEY §2.3 J11's ``approxSimilarityJoin``).

The engine's native LSH (llm/dedup.py, llm/similarity.py) is pure
DataFrame code; these wrappers expose the same capabilities through
pyspark.ml's estimators — MinHashLSH over token sets and
BucketedRandomProjectionLSH over embeddings — for users coming from the
MLlib API. Seeds fixed for determinism; rows-only checks (model
internals aren't SQL-expressible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_with_debezium_spark.registry import query
from spark_streaming_with_debezium_spark.sources.tables import load_table


def _token_vectors(docs: DataFrame, vocab_size: int = 1 << 16) -> DataFrame:
    """Sparse binary token vectors via HashingTF (set semantics)."""
    from pyspark.ml.feature import HashingTF, Tokenizer

    tok = Tokenizer(inputCol="text", outputCol="words")
    tf = HashingTF(
        inputCol="words", outputCol="features", numFeatures=vocab_size, binary=True
    )
    return tf.transform(tok.transform(docs.select("doc_id", F.lower(F.trim("text")).alias("text"))))


@query("dedup_minhash_ml", oracle=None)  # model-based => rows-only
def dedup_minhash_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11 via pyspark.ml MinHashLSH.approxSimilarityJoin: near-dup doc
    pairs at Jaccard distance ≤ 0.4 over hashed token sets. Compared
    against the native LSH in tests (both must find the exact-dup
    clusters)."""
    from pyspark.ml.feature import MinHashLSH

    d = load_table(spark, sf_dir, "documents")
    vecs = _token_vectors(d)
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = mh.fit(vecs)
    pairs = model.approxSimilarityJoin(vecs, vecs, 0.4, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
    )


@query("ann_brp_ml", oracle=None)  # model-based => rows-only
def ann_brp_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11 via BucketedRandomProjectionLSH: approx nearest neighbors in
    euclidean distance for the standing query vectors (vec_id < 8).

    ONE ``approxSimilarityJoin`` (queries × corpus, bucket-colliding
    candidates only) + a per-query top-k window — no driver-side
    ``collect()`` of query vectors, no per-query Spark job. Cost is
    O(colliding pairs), independent of the number of standing queries;
    the embeddings are unit vectors so euclidean distance < 2.0 and the
    threshold keeps every candidate the hash buckets surface (matching
    the former ``approxNearestNeighbors`` loop up to multi-probe)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0,
        numHashTables=4, seed=42,
    )
    model = brp.fit(e)
    queries = e.filter(F.col("vec_id") < 8)
    pairs = model.approxSimilarityJoin(queries, e, 2.0, distCol="dist")
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("vec_id").asc())
    return (
        pairs.select(
            F.col("datasetA.vec_id").alias("query_id"),
            F.col("datasetB.vec_id").alias("vec_id"),
            F.round("dist", 6).alias("dist"),
        )
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= 5)
        .drop("_rk")
    )
