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


def _shingle_vectors(docs: DataFrame, vocab_size: int = 1 << 18) -> DataFrame:
    """Sparse binary 3-word-shingle vectors via HashingTF (set
    semantics). Shingles, NOT unigram tokens: unigram-set Jaccard at
    distance ≤ 0.4 called 55% of ALL possible pairs in the test corpus
    "near-dups" (68,452 pairs from 500 docs — O(n²)-shaped output at
    scale and useless as a dedup signal). Word shingles are exactly what
    the native face (llm/dedup.py) hashes, so the two faces agree on
    semantics and the pair rate stays a small multiple of the true
    duplicate count."""
    from pyspark.ml.feature import HashingTF

    from spark_streaming_with_debezium_spark.llm.dedup import word_shingles

    tf = HashingTF(
        inputCol="shingles",
        outputCol="features",
        numFeatures=vocab_size,
        binary=True,
    )
    return tf.transform(
        docs.select("doc_id", word_shingles(F.col("text")).alias("shingles"))
    )


@query("dedup_minhash_ml", oracle=None)  # model-based => rows-only
def dedup_minhash_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11 via pyspark.ml MinHashLSH.approxSimilarityJoin: near-dup doc
    pairs at 3-word-shingle Jaccard distance ≤ 0.4 (similarity ≥ 0.6,
    the native face's threshold). Compared against the native LSH in
    tests (both must find the exact-dup clusters, and the pair count
    must stay ≪ C(n,2))."""
    from pyspark.ml.feature import MinHashLSH

    d = load_table(spark, sf_dir, "documents")
    vecs = _shingle_vectors(d)
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
    the embeddings are unit vectors so euclidean distance ≤ 2.0 and the
    threshold keeps every candidate the hash buckets surface (matching
    the former ``approxNearestNeighbors`` loop up to multi-probe).

    The join keeps dist strictly below the threshold, so the cutoff is
    2.0 + 1e-6, not 2.0: float error on unit vectors can push a
    near-antipodal distance to exactly 2.0 or a hair above, and there
    is no multi-probe fallback — without the epsilon such a neighbor
    silently vanishes. Queries may still return FEWER than k rows when
    no bucket collision surfaces enough candidates; callers needing
    guaranteed-k should use the exact ``ann_cosine_topk``."""
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
    pairs = model.approxSimilarityJoin(queries, e, 2.0 + 1e-6, distCol="dist")
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
