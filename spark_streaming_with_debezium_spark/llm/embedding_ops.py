"""Embedding column transforms: L2-normalize, int8 quantization, IDF.

The vector-preprocessing steps a training-data pipeline runs before
indexing/serving — per-row higher-order expressions (no shuffle, no
UDF), oracle-checked against DuckDB list lambdas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_with_debezium_spark.registry import query
from spark_streaming_with_debezium_spark.sources.tables import load_table


@query(
    "embedding_normalize",
    oracle="""
    WITH n AS (
      SELECT vec_id,
             sqrt(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
             embedding
      FROM embeddings
    )
    SELECT vec_id,
           round(nrm, 6) AS norm,
           round(CAST(embedding[1] AS DOUBLE) / nrm, 6) AS first_normed
    FROM n
    """,
)
def embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norm + first normalized component (full normalized arrays are
    checked in pytest; the oracle pins the scalar projections)."""
    from spark_streaming_with_debezium_spark.llm.similarity import norm

    e = load_table(spark, sf_dir, "embeddings")
    nrm = norm(F.col("embedding"))
    return e.select(
        "vec_id",
        F.round(nrm, 6).alias("norm"),
        F.round(F.element_at("embedding", 1).cast("double") / nrm, 6).alias(
            "first_normed"
        ),
    )


@query(
    "embedding_quantize_int8",
    oracle="""
    WITH m AS (
      SELECT vec_id, embedding,
             greatest(abs(CAST(list_max(embedding) AS DOUBLE)),
                      abs(CAST(list_min(embedding) AS DOUBLE))) AS absmax
      FROM embeddings
    )
    SELECT vec_id,
           round(absmax, 6) AS absmax,
           -- round via decimal: the IEEE double is identical in both
           -- engines, but near-half values round differently engine-to-
           -- engine on raw doubles; the decimal hop pins the grid.
           array_to_string(list_transform(embedding,
             x -> CAST(round(CAST(CAST(x AS DOUBLE) / absmax * 127
                             AS DECIMAL(20,10))) AS BIGINT)), ',') AS q
    FROM m
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization (absmax scaling) — 4× storage cut for
    ANN candidate filtering; dequantize error bounded by absmax/127."""
    e = load_table(spark, sf_dir, "embeddings")
    absmax = F.greatest(
        F.abs(F.array_max("embedding").cast("double")),
        F.abs(F.array_min("embedding").cast("double")),
    )
    # NOTE the distinct internal name: if the output column were also
    # called "absmax", the unqualified F.col("absmax") inside the lambda
    # resolves to the ROUNDED output of the same select (alias
    # shadowing) and quantization silently uses the 6-decimal value.
    q = F.transform(
        F.col("embedding"),
        lambda x: F.round(
            (x.cast("double") / F.col("_absmax_raw") * 127).cast("decimal(20,10)")
        ).cast("long"),
    )
    # joined-string output: registered queries never emit array columns
    # (driver canonicalizer); the array form is the unregistered helper
    q_str = F.array_join(F.transform(q, lambda v: v.cast("string")), ",")
    return (
        e.withColumn("_absmax_raw", absmax)
        .select("vec_id", F.round("_absmax_raw", 6).alias("absmax"), q_str.alias("q"))
    )


@query(
    "text_idf",
    oracle="""
    WITH words AS (
      SELECT DISTINCT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
      FROM documents
    ),
    df AS (
      SELECT word, COUNT(*) AS doc_freq FROM words GROUP BY word
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT word, doc_freq,
           round(ln((SELECT n_docs FROM n) / CAST(doc_freq AS DOUBLE)), 6) AS idf
    FROM df
    WHERE doc_freq >= 5
    """,
)
def text_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDF table (the TF-IDF building block): per-word document
    frequency → ln(N/df). One explode + two aggregates; the N scalar is
    a broadcast cross join."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), "\\s+")).alias("word")
    ).distinct()
    df_ = words.groupBy("word").agg(F.count(F.lit(1)).alias("doc_freq"))
    # lazy scalar N: broadcast 1-row aggregate instead of an eager
    # driver-side count() (same pattern as q22's threshold)
    n_docs = F.broadcast(d.agg(F.count(F.lit(1)).cast("double").alias("_n_docs")))
    return (
        df_.filter(F.col("doc_freq") >= 5)
        .crossJoin(n_docs)
        .select(
            "word",
            "doc_freq",
            F.round(F.log(F.col("_n_docs") / F.col("doc_freq")), 6).alias("idf"),
        )
    )
