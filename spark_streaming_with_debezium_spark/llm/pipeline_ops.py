"""Dataset-pipeline operators: split assignment, cross-split
contamination, stratified sampling.

The bookkeeping half of a training-data pipeline — all deterministic,
so a re-run (or a retried stage at 100 TB) produces byte-identical
splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_with_debezium_spark.registry import query
from spark_streaming_with_debezium_spark.sources.tables import load_table


@query(
    "split_train_eval",
    oracle="""
    WITH assigned AS (
      SELECT doc_id, lang,
             CASE WHEN substr(md5(text), 1, 2) < '0a' THEN 'eval'
                  WHEN substr(md5(text), 1, 2) < '14' THEN 'heldout'
                  ELSE 'train' END AS split
      FROM documents
    )
    SELECT split, lang, COUNT(*) AS n_docs
    FROM assigned GROUP BY split, lang
    """,
)
def split_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash split (~4% eval, ~4% heldout, rest
    train via md5 prefix ranges) — reproducible across engines, runs,
    and cluster sizes; no RNG state to manage."""
    d = load_table(spark, sf_dir, "documents")
    prefix = F.substring(F.md5("text"), 1, 2)
    split = (
        F.when(prefix < "0a", "eval")
        .when(prefix < "14", "heldout")
        .otherwise("train")
    )
    return (
        d.select(split.alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "contamination_cross_source",
    oracle="""
    WITH hashed AS (
      SELECT doc_id, source, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS h
      FROM documents
    )
    SELECT a.doc_id AS doc_id, a.source AS source,
           b.doc_id AS dup_of, b.source AS dup_source
    FROM hashed a JOIN hashed b
      ON a.h = b.h AND a.source <> b.source AND a.doc_id > b.doc_id
    """,
)
def contamination_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination: documents whose normalized content
    also appears under a DIFFERENT source (the train/test-leak check).
    Hash join on content hash — uniform keys, no skew."""
    d = load_table(spark, sf_dir, "documents")
    hashed = d.select(
        "doc_id",
        "source",
        F.md5(F.regexp_replace(F.lower(F.trim("text")), "\\s+", " ")).alias("h"),
    )
    a, b = hashed.alias("a"), hashed.alias("b")
    return a.join(
        b,
        (F.col("a.h") == F.col("b.h"))
        & (F.col("a.source") != F.col("b.source"))
        & (F.col("a.doc_id") > F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_id"),
        F.col("a.source").alias("source"),
        F.col("b.doc_id").alias("dup_of"),
        F.col("b.source").alias("dup_source"),
    )


@query("sample_stratified", oracle=None)  # RNG-based => rows-only
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling: per-language fractions via sampleBy with a
    fixed seed (deterministic per Spark version — asserted in tests);
    the shape used for eval-set carving and data ablations."""
    d = load_table(spark, sf_dir, "documents")
    fractions = {"en": 0.1, "es": 0.3, "de": 0.3, "zh": 0.3, "fr": 0.3}
    s = d.sampleBy("lang", fractions, seed=42)
    return s.groupBy("lang").agg(F.count(F.lit(1)).alias("n_sampled"))
