"""Sources (CSV dimension, JDBC plumbing) + UDF/UDTF surface tests."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from spark_streaming_with_debezium_spark.sources.csv_source import (
    enrich,
    read_dimension_csv,
)
from spark_streaming_with_debezium_spark.sources.jdbc_source import read_jdbc
from spark_streaming_with_debezium_spark.functions.udfs import (
    EnvelopeDiffUDTF,
    cosine_pandas,
    geometric_mean,
    replay_validate,
)


CITIES_CSV = "﻿email;city\na@x.com;Valencia\nb@x.com;Barcelona\nc@x.com;Valencia\n"


def test_csv_dimension_with_bom(spark, tmp_path):
    p = tmp_path / "cities.csv"
    p.write_text(CITIES_CSV, encoding="utf-8")
    dim = read_dimension_csv(spark, str(p))
    assert dim.columns == ["email", "city"]  # BOM stripped from header
    assert dim.count() == 3


def test_stream_static_enrichment_broadcasts(spark, tmp_path):
    from spark_streaming_with_debezium_spark.plans.explain import (
        broadcast_join_count,
    )

    p = tmp_path / "cities.csv"
    p.write_text(CITIES_CSV, encoding="utf-8")
    dim = read_dimension_csv(spark, str(p))
    facts = spark.createDataFrame(
        [("a@x.com", 1), ("z@x.com", 2)], "email string, n int"
    )
    out = enrich(facts, dim, on="email")
    rows = {r.email: r.city for r in out.collect()}
    assert rows == {"a@x.com": "Valencia", "z@x.com": None}
    assert broadcast_join_count(out) == 1  # J6: dimension broadcast, no shuffle


def test_jdbc_fails_cleanly_without_driver(spark):
    with pytest.raises(Exception, match="(?i)driver|class"):
        read_jdbc(spark, "jdbc:postgresql://localhost/x", "t").collect()


def test_cosine_pandas_matches_builtin(spark, sf_dir):
    from spark_streaming_with_debezium_spark.llm.similarity import cosine
    from spark_streaming_with_debezium_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings").limit(50)
    a = e.select(F.col("vec_id"), F.col("embedding").alias("a"))
    b = e.select(F.col("vec_id"), F.col("embedding").alias("b"))
    j = a.join(b, "vec_id")
    both = j.select(
        "vec_id",
        cosine_pandas("a", "b").alias("c_udf"),
        cosine(F.col("a"), F.col("b")).alias("c_jvm"),
    ).collect()
    for r in both:
        assert abs(r.c_udf - r.c_jvm) < 1e-6  # numpy float64 vs JVM double


def test_geometric_mean_grouped_agg(spark, sf_dir):
    import math

    from spark_streaming_with_debezium_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    got = {
        r.event_type: r.gm
        for r in e.groupBy("event_type")
        .agg(geometric_mean("value").alias("gm"))
        .collect()
    }
    # cross-check one group in pure python
    vals = [
        r.value
        for r in e.filter((F.col("event_type") == "error") & (F.col("value") > 0))
        .select("value")
        .collect()
    ]
    expected = math.exp(sum(math.log(v) for v in vals) / len(vals))
    assert abs(got["error"] - expected) < 1e-9


def test_replay_validate_agrees_with_lww(spark):
    changes = spark.createDataFrame(
        [(1, "c", 0), (1, "u", 1), (1, "d", 2), (2, "c", 3), (2, "u", 4)],
        "id long, op string, offset long",
    )
    got = {r.id: (r.n_events, r.final_op, r.lww_matches_replay)
           for r in replay_validate(changes).collect()}
    assert got == {1: (3, "d", True), 2: (2, "u", True)}


def test_envelope_diff_udtf(spark):
    spark.udtf.register("EnvelopeDiffUDTF", EnvelopeDiffUDTF)
    rows = spark.sql(
        """
        SELECT d.col, d.before, d.after
        FROM VALUES (map('a','1','b','2'), map('a','1','b','3','c','4')) AS t(b, a),
        LATERAL EnvelopeDiffUDTF(t.b, t.a) d
        """
    ).collect()
    got = {(r.col): (r.before, r.after) for r in rows}
    assert got == {"b": ("2", "3"), "c": (None, "4")}


def test_cell_changelog_lateral(spark):
    from spark_streaming_with_debezium_spark.functions.udfs import cell_changelog

    changes = spark.createDataFrame(
        [(1, {"a": "1", "b": "2"}, {"a": "1", "b": "3"})],
        "id long, before map<string,string>, after map<string,string>",
    )
    rows = cell_changelog(changes, "before", "after").collect()
    assert [(r.id, r.changed_col, r.before_value, r.after_value) for r in rows] == [
        (1, "b", "2", "3")
    ]


def test_kafka_reader_fails_cleanly_without_package(spark):
    """No kafka package on this classpath: the reader must fail with
    Spark's data-source-not-found guidance, not something cryptic."""
    from spark_streaming_with_debezium_spark.cdc.pipeline import kafka_reader

    with pytest.raises(Exception, match="(?i)kafka|data source"):
        kafka_reader(spark, "localhost:9092", "topic")


def test_jsonl_documents_roundtrip(spark, sf_dir, tmp_path):
    """JSONL load under an explicit schema must reproduce the parquet
    documents table exactly, and malformed lines must land in the
    dead-letter frame — not crash the load, not silently null out."""
    import json as _json

    from spark_streaming_with_debezium_spark.sources.jsonl_source import (
        read_jsonl,
        split_corrupt,
    )
    from spark_streaming_with_debezium_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs.jsonl")
    rows = [r.asDict() for r in docs.collect()]
    with open(path, "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
        f.write("{not valid json\n")          # malformed line
        f.write('{"doc_id": "NaNope"}\n')     # type mismatch on doc_id
    schema = ", ".join(f"{name} {dt}" for name, dt in docs.dtypes)
    clean, dead = split_corrupt(read_jsonl(spark, path, schema))
    got = sorted(tuple(r) for r in clean.select(*docs.columns).collect())
    want = sorted(tuple(r) for r in docs.collect())
    assert got == want
    assert sorted(r.raw_line[:4] for r in dead.collect()) == ['{"do', "{not"]


def test_jsonl_requires_no_inference_pass(spark, tmp_path):
    """The declared schema must reach the scan (no inference job) and
    unreferenced fields must prune: a projection of one column shows
    only that column (+ corrupt col) in the scan's ReadSchema."""
    from spark_streaming_with_debezium_spark.sources.jsonl_source import (
        read_jsonl,
    )

    path = str(tmp_path / "t.jsonl")
    with open(path, "w") as f:
        f.write('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    df = read_jsonl(spark, path, "a bigint, b string").select("a")
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema")[-1]
    assert "a:bigint" in read_schema and "b:string" not in read_schema
    assert [r.a for r in sorted(df.collect())] == [1, 2]
