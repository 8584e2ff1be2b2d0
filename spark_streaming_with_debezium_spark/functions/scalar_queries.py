"""Scalar-function families: SURVEY §2.8 (F1–F10).

Each query exercises one family over the synthetic tables with a DuckDB
oracle. All expressions are built-in ``pyspark.sql.functions`` — JVM
whole-stage-codegen, zero Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_streaming_with_debezium_spark.functions.numeric import dsum, sql_dsum
from spark_streaming_with_debezium_spark.registry import query
from spark_streaming_with_debezium_spark.sources.tables import load_table


@query(
    "fn_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           event_type
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    """,
)
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: JSON field extraction from the props payload — the Debezium
    envelope idiom (executor-side get_json_object, not driver parsing
    as in DebeziumDeltaFormatter.scala:34-43)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.select(
        "event_id", k.alias("k_value"), "event_type"
    ).filter(F.col("k_value") > 50)


@query(
    "fn_json_typed_parse",
    oracle=f"""
    SELECT event_type,
           {sql_dsum("CAST(json_extract_string(props, '$.k') AS BIGINT)")} AS sum_k,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def fn_json_typed_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F9: from_json with an explicit schema → typed struct access
    (the vectorized envelope-parse pattern), then aggregate."""
    e = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = e.withColumn("p", F.from_json("props", schema))
    return parsed.groupBy("event_type").agg(
        dsum(F.col("p.k")).alias("sum_k"), F.count(F.lit(1)).alias("n")
    )


@query(
    "fn_strings",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           LOWER(c_mktsegment) AS seg_lower,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           LENGTH(c_name) AS name_len,
           CONCAT(c_name, '#', c_mktsegment) AS tagged,
           TRIM(CONCAT('  ', c_name, '  ')) AS trimmed,
           REPLACE(c_name, 'Customer', 'Cust') AS short_name,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits
    FROM customer
    WHERE c_name LIKE 'Customer%'
    """,
)
def fn_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: string functions — case, substring, length, concat, trim,
    replace, regexp_extract, LIKE."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_name").like("Customer%")).select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat(F.col("c_name"), F.lit("#"), F.col("c_mktsegment")).alias("tagged"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("trimmed"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("short_name"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
    )


@query(
    "fn_conditionals_nulls",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 30000 THEN 'high'
                WHEN o_totalprice > 10000 THEN 'mid'
                ELSE 'low' END AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_label,
           (o_orderstatus = 'F') AS is_final
    FROM orders
    """,
)
def fn_conditionals_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F5: when/otherwise, coalesce, nullif, boolean synthesis (the
    `deleted = op=='d'` idiom, DebeziumDeltaFormatter.scala:42)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 30000, "high")
        .when(F.col("o_totalprice") > 10000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_label"
        ),
        (F.col("o_orderstatus") == "F").alias("is_final"),
    )


@query(
    "fn_datetime",
    oracle=f"""
    SELECT date_trunc('month', o_orderdate) AS order_month,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS revenue
    FROM orders
    WHERE year(o_orderdate) >= 2020
    GROUP BY date_trunc('month', o_orderdate)
    """,
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: date_trunc/year — monthly revenue trend (epoch-millis →
    timestamp handling lives in cdc.envelope; this is the analytic side)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.year("o_orderdate") >= 2020)
        .groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("revenue"))
    )


@query(
    "fn_datetime_parts",
    oracle="""
    SELECT event_id,
           year(ts) AS y, month(ts) AS m, day(ts) AS d, hour(ts) AS h,
           CAST(date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts) AS INT)
             AS days_since_epoch_start,
           CAST(floor(epoch(ts)) AS BIGINT) AS unix_ts  -- truncate like Spark
    FROM events
    """,
)
def fn_datetime_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: calendar part extraction + datediff + unix epoch."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        F.unix_timestamp("ts").alias("unix_ts"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 6) AS net_price,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           CAST(ceil(l_quantity / 10) AS BIGINT) AS qty_decile,
           round(sqrt(l_extendedprice), 6) AS price_sqrt,
           round(power(1 + l_tax, 2), 10) AS tax_sq
    FROM lineitem WHERE l_linenumber = 1
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: arithmetic/round/abs/floor/ceil/sqrt/power (IEEE-identical
    per-row in both engines; rounded where display-formatted)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_linenumber") == 1).select(
        "l_orderkey",
        "l_linenumber",
        # scale 6, not 2: at scale 2 the double representation error of
        # price*(1-disc) straddles the .005 boundary and Spark (string-based
        # BigDecimal round) disagrees with DuckDB (binary-value round).
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
            "net_price"
        ),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_quantity") / 10).alias("qty_decile"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.pow(1 + F.col("l_tax"), 2), 10).alias("tax_sq"),
    )


@query(
    "fn_arrays",
    oracle="""
    SELECT vec_id, label,
           len(embedding) AS dim,
           embedding[1] AS first_elem,
           round(CAST(embedding[1] AS DOUBLE) * 2.0 + 1.0, 6) AS first_scaled,
           len(list_filter(embedding, x -> x > 0)) AS n_positive,
           round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_elem
    FROM embeddings
    """,
)
def fn_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: array size/index/higher-order filter/max over the embedding
    column (the similarity-search building blocks)."""
    em = load_table(spark, sf_dir, "embeddings")
    first = F.element_at("embedding", 1).cast("double")
    return em.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_elem"),
        F.round(first * 2.0 + 1.0, 6).alias("first_scaled"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_elem"),
    )


@query(
    "fn_array_agg_decimal",
    oracle="""
    SELECT vec_id,
           CAST(list_sum(list_transform(embedding,
                x -> CAST(CAST(x AS DOUBLE) AS DECIMAL(20,7)))) AS DOUBLE) AS vec_sum
    FROM embeddings
    """,
)
def fn_array_agg_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 higher-order aggregate: per-row array sum with decimal interior
    (order-independent, so float32 reduction matches DuckDB exactly)."""
    em = load_table(spark, sf_dir, "embeddings")
    # float → double → decimal: Spark's float→decimal cast goes through the
    # float's shortest string repr, which disagrees with DuckDB; the double
    # hop makes both engines round the same binary value. The accumulator
    # stays at precision 32 so (32,7)+(20,7) fits in 38 digits — at
    # precision 38 Spark's decimal '+' would *reduce the scale* to 6 and
    # round every step (allowPrecisionLoss), drifting off the exact sum.
    vec_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double").cast("decimal(20,7)")),
        F.lit(0).cast("decimal(32,7)"),
        lambda acc, x: (acc + x).cast("decimal(32,7)"),
    ).cast("double")
    return em.select("vec_id", vec_sum.alias("vec_sum"))


@query(
    "fn_maps",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_from_map,
           1 AS n_keys
    FROM events
    """,
)
def fn_maps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: MapType path for schemaless payloads (the reference's
    Map[String,String] after-image, DebeziumDeltaFormatter.scala:43):
    parse props into a map, then element_at + map_keys."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    return e.select(
        "event_id",
        F.element_at(m, "k").alias("k_from_map"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@query(
    "fn_hashes",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256
    FROM documents
    """,
)
def fn_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10: content hashing for dedup ids — md5/sha256 hex (identical
    across engines; xxhash64 is Spark-only and used in the LSH path)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )


@query(
    "fn_casts",
    oracle="""
    SELECT o_orderkey,
           CAST(trunc(o_totalprice) AS BIGINT) AS price_int,  -- Spark cast truncates; DuckDB rounds
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_dec
    FROM orders
    """,
)
def fn_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: cast surface — the CAST(value AS STRING) Kafka idiom
    (`StreamingJobExecutor.scala:23`) generalized. ``price_dec`` is the
    decimal cast rendered as its canonical string: the decimal VALUES
    match across engines, but driver-side fetch renders DECIMAL columns
    differently (Decimal vs float), so the exterior type must be scalar
    text per the decimal-interior/scalar-exterior discipline."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("bigint").alias("price_int"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string").alias("price_dec"),
    )


@query(
    "fn_strings_extended",
    oracle="""
    SELECT s_suppkey,
           lpad(CAST(s_suppkey AS VARCHAR), 10, '0') AS padded_key,
           levenshtein(s_name, 'Supplier#000000001') AS edit_dist,
           reverse(s_name) AS rev_name,
           repeat('ab', 3) AS repeated,
           translate(s_name, '#', '-') AS translated,
           CAST(strpos(s_name, '#') AS INT) AS hash_pos
    FROM supplier
    """,
)
def fn_strings_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 completion: pad, levenshtein (the edit-distance dedup
    primitive), reverse, repeat, translate, instr."""
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.lpad(F.col("s_suppkey").cast("string"), 10, "0").alias("padded_key"),
        F.levenshtein("s_name", F.lit("Supplier#000000001")).alias("edit_dist"),
        F.reverse("s_name").alias("rev_name"),
        F.repeat(F.lit("ab"), 3).alias("repeated"),
        F.translate("s_name", "#", "-").alias("translated"),
        F.instr("s_name", "#").alias("hash_pos"),
    )


@query(
    "fn_arrays_extended",
    oracle="""
    SELECT p_partkey,
           list_contains(string_split(p_type, ' '), 'PLATED') AS has_plated,
           list_position(string_split(p_type, ' '), 'PLATED') AS plated_pos,
           len(flatten([string_split(p_type, ' '), string_split(p_brand, '#')]))
             AS n_parts,
           array_to_string(list_transform(range(1, 4), x -> x * p_size), ',')
             AS size_multiples
    FROM part
    """,
)
def fn_arrays_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 completion: array_contains/position, flatten, sequence ×
    scalar (generator arrays). The generated array is emitted as a
    joined string — registered queries never return array columns."""
    p = load_table(spark, sf_dir, "part")
    words = F.split("p_type", " ")
    multiples = F.transform(
        F.sequence(F.lit(1), F.lit(3)), lambda x: (x * F.col("p_size")).cast("string")
    )
    return p.select(
        "p_partkey",
        F.array_contains(words, "PLATED").alias("has_plated"),
        F.array_position(words, "PLATED").alias("plated_pos"),
        F.size(F.flatten(F.array(words, F.split("p_brand", "#")))).alias("n_parts"),
        F.array_join(multiples, ",").alias("size_multiples"),
    )


@query(
    "fn_map_higher_order",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) * 2 AS doubled_k,
           'k=' || json_extract_string(props, '$.k') AS kv_repr
    FROM events
    """,
)
def fn_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 completion: map higher-order functions — transform_values to
    double each value, then render entries (map internals aren't
    SQL-portable, so the oracle pins the derived scalars)."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    doubled = F.transform_values(m, lambda k, v: v * 2)
    entries = F.transform(
        F.map_entries(m), lambda kv: F.concat(kv["key"], F.lit("="), kv["value"])
    )
    return e.select(
        "event_id",
        F.element_at(doubled, "k").alias("doubled_k"),
        F.element_at(entries, 1).alias("kv_repr"),
    )
