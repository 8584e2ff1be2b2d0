"""HLL sketch queries: the bound-check faces must emit correct exact
counts with every estimate inside the published bound (within_bound=1
— the property the DuckDB oracle hash now certifies), the raw sketch
accuracy must hold, and sketch unions must be mergeable.
"""

import pytest
from pyspark.sql import functions as F

from spark_streaming_with_debezium_spark.operators.sketches import (
    LG_CONFIG_K,
    normalized_content_hash,
    sketch_hll_distinct_docs,
    sketch_hll_rolling_users,
)
from spark_streaming_with_debezium_spark.sources.tables import load_table

# lgK=12 => ~1.6% RSE; 5% is a >3-sigma bound.
TOL = 0.05


def test_hll_distinct_docs_bound_and_mergeable(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    exact = {
        r["source"]: r["n"]
        for r in d.select("source", normalized_content_hash().alias("h"))
        .groupBy("source")
        .agg(F.countDistinct("h").alias("n"))
        .collect()
    }
    exact["__all__"] = (
        d.select(normalized_content_hash().alias("h"))
        .agg(F.countDistinct("h"))
        .collect()[0][0]
    )

    rows = sketch_hll_distinct_docs(spark, sf_dir).collect()
    got = {r["source"]: r["exact_distinct"] for r in rows}
    assert set(got) == set(exact)
    for src, n in exact.items():
        # hash-vs-text distinct may differ only by 64-bit collisions
        assert abs(got[src] - n) <= 1, src
    assert all(r["within_bound"] == 1 for r in rows), [
        r["source"] for r in rows if r["within_bound"] != 1
    ]

    # Mergeability: union of the per-source sketches estimates the same
    # cardinality as a single sketch built over all rows. Not bit-equal:
    # a direct small-n sketch stays in exact sparse (coupon-list) mode,
    # while the union promotes to dense HLL registers — so compare
    # within the sketch's error bound, not for identity.
    per_src = (
        d.select("source", normalized_content_hash().alias("h"))
        .groupBy("source")
        .agg(F.hll_sketch_agg("h", F.lit(LG_CONFIG_K)).alias("sk"))
    )
    union_est = (
        per_src.agg(F.hll_union_agg("sk").alias("sk"))
        .select(F.hll_sketch_estimate("sk").alias("e"))
        .collect()[0]["e"]
    )
    direct = (
        d.select(normalized_content_hash().alias("h"))
        .agg(F.hll_sketch_agg("h", F.lit(LG_CONFIG_K)).alias("sk"))
        .select(F.hll_sketch_estimate("sk").alias("e"))
        .collect()[0]["e"]
    )
    assert union_est == pytest.approx(direct, rel=TOL)
    assert union_est == pytest.approx(exact["__all__"], rel=TOL)


def test_hll_rolling_users_bound_and_deterministic(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    exact = {
        r["anchor"]: r["n"]
        for r in e.select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .select(F.col("day").alias("anchor"))
        .distinct()
        .join(
            e.select(F.to_date("ts").alias("day"), "user_id").distinct(),
            (F.col("day") <= F.col("anchor"))
            & (F.col("day") >= F.date_sub(F.col("anchor"), 6)),
        )
        .groupBy("anchor")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    rows1 = sketch_hll_rolling_users(spark, sf_dir).collect()
    rows2 = sketch_hll_rolling_users(spark, sf_dir).collect()
    got1 = {r["day"]: (r["exact_users_7d"], r["within_bound"]) for r in rows1}
    got2 = {r["day"]: (r["exact_users_7d"], r["within_bound"]) for r in rows2}
    assert got1 == got2  # deterministic across runs
    assert set(got1) == set(exact)
    for day, n in exact.items():
        assert got1[day] == (n, 1), day


def test_cms_mergeable_and_overestimates(spark, sf_dir):
    """Counter-sketch contract: (a) est >= exact for every queried
    token (CMS never undercounts); (b) cell-wise SUM of per-source
    sketches equals the global sketch (mergeability — the property
    that lets every partition build its grid independently)."""
    from spark_streaming_with_debezium_spark.llm.corpus_rules import (
        normalize_text,
    )
    from spark_streaming_with_debezium_spark.llm.dedup import _md5_60bit
    from spark_streaming_with_debezium_spark.operators.sketches import (
        _cms_hash_exprs,
        sketch_cms_heavy_hitters,
    )
    from spark_streaming_with_debezium_spark.sources.tables import load_table

    rows = sketch_cms_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == 20
    assert all(r.est_cnt >= r.exact_cnt for r in rows)

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split(normalize_text("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    hashed = toks.select(
        "source",
        F.posexplode(
            F.array(*_cms_hash_exprs(_md5_60bit(F.col("tok"))))
        ).alias("i", "bucket"),
    )
    merged = {
        (r.i, r.bucket): r.c
        for r in hashed.groupBy("source", "i", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("i", "bucket")
        .agg(F.sum("c").alias("c"))
        .collect()
    }
    direct = {
        (r.i, r.bucket): r.c
        for r in hashed.groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert merged == direct
