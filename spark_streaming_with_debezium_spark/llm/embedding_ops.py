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


_PCA_ORACLE = """
    WITH x1 AS (
      SELECT vec_id, list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS v
      FROM embeddings
    ),
    t0 AS (SELECT vec_id, CAST(list_sum(v) AS HUGEINT) AS t FROM x1),
    ex AS (SELECT vec_id, unnest(v) AS x, generate_subscripts(v,1) AS pos
           FROM x1),
    v1 AS (SELECT pos, SUM(CAST(ex.x AS HUGEINT) * t0.t) AS s
           FROM ex JOIN t0 USING (vec_id) GROUP BY pos),
    t1 AS (SELECT ex.vec_id, SUM(CAST(ex.x AS HUGEINT) * v1.s) AS t
           FROM ex JOIN v1 USING (pos) GROUP BY ex.vec_id),
    v2 AS (SELECT pos, SUM(CAST(ex.x AS HUGEINT) * t1.t) AS s
           FROM ex JOIN t1 USING (vec_id) GROUP BY pos),
    ref AS (SELECT pos, s FROM v2
            QUALIFY row_number() OVER (ORDER BY abs(s) DESC, pos) = 1)
    SELECT v2.pos AS pos,
           round(CAST(v2.s AS DOUBLE) / CAST(r.s AS DOUBLE), 6) AS dir_ratio,
           round(CAST(r.s AS DOUBLE) / CAST(v1r.s AS DOUBLE) / 1e12, 6)
             AS eig_est
    FROM v2, ref r JOIN v1 v1r ON v1r.pos = r.pos
    """


@query("embedding_pca_power", oracle=_PCA_ORACLE)
def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal axis of the embedding corpus by MATRIX-FREE
    power iteration — the spectral building block behind whitening,
    SemDeDup-style re-centering and low-rank drift monitors. The Gram
    matrix G = XᵀX is never materialized: each iteration computes
    v ← Xᵀ(X·v) as ONE stateless pass (per-row dot against the
    broadcast iterate, posexplode, partial-aggregated groupBy(pos)),
    so the per-round cost is a scan and a d-row shuffle — the same
    shape at 100 TB, where forming the d×d Gram via n·d² explosion
    would be the wrong plan for the first iterations.

    Determinism without a float anywhere in the fixpoint: coordinates
    drop on the exact 1e-6 integer grid, iterates stay exact integers
    (decimal(38) interior / DuckDB HUGEINT — bounds proven for d=64,
    n ≤ ~1e5; beyond that, production rescales the iterate by an exact
    2^k floor-shift between rounds), and the OUTPUT is normalization-
    free projective coordinates: every component as a ratio to the
    largest-|component| reference (tie-break smallest pos), plus the
    eigenvalue estimate v2_ref/v1_ref rescaled to float units. The
    only float ops are two divisions of exactly-known integers —
    bit-identical IEEE in both engines."""
    from spark_streaming_with_debezium_spark.llm.cluster import (
        _gridded_embeddings,
    )

    # One materialization for BOTH power iterations: without persist
    # each half_pass re-runs the parquet scan + per-element grid
    # transform (iterations × scan). Bounded cache: n × d longs.
    e = _gridded_embeddings(spark, sf_dir).select("vec_id", "v").persist()
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    zero = F.lit(0).cast("decimal(38,0)")
    add = lambda a, x: (a + x).cast("decimal(38,0)")  # noqa: E731

    def half_pass(t_col) -> list[int]:
        """One v ← Xᵀ(X·v) pass: t_col is the per-row dot X·v; returns
        the d exact integer components of the new iterate (bounded
        d-row collect — the iterative-ML driver loop shape).

        t is bound ONCE per row by making the generator's argument the
        product array ``zip_with(v, array_repeat(t, d), *)``: selecting
        ``t`` next to ``posexplode(v)`` plans the Project ABOVE the
        Generate, re-evaluating the d-element interpreted decimal dot
        per exploded element — O(d²) lambda evals per row (measured
        4.5× slower at d=64). Generate evaluates its argument once per
        input row, so this form is O(d)."""
        prod = F.zip_with(
            "v",
            F.array_repeat(t_col, F.size("v")),
            lambda x, t: dec(x) * t,
        )
        rows = (
            e.select(F.posexplode(prod).alias("pos", "p"))
            .groupBy("pos")
            .agg(F.sum("p").alias("s"))
            .collect()
        )
        by_pos = {r["pos"]: int(r["s"]) for r in rows}
        return [by_pos[p] for p in range(len(by_pos))]

    try:
        # iteration 1: v0 = all-ones ⇒ X·v0 is just the coordinate sum
        t0 = F.aggregate("v", zero, lambda a, x: add(a, dec(x)))
        v1 = half_pass(t0)
        # iteration 2: dot against the broadcast exact iterate
        v1_lit = F.array(
            *[F.lit(str(c)).cast("decimal(38,0)") for c in v1]
        )
        t1 = F.aggregate(
            F.zip_with("v", v1_lit, lambda x, c: dec(x) * c), zero, add
        )
        v2 = half_pass(t1)
    finally:
        # both iterates are collected integers; the cache is done
        e.unpersist()

    d = len(v2)
    ref = sorted(range(d), key=lambda p: (-abs(v2[p]), p))[0]
    out = spark.createDataFrame(
        [(p + 1, str(v2[p])) for p in range(d)], "pos int, v2 string"
    )
    ref2 = F.lit(str(v2[ref])).cast("decimal(38,0)").cast("double")
    ref1 = F.lit(str(v1[ref])).cast("decimal(38,0)").cast("double")
    return out.select(
        "pos",
        F.round(
            F.col("v2").cast("decimal(38,0)").cast("double") / ref2, 6
        ).alias("dir_ratio"),
        F.round(ref2 / ref1 / F.lit(1e12), 6).alias("eig_est"),
    )


@query(
    "embedding_label_cohesion",
    oracle="""
    WITH ex AS (
      SELECT vec_id, label, i AS pos,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
               AS x
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ), s AS (
      SELECT label, pos, CAST(SUM(x) AS BIGINT) AS s
      FROM ex GROUP BY 1, 2
    ), n2s AS (
      SELECT label,
             CAST(SUM(CAST(s AS DECIMAL(19,0)) * CAST(s AS DECIMAL(19,0)))
                  AS DOUBLE) AS n2s
      FROM s GROUP BY 1
    ), per_vec AS (
      SELECT ex.vec_id, ex.label,
             CAST(SUM(CAST(ex.x AS DECIMAL(19,0)) * CAST(s.s AS DECIMAL(19,0)))
                  AS DOUBLE) AS dot,
             CAST(SUM(CAST(ex.x AS DECIMAL(19,0)) * CAST(ex.x AS DECIMAL(19,0)))
                  AS DOUBLE) AS n2v
      FROM ex JOIN s ON ex.label = s.label AND ex.pos = s.pos
      GROUP BY 1, 2
    ), cos AS (
      SELECT p.label,
             CASE WHEN p.n2v * n.n2s = 0 THEN NULL
                  ELSE p.dot / (sqrt(p.n2v) * sqrt(n.n2s)) END AS c
      FROM per_vec p JOIN n2s n ON p.label = n.label
    )
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           round(CAST(SUM(CAST(c AS DECIMAL(38,12))) AS DOUBLE)
                 / COUNT(c), 6) AS avg_cos_centroid
    FROM cos GROUP BY 1
    """,
)
def embedding_label_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster cohesion per label: average cosine of each vector to its
    label centroid — the health metric for any labeled/clustered
    embedding corpus (a label whose members barely point at their own
    centroid is mislabeled or needs re-clustering).

    Cross-engine float determinism via EXACT fixed-point arithmetic:
    each float coordinate drops onto a 1e-6 integer grid (floor never
    ties, unlike round-half), so the centroid sums, dot products, and
    norms are integer/decimal EXACT and order-independent — the same
    property that makes the result identical across partitionings,
    retries, and engines. cosine(v, centroid) == cosine(v, sum-vector)
    (scale invariance), so the centroid division never happens and no
    engine-specific decimal-division scale rules apply. Only the final
    cosine is double math — identical IEEE ops on identical inputs.

    Scale shape: one posexplode pass builds the (label, pos) sums —
    dims × labels rows, broadcast-sized for any corpus; the sum-vectors
    are reassembled as arrays and BROADCAST back, so the per-vector
    cosine is a single stateless pass over the fact (no 64× exploded
    shuffle, no join shuffle on the big side); the finale aggregates
    O(labels) rows. 1e-6 grid × 1e9-vector labels stays within
    decimal(38) exactness by ~18 orders of magnitude."""
    e = load_table(spark, sf_dir, "embeddings")
    dec = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    acc_add = lambda a, x: (a + x).cast("decimal(38,0)")  # noqa: E731
    zero = F.lit(0).cast("decimal(38,0)")

    ei = e.select(
        "vec_id",
        "label",
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * 1000000.0).cast("long")
        ).alias("xi"),
    )
    s_arr = (
        ei.select("label", F.posexplode("xi").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.sum("x").alias("s"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "s"))).alias("ps"))
        .select(
            "label",
            F.transform("ps", lambda p: p["s"]).alias("sv"),
        )
        .withColumn(
            "n2s",
            F.aggregate(
                F.transform("sv", lambda s: dec(s) * dec(s)), zero, acc_add
            ).cast("double"),
        )
    )
    joined = ei.join(F.broadcast(s_arr), "label")
    dot = F.aggregate(
        F.zip_with("xi", "sv", lambda x, s: dec(x) * dec(s)), zero, acc_add
    ).cast("double")
    n2v = F.aggregate(
        F.transform("xi", lambda x: dec(x) * dec(x)), zero, acc_add
    ).cast("double")
    cos = F.when(
        (n2v * F.col("n2s")) != 0, dot / (F.sqrt(n2v) * F.sqrt("n2s"))
    )
    per_vec = joined.select("label", cos.alias("c"))
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(
            F.sum(F.col("c").cast("decimal(38,12)")).cast("double") / F.count("c"),
            6,
        ).alias("avg_cos_centroid"),
    )


@query(
    "embedding_outlier_mahalanobis",
    oracle="""
    WITH ex AS (
      SELECT vec_id, label, i AS pos,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
               AS x
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ), st AS (
      SELECT label, pos,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS s,
             CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
                  AS BIGINT) AS q
      FROM ex GROUP BY 1, 2
    ), ratio AS (
      SELECT ex.vec_id, ex.label,
             CASE WHEN CAST(st.n AS DECIMAL(19,0)) * CAST(st.q AS DECIMAL(19,0))
                       - CAST(st.s AS DECIMAL(19,0)) * CAST(st.s AS DECIMAL(19,0))
                       = 0
                  THEN CAST(0 AS DOUBLE)
                  ELSE CAST(CAST(ex.x * st.n - st.s AS DECIMAL(19,0))
                            * CAST(ex.x * st.n - st.s AS DECIMAL(19,0))
                            AS DOUBLE)
                       / CAST(CAST(st.n AS DECIMAL(19,0))
                              * CAST(st.q AS DECIMAL(19,0))
                              - CAST(st.s AS DECIMAL(19,0))
                              * CAST(st.s AS DECIMAL(19,0)) AS DOUBLE)
             END AS r
      FROM ex JOIN st ON ex.label = st.label AND ex.pos = st.pos
    ), score AS (
      SELECT vec_id, label,
             CAST(SUM(CAST(r AS DECIMAL(38,12))) AS DOUBLE) AS m2
      FROM ratio GROUP BY 1, 2
    ), ranked AS (
      SELECT vec_id, label, m2,
             row_number() OVER (PARTITION BY label
                                ORDER BY m2 DESC, vec_id) AS rk
      FROM score
    )
    SELECT label, CAST(rk AS BIGINT) AS rank, vec_id,
           round(m2, 6) AS mahalanobis2
    FROM ranked WHERE rk <= 5
    """,
)
def embedding_outlier_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier detection — the QA pass a curation
    pipeline runs over a labeled/clustered corpus before training:
    per label, the top-5 vectors by squared Mahalanobis distance under
    a DIAGONAL covariance model (n·Σ-normalized per-dimension
    z-scores). High scorers are mislabeled points, encoder glitches,
    or genuine novelty — either way the rows a human reviews first.
    Complements `embedding_label_cohesion` (cluster-level health
    scalar) with a per-VECTOR ranking, and `embedding_drift_cells`
    (population drift) with a point-anomaly view.

    Exact fixed-point discipline (module convention): coordinates on
    the 1e-6 floor grid; per-(label, dim) moment sums n/S/Q are exact
    integers, and the per-dimension ratio is formed from the
    INTEGER-EXACT identity (x·n − S)² / (n·Q − S²) — numerator and
    denominator are exact decimals converted to double once, so the
    only float ops are one division per dimension and the final sum,
    accumulated in DECIMAL(38,12) (order-independent) before a single
    cast back. A zero-variance dimension contributes exactly 0 (the
    integer-exact guard), never NaN/Inf. Both engines therefore
    compute bit-identical scores; round(6) absorbs nothing but
    representation slack.

    Scale shape: one posexplode aggregate builds labels × dims moment
    rows (broadcast-sized for any corpus); the stats rejoin the fact
    as BROADCAST arrays, so scoring is a single stateless pass over
    the embeddings — no fact-side shuffle at all until the final
    top-5-per-label window over per-vector scores, which shuffles one
    64-byte row per vector on the label key (the bounded per-group
    top-k pattern of `window_rank_topk_per_group`)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings")
    dec = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    ei = e.select(
        "vec_id",
        "label",
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * 1000000.0).cast("long")
        ).alias("xi"),
    )
    st = (
        ei.select("label", F.posexplode("xi").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("s"),
            F.sum(dec(F.col("x")) * dec(F.col("x")))
            .cast("long")
            .alias("q"),
        )
        .groupBy("label")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "n", "s", "q"))).alias(
                "ps"
            )
        )
        .select(
            "label",
            F.transform("ps", lambda p: p["n"]).alias("nv"),
            F.transform("ps", lambda p: p["s"]).alias("sv"),
            F.transform("ps", lambda p: p["q"]).alias("qv"),
        )
    )
    joined = ei.join(F.broadcast(st), "label")
    z = F.arrays_zip("xi", "nv", "sv", "qv")
    num = lambda t: dec(t["xi"] * t["nv"] - t["sv"]) * dec(  # noqa: E731
        t["xi"] * t["nv"] - t["sv"]
    )
    den = lambda t: dec(t["nv"]) * dec(t["qv"]) - dec(t["sv"]) * dec(  # noqa: E731
        t["sv"]
    )
    ratio = F.transform(
        z,
        lambda t: F.when(den(t) == 0, F.lit(0.0)).otherwise(
            num(t).cast("double") / den(t).cast("double")
        ),
    )
    m2 = F.aggregate(
        ratio,
        F.lit(0).cast("decimal(38,12)"),
        lambda acc, r: (acc + r.cast("decimal(38,12)")).cast("decimal(38,12)"),
    ).cast("double")
    scored = joined.select("vec_id", "label", m2.alias("m2"))
    w = Window.partitionBy("label").orderBy(F.desc("m2"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("label", "rank", "vec_id", F.round("m2", 6).alias("mahalanobis2"))
    )
