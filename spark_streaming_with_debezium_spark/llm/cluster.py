"""Near-duplicate clustering: connected components over candidate
pairs → one canonical document per duplicate cluster.

Pairwise dedup (MinHash/SimHash/jaccard) yields EDGES; the keep/drop
decision needs COMPONENTS (doc A~B, B~C ⇒ {A,B,C} is one cluster even
if A~C was never scored). Implemented as iterative min-label
propagation on DataFrames:

    label(v) ← min(label(v), min over neighbors(label(u)))

repeated until fixpoint — O(diameter) joins, and near-dup clusters are
shallow (diameter ≤ ~log cluster size in practice), so 5-10 iterations
close 100 TB-scale graphs. Each iteration is one shuffle join on doc
id; no driver-side graph state (this is the standard large-scale
connected-components-on-MapReduce recipe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_streaming_with_debezium_spark.registry import query


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 15,
) -> DataFrame:
    """(node, component) from an edge list; component = min node id in
    the component. Converges when an iteration changes nothing."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    try:
        changed = 0
        for _ in range(max_iter):
            # candidate label for v = min label among its neighbors u
            neighbor_min = (
                edges.join(labels, edges.u == labels.node)
                .groupBy(F.col("v").alias("node"))
                .agg(F.min("comp").alias("nmin"))
            )
            new_labels = (
                labels.join(neighbor_min, "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))
                    ).alias("comp"),
                )
                .persist()
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.comp") != F.col("o.comp"))
                .limit(1)
                .count()
            )
            labels.unpersist() if hasattr(labels, "unpersist") else None
            labels = new_labels
            if changed == 0:
                break
        if changed != 0:
            raise RuntimeError(
                f"connected_components did not converge within {max_iter} "
                "iterations — long-chain components would get wrong labels; "
                "raise max_iter (rounds needed ≈ graph diameter)"
            )
        return labels.select("node", "comp")
    finally:
        edges.unpersist()


def clusters_from_pairs(pairs: DataFrame) -> DataFrame:
    """Edge list → duplicate clusters: per cluster, canonical doc =
    lowest doc_id, plus size and a joined member list (scalar output —
    registered queries never return array columns). Shared by every
    pair-producing dedup face (native LSH, pyspark.ml LSH), so the
    keep/drop decision logic exists exactly once."""
    comps = connected_components(pairs)
    return (
        comps.groupBy(F.col("comp").alias("canonical_doc"))
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("node")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("members"),
        )
        .filter(F.col("cluster_size") > 1)
    )


def _clusters_oracle() -> str:
    """DuckDB dual of the WHOLE clustering face: the deterministic
    MinHash+LSH verified pairs (shared CTEs from ``llm/dedup.py``) fed
    into connected components via a recursive CTE (min-label closure —
    every node collects every reachable label, MIN per node is its
    component), then the canonical/size/member-list aggregation. The
    iterative Spark loop and the recursive SQL closure are independent
    formulations of the same fixpoint, so a value-hash match checks
    convergence and labeling, not just row counts."""
    from spark_streaming_with_debezium_spark.llm.dedup import minhash_pairs_ctes

    return f"""
    WITH RECURSIVE {minhash_pairs_ctes()},
    vp AS (SELECT doc_a, doc_b FROM verified WHERE jac >= 0.5),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM vp
      UNION ALL SELECT doc_b, doc_a FROM vp
    ),
    nodes AS (SELECT DISTINCT u AS node FROM edges),
    reach(node, label) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.v, r.label FROM reach r JOIN edges e ON e.u = r.node
    ),
    comp AS (SELECT node, MIN(label) AS comp FROM reach GROUP BY node)
    SELECT comp AS canonical_doc,
           CAST(COUNT(*) AS BIGINT) AS cluster_size,
           string_agg(CAST(node AS VARCHAR), ',' ORDER BY node) AS members
    FROM comp GROUP BY comp HAVING COUNT(*) > 1
    """


@query("dedup_clusters", oracle=_clusters_oracle())
def dedup_clusters(spark, sf_dir: str) -> DataFrame:
    """Duplicate clusters from MinHash-LSH verified pairs: the
    keep-list / drop-list a dedup pipeline actually applies. Fully
    oracle-checked since round 7 (recursive-CTE components over the
    deterministic pair set — see :func:`_clusters_oracle`); also
    verified against a driver-side union-find in tests."""
    from spark_streaming_with_debezium_spark.llm.dedup import dedup_minhash_lsh

    return clusters_from_pairs(dedup_minhash_lsh(spark, sf_dir))


@query("dedup_clusters_ml", oracle=None)  # iterative => rows-only
def dedup_clusters_ml(spark, sf_dir: str) -> DataFrame:
    """Same cluster output over the pyspark.ml MinHashLSH face — both
    LSH implementations feed ONE clustering path, so a user can swap
    candidate generators without changing the keep/drop logic.
    Exact-duplicate groups must appear identically in both faces'
    clusters (asserted in tests/test_llm_ops.py)."""
    from spark_streaming_with_debezium_spark.llm.ml_lsh import dedup_minhash_ml

    return clusters_from_pairs(dedup_minhash_ml(spark, sf_dir))


def _group_split_oracle() -> str:
    """DuckDB dual of the dedup-aware split: verified near-dup pairs →
    recursive-CTE components → every document splits by the md5 prefix
    of its GROUP representative's id (singletons represent themselves),
    with the naive content-hash split computed alongside so the oracle
    value-hashes both the assignment and the leakage comparison."""
    from spark_streaming_with_debezium_spark.llm.dedup import minhash_pairs_ctes

    return f"""
    WITH RECURSIVE {minhash_pairs_ctes()},
    vp AS (SELECT doc_a, doc_b FROM verified WHERE jac >= 0.5),
    uedges AS (
      SELECT doc_a AS u, doc_b AS v FROM vp
      UNION ALL SELECT doc_b, doc_a FROM vp
    ),
    unodes AS (SELECT DISTINCT u AS node FROM uedges),
    reach(node, label) AS (
      SELECT node, node FROM unodes
      UNION
      SELECT e.v, r.label FROM reach r JOIN uedges e ON e.u = r.node
    ),
    comp AS (SELECT node, MIN(label) AS comp FROM reach GROUP BY node),
    rep AS (
      SELECT d.doc_id,
             COALESCE(c.comp, d.doc_id) AS grp,
             CASE WHEN substr(md5(CAST(COALESCE(c.comp, d.doc_id) AS VARCHAR)),
                              1, 2) < '14'
                  THEN 'holdout' ELSE 'train' END AS gsplit,
             CASE WHEN substr(md5(d.text), 1, 2) < '14'
                  THEN 'holdout' ELSE 'train' END AS nsplit
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    ),
    leak AS (
      SELECT
        CAST(SUM(CASE WHEN ra.gsplit <> rb.gsplit THEN 1 ELSE 0 END)
             AS BIGINT) AS leak_pairs_grouped,
        CAST(SUM(CASE WHEN ra.nsplit <> rb.nsplit THEN 1 ELSE 0 END)
             AS BIGINT) AS leak_pairs_naive
      FROM vp
      JOIN rep ra ON vp.doc_a = ra.doc_id
      JOIN rep rb ON vp.doc_b = rb.doc_id
    ),
    per AS (
      SELECT gsplit, CAST(COUNT(*) AS BIGINT) AS n_docs FROM rep GROUP BY gsplit
    ),
    gsz AS (SELECT grp, gsplit, COUNT(*) AS n FROM rep GROUP BY grp, gsplit),
    pg AS (
      SELECT gsplit, CAST(COUNT(*) AS BIGINT) AS n_dup_groups
      FROM gsz WHERE n > 1 GROUP BY gsplit
    )
    SELECT per.gsplit AS split, per.n_docs,
           CAST(COALESCE(pg.n_dup_groups, 0) AS BIGINT) AS n_dup_groups,
           l.leak_pairs_grouped, l.leak_pairs_naive
    FROM per LEFT JOIN pg USING (gsplit), leak l
    """


@query("split_leakage_safe_groups", oracle=_group_split_oracle())
def split_leakage_safe_groups(spark, sf_dir: str) -> DataFrame:
    """Dedup-aware train/holdout split: every near-dup CLUSTER travels
    as one unit (split decided by the md5 prefix of the cluster
    representative's id; singletons represent themselves), so no
    verified near-duplicate pair can straddle the split — the leakage
    a naive per-document content-hash split permits when two documents
    are near-but-not-exact copies. The output carries the receipts:
    ``leak_pairs_grouped`` (straddling pairs under the group split —
    COMPUTED, structurally 0) next to ``leak_pairs_naive`` (the same
    count under the naive split).

    Scale shape: components via the iterative min-label propagation of
    :func:`connected_components` (O(diameter) shuffle joins, no driver
    graph state); the corpus then LEFT-joins the component table once
    on doc_id (components cover only docs that appear in pairs — far
    smaller than the corpus) and everything downstream is two bounded
    aggregates plus a 1-row leakage broadcast."""
    from pyspark.sql import SparkSession  # noqa: F401 (signature parity)

    from spark_streaming_with_debezium_spark.llm.dedup import dedup_minhash_lsh
    from spark_streaming_with_debezium_spark.sources.tables import load_table

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    comps = connected_components(pairs)
    d = load_table(spark, sf_dir, "documents")
    grp = F.coalesce(F.col("comp"), F.col("doc_id"))
    gsplit = F.when(
        F.substring(F.md5(grp.cast("string")), 1, 2) < "14", "holdout"
    ).otherwise("train")
    nsplit = F.when(
        F.substring(F.md5("text"), 1, 2) < "14", "holdout"
    ).otherwise("train")
    rep = d.join(comps, d.doc_id == comps.node, "left").select(
        "doc_id",
        grp.alias("grp"),
        gsplit.alias("gsplit"),
        nsplit.alias("nsplit"),
    )
    ra = rep.select(
        F.col("doc_id").alias("doc_a"),
        F.col("gsplit").alias("ga"),
        F.col("nsplit").alias("na"),
    )
    rb = rep.select(
        F.col("doc_id").alias("doc_b"),
        F.col("gsplit").alias("gb"),
        F.col("nsplit").alias("nb"),
    )
    leak = F.broadcast(
        pairs.join(ra, "doc_a")
        .join(rb, "doc_b")
        .agg(
            F.sum(F.when(F.col("ga") != F.col("gb"), 1).otherwise(0))
            .cast("long")
            .alias("leak_pairs_grouped"),
            F.sum(F.when(F.col("na") != F.col("nb"), 1).otherwise(0))
            .cast("long")
            .alias("leak_pairs_naive"),
        )
    )
    per = rep.groupBy(F.col("gsplit").alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    pg = (
        rep.groupBy("grp", "gsplit")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .groupBy(F.col("gsplit").alias("split"))
        .agg(F.count(F.lit(1)).alias("n_dup_groups"))
    )
    return (
        per.join(pg, "split", "left")
        .select(
            "split",
            "n_docs",
            F.coalesce(F.col("n_dup_groups"), F.lit(0))
            .cast("long")
            .alias("n_dup_groups"),
        )
        .crossJoin(leak)
    )
