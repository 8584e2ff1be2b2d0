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
