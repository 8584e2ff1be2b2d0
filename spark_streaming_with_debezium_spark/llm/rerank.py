"""Second-stage retrieval re-ranking — the serving step between ANN
candidate generation and the final context a RAG pipeline hands to the
model. Maximal Marginal Relevance (Carbonell & Goldstein 1998) picks,
greedily, the candidate that best balances relevance to the query
against redundancy with what's already picked:

    MMR(d) = λ·sim(q, d) − (1 − λ)·max_{s ∈ S} sim(d, s)

With λ = 1/2 the argmax is equivalent to ``dot(q, d) − max dot(d, s)``
— computed here on the exact 1e-6 integer grid (``llm/cluster.py``
conventions), so the entire greedy selection is bit-deterministic and
value-hash-oracled against an unrolled CTE dual in DuckDB.

Scale shape (the production two-stage serving split):

1. Candidate generation is CORPUS-scale and distributed: one stateless
   pass scores every vector against the broadcast query set (the
   ``ann_cosine_topk`` shape — at 100 TB this is the IVF/PQ-pruned
   scan) and a per-query top-N window keeps N candidates.
2. Pairwise candidate similarities are q·N² BOUNDED rows — one
   self-join of the candidate set, co-partitioned on query_id.
3. The greedy argmax loop runs on the COLLECTED q·N² pair table —
   deliberately driver-side, exactly like a re-ranker on a serving
   node: the pool is bounded by construction (N = 20 here), and k
   sequential argmaxes over ≤ N rows each are not distributable work.
   The repo's bounded-collect precedent: ``_lloyd_centroids`` /
   ``ann_pq_adc_topk``'s LUTs.

The returned DataFrame is the distributed candidate frame filtered by
a broadcast literal of the selections, so relevance scores in the
result come from the Spark scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_streaming_with_debezium_spark.llm.cluster import (
    _gridded_embeddings,
    collect_standing_queries,
)
from spark_streaming_with_debezium_spark.registry import query

_MMR_QUERIES = 8  # vec_id < 8 are the standing query vectors
_MMR_N_CAND = 20  # first-stage candidate pool per query
_MMR_K = 5  # final diversified picks per query

#: exact integer dot product of two BIGINT coordinate lists (DuckDB)
_DOT = "list_sum(list_transform(list_zip({a}, {b}), pr -> pr[1]*pr[2]))"


def _mmr_steps() -> str:
    """Unrolled greedy CTE chain ``s1, sel1, sc2, s2, sel2, …`` — the
    same fixed-round unrolling the k-means/PQ oracles use, one level
    per MMR pick."""
    steps = [
        f"""
    s1 AS (
      SELECT query_id, vec_id, dq, dq AS score, 1 AS rnk FROM (
        SELECT c.*, row_number() OVER (PARTITION BY query_id
                      ORDER BY dq DESC, vec_id) AS rn
        FROM cand c
      ) WHERE rn = 1
    ),
    sel1 AS (SELECT query_id, vec_id FROM s1)"""
    ]
    for i in range(2, _MMR_K + 1):
        steps.append(f"""
    sc{i} AS (
      SELECT c.query_id, c.vec_id, c.dq, c.dq - max(p.dab) AS score
      FROM cand c
      JOIN pd p ON p.query_id = c.query_id AND p.da = c.vec_id
      JOIN sel{i - 1} s ON s.query_id = p.query_id AND s.vec_id = p.db
      WHERE NOT EXISTS (
        SELECT 1 FROM sel{i - 1} s2
        WHERE s2.query_id = c.query_id AND s2.vec_id = c.vec_id)
      GROUP BY 1, 2, 3
    ),
    s{i} AS (
      SELECT query_id, vec_id, dq, score, {i} AS rnk FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY score DESC, vec_id) AS rn
        FROM sc{i}
      ) WHERE rn = 1
    ),
    sel{i} AS (SELECT query_id, vec_id FROM sel{i - 1}
               UNION ALL SELECT query_id, vec_id FROM s{i})""")
    return ",".join(steps)


def _mmr_oracle() -> str:
    dqx = _DOT.format(a="x.v", b="q.qv")
    dab = _DOT.format(a="xa.v", b="xb.v")
    picks = " UNION ALL ".join(
        f"SELECT * FROM s{i}" for i in range(1, _MMR_K + 1)
    )
    return f"""
    WITH xi AS (
      SELECT vec_id, list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM xi
          WHERE vec_id < {_MMR_QUERIES}),
    cand AS (
      SELECT query_id, vec_id, dq FROM (
        SELECT q.query_id, x.vec_id, {dqx} AS dq,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY {dqx} DESC, x.vec_id) AS rn
        FROM xi x CROSS JOIN q
        WHERE x.vec_id <> q.query_id
      ) WHERE rn <= {_MMR_N_CAND}
    ),
    pd AS (
      SELECT a.query_id, a.vec_id AS da, b.vec_id AS db, {dab} AS dab
      FROM cand a
      JOIN cand b ON a.query_id = b.query_id AND a.vec_id <> b.vec_id
      JOIN xi xa ON a.vec_id = xa.vec_id
      JOIN xi xb ON b.vec_id = xb.vec_id
    ),
    {_mmr_steps()}
    SELECT query_id, vec_id, rnk,
           CAST(dq AS BIGINT) AS dot_q,
           CAST(score AS BIGINT) AS mmr_score
    FROM ({picks})
    """


@query("rag_rerank_mmr", oracle=_mmr_oracle())
def rag_rerank_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-k per query: distributed first-stage top-N
    by exact integer dot product, distributed q·N² pairwise candidate
    similarities, then the bounded greedy selection (λ = 1/2, pinned
    (score DESC, vec_id) tie-break) — see module docstring for the
    two-stage scale argument. Fully value-hash-oracled against an
    unrolled greedy CTE dual."""
    e = _gridded_embeddings(spark, sf_dir).select("vec_id", "v")
    q_rows = collect_standing_queries(e, _MMR_QUERIES)
    qvs = {int(r["vec_id"]): list(r["v"]) for r in q_rows}

    def dot_lit(col, vec: list[int]):
        return F.aggregate(
            F.zip_with(
                col,
                F.array(*[F.lit(int(c)) for c in vec]),
                lambda x, c: x * c,
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    # stage 1 — corpus-scale: score against the broadcast query set,
    # per-query top-N window
    exploded = e.select(
        "vec_id",
        "v",
        F.explode(
            F.array(
                *[
                    F.named_struct(
                        F.lit("query_id"),
                        F.lit(qid),
                        F.lit("dq"),
                        dot_lit(F.col("v"), qv),
                    )
                    for qid, qv in sorted(qvs.items())
                ]
            )
        ).alias("z"),
    ).select("vec_id", "v", "z.query_id", F.col("z.dq").alias("dq"))
    w = Window.partitionBy("query_id").orderBy(F.desc("dq"), "vec_id")
    cand = (
        exploded.filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _MMR_N_CAND)
        .select("query_id", "vec_id", "v", "dq")
        .localCheckpoint()  # the graph_pagerank precedent: the q·N
        # candidate set materializes ONCE; the two bounded collects and
        # the final result join reuse it instead of re-running the
        # corpus scan (and no unpersist race with the lazy return).
    )
    # stage 2 — bounded: pairwise dots, co-partitioned on query_id
    a = cand.select(
        "query_id", F.col("vec_id").alias("da"), F.col("v").alias("va")
    )
    b = cand.select(
        "query_id", F.col("vec_id").alias("db"), F.col("v").alias("vb")
    )
    pairs = (
        a.join(b, "query_id")
        .filter(F.col("da") != F.col("db"))
        .select(
            "query_id",
            "da",
            "db",
            F.aggregate(
                F.zip_with("va", "vb", lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dab"),
        )
        .collect()  # bounded: q · N · (N−1) rows
    )
    dq_rows = cand.select("query_id", "vec_id", "dq").collect()

    # stage 3 — greedy MMR on the bounded pool (driver-side, exact
    # ints, same pinned tie-break as the oracle)
    dqs: dict[int, dict[int, int]] = {}
    for r in dq_rows:
        dqs.setdefault(int(r["query_id"]), {})[int(r["vec_id"])] = int(
            r["dq"]
        )
    dab: dict[tuple[int, int, int], int] = {
        (int(r["query_id"]), int(r["da"]), int(r["db"])): int(r["dab"])
        for r in pairs
    }
    picks: list[tuple[int, int, int, int]] = []  # (q, vec, rnk, score)
    for qid, pool in sorted(dqs.items()):
        selected: list[int] = []
        for rnk in range(1, _MMR_K + 1):
            best = None
            for vid, dq in sorted(pool.items()):
                if vid in selected:
                    continue
                if selected:
                    score = dq - max(
                        dab[(qid, vid, s)] for s in selected
                    )
                else:
                    score = dq
                # argmax by (score DESC, vec_id ASC)
                if best is None or score > best[1]:
                    best = (vid, score)
            if best is None:  # pool smaller than k
                break
            selected.append(best[0])
            picks.append((qid, best[0], rnk, best[1]))

    sel_df = F.broadcast(
        spark.createDataFrame(
            picks, "query_id long, vec_id long, rnk int, mmr_score long"
        )
    )
    return cand.join(sel_df, ["query_id", "vec_id"]).select(
        "query_id",
        "vec_id",
        "rnk",
        F.col("dq").cast("long").alias("dot_q"),
        F.col("mmr_score").cast("long").alias("mmr_score"),
    )
