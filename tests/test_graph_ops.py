"""Property tests for the iterative graph operators (operators/graph.py)
and the exact-substring dedup — invariants the DuckDB oracle sweep
can't express (mass conservation, planted-duplicate detection)."""

import pyspark.sql.functions as F
import pytest

from spark_streaming_with_debezium_spark.operators.graph import (
    graph_pagerank,
    pagerank_fixed,
)
from spark_streaming_with_debezium_spark.registry import load_all


def test_pagerank_conserves_mass(spark, sf_dir):
    """With an undirected graph every node has out-edges (no dangling
    mass), so Σrank = N exactly after every iteration:
    Σr' = (1-d)·N + d·Σr = N by induction from r₀ ≡ 1."""
    out = graph_pagerank(spark, sf_dir)
    row = out.agg(
        F.count(F.lit(1)).alias("n"), F.sum("pagerank").alias("mass")
    ).collect()[0]
    assert row["n"] > 0
    assert row["mass"] == pytest.approx(row["n"], rel=1e-6)
    # Teleport floor: no node can fall below (1-d).
    assert out.agg(F.min("pagerank")).collect()[0][0] >= 0.15 - 1e-9


def test_pagerank_star_center_dominates(spark):
    """On a star graph (hub ↔ k spokes) the hub must outrank every
    spoke, and all spokes tie exactly (symmetry — a determinism check:
    identical structural positions yield bit-identical ranks)."""
    k = 8
    pairs = [("hub", f"s{i}") for i in range(k)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], ["src", "dst"]
    )
    ranks = {r["node"]: r["rank"] for r in pagerank_fixed(edges).collect()}
    spoke_ranks = {v for n, v in ranks.items() if n != "hub"}
    assert len(spoke_ranks) == 1  # exact tie, not approximate
    assert ranks["hub"] > spoke_ranks.pop()


def test_exact_substring_planted_duplicate(spark, tmp_path):
    """A doc sharing a verbatim 60-char block with another is flagged
    (dup_fraction > 0); a doc of unique text is not. Uses a tiny
    synthetic documents table so the planted span is controlled."""
    import shutil
    import os

    base = "/root/testdata/sf0.001"
    sf = tmp_path / "sf"
    sf.mkdir()
    for t in os.listdir(base):
        shutil.copy(os.path.join(base, t), sf / t)
    shared = "the quick brown fox jumps over the lazy dog again and again!"
    assert len(shared) == 60
    docs = spark.createDataFrame(
        [
            ("a", "PREFIX-A " + shared + " SUFFIX-A" + "x" * 40, "en", "s1", 1),
            ("b", "PREFIX-B " + shared + " SUFFIX-B" + "y" * 40, "en", "s1", 1),
            ("c", "".join(chr(97 + (i * 7) % 26) for i in range(200)), "en", "s1", 1),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    docs.write.mode("overwrite").parquet(str(sf / "documents.parquet"))
    q = load_all()["dedup_exact_substring"]
    out = {r["doc_id"]: r.asDict() for r in q.fn(spark, str(sf)).collect()}
    assert out["a"]["dup_fraction"] > 0
    assert out["b"]["dup_fraction"] > 0
    assert out["c"]["dup_fraction"] == 0.0
    # Stride accounting: positions are 1, 11, 21, … while i+39 ≤ len.
    for d in out.values():
        assert d["n_dup_grams"] <= d["n_grams"]


from decimal import Decimal, ROUND_HALF_UP

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_Q18 = Decimal(1).scaleb(-18)

EDGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),
        st.integers(min_value=0, max_value=6),
    ),
    min_size=1,
    max_size=20,
)


def _ref_pagerank(edges, n_iter=3, damping=0.85):
    """Driver-side reference with the SAME decimal-interior contract as
    pagerank_fixed: per-edge double division, contributions quantized
    to DECIMAL(38,18) (exact halfway never occurs for binary doubles —
    see operators/graph.py), exact decimal sum, one double damping
    update per node per iteration."""
    edges = sorted(set(edges))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    rank = {n: 1.0 for n in nodes}
    for _ in range(n_iter):
        inflow = {n: Decimal(0) for n in nodes}
        for u, v in edges:
            contrib = rank[u] / deg[u]  # IEEE double division
            inflow[v] += Decimal(contrib).quantize(_Q18, ROUND_HALF_UP)
        rank = {
            n: (1.0 - damping) + damping * float(inflow[n]) for n in nodes
        }
    return rank


@settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(edges=EDGES)
def test_pagerank_matches_reference_any_digraph(spark, edges):
    """For ANY directed graph — self-loops, dangling destinations,
    multi-hub — pagerank_fixed must match the driver-side decimal
    reference to 1e-9 (the reference's own float steps carry ~1-ulp
    noise, and round-at-9-digits equality amplified that at exact
    half-boundaries — hypothesis found ...8125 vs ...8125000000001).
    Exercises the dangling-node left-join path the (undirected)
    registered query never hits."""
    edges = sorted(set(edges))
    df = spark.createDataFrame(
        [(f"n{u}", f"n{v}") for u, v in edges], ["src", "dst"]
    )
    got = {r["node"]: r["rank"] for r in pagerank_fixed(df).collect()}
    want = {f"n{n}": v for n, v in _ref_pagerank(edges).items()}
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9, (n, got[n], want[n])


def test_triangle_census_matches_bruteforce(spark):
    """The degree-oriented edge-iterator census must agree with a
    brute-force reference on arbitrary graphs — Hypothesis generates
    edge sets including the adversarial shapes (hubs, ties in the
    degree ordering, isolated stars, cliques)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from itertools import combinations

    from spark_streaming_with_debezium_spark.operators.graph import (
        triangle_census,
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.sets(
            st.tuples(
                st.integers(min_value=0, max_value=14),
                st.integers(min_value=0, max_value=14),
            ).filter(lambda p: p[0] != p[1]),
            min_size=1,
            max_size=60,
        )
    )
    def run(raw_pairs):
        canon = {(min(a, b), max(a, b)) for a, b in raw_pairs}
        nbrs = {}
        for a, b in canon:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        want_tri = sum(
            1
            for trio in combinations(sorted(nbrs), 3)
            if trio[1] in nbrs[trio[0]]
            and trio[2] in nbrs[trio[0]]
            and trio[2] in nbrs[trio[1]]
        )
        want_wedges = sum(d * (d - 1) // 2 for d in map(len, nbrs.values()))
        edges = spark.createDataFrame(sorted(canon), ["pa", "pb"])
        row = triangle_census(edges).collect()[0]
        assert row["n_nodes"] == len(nbrs)
        assert row["n_edges"] == len(canon)
        assert row["n_triangles"] == want_tri
        assert row["n_wedges"] == want_wedges
        if want_wedges:
            assert row["global_clustering"] == pytest.approx(
                3.0 * want_tri / want_wedges, abs=1e-6
            )

    run()


def test_connected_components_match_union_find(spark, sf_dir):
    """The fixed-round min-label result must equal TRUE connected
    components (independent union-find reference) on shipped data, and
    every node must report stable=1 (converged within CC_ITERS)."""
    from collections import defaultdict

    from spark_streaming_with_debezium_spark.operators.graph import (
        CC_MIN_ORDERS,
        graph_connected_components,
    )
    from spark_streaming_with_debezium_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = [
        (r.ck, r.sk)
        for r in o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk"))
        .agg(F.count_distinct("o_orderkey").alias("n"))
        .filter(F.col("n") >= CC_MIN_ORDERS)
        .collect()
    ]
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for c, s in pairs:
        a, b = find(2 * c), find(2 * s + 1)
        if a != b:
            parent[a] = b
    ref = defaultdict(set)
    for node in list(parent):
        ref[find(node)].add(node)
    ref_comps = {frozenset(v) for v in ref.values()}

    rows = graph_connected_components(spark, sf_dir).collect()
    assert rows and all(r.stable == 1 for r in rows)
    got = defaultdict(set)
    for r in rows:
        node = 2 * r.node_key + (0 if r.node_type == "c" else 1)
        got[r.component].add(node)
    assert {frozenset(v) for v in got.values()} == ref_comps
    # the label IS the component's minimum packed id (the canonical
    # representative — deterministic, joinable)
    for lab, members in got.items():
        assert lab == min(members)
