"""Fixed-point PageRank: hand-computed tiny graph, determinism across
partitionings, and mass/bounds sanity on the fixture trade graph."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_rawdataingestion_spark.operators import graph

SCALE = graph.PAGERANK_SCALE


def _expected_fixed_point(edges, n_iters):
    """Reference implementation in plain Python (same integer arithmetic).
    Source-only nodes (out-edges, no in-edges) hold the constant teleport
    base from iteration 1 on and keep contributing — the general-graph
    semantics the engine implements."""
    from collections import defaultdict

    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    src_only = set(deg) - {d for _, d in edges}
    base = 15 * SCALE // 100
    pr = {n: SCALE for n in deg}
    for _ in range(n_iters):
        acc = defaultdict(int)
        for s, d in edges:
            if s in pr:
                acc[d] += pr[s] // deg[s]
        pr = {n: base + (85 * c) // 100 for n, c in acc.items()}
        pr.update({n: base for n in src_only})
    return pr


def test_pagerank_matches_hand_computation(spark):
    # star: 1 ↔ {2,3,4} (symmetric) — center must outrank leaves
    pairs = [(1, 2), (1, 3), (1, 4)]
    edges_list = pairs + [(d, s) for s, d in pairs]
    edges = spark.createDataFrame(edges_list, "src long, dst long")
    out = {r.node: r.pr for r in graph.pagerank(edges, n_iters=3).collect()}
    assert out == _expected_fixed_point(edges_list, 3)
    assert out[1] > out[2] == out[3] == out[4]


def test_pagerank_asymmetric_source_only_nodes(spark):
    # chain 1 → 2 → 3 plus feeder 4 → 2: nodes 1 and 4 have out-edges but
    # no in-edges. They must (a) appear in the output at the teleport
    # base, and (b) keep contributing base-scaled mass to node 2 in every
    # iteration — not vanish after iteration 1 (the general-graph case
    # the symmetrized fixture never exercises).
    edges_list = [(1, 2), (2, 3), (4, 2)]
    edges = spark.createDataFrame(edges_list, "src long, dst long")
    for n_iters in (1, 2, 3):
        out = {r.node: r.pr for r in graph.pagerank(edges, n_iters).collect()}
        assert out == _expected_fixed_point(edges_list, n_iters)
    base = 15 * SCALE // 100
    assert out[1] == out[4] == base
    # node 2 receives from both source-only nodes even at iteration 3
    assert out[2] == base + (85 * (2 * base)) // 100


def test_pagerank_deterministic_across_partitioning(spark):
    pairs = [(i, (i * 7) % 20) for i in range(20) if i != (i * 7) % 20]
    edges_list = pairs + [(d, s) for s, d in pairs]
    one = spark.createDataFrame(edges_list, "src long, dst long").coalesce(1)
    many = spark.createDataFrame(edges_list, "src long, dst long").repartition(13)
    r_one = {(r.node, r.pr) for r in graph.pagerank(one, 3).collect()}
    r_many = {(r.node, r.pr) for r in graph.pagerank(many, 3).collect()}
    assert r_one == r_many  # bit-exact, not approximately equal


def test_pagerank_fixture_mass_and_bounds(spark, sf_dir):
    out = graph.QUERIES["graph_pagerank_authority"](spark, sf_dir)
    agg = out.agg(
        F.count("*").alias("n"),
        F.min("pr").alias("lo"),
        F.sum("pr").alias("total"),
    ).first()
    assert agg.n > 0
    assert agg.lo >= 15 * SCALE // 100  # base rank is a hard floor
    # truncating div only loses mass: total <= N * SCALE
    assert agg.total <= agg.n * SCALE


def test_common_neighbors_on_crafted_graph(spark, tmp_path):
    """Path graph 1-2-3-4 plus hub 5 adjacent to {1,3}: (1,3) share
    {2,5}, (2,4) share {3}; adjacent pairs never appear."""
    from pyspark.sql import functions as F

    from sparkstreaming_rawdataingestion_spark.operators import graph

    # encode edges via the co-supply projection: a part shipped by both
    # suppliers of the edge, quantity >= 48
    edges = [(1, 2), (2, 3), (3, 4), (1, 5), (3, 5)]
    rows = []
    for i, (u, v) in enumerate(edges):
        rows.append((1000 + i, u, 50.0))
        rows.append((1000 + i, v, 50.0))
    li = spark.createDataFrame(
        rows, "l_partkey long, l_suppkey long, l_quantity double"
    )
    li.write.parquet(str(tmp_path / "lineitem.parquet"))
    out = {
        (r.node_a, r.node_b): (r.common, r.jaccard)
        for r in graph.q_graph_common_neighbors(
            spark, str(tmp_path)
        ).collect()
    }
    # two pairs clear the common >= 2 floor: (1,3) via {2,5} and
    # (2,5) via {1,3}; adjacent pairs and single-wedge pairs never appear
    assert set(out) == {(1, 3), (2, 5)}
    # deg(1)=2 {2,5}, deg(3)=3 {2,4,5} → jaccard = 2/(2+3-2)
    assert out[(1, 3)] == (2, round(2 / 3, 6))
    # deg(2)=2 {1,3}, deg(5)=2 {1,3} → identical neighborhoods, jaccard 1
    assert out[(2, 5)] == (2, 1.0)
