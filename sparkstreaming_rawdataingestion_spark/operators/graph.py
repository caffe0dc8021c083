"""Iterative graph operators: fixed-point integer PageRank.

Webgraph-style authority scoring is a standard corpus-quality signal in
training-data pipelines (rank domains/documents by link authority, weight
or filter the corpus by it). The engine's variant is **integer
fixed-point** PageRank: ranks are BIGINT multiples of ``1/SCALE`` and
every step uses truncating integer arithmetic, so the result is
bit-exact regardless of partitioning or reduction order — the property
that makes an iterative distributed computation *verifiable* (the DuckDB
oracle unrolls the same iterations and must match exactly; float
PageRank could only ever be compared approximately).

Scale shape per iteration: one shuffle (contributions grouped by dst).
The degree-annotated edge list is staged once (session.stage) and reused
by every iteration — at 100 TB that is the big payload you must not
recompute; rank vectors are one BIGINT per node. Spark's default is the
right loop structure here (compare GraphX/Pregel: same
join-aggregate-per-superstep, no driver-side data).

Like dedup's connected components (operators/dedup.py), this is the
(b)-tier pattern from the brief: semantics Spark's built-in operators
can't express in one plan, built as a bounded loop of DataFrame ops —
never ``collect()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import catalog, session

QUERIES: dict = {}
ORACLES: dict = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


#: rank unit: ranks are BIGINT multiples of 1/SCALE (9 decimal digits).
#: Headroom check: 85 * sum(all ranks) ≈ 85 * N * SCALE must stay inside
#: int64 → fine to ~10^8 nodes; beyond that drop SCALE a digit.
PAGERANK_SCALE = 1_000_000_000


def pagerank(edges: DataFrame, n_iters: int = 3) -> DataFrame:
    """Fixed-point PageRank over a directed edge list (``src``, ``dst``).

    Damping 0.85 in the per-node form ``pr'(v) = 0.15*SCALE +
    0.85 * sum(pr(u) div outdeg(u))`` — total mass ≈ N*SCALE, no global
    N division, all arithmetic truncating-integer (``div``), so results
    are exactly reproducible. Every node of the graph (src ∪ dst) is
    carried through every iteration: a source-only node keeps its
    0.15*SCALE teleport rank and keeps contributing to its out-neighbors,
    rather than vanishing after iteration 1 on asymmetric graphs.
    Dangling-node mass is dropped (the standard damped variant without
    dangling redistribution); on a symmetrized edge list the result is
    identical to the in-edge-only formulation.
    """
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ed = session.stage(edges.join(deg, "src"))
    nodes = session.stage(
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    pr = nodes.select("node", F.lit(PAGERANK_SCALE).alias("pr"))
    base = 15 * PAGERANK_SCALE // 100
    for _ in range(n_iters):
        contrib = ed.join(pr, ed.src == pr.node).select(
            "dst", F.expr("pr div deg").alias("c")
        )
        in_rank = contrib.groupBy(F.col("dst").alias("node")).agg(
            F.expr("(85 * sum(c)) div 100").alias("in_pr")
        )
        pr = nodes.join(in_rank, "node", "left").select(
            "node",
            (F.lit(base) + F.coalesce(F.col("in_pr"), F.lit(0))).alias("pr"),
        )
    return pr


@_register(
    "graph_pagerank_authority",
    f"""
WITH pairs AS (
  SELECT DISTINCT o.o_custkey * 2 AS cnode, l.l_suppkey * 2 + 1 AS snode
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT cnode AS src, snode AS dst FROM pairs
  UNION ALL
  SELECT snode AS src, cnode AS dst FROM pairs
),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
pr0 AS (SELECT src AS node, CAST({PAGERANK_SCALE} AS BIGINT) AS pr FROM deg),
it1 AS (
  SELECT e.dst AS node,
         CAST({15 * PAGERANK_SCALE} // 100
            + (85 * SUM(p.pr // d.deg)) // 100 AS BIGINT) AS pr
  FROM edges e JOIN deg d ON d.src = e.src JOIN pr0 p ON p.node = e.src
  GROUP BY e.dst
),
it2 AS (
  SELECT e.dst AS node,
         CAST({15 * PAGERANK_SCALE} // 100
            + (85 * SUM(p.pr // d.deg)) // 100 AS BIGINT) AS pr
  FROM edges e JOIN deg d ON d.src = e.src JOIN it1 p ON p.node = e.src
  GROUP BY e.dst
),
it3 AS (
  SELECT e.dst AS node,
         CAST({15 * PAGERANK_SCALE} // 100
            + (85 * SUM(p.pr // d.deg)) // 100 AS BIGINT) AS pr
  FROM edges e JOIN deg d ON d.src = e.src JOIN it2 p ON p.node = e.src
  GROUP BY e.dst
)
SELECT node, pr FROM it3
""",
)
def q_graph_pagerank_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank authority over the customer↔supplier trade graph
    (bipartite, symmetrized; node ids disambiguated as 2k / 2k+1).
    3 iterations; the oracle unrolls the identical integer arithmetic —
    an exact hash-match on an *iterative* distributed algorithm.
    All positive values, so Spark's truncating ``div`` and DuckDB's
    flooring ``//`` agree."""
    o = catalog.load_table(spark, sf_dir, "orders")
    li = catalog.load_table(spark, sf_dir, "lineitem")
    pairs = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("cnode"),
            (F.col("l_suppkey") * 2 + 1).alias("snode"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("cnode").alias("src"), F.col("snode").alias("dst")
    ).unionAll(pairs.select(F.col("snode").alias("src"), F.col("cnode").alias("dst")))
    return pagerank(edges, n_iters=3)
