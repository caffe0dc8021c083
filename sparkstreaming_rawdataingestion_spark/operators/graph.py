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

Scale shape: the edge list is staged once (session.stage) — at 100 TB
that is the big payload you must not recompute — and ONE aggregation
over it yields both degree vectors (out-degree for contribution
division, in-degree for source-only detection). Each iteration is a
node-sized join (rank × degree, co-partitioned; AQE broadcasts while
small) followed by the single edge-sized aggregation shuffle
(contributions grouped by dst); rank vectors are one BIGINT per node. Spark's default is the
right loop structure here (compare GraphX/Pregel: same
join-aggregate-per-superstep, no driver-side data).

Like dedup's connected components (operators/dedup.py), this is the
(b)-tier pattern from the brief: semantics Spark's built-in operators
can't express in one plan, built as a bounded loop of DataFrame ops —
never ``collect()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

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

    ``edges`` is consumed three times (degrees, the staged edge-degree
    join, the source-only probe) — pass a cheap or already-staged plan
    (q_graph_pagerank_authority stages the underlying pair list once and
    derives the symmetrized edges as a map-only union over the cache).
    """
    # The big payload, materialized ONCE. Round 14 cached it
    # pre-partitioned on ``src`` (repartition before persist) hoping the
    # three iteration joins would read co-partitioned cache; round 15
    # REVERTED that: the after-plan gained exchanges (54 → 65 — the
    # cache's hash partitioning did not satisfy the joins'
    # ENSURE_REQUIREMENTS under AQE, so the edge list was re-exchanged
    # anyway ON TOP of the staging repartition), the r14 builder's own
    # win was 8% inside the noise band, and the driver regressed in
    # both its runs (0.62x at 32 cores). Interleaved A/B on the revert:
    # see OPTIMIZATION_r15.md (pagerank row).
    edges = session.stage(edges)
    base = 15 * PAGERANK_SCALE // 100
    # ONE aggregation over the (exploded) edge list yields both degree
    # vectors — out-degree for contribution division, in-degree to find
    # source-only nodes. Source-only nodes (out-edges, no in-edges)
    # receive nothing, so from iteration 2 on their rank is the constant
    # teleport base — carried as a tiny static union branch, not a
    # per-iteration join against the full node set. Iteration 1 still
    # sees their initial SCALE rank via pr0 (every contributing node has
    # out_deg > 0).
    node_stats = session.stage(
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col("src").alias("node"), F.lit(1).alias("s")),
                    F.struct(F.col("dst").alias("node"), F.lit(0).alias("s")),
                )
            ).alias("e")
        )
        .select("e.node", "e.s")
        .groupBy("node")
        .agg(
            F.sum("s").alias("out_deg"),
            F.sum(1 - F.col("s")).alias("in_deg"),
        )
    )
    deg = node_stats.where(F.col("out_deg") > 0).select(
        F.col("node").alias("src"), F.col("out_deg").alias("deg")
    )
    src_only = node_stats.where(
        (F.col("in_deg") == 0) & (F.col("out_deg") > 0)
    ).select("node")
    pr = deg.select(F.col("src").alias("node"), F.lit(PAGERANK_SCALE).alias("pr"))
    for _ in range(n_iters):
        # per-source outgoing contribution: a NODE-sized join (rank vector
        # × degree vector — co-partitioned on the same key, AQE broadcasts
        # it while small), so the edge list is touched by exactly one
        # map-side probe + one aggregation shuffle per iteration
        csum = pr.join(deg, pr.node == deg.src).select(
            "src", F.expr("pr div deg").alias("c")
        )
        pr = (
            edges.join(csum, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg((F.lit(base) + F.expr("(85 * sum(c)) div 100")).alias("pr"))
            .unionAll(src_only.select("node", F.lit(base).alias("pr")))
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
    # Distinct the DIRECTED PAIRS first, then symmetrize with a map-side
    # 2-row explode: the join runs once, the dedup shuffle carries N pair
    # rows instead of 2N exploded rows, and the exploded orientations of
    # distinct (even, odd) pairs are distinct by construction — no second
    # dedup needed. (Measured at sf0.1: 6.10 s → 5.73 s full query vs the
    # explode-then-distinct form; the edge build, not the rank loop,
    # dominates wall time on this graph.)
    pairs = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("cnode"),
            (F.col("l_suppkey") * 2 + 1).alias("snode"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("cnode").alias("src"), F.col("snode").alias("dst")
                ),
                F.struct(
                    F.col("snode").alias("src"), F.col("cnode").alias("dst")
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    return pagerank(edges, n_iters=3)


# ---------------------------------------------------------------------------
# graph_triangle_count — triangles + clustering coefficient, co-supply graph
# ---------------------------------------------------------------------------

_TRIANGLE_ORACLE = """
WITH ps AS (
  SELECT DISTINCT l_partkey AS pk, l_suppkey AS s
  FROM lineitem WHERE l_quantity >= 48
),
e AS (
  SELECT DISTINCT a.s AS u, b.s AS v
  FROM ps a JOIN ps b ON a.pk = b.pk AND a.s < b.s
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
  GROUP BY node
),
tri AS (
  SELECT count(*) AS n_triangles
  FROM e e1 JOIN e e2 ON e2.u = e1.v JOIN e e3
    ON e3.u = e1.u AND e3.v = e2.v
)
SELECT CAST(t.n_triangles AS BIGINT)          AS n_triangles,
       CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
       CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
       round(3.0e0 * t.n_triangles
             / (SELECT sum(d * (d - 1)) / 2.0e0 FROM deg), 6)
         AS global_clustering
FROM tri t
"""


@_register("graph_triangle_count", _TRIANGLE_ORACLE)
def q_graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient over the co-supply
    graph (suppliers linked when they both ship the same part in a
    high-quantity line item — the l_quantity ≥ 48 filter keeps the
    projection sparse; an unfiltered co-occurrence projection densifies
    toward a clique, which no triangle algorithm survives).

    Orientation: edges are stored once as (u < v), so the wedge join
    e1(a,b)⋈e2(b,c) enumerates each ordered path a<b<c exactly once and
    the closure probe e3(a,c) counts every triangle exactly once — three
    hash equi-joins over the edge list, no n² anywhere. The edge list is
    staged (one materialization feeds wedge + closure + the degree
    aggregation). At production scale the standard refinement is
    degree-ordering the orientation ((deg,id) instead of id) to bound
    hub fan-out; id-orientation keeps the oracle algebra identical and
    the join shape is the same."""
    li = catalog.load_table(spark, sf_dir, "lineitem").where(
        F.col("l_quantity") >= 48
    )
    ps = li.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("s")
    ).distinct()
    a = ps.select("pk", F.col("s").alias("u"))
    b = ps.select("pk", F.col("s").alias("v"))
    edges = session.stage(
        a.join(b, "pk").where(F.col("u") < F.col("v")).select("u", "v").distinct()
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select("v"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = edges.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = edges.select(F.col("u").alias("a"), F.col("v").alias("c"))
    wedges = e1.join(e2, "b").select("a", "c")
    tri = wedges.join(e3, ["a", "c"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    counts = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum(F.col("d") * (F.col("d") - 1)) / F.lit(2.0)).alias("wedge_ct"),
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        tri.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(counts))
        .select(
            F.col("n_triangles").cast("long").alias("n_triangles"),
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.round(
                F.lit(3.0) * F.col("n_triangles") / F.col("wedge_ct"), 6
            ).alias("global_clustering"),
        )
    )


# ---------------------------------------------------------------------------
# graph_common_neighbors — link prediction over the co-supply graph
# ---------------------------------------------------------------------------

_LINKPRED_ORACLE = """
WITH ps AS (
  SELECT DISTINCT l_partkey AS pk, l_suppkey AS s
  FROM lineitem WHERE l_quantity >= 48
),
e AS (
  SELECT DISTINCT a.s AS u, b.s AS v
  FROM ps a JOIN ps b ON a.pk = b.pk AND a.s < b.s
),
sym AS (
  SELECT u, v FROM e UNION ALL SELECT v, u FROM e
),
deg AS (
  SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY u
),
cand AS (
  SELECT n1.v AS a, n2.v AS c, CAST(count(*) AS BIGINT) AS common
  FROM sym n1 JOIN sym n2 ON n1.u = n2.u AND n1.v < n2.v
  GROUP BY 1, 2
),
nonadj AS (
  SELECT cd.a, cd.c, cd.common
  FROM cand cd ANTI JOIN e ON e.u = cd.a AND e.v = cd.c
)
SELECT na.a AS node_a, na.c AS node_b, na.common,
       round(CAST(na.common AS DOUBLE)
             / (da.d + dc.d - na.common), 6) AS jaccard
FROM nonadj na
JOIN deg da ON da.node = na.a
JOIN deg dc ON dc.node = na.c
WHERE na.common >= 2
"""


# Skew escape hatch for the wedge join: a center of degree d emits
# ~d²/2 candidate rows BEFORE any filter, so one hot hub can dominate
# the shuffle on a skewed graph. Centers above this cap enumerate only
# their WEDGE_NEIGHBOR_CAP lowest-id neighbors (deterministic); common
# counts THROUGH such hubs become a documented undercount (≥-recall on
# pairs that also meet via a non-capped center), the same
# soundness-for-boundedness trade as dedup.py's SHINGLE_MAX_DF cap. The
# cap is far above the fixture graphs' max center degree (106 at sf0.1,
# pinned by tests/test_graph_wedge_cap.py), so every test/oracle result
# is exact; at 100× scale it bounds any hub's wedge fan-out at
# cap²/2 ≈ 131k rows.
WEDGE_NEIGHBOR_CAP = 512


@_register("graph_common_neighbors", _LINKPRED_ORACLE)
def q_graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the same co-supply graph as
    graph_triangle_count: for every NON-adjacent node pair at distance
    2, the common-neighbor count and the neighborhood Jaccard score —
    the classic "who should be connected next" primitive.

    Plan: the oriented edge list is staged once and symmetrized as a
    map-only union over the cache; candidates come from one wedge
    equi-join on the shared center (never an all-pairs product — only
    distance-2 pairs materialize, and hub centers are degree-capped at
    WEDGE_NEIGHBOR_CAP — see the constant's note), existing edges drop
    via a LEFT ANTI join on the oriented pair, and degrees broadcast
    back from a node-sized aggregate over the UNCAPPED adjacency (true
    degrees; only the wedge enumeration is capped). The common >= 2
    floor keeps the output the interesting candidates (and bounds it at
    scale); Jaccard divides exact BIGINT counts as doubles."""
    li = catalog.load_table(spark, sf_dir, "lineitem").where(
        F.col("l_quantity") >= 48
    )
    ps = li.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("s")
    ).distinct()
    a = ps.select("pk", F.col("s").alias("u"))
    b = ps.select("pk", F.col("s").alias("v"))
    edges = session.stage(
        a.join(b, "pk")
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    sym = edges.unionAll(edges.select(F.col("v"), F.col("u")))
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    # degree-capped adjacency for the wedge enumeration only (true
    # degrees above stay uncapped): keep each center's cap lowest-id
    # neighbors — deterministic, and a no-op below the cap
    wedge_w = Window.partitionBy("u").orderBy("v")
    capped = (
        sym.withColumn("nbr_rank", F.row_number().over(wedge_w))
        .where(F.col("nbr_rank") <= WEDGE_NEIGHBOR_CAP)
        .drop("nbr_rank")
    )
    n1 = capped.select(F.col("u").alias("ctr"), F.col("v").alias("a"))
    n2 = capped.select(F.col("u").alias("ctr"), F.col("v").alias("c"))
    cand = (
        n1.join(n2, "ctr")
        .where(F.col("a") < F.col("c"))
        .groupBy("a", "c")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    nonadj = cand.join(
        edges,
        (F.col("a") == F.col("u")) & (F.col("c") == F.col("v")),
        "left_anti",
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    dc = deg.select(F.col("node").alias("c"), F.col("d").alias("dc"))
    return (
        nonadj.where(F.col("common") >= 2)
        .join(da, "a")
        .join(dc, "c")
        .select(
            F.col("a").alias("node_a"),
            F.col("c").alias("node_b"),
            "common",
            F.round(
                F.col("common").cast("double")
                / (F.col("da") + F.col("dc") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# graph_degree_distribution — the skew-observability twin of the wedge cap
# ---------------------------------------------------------------------------

_DEGREE_DIST_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT o_custkey * 2 AS cnode, l_suppkey * 2 + 1 AS snode
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
deg AS (
  SELECT node, count(*) AS degree
  FROM (SELECT cnode AS node FROM pairs
        UNION ALL SELECT snode FROM pairs)
  GROUP BY node
),
tot AS (SELECT count(*) AS n FROM deg)
SELECT CAST(degree AS BIGINT)   AS degree,
       CAST(count(*) AS BIGINT) AS n_nodes,
       round(count(*) / CAST((SELECT n FROM tot) AS DOUBLE), 6)
         AS node_share
FROM deg GROUP BY degree
"""


@_register("graph_degree_distribution", _DEGREE_DIST_ORACLE)
def q_graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the customer↔supplier trade graph (same node
    encoding as graph_pagerank_authority): how many nodes have each
    degree. This is the observability table behind every skew decision
    in the graph family — WEDGE_NEIGHBOR_CAP (the wedge join's hub
    bound) is chosen by reading exactly this distribution's tail.

    Two grouped counts (edges→degrees, degrees→histogram), both with
    map-side combine, plus a 1-row total broadcast — nothing here can
    hotspot even when the graph itself is skewed, because the SECOND
    aggregation keys on degree, collapsing each hub to one row before
    the share arithmetic."""
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
    nodes = pairs.select(F.col("cnode").alias("node")).unionAll(
        pairs.select(F.col("snode").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    tot = deg.agg(F.count(F.lit(1)).alias("n"))
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("degree").cast("long").alias("degree"),
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.round(
                F.col("n_nodes") / F.col("n").cast("double"), 6
            ).alias("node_share"),
        )
    )
