"""Recommendation operators: item-item collaborative filtering.

LLM-pipeline / warehouse context: once the ingest (RawDataIngestion.java:
134-152) lands transactional facts, the classic downstream consumer is an
item-to-item recommender ("customers who bought X also bought Y") built
from co-occurrence statistics — the Amazon-style neighborhood model. The
same kernel doubles as a data-curation tool: co-occurrence cosine over
(document, source) or (document, n-gram) matrices surfaces correlated
training sources.

Scale shape:

- **recsys_item_neighbors**: the quadratic step (item pairs) is expanded
  per ORDER from a grouped item set — fan-out C(k, 2) with k = items per
  order (a small constant bounded by basket size, independent of catalog
  or corpus size), so there is no item×item or fact×fact join anywhere.
  Pair counts shuffle (item, item, int) triples; per-item order counts
  are a catalog-sized aggregate broadcast back onto the pairs; the final
  per-item top-k compiles to WindowGroupLimit (per-item heaps inside the
  hash partitions — never a global or per-item full sort). At 100 TB the
  only growing shuffle is the distinct pair-count aggregation, which is
  bounded by Σ_orders C(k,2) ≈ 21× the order count — linear in the fact
  table, map-side combined before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .. import catalog

QUERIES: dict = {}
ORACLES: dict = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# recsys_item_neighbors — item-item cosine top-k over order baskets
# ---------------------------------------------------------------------------

_NEIGHBOR_K = 5

_NEIGHBOR_ORACLE = f"""
WITH baskets AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
item_n AS (
  SELECT l_partkey AS item, count(*) AS n_orders
  FROM baskets GROUP BY l_partkey
),
pairs AS (
  SELECT a.l_partkey AS item_a, b.l_partkey AS item_b, count(*) AS n_pair
  FROM baskets a
  JOIN baskets b ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
sym AS (
  SELECT item_a AS item_id, item_b AS neighbor_id, n_pair FROM pairs
  UNION ALL
  SELECT item_b AS item_id, item_a AS neighbor_id, n_pair FROM pairs
),
scored AS (
  SELECT s.item_id, s.neighbor_id, s.n_pair,
         CAST(s.n_pair AS DOUBLE)
           / sqrt(CAST(ia.n_orders * ib.n_orders AS DOUBLE)) AS cos_raw
  FROM sym s
  JOIN item_n ia ON ia.item = s.item_id
  JOIN item_n ib ON ib.item = s.neighbor_id
)
SELECT item_id, neighbor_id, CAST(n_pair AS BIGINT) AS n_pair,
       round(cos_raw, 6) AS cosine, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT *, row_number() OVER (
           PARTITION BY item_id
           ORDER BY cos_raw DESC, n_pair DESC, neighbor_id) AS rk
  FROM scored)
WHERE rk <= {_NEIGHBOR_K}
"""


@_register("recsys_item_neighbors", _NEIGHBOR_ORACLE)
def q_recsys_item_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-to-item collaborative filtering: top-5 neighbors per part by
    binary cosine over order baskets — cos(a,b) = |orders with both| /
    sqrt(|orders with a| · |orders with b|) — the neighborhood model
    behind "bought X, also bought Y".

    Plan: ONE fact-table shuffle — the per-order distinct item sets
    materialize once (grouped collect_set, staged for both consumers);
    pair enumeration is a map-side double explode of each order's set
    (fan-out C(k,2), k = basket size — no fact×fact self-join), feeding
    a map-side-combined (item_a, item_b) count. Per-item order counts
    are a catalog-sized aggregate over the same staged sets, broadcast
    back onto the pair counts twice (both endpoints). The rank-≤-k
    filter compiles to WindowGroupLimit per-item heaps. Cosine's inputs
    are exact BIGINT counts, sqrt/division correctly rounded → the
    ranking float is bit-identical on both engines; ties break on
    n_pair then neighbor_id for a stable top-k edge."""
    from .. import session

    li = catalog.load_table(spark, sf_dir, "lineitem")
    sets = session.stage(
        li.groupBy("l_orderkey").agg(
            F.collect_set("l_partkey").alias("items")
        )
    )
    item_n = sets.select(F.explode("items").alias("item")).groupBy(
        "item"
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    pairs = (
        sets.select(F.col("items"), F.explode("items").alias("item_a"))
        .select("item_a", F.explode("items").alias("item_b"))
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    sym = pairs.select(
        F.col("item_a").alias("item_id"),
        F.col("item_b").alias("neighbor_id"),
        "n_pair",
    ).unionAll(
        pairs.select(
            F.col("item_b").alias("item_id"),
            F.col("item_a").alias("neighbor_id"),
            "n_pair",
        )
    )
    ia = item_n.select(
        F.col("item").alias("item_id"), F.col("n_orders").alias("na")
    )
    ib = item_n.select(
        F.col("item").alias("neighbor_id"), F.col("n_orders").alias("nb")
    )
    scored = (
        sym.join(F.broadcast(ia), "item_id")
        .join(F.broadcast(ib), "neighbor_id")
        .select(
            "item_id",
            "neighbor_id",
            "n_pair",
            (
                F.col("n_pair").cast("double")
                / F.sqrt((F.col("na") * F.col("nb")).cast("double"))
            ).alias("cos_raw"),
        )
    )
    w = Window.partitionBy("item_id").orderBy(
        F.col("cos_raw").desc(), F.col("n_pair").desc(), "neighbor_id"
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _NEIGHBOR_K)
        .select(
            "item_id",
            "neighbor_id",
            F.col("n_pair").cast("long").alias("n_pair"),
            F.round("cos_raw", 6).alias("cosine"),
            F.col("rk").cast("long").alias("rk"),
        )
    )
