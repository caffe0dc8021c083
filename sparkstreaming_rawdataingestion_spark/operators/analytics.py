"""Composite analytics queries — multi-join TPC-H-flavored shapes, the
CDC latest-per-key compaction the ingest platform needs, and correlated
subqueries via the SQL frontend.

These are the queries a user of the ingestion platform actually runs over
the accumulated archive; they exercise join *graphs* (not single joins)
under AQE, which is where join order and broadcast decisions matter at
100 TB.
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


@_register(
    "q5_regional_revenue",
    """
SELECT n.n_name AS nation,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
               * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY n.n_name
""",
)
def q_q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join graph with a selective dim filter.
    The region/nation dims broadcast; the region predicate prunes before
    the fact joins; the local-supplier condition rides the supplier join."""
    t = {n: catalog.load_table(spark, sf_dir, n)
         for n in ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    revenue = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,4)")
    return (
        t["customer"]
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["supplier"],
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(t["region"]), F.col("r_regionkey") == F.col("n_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@_register(
    "q10_returned_items",
    """
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
               * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
)
def q_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most — join graph + grouped agg +
    global top-20 (TakeOrderedAndProject, no full sort)."""
    t = {n: catalog.load_table(spark, sf_dir, n)
         for n in ("customer", "orders", "lineitem", "nation")}
    revenue = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,4)")
    return (
        t["customer"]
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t["lineitem"].where(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@_register(
    "cdc_latest_per_key",
    """
SELECT user_id, event_id AS latest_event_id, ts AS latest_ts,
       event_type AS latest_type, value AS latest_value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
WHERE rn = 1
""",
)
def q_cdc_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC/compaction: latest record per key — the batch form of the
    upsert the streaming sink performs per micro-batch. One shuffle on the
    key; WindowGroupLimit keeps only the head row per key during the sort
    (never materializes full per-key history)."""
    ev = catalog.load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            F.col("ts").alias("latest_ts"),
            F.col("event_type").alias("latest_type"),
            F.col("value").alias("latest_value"),
        )
    )


@_register(
    "correlated_subquery_above_avg",
    """
SELECT l_orderkey, l_partkey, l_extendedprice
FROM lineitem l1
WHERE l_extendedprice > 1.5 * (
  SELECT avg(l_extendedprice) FROM lineitem l2
  WHERE l2.l_partkey = l1.l_partkey)
""",
)
def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL frontend — Catalyst
    decorrelates it into an aggregate + join (no per-row re-execution)."""
    li = catalog.load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_orderkey, l_partkey, l_extendedprice
        FROM lineitem l1
        WHERE l_extendedprice > 1.5 * (
          SELECT avg(l_extendedprice) FROM lineitem l2
          WHERE l2.l_partkey = l1.l_partkey)
        """
    )


@_register(
    "in_exists_subqueries",
    """
SELECT p_partkey, p_name
FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_partkey = p_partkey AND l.l_discount = 0)
""",
)
def q_in_exists_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN + correlated EXISTS (both become semi-joins under Catalyst)."""
    li = catalog.load_table(spark, sf_dir, "lineitem")
    p = catalog.load_table(spark, sf_dir, "part")
    li.createOrReplaceTempView("lineitem")
    p.createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_partkey, p_name
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_partkey = p_partkey AND l.l_discount = 0)
        """
    )


@_register(
    "sessionize_events",
    """
WITH flags AS (
  SELECT event_id, user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id,
       CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS BIGINT) AS session_seq
FROM flags
""",
)
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level sessionization: every event tagged with its per-user
    session ordinal (gap > 30 min ⇒ new session) — the assignment form a
    conversation-grouping / trajectory-building pipeline needs, unlike
    ``session_window`` which only emits per-session aggregates. The
    lag + running-sum pair shares ONE window spec, so Catalyst plans a
    single shuffle on user_id and a single in-partition sort — there is
    no global sort anywhere, which is what keeps this viable at 100 TB
    (each user's timeline sorts locally within its hash partition)."""
    ev = catalog.load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    is_new = (
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") - F.lag("ts").over(w) > F.expr("INTERVAL 30 MINUTE")),
            1,
        )
        .otherwise(0)
    )
    return (
        ev.withColumn("is_new", is_new)
        .withColumn(
            "session_seq",
            F.sum("is_new")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"),
        )
        .select("event_id", "user_id", "session_seq")
    )


# ---------------------------------------------------------------------------
# subquery_pack — the three subquery-decorrelation shapes (correlated
# scalar, IN + EXISTS, LATERAL top-k) union-tagged onto one schema,
# reusing the granular queries and oracles verbatim. Catalyst rewrites
# each into a join (no per-row re-execution) — the plans are pinned in
# tests/test_plans.py. (Merges correlated_subquery_above_avg,
# in_exists_subqueries, lateral_topk_per_group.)
# ---------------------------------------------------------------------------


def _subquery_pack_oracle() -> str:
    from .lowlevel import ORACLES as _LOWLEVEL_ORACLES

    return f"""
SELECT 'correlated_scalar' AS shape,
       CAST(l_orderkey AS VARCHAR)      AS k1,
       CAST(l_partkey AS VARCHAR)       AS k2,
       CAST(l_extendedprice AS DOUBLE)  AS amount
FROM ({ORACLES["correlated_subquery_above_avg"]})
UNION ALL
SELECT 'in_exists', CAST(p_partkey AS VARCHAR), p_name, CAST(NULL AS DOUBLE)
FROM ({ORACLES["in_exists_subqueries"]})
UNION ALL
SELECT 'lateral_topk', n_name, CAST(c_custkey AS VARCHAR),
       CAST(c_acctbal AS DOUBLE)
FROM ({_LOWLEVEL_ORACLES["lateral_topk_per_group"]})
"""


def q_subquery_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subquery-decorrelation surface in one union: a correlated scalar
    subquery (per-partkey average) Catalyst turns into an aggregate +
    join, IN/EXISTS membership predicates planned as left-semi joins, and
    a LATERAL per-group top-k planned as WindowGroupLimit — never a
    per-row loop."""
    from .lowlevel import q_lateral_topk_per_group

    corr = q_correlated_subquery(spark, sf_dir).select(
        F.lit("correlated_scalar").alias("shape"),
        F.col("l_orderkey").cast("string").alias("k1"),
        F.col("l_partkey").cast("string").alias("k2"),
        F.col("l_extendedprice").cast("double").alias("amount"),
    )
    inex = q_in_exists_subqueries(spark, sf_dir).select(
        F.lit("in_exists").alias("shape"),
        F.col("p_partkey").cast("string").alias("k1"),
        F.col("p_name").alias("k2"),
        F.lit(None).cast("double").alias("amount"),
    )
    lat = q_lateral_topk_per_group(spark, sf_dir).select(
        F.lit("lateral_topk").alias("shape"),
        F.col("n_name").alias("k1"),
        F.col("c_custkey").cast("string").alias("k2"),
        F.col("c_acctbal").cast("double").alias("amount"),
    )
    return corr.unionByName(inex).unionByName(lat)


QUERIES["subquery_pack"] = q_subquery_pack
ORACLES["subquery_pack"] = _subquery_pack_oracle()
