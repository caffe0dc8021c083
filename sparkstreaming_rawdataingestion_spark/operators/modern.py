"""Modern Spark 4 SQL surface — recursive CTEs and the VARIANT type.

Both became available to this engine with Spark 4.x and round out the
SQL frontend a reference user would expect from a current warehouse:
iterative graph/series queries without driver-side loops, and
schemaless-JSON columns with typed, lazy extraction (the modern form of
the reference's opaque ``sample`` payload, RawDataIngestion.java:140).

Scale notes: each recursion step is one join + the running working set —
Spark plans it as an iterative union with the same shuffle shape as the
driver-side loop in ``dedup.connected_components``, but expressible in
pure SQL text. VARIANT keeps the parse cost at extraction time and the
binary encoding columnar; extraction is codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

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
# recursive_event_chains — transitive closure over per-user event chains,
# ONE SQL text executed verbatim by both engines (like lateral_topk).
# ---------------------------------------------------------------------------

# Edges connect consecutive events of a user at most 1 hour apart; the
# graph is a forest of forward chains (ts strictly ordered ⇒ acyclic, so
# UNION ALL recursion terminates). The closure counts every (start, end)
# sub-chain and the longest chain per user.
_CHAINS_SQL = """
WITH RECURSIVE e2 AS (
  SELECT user_id, event_id AS src_id, ts,
         LEAD(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst_id,
         LEAD(ts)       OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
  FROM events
), edges AS (
  SELECT user_id, src_id, dst_id FROM e2
  WHERE dst_id IS NOT NULL AND next_ts <= ts + INTERVAL 1 HOUR
), chain(user_id, start_id, end_id, len) AS (
  SELECT user_id, src_id, src_id, 0 FROM (SELECT DISTINCT user_id, src_id FROM edges)
  UNION ALL
  SELECT c.user_id, c.start_id, e.dst_id, c.len + 1
  FROM chain c JOIN edges e ON e.user_id = c.user_id AND e.src_id = c.end_id
)
SELECT user_id, CAST(max(len) AS BIGINT) AS longest_chain,
       CAST(count(*) AS BIGINT) AS n_paths
FROM chain GROUP BY user_id
"""


@_register("recursive_event_chains", _CHAINS_SQL)
def q_recursive_event_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4): per-user burst analysis — longest run of
    events each ≤ 1 h apart, and the number of sub-chains — computed by an
    in-engine iterative union, no driver-side loop. The oracle is the
    SAME SQL text on DuckDB."""
    catalog.load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "events"
    )
    return spark.sql(_CHAINS_SQL)


# ---------------------------------------------------------------------------
# variant_pack — schemaless JSON as a first-class typed column
# ---------------------------------------------------------------------------


@_register(
    "variant_pack",
    """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER)  AS k_int,
       json_extract_string(props, '$.k')                   AS k_str,
       CAST(NULL AS INTEGER)                               AS missing_int,
       replace(props, ' ', '')                             AS canonical_json,
       (json_extract(props, '$.k') IS NOT NULL)            AS has_k
FROM events
WHERE event_id % 4 = 0
""",
)
def q_variant_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT (Spark 4): the opaque payload parsed once into the binary
    variant encoding, then typed lazy extraction — variant_get with a cast
    type, try_variant_get null-quarantine for absent paths, and canonical
    re-serialization (op 9's modern form). All codegen; the parse happens
    in the scan stage."""
    ev = catalog.load_table(spark, sf_dir, "events").where(
        F.col("event_id") % 4 == 0
    )
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k_int"),
        F.expr("variant_get(parse_json(props), '$.k', 'string')").alias(
            "k_str"
        ),
        F.expr("try_variant_get(parse_json(props), '$.missing', 'int')").alias(
            "missing_int"
        ),
        F.to_json(v).alias("canonical_json"),
        F.expr(
            "variant_get(parse_json(props), '$.k', 'string') IS NOT NULL"
        ).alias("has_k"),
    )
