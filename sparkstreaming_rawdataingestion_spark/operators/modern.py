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


# ---------------------------------------------------------------------------
# modern_sql_pack — the modern-SQL engine surface (recursive CTE graph
# traversal, VARIANT semi-structured type, native Python UDTF with
# LATERAL correlation) union-tagged onto one schema, reusing the granular
# queries and oracles verbatim. (Merges recursive_event_chains,
# variant_pack, udtf_sentence_split.)
# ---------------------------------------------------------------------------


def _modern_sql_oracle() -> str:
    from .udfs import ORACLES as _UDF_ORACLES

    return f"""
SELECT 'recursive_cte' AS feature,
       CAST(user_id AS BIGINT)       AS id,
       CAST(longest_chain AS BIGINT) AS n,
       CAST(n_paths AS BIGINT)       AS n2,
       CAST(NULL AS VARCHAR)         AS s1,
       CAST(NULL AS VARCHAR)         AS s2,
       CAST(NULL AS BOOLEAN)         AS flag
FROM ({ORACLES["recursive_event_chains"]})
UNION ALL
SELECT 'variant', CAST(event_id AS BIGINT), CAST(k_int AS BIGINT),
       CAST(missing_int AS BIGINT), k_str, canonical_json, has_k
FROM ({ORACLES["variant_pack"]})
UNION ALL
SELECT 'python_udtf', CAST(doc_id AS BIGINT), CAST(pos AS BIGINT),
       CAST(n_words AS BIGINT), sentence, CAST(NULL AS VARCHAR),
       CAST(NULL AS BOOLEAN)
FROM ({_UDF_ORACLES["udtf_sentence_split"]})
"""


def q_modern_sql_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern-SQL surface in one union: a recursive CTE walking event
    chains to a fixed point, the VARIANT open-schema type (parse /
    typed extraction / canonical re-serialization), and a native Python
    UDTF applied per-row via LATERAL correlation (arrow-batched,
    one-to-many)."""
    from .udfs import q_udtf_sentence_split

    rec = q_recursive_event_chains(spark, sf_dir).select(
        F.lit("recursive_cte").alias("feature"),
        F.col("user_id").cast("long").alias("id"),
        F.col("longest_chain").cast("long").alias("n"),
        F.col("n_paths").cast("long").alias("n2"),
        F.lit(None).cast("string").alias("s1"),
        F.lit(None).cast("string").alias("s2"),
        F.lit(None).cast("boolean").alias("flag"),
    )
    var = q_variant_pack(spark, sf_dir).select(
        F.lit("variant").alias("feature"),
        F.col("event_id").cast("long").alias("id"),
        F.col("k_int").cast("long").alias("n"),
        F.col("missing_int").cast("long").alias("n2"),
        F.col("k_str").alias("s1"),
        F.col("canonical_json").alias("s2"),
        F.col("has_k").alias("flag"),
    )
    udtf = q_udtf_sentence_split(spark, sf_dir).select(
        F.lit("python_udtf").alias("feature"),
        F.col("doc_id").cast("long").alias("id"),
        F.col("pos").cast("long").alias("n"),
        F.col("n_words").cast("long").alias("n2"),
        F.col("sentence").alias("s1"),
        F.lit(None).cast("string").alias("s2"),
        F.lit(None).cast("boolean").alias("flag"),
    )
    return rec.unionByName(var).unionByName(udtf)


QUERIES["modern_sql_pack"] = q_modern_sql_pack
ORACLES["modern_sql_pack"] = _modern_sql_oracle()
