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


# ---------------------------------------------------------------------------
# merge_upsert_apply — MERGE INTO semantics (insert/update/delete changeset)
# ---------------------------------------------------------------------------

_MERGE_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey % 3 != 2
),
changes AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 2 THEN 'I'
              WHEN o_orderkey % 3 = 0 THEN 'U'
              ELSE 'D' END AS action,
         o_custkey, round(o_totalprice + 10.0, 2) AS new_price
  FROM orders
  WHERE o_orderkey % 3 = 2 OR o_orderkey % 3 = 0
     OR (o_orderkey % 3 = 1 AND o_custkey % 2 = 1)
)
SELECT b.o_orderkey, b.o_custkey,
       round(CASE WHEN c.action = 'U' THEN c.new_price
                  ELSE b.o_totalprice END, 2) AS totalprice,
       CASE WHEN c.action = 'U' THEN 'updated' ELSE 'kept' END AS status
FROM base b LEFT JOIN changes c ON c.o_orderkey = b.o_orderkey
WHERE c.action IS NULL OR c.action != 'D'
UNION ALL
SELECT c.o_orderkey, c.o_custkey, c.new_price, 'inserted'
FROM changes c WHERE c.action = 'I'
"""


@_register("merge_upsert_apply", _MERGE_ORACLE)
def q_merge_upsert_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics on plain DataFrames: apply an
    insert/update/delete changeset to a base table in one pass —
    ``WHEN MATCHED AND action='U' THEN UPDATE / ... 'D' THEN DELETE /
    WHEN NOT MATCHED THEN INSERT`` — without a table format.

    Plan shape: ONE left join base⋈changes on the primary key (both
    sides hash-partitioned on the key; this is exactly the shuffle a
    Delta/Iceberg MERGE does under the hood), a map-side CASE for the
    update/delete arms, and a union with the insert arm (a filter of the
    changeset — no join needed because NOT-MATCHED keys can't be in
    base). The changeset is derived deterministically from orders so the
    oracle can reproduce it."""
    o = catalog.load_table(spark, sf_dir, "orders")
    base = o.where(F.col("o_orderkey") % 3 != 2).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    m3 = F.col("o_orderkey") % 3
    changes = (
        o.where(
            (m3 == 2)
            | (m3 == 0)
            | ((m3 == 1) & (F.col("o_custkey") % 2 == 1))
        )
        .select(
            "o_orderkey",
            F.when(m3 == 2, "I").when(m3 == 0, "U").otherwise("D").alias(
                "action"
            ),
            F.col("o_custkey").alias("c_custkey"),
            F.round(F.col("o_totalprice") + 10.0, 2).alias("new_price"),
        )
    )
    merged = (
        base.join(changes, "o_orderkey", "left")
        .where(F.col("action").isNull() | (F.col("action") != "D"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.round(
                F.when(F.col("action") == "U", F.col("new_price")).otherwise(
                    F.col("o_totalprice")
                ),
                2,
            ).alias("totalprice"),
            F.when(F.col("action") == "U", "updated")
            .otherwise("kept")
            .alias("status"),
        )
    )
    inserts = changes.where(F.col("action") == "I").select(
        "o_orderkey",
        F.col("c_custkey").alias("o_custkey"),
        F.col("new_price").alias("totalprice"),
        F.lit("inserted").alias("status"),
    )
    return merged.unionByName(inserts)
