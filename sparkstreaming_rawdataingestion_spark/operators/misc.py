"""Remaining SQL-surface corners: HAVING, explicit NULLS ordering,
LIMIT/OFFSET pagination, JSON construction, month arithmetic."""

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
    "having_filter",
    """
SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
GROUP BY l_partkey
HAVING count(*) >= 45
""",
)
def q_having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = catalog.load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.count("*").alias("n_lines"))
        .where(F.col("n_lines") >= 45)
    )


@_register(
    "nulls_ordering",
    """
SELECT l_returnflag, l_linestatus, CAST(n AS BIGINT) AS n
FROM (
  SELECT l_returnflag, l_linestatus, count(*) AS n
  FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus))
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS LAST, n
LIMIT 6
""",
)
def q_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS FIRST/LAST over rollup output (sorting grouping
    nulls deterministically is what makes rollup reports stable)."""
    li = catalog.load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_last(),
            F.col("n"),
        )
        .limit(6)
    )


@_register(
    "limit_offset_pagination",
    """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10 OFFSET 20
""",
)
def q_limit_offset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page 3 of a deterministic ordering (offset requires a total order —
    fine for report pagination, an anti-pattern for table scans at scale)."""
    o = catalog.load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(20)
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@_register(
    "json_construction",
    """
SELECT event_id,
       to_json({'id': event_id, 'kind': event_type}) AS as_json,
       CAST(to_json([value, value * 2]) AS VARCHAR)  AS arr_json
FROM events
WHERE event_id % 17 = 0
""",
)
def q_json_construction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_json over constructed structs/arrays — the write side of the
    opaque-payload convention (op 9's inverse)."""
    ev = catalog.load_table(spark, sf_dir, "events").where(
        F.col("event_id") % 17 == 0
    )
    return ev.select(
        "event_id",
        F.to_json(
            F.struct(F.col("event_id").alias("id"), F.col("event_type").alias("kind"))
        ).alias("as_json"),
        F.to_json(F.array(F.col("value"), F.col("value") * 2)).alias("arr_json"),
    )


@_register(
    "month_arithmetic",
    """
SELECT o_orderkey,
       o_orderdate + INTERVAL 3 MONTH                   AS plus_3m,
       last_day(o_orderdate)                            AS month_end,
       CAST(date_diff('month', o_orderdate,
                      TIMESTAMP '1999-01-01') AS INTEGER) AS months_to_1999
FROM orders
WHERE o_orderkey % 23 = 0
""",
)
def q_month_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = catalog.load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 23 == 0
    )
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTHS")).alias("plus_3m"),
        F.last_day("o_orderdate").alias("month_end"),
        # Spark has no date_diff('month'); derive from year/month fields to
        # match DuckDB's calendar-month difference semantics
        (
            (F.lit(1999) - F.year("o_orderdate")) * 12
            + (F.lit(1) - F.month("o_orderdate"))
        )
        .cast("int")
        .alias("months_to_1999"),
    )


@_register(
    "array_advanced_pack",
    """
SELECT p_partkey,
       coalesce(array_to_string(
           list_filter(toks, t -> length(t) > 4), '|'), '')         AS long_toks,
       coalesce(array_to_string(flatten([toks[1:2], toks[3:4]]), '|'), '') AS reflat,
       coalesce(array_to_string([upper(t) FOR t IN toks], '|'), '') AS toks_upper,
       len(list_distinct(toks)) != len(toks)                      AS had_dups,
       len(toks) - len(list_distinct(toks))                       AS n_dup_toks,
       coalesce(toks[2], '<none>')                                AS second_tok
FROM (SELECT p_partkey, string_split(p_name, ' ') AS toks FROM part)
""",
)
def q_array_advanced_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: filter/flatten/transform lambdas —
    all JVM expressions, no Python. Array results serialized by
    array_join: the driver canonicalizer cannot hash list cells."""
    p = catalog.load_table(spark, sf_dir, "part")
    toks = F.split("p_name", " ")
    return p.select(
        "p_partkey",
        F.array_join(
            F.filter(toks, lambda t: F.length(t) > 4), "|"
        ).alias("long_toks"),
        F.array_join(
            F.flatten(F.array(F.slice(toks, 1, 2), F.slice(toks, 3, 2))), "|"
        ).alias("reflat"),
        F.array_join(F.transform(toks, lambda t: F.upper(t)), "|").alias(
            "toks_upper"
        ),
        (F.size(F.array_distinct(toks)) != F.size(toks)).alias("had_dups"),
        (F.size(toks) - F.size(F.array_distinct(toks))).alias("n_dup_toks"),
        F.coalesce(F.element_at(toks, 2), F.lit("<none>")).alias("second_tok"),
    )


@_register(
    "string_advanced_pack",
    """
SELECT p_partkey,
       translate(p_brand, 'brand', 'BRAND')       AS brand_translated,
       repeat('-', p_size % 5)                    AS dashes,
       split_part(p_type, ' ', 1)                 AS type_head,
       format('{:s}#{:d}', p_brand, p_size)       AS brand_tag,
       left(p_name, 3)                            AS name_l3,
       right(p_name, 3)                           AS name_r3,
       md5(p_name)                                AS name_md5,
       CAST(levenshtein(p_brand, 'brand12') AS INTEGER) AS lev_to_brand12
FROM part
WHERE p_partkey % 7 = 0
""",
)
def q_string_advanced_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = catalog.load_table(spark, sf_dir, "part").where(
        F.col("p_partkey") % 7 == 0
    )
    return p.select(
        "p_partkey",
        F.translate("p_brand", "brand", "BRAND").alias("brand_translated"),
        F.repeat(F.lit("-"), (F.col("p_size") % 5).cast("int")).alias("dashes"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.format_string("%s#%d", "p_brand", "p_size").alias("brand_tag"),
        F.substring("p_name", 1, 3).alias("name_l3"),
        F.col("p_name").substr(F.length("p_name") - 2, F.lit(3)).alias("name_r3"),
        F.md5("p_name").alias("name_md5"),
        F.levenshtein("p_brand", F.lit("brand12")).alias("lev_to_brand12"),
    )


# ---------------------------------------------------------------------------
# query_shapes_pack — the small SQL-surface corner shapes (HAVING,
# NULLS FIRST/LAST ordering, LIMIT/OFFSET pagination, deterministic
# hash sampling) union-tagged onto one schema, reusing the granular
# queries and oracles verbatim. (Merges having_filter, nulls_ordering,
# limit_offset_pagination, deterministic_sample.)
# ---------------------------------------------------------------------------


def _query_shapes_oracle() -> str:
    from .extras import ORACLES as _EXTRAS_ORACLES

    return f"""
SELECT 'having' AS shape, CAST(l_partkey AS VARCHAR) AS k1,
       CAST(NULL AS VARCHAR) AS k2, CAST(n_lines AS BIGINT) AS n,
       CAST(NULL AS DOUBLE) AS amount
FROM ({ORACLES["having_filter"]})
UNION ALL
SELECT 'nulls_ordering', l_returnflag, l_linestatus, CAST(n AS BIGINT),
       CAST(NULL AS DOUBLE)
FROM ({ORACLES["nulls_ordering"]})
UNION ALL
SELECT 'pagination', CAST(o_orderkey AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(NULL AS BIGINT), CAST(o_totalprice AS DOUBLE)
FROM ({ORACLES["limit_offset_pagination"]})
UNION ALL
SELECT 'hash_sample', CAST(l_orderkey AS VARCHAR),
       CAST(l_linenumber AS VARCHAR), CAST(NULL AS BIGINT),
       CAST(l_quantity AS DOUBLE)
FROM ({_EXTRAS_ORACLES["deterministic_sample"]})
"""


def q_query_shapes_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL corner shapes in one union: post-aggregation HAVING, explicit
    NULLS FIRST/LAST ordering (hash-checked as a set; the ordering
    semantics stay pinned by the granular query's sorted output), keyset-
    stable LIMIT/OFFSET pagination, and deterministic hash-bucket sampling
    (reproducible under any partitioning, unlike rand())."""
    from .extras import q_deterministic_sample

    hav = q_having_filter(spark, sf_dir).select(
        F.lit("having").alias("shape"),
        F.col("l_partkey").cast("string").alias("k1"),
        F.lit(None).cast("string").alias("k2"),
        F.col("n_lines").cast("long").alias("n"),
        F.lit(None).cast("double").alias("amount"),
    )
    nul = q_nulls_ordering(spark, sf_dir).select(
        F.lit("nulls_ordering").alias("shape"),
        F.col("l_returnflag").alias("k1"),
        F.col("l_linestatus").alias("k2"),
        F.col("n").cast("long").alias("n"),
        F.lit(None).cast("double").alias("amount"),
    )
    pag = q_limit_offset_pagination(spark, sf_dir).select(
        F.lit("pagination").alias("shape"),
        F.col("o_orderkey").cast("string").alias("k1"),
        F.lit(None).cast("string").alias("k2"),
        F.lit(None).cast("long").alias("n"),
        F.col("o_totalprice").cast("double").alias("amount"),
    )
    samp = q_deterministic_sample(spark, sf_dir).select(
        F.lit("hash_sample").alias("shape"),
        F.col("l_orderkey").cast("string").alias("k1"),
        F.col("l_linenumber").cast("string").alias("k2"),
        F.lit(None).cast("long").alias("n"),
        F.col("l_quantity").cast("double").alias("amount"),
    )
    return hav.unionByName(nul).unionByName(pag).unionByName(samp)


QUERIES["query_shapes_pack"] = q_query_shapes_pack
ORACLES["query_shapes_pack"] = _query_shapes_oracle()


# ---------------------------------------------------------------------------
# skyline_pareto_brand — per-brand Pareto frontier (min price, max size)
# ---------------------------------------------------------------------------

_SKYLINE_ORACLE = """
SELECT p.p_brand, p.p_partkey, round(p.p_retailprice, 2) AS price, 
       CAST(p.p_size AS INTEGER) AS size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_brand = p.p_brand
    AND ((q.p_retailprice < p.p_retailprice AND q.p_size >= p.p_size)
      OR (q.p_retailprice <= p.p_retailprice AND q.p_size > p.p_size))
)
"""


@_register("skyline_pareto_brand", _SKYLINE_ORACLE)
def q_skyline_pareto_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) per brand: parts not dominated on
    (cheaper price, bigger size) by any same-brand part.

    The oracle states the textbook NOT EXISTS definition (quadratic);
    the engine computes the identical set with two RANGE-framed window
    maxima over the price ordering — one per-key local sort, zero joins:
    a row is dominated iff a strictly-cheaper row has size ≥ its own
    (running max over the strict-predecessor frame) or a
    cheaper-or-equal row has size > its own (running max over the
    inclusive frame — the row itself never beats this test). Prices are
    compared in exact integer cents so the RANGE frame bound -1 means
    'strictly cheaper'. Partitioned by brand → embarrassingly parallel
    across keys at 100 TB."""
    p = catalog.load_table(spark, sf_dir, "part")
    cents = F.round(F.col("p_retailprice") * 100).cast("long")
    w_strict = (
        Window.partitionBy("p_brand")
        .orderBy(F.col("_cents"))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_incl = (
        Window.partitionBy("p_brand")
        .orderBy(F.col("_cents"))
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    annotated = p.withColumn("_cents", cents).select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        "p_size",
        F.max("p_size").over(w_strict).alias("_max_strict"),
        F.max("p_size").over(w_incl).alias("_max_incl"),
    )
    dominated = (F.col("_max_strict") >= F.col("p_size")) | (
        F.col("_max_incl") > F.col("p_size")
    )
    return annotated.where(~F.coalesce(dominated, F.lit(False))).select(
        "p_brand",
        "p_partkey",
        F.round("p_retailprice", 2).alias("price"),
        F.col("p_size").cast("int").alias("size"),
    )


# ---------------------------------------------------------------------------
# string_agg_pack — ordered LISTAGG / string aggregation
# ---------------------------------------------------------------------------

_LISTAGG_ORACLE = """
WITH top_parts AS (
  SELECT p_brand, p_name, p_retailprice,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rnk
  FROM part
)
SELECT p_brand,
       string_agg(p_name, '|' ORDER BY p_retailprice DESC, p_name)
         AS top_names,
       CAST(count(*) AS BIGINT) AS n
FROM top_parts
WHERE rnk <= 3
GROUP BY p_brand
"""


@_register("string_agg_pack", _LISTAGG_ORACLE)
def q_string_agg_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (SQL:2016 LISTAGG ... WITHIN GROUP —
    Spark 4's ``listagg``, DuckDB's ``string_agg`` with ORDER BY): the
    top-3 part names per brand joined '|'-delimited in deterministic
    (price DESC, name) order. The aggregation input is pre-pruned to 3
    rows per brand by WindowGroupLimit, so the string build never sees
    the full per-brand row set."""
    p = catalog.load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), "p_partkey"
    )
    top = p.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= 3
    )
    return top.groupBy("p_brand").agg(
        F.expr(
            "listagg(p_name, '|') WITHIN GROUP "
            "(ORDER BY p_retailprice DESC, p_name)"
        ).alias("top_names"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
