"""Low-level SQL surface: bitwise algebra, error-safe (``try_``)
arithmetic, array set algebra, and LATERAL correlated subqueries.

All packs are pure column algebra over the ``events`` / star-schema
tables — map-only (zero shuffles) except the LATERAL query, whose
correlated per-group top-k decorrelates into a ranked window. The
``try_`` pack matters operationally: the engine runs under ANSI mode
(overflow/bad-cast = job failure at 100 TB), and ``try_*`` is the
idiomatic per-row quarantine that keeps one poison record from killing a
batch — the modern form of the reference's catch-and-continue intent
(RawDataIngestion.java:117-123, which caught parse errors but then
crashed anyway; SURVEY §0).
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
# Bitwise pack — Spark `&,|,^,~,<<,>>,bit_count` vs DuckDB (`xor()` — its
# `^` is exponentiation; a classic cross-engine trap worth pinning).
# ---------------------------------------------------------------------------


@_register(
    "bitwise_pack",
    """
SELECT event_id,
       event_id & 255                                   AS band,
       event_id | 4096                                  AS bor,
       xor(event_id, 1365)                              AS bxor,
       ~event_id                                        AS bnot,
       (event_id % 1024) << 3                           AS shl,
       event_id >> 2                                    AS shr,
       CAST(bit_count(event_id) AS INTEGER)             AS popcount
FROM events
""",
)
def q_bitwise_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar algebra over the key column (hash bucketing, bloom
    probes, and bit-packed flags all reduce to these)."""
    ev = catalog.load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr("event_id & 255").alias("band"),
        F.expr("event_id | 4096").alias("bor"),
        F.expr("event_id ^ 1365").alias("bxor"),
        F.expr("~event_id").alias("bnot"),
        F.expr("shiftleft(event_id % 1024, 3)").alias("shl"),
        F.expr("shiftright(event_id, 2)").alias("shr"),
        F.bit_count("event_id").alias("popcount"),
    )


# ---------------------------------------------------------------------------
# try_-safe arithmetic — ANSI mode's per-row quarantine surface.  The
# oracle encodes the *defined* null-on-error semantics explicitly (DuckDB
# has TRY_CAST but no try_add/try_divide).
# ---------------------------------------------------------------------------


@_register(
    "try_safe_arith_pack",
    """
SELECT event_id,
       CASE WHEN event_id % 5 = 0 THEN NULL
            ELSE round(value / (event_id % 5), 6) END        AS safe_div,
       TRY_CAST(event_type AS INTEGER)                       AS bad_cast,
       TRY_CAST(substr(props, 7, 2) AS INTEGER)              AS digit_cast,
       CASE WHEN event_id % 2 = 1 THEN NULL
            ELSE 9223372036854775807 END                     AS overflow_add
FROM events
""",
)
def q_try_safe_arith_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_divide / try_cast / try_add under ANSI mode: each yields NULL
    where strict evaluation would fail the whole job — divide-by-zero,
    non-numeric cast, and bigint overflow (MAX + 1)."""
    ev = catalog.load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.round(F.try_divide(F.col("value"), F.col("event_id") % 5), 6).alias(
            "safe_div"
        ),
        F.col("event_type").try_cast("int").alias("bad_cast"),
        F.substring("props", 7, 2).try_cast("int").alias("digit_cast"),
        F.try_add(
            F.lit(9223372036854775807), F.col("event_id") % 2
        ).alias("overflow_add"),
    )


# ---------------------------------------------------------------------------
# Array set algebra — union/intersect/except/overlap.  Results are sorted
# on both sides: Spark preserves first-appearance order, DuckDB's list_*
# make no order guarantee, so the canonical form is the sorted set.
# ---------------------------------------------------------------------------


@_register(
    "array_set_ops_pack",
    """
SELECT event_id,
       coalesce(array_to_string(list_sort(list_distinct(a || b)), ','), '') AS u,
       coalesce(array_to_string(
           list_sort(list_distinct(list_intersect(a, b))), ','), '')    AS i,
       coalesce(array_to_string(list_sort(list_distinct(
           list_filter(a, x -> NOT list_contains(b, x)))), ','), '')    AS d,
       len(list_intersect(a, b)) > 0                                    AS overlaps
FROM (
  SELECT event_id,
         range(event_id % 5, event_id % 5 + 4)  AS a,
         range(event_id % 3, event_id % 3 + 6)  AS b
  FROM events)
""",
)
def q_array_set_ops_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_union / array_intersect / array_except / arrays_overlap over
    synthesized integer ranges (sequence), canonicalized by array_sort and
    serialized via array_join (the driver's pandas canonicalizer cannot
    hash list cells — output columns must be scalar)."""
    ev = catalog.load_table(spark, sf_dir, "events")
    a = F.sequence(F.col("event_id") % 5, F.col("event_id") % 5 + 3)
    b = F.sequence(F.col("event_id") % 3, F.col("event_id") % 3 + 5)

    def joined(arr):
        return F.array_join(
            F.transform(F.array_sort(arr), lambda x: x.cast("string")), ","
        )

    return ev.select(
        "event_id",
        joined(F.array_union(a, b)).alias("u"),
        joined(F.array_intersect(a, b)).alias("i"),
        joined(F.array_except(a, b)).alias("d"),
        F.arrays_overlap(a, b).alias("overlaps"),
    )


# ---------------------------------------------------------------------------
# LATERAL correlated subquery — per-nation top-k through the SQL frontend.
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
SELECT n.n_name, t.c_custkey, t.c_acctbal
FROM nation n
CROSS JOIN LATERAL (
  SELECT c.c_custkey, c.c_acctbal
  FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c.c_acctbal DESC, c.c_custkey
  LIMIT 3) t
"""


@_register("lateral_topk_per_group", _LATERAL_SQL)
def q_lateral_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL (correlated table subquery) with per-group ORDER BY+LIMIT —
    the SQL-standard spelling of top-k-per-group. Same text runs on the
    DuckDB oracle; Spark decorrelates to a ranked-window filter rather
    than executing the subquery once per outer row."""
    for t in ("nation", "customer"):
        catalog.load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_LATERAL_SQL)
