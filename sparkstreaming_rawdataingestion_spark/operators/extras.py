"""Second-wave relational coverage: generators (UDTF shapes), array/map
algebra, pivot, extended window frames, casts, deterministic sampling,
gap-filled downsampling, and the salted-aggregation skew pattern.

The salted query is the load-bearing one for 100 TB: it *proves* (via the
oracle) that the two-phase salt/combine rewrite is value-identical to the
direct aggregation, which is exactly the rewrite you reach for when one
group key carries a disproportionate share of a 100 TB table.
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
# Generators — the UDTF surface (op 5's explode, widened)
# ---------------------------------------------------------------------------


@_register(
    "generator_posexplode",
    """
SELECT p_partkey, CAST(x.s.pos AS INTEGER) AS pos, x.s.word AS word
FROM (SELECT p_partkey, string_split(p_name, ' ') AS toks FROM part),
     unnest([{'pos': i - 1, 'word': toks[i]}
             FOR i IN range(1, len(toks) + 1)]) AS x(s)
""",
)
def q_generator_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode — correlated flatten carrying the element index."""
    p = catalog.load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey", F.posexplode(F.split("p_name", " ")).alias("pos", "word")
    )


@_register(
    "generator_explode_outer",
    """
SELECT p_partkey, u.n AS number
FROM part,
     unnest(CASE WHEN len(regexp_extract_all(p_name, '[0-9]+')) = 0
                 THEN [NULL]
                 ELSE regexp_extract_all(p_name, '[0-9]+') END) AS u(n)
""",
)
def q_generator_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer — rows with empty arrays survive as NULL (explode
    would drop them; the reference's loop had the drop semantics, op 5)."""
    p = catalog.load_table(spark, sf_dir, "part")
    nums = F.regexp_extract_all("p_name", F.lit("[0-9]+"), F.lit(0))
    return p.select(
        "p_partkey", F.explode_outer(nums).alias("number")
    )


# ---------------------------------------------------------------------------
# Array / map algebra
# ---------------------------------------------------------------------------


@_register(
    "array_algebra_pack",
    """
SELECT p_partkey,
       CAST(len(toks) AS INTEGER)                       AS n_toks,
       list_contains(toks, 'spark')                     AS has_spark,
       CAST(list_position(toks, toks[1]) AS INTEGER)    AS first_pos,
       array_to_string(list_sort(toks), '|')            AS toks_sorted,
       array_to_string(list_reverse(toks), '|')         AS toks_rev,
       coalesce(array_to_string(toks[2:3], '|'), '')    AS middle,
       array_to_string(toks || ['x'], '|')              AS appended,
       array_to_string(toks, '|')                       AS joined
FROM (SELECT p_partkey, string_split(p_name, ' ') AS toks FROM part)
""",
)
def q_array_algebra_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array algebra (size/contains/position/sort/reverse/slice/concat).

    Array-valued results are serialized with array_join — the driver's
    pandas canonicalizer cannot hash list cells, so every top-level output
    column must be scalar (the array *operations* are unchanged)."""
    p = catalog.load_table(spark, sf_dir, "part")
    toks = F.split("p_name", " ")
    return p.select(
        "p_partkey",
        F.size(toks).alias("n_toks"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_position(toks, toks[0]).cast("int").alias("first_pos"),
        F.array_join(F.array_sort(toks), "|").alias("toks_sorted"),
        F.array_join(F.reverse(toks), "|").alias("toks_rev"),
        F.array_join(F.slice(toks, 2, 2), "|").alias("middle"),
        F.array_join(F.concat(toks, F.array(F.lit("x"))), "|").alias(
            "appended"
        ),
        F.array_join(toks, "|").alias("joined"),
    )


@_register(
    "map_algebra_pack",
    """
SELECT event_id,
       map(['type'], [event_type])['type'][1]  AS type_from_map,
       CAST(cardinality(map(['a','b'], [value, value * 2])) AS INTEGER) AS map_size
FROM events
WHERE event_id % 11 = 0
""",
)
def q_map_algebra_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = catalog.load_table(spark, sf_dir, "events").where(
        F.col("event_id") % 11 == 0
    )
    m1 = F.create_map(F.lit("type"), F.col("event_type"))
    m2 = F.create_map(
        F.lit("a"), F.col("value"), F.lit("b"), F.col("value") * 2
    )
    return ev.select(
        "event_id",
        F.element_at(m1, "type").alias("type_from_map"),
        F.size(m2).alias("map_size"),
    )


# ---------------------------------------------------------------------------
# Pivot
# ---------------------------------------------------------------------------


@_register(
    "pivot_status_counts",
    """
SELECT o_orderpriority,
       CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_F,
       CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_O,
       CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_P
FROM orders
GROUP BY o_orderpriority
""",
)
def q_pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with an explicit value list — the explicit list is
    mandatory at scale (implicit pivot does a distinct scan first)."""
    o = catalog.load_table(spark, sf_dir, "orders")
    out = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return out.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_F"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_O"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_P"),
    )


# ---------------------------------------------------------------------------
# Window frames, ranking family beyond row_number
# ---------------------------------------------------------------------------


@_register(
    "window_frames_pack",
    """
SELECT o_custkey, o_orderkey,
       CAST(dense_rank() OVER w AS BIGINT)             AS drk,
       CAST(ntile(4) OVER w AS BIGINT)                 AS quartile,
       round(percent_rank() OVER w, 6)                 AS pct_rank,
       round(cume_dist() OVER w, 6)                    AS cdist,
       first_value(o_orderkey) OVER
         (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_key,
       last_value(o_orderkey) OVER
         (w ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS last_key,
       nth_value(o_orderkey, 2) OVER
         (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_key
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
""",
)
def q_window_frames_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank / ntile / percent_rank / cume_dist / first / last / nth
    with explicit ROWS frames (unique tiebreak keeps every function
    deterministic under any partitioning)."""
    o = catalog.load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.dense_rank().over(w).cast("long").alias("drk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.first("o_orderkey").over(w_run).alias("first_key"),
        F.last("o_orderkey").over(w_fwd).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(w_all).alias("second_key"),
    )


# ---------------------------------------------------------------------------
# Casts / conditionals
# ---------------------------------------------------------------------------


@_register(
    "cast_conditional_pack",
    """
SELECT event_id,
       TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)  AS k_int,
       TRY_CAST(event_type AS INTEGER)                         AS bad_cast,
       CAST(value AS VARCHAR)                                  AS value_str,
       CAST(CAST(ts AS DATE) AS VARCHAR)                       AS ts_date_str,
       COALESCE(NULLIF(event_type, 'error'), 'was_error')      AS type_or_flag,
       CASE WHEN value >= 100 THEN 'high'
            WHEN value >= 50  THEN 'mid'
            ELSE 'low' END                                     AS value_band,
       (event_type IS NOT DISTINCT FROM 'click')               AS is_click_nullsafe
FROM events
WHERE event_id % 13 = 0
""",
)
def q_cast_conditional_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = catalog.load_table(spark, sf_dir, "events").where(
        F.col("event_id") % 13 == 0
    )
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("int").alias("k_int"),
        F.col("event_type").try_cast("int").alias("bad_cast"),
        F.col("value").cast("string").alias("value_str"),
        F.col("ts").cast("date").cast("string").alias("ts_date_str"),
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("was_error")).alias(
            "type_or_flag"
        ),
        F.when(F.col("value") >= 100, "high")
        .when(F.col("value") >= 50, "mid")
        .otherwise("low")
        .alias("value_band"),
        F.col("event_type").eqNullSafe("click").alias("is_click_nullsafe"),
    )


# ---------------------------------------------------------------------------
# Deterministic sampling
# ---------------------------------------------------------------------------


@_register(
    "deterministic_sample",
    """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE ((l_orderkey % 4294967296) * 1540483477 % 4294967296) % 100 < 5
""",
)
def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~5% key-hash Bernoulli sample — deterministic and re-runnable (the
    sampling contract a training-data pipeline needs for reproducibility).
    Key reduced mod 2^32 before multiplying by a sub-2^31 multiplier
    (MurmurHash2's 1540483477) so int64 never overflows at full-scale key
    ranges — see operators/profiling.py for the derivation."""
    li = catalog.load_table(spark, sf_dir, "lineitem")
    bucket = (
        (F.col("l_orderkey") % F.lit(4294967296))
        * F.lit(1540483477)
        % F.lit(4294967296)
    ) % 100
    return li.where(bucket < 5).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


# ---------------------------------------------------------------------------
# Gap-filled downsampling (hypertable-style rollup)
# ---------------------------------------------------------------------------


@_register(
    "downsample_gapfill",
    """
WITH bounds AS (
  SELECT min(time_bucket(INTERVAL '1 day', ts)) AS lo,
         max(time_bucket(INTERVAL '1 day', ts)) AS hi
  FROM events
), grid AS (
  SELECT u.d AS bucket, user_id FROM bounds,
       unnest(generate_series(lo, hi, INTERVAL '1 day')) AS u(d),
       (SELECT DISTINCT user_id FROM events)
)
SELECT g.bucket AS bucket_start, g.user_id,
       CAST(COALESCE(e.n, 0) AS BIGINT) AS n_events
FROM grid g
LEFT JOIN (
  SELECT time_bucket(INTERVAL '1 day', ts) AS bucket, user_id,
         count(*) AS n
  FROM events GROUP BY 1, 2) e
ON e.bucket = g.bucket AND e.user_id = g.user_id
""",
)
def q_downsample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsample to 1-day buckets with explicit zero-filled
    gaps: the dense (bucket × entity) grid comes from sequence + explode —
    the hypertable rollup shape. The grid is generated, never scanned."""
    ev = catalog.load_table(spark, sf_dir, "events")
    by_day = ev.select(
        F.date_trunc("day", "ts").cast("timestamp_ntz").alias("bucket"),
        "user_id",
    ).groupBy("bucket", "user_id").agg(F.count("*").alias("n"))
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).cast("timestamp_ntz").alias("lo"),
        F.date_trunc("day", F.max("ts")).cast("timestamp_ntz").alias("hi"),
    )
    days = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
        ).alias("bucket_start")
    )
    users = ev.select("user_id").distinct()
    grid = days.crossJoin(users)
    return (
        grid.join(
            by_day,
            (by_day.bucket == grid.bucket_start)
            & (by_day.user_id == grid.user_id),
            "left",
        )
        .select(
            grid.bucket_start,
            grid.user_id,
            F.coalesce(by_day.n, F.lit(0)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# Salted aggregation — the skew pattern, value-proven
# ---------------------------------------------------------------------------

SALT_BUCKETS = 8


@_register(
    "salted_agg_equivalence",
    """
SELECT event_type,
       CAST(count(*) AS BIGINT)                          AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type
""",
)
def q_salted_agg_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation: phase 1 groups on (key, salt) —
    splitting any hot key across SALT_BUCKETS reducers — phase 2 combines
    partials per key. The oracle is the *unsalted* aggregation: the rewrite
    must be value-identical (decimal partials make it exactly so)."""
    ev = catalog.load_table(spark, sf_dir, "events")
    salted = ev.withColumn(
        "salt", (F.xxhash64("event_id") % SALT_BUCKETS).cast("int")
    )
    partial = salted.groupBy("event_type", "salt").agg(
        F.count("*").alias("pn"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("psum"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.sum("psum").cast("double").alias("sum_value"),
    )


@_register(
    "salted_join_equivalence",
    """
SELECT o.o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
              * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderstatus
""",
)
def q_salted_join_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted shuffle join — the hot-key mitigation for fact-fact joins:
    the big (probe) side gets a deterministic salt in [0, SALT_BUCKETS),
    the build side is replicated once per salt value, and the join runs
    on (key, salt) so one hot order key spreads across SALT_BUCKETS
    reducers instead of melting one. ``merge`` hints force a genuine
    sort-merge shuffle join (broadcast would make salting moot). The
    oracle is the PLAIN join aggregate: the rewrite must be
    value-identical (decimal accumulation makes it exactly so).
    AQE's skew-join split handles *detected* skew at runtime; explicit
    salting is the tool when skew is known a priori or a single key
    exceeds what one task can hold at all."""
    n_salt = 8
    li = catalog.load_table(spark, sf_dir, "lineitem")
    o = catalog.load_table(spark, sf_dir, "orders")
    salted_li = li.withColumn(
        "_salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(n_salt))
    )
    replicated_o = o.select(
        "o_orderkey",
        "o_orderstatus",
        F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("_salt"),
    )
    revenue = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,4)")
    return (
        salted_li.hint("merge")
        .join(
            replicated_o.hint("merge"),
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (salted_li["_salt"] == replicated_o["_salt"]),
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(revenue).cast("double").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# skew_equivalence_pack — both skew-mitigation equivalence proofs (salted
# pre-aggregation and salted shuffle join) union-tagged onto one schema.
# Each branch asserts the salted plan produces byte-identical results to
# the plain plan by RETURNING the salted side while the oracle computes
# the plain aggregation — the driver's hash match IS the equivalence
# proof. (Merges salted_agg_equivalence, salted_join_equivalence.)
# ---------------------------------------------------------------------------


def _skew_equivalence_oracle() -> str:
    return f"""
SELECT 'salted_agg' AS method, key,
       CAST(n AS BIGINT) AS n, CAST(amount AS DOUBLE) AS amount
FROM (SELECT event_type AS key, n, sum_value AS amount
      FROM ({ORACLES["salted_agg_equivalence"]}))
UNION ALL
SELECT 'salted_join', o_orderstatus, CAST(n_lines AS BIGINT),
       CAST(revenue AS DOUBLE)
FROM ({ORACLES["salted_join_equivalence"]})
"""


def q_skew_equivalence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigation surface in one union: two-stage salted aggregation
    (decimal partials re-aggregate exactly across the salt split) and the
    salted shuffle join (fact keys salted k ways, dim rows replicated k
    ways — the manual form of AQE's skew-join split). Both branches hash-
    match the unsalted oracle, proving salting changes the physical plan
    only."""
    agg = q_salted_agg_equivalence(spark, sf_dir).select(
        F.lit("salted_agg").alias("method"),
        F.col("event_type").alias("key"),
        F.col("n").cast("long").alias("n"),
        F.col("sum_value").cast("double").alias("amount"),
    )
    join = q_salted_join_equivalence(spark, sf_dir).select(
        F.lit("salted_join").alias("method"),
        F.col("o_orderstatus").alias("key"),
        F.col("n_lines").cast("long").alias("n"),
        F.col("revenue").cast("double").alias("amount"),
    )
    return agg.unionByName(join)


QUERIES["skew_equivalence_pack"] = q_skew_equivalence_pack
ORACLES["skew_equivalence_pack"] = _skew_equivalence_oracle()


# ---------------------------------------------------------------------------
# timeseries_pack — time-bucket downsampling with gap fill + row-level
# sessionization union-tagged onto one schema. (Merges downsample_gapfill,
# sessionize_events — the batch time-series reshapes; the windowed
# streaming twins live in streaming_window_pack.)
# ---------------------------------------------------------------------------


def _timeseries_oracle() -> str:
    from .analytics import ORACLES as _ANALYTICS_ORACLES

    return f"""
SELECT 'gapfill' AS op,
       CAST(user_id AS BIGINT)        AS user_id,
       CAST(NULL AS BIGINT)           AS event_id,
       CAST(bucket_start AS TIMESTAMP) AS bucket_start,
       CAST(n_events AS BIGINT)       AS n
FROM ({ORACLES["downsample_gapfill"]})
UNION ALL
SELECT 'sessionize', CAST(user_id AS BIGINT), CAST(event_id AS BIGINT),
       CAST(NULL AS TIMESTAMP), CAST(session_seq AS BIGINT)
FROM ({_ANALYTICS_ORACLES["sessionize_events"]})
"""


def q_timeseries_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch time-series surface in one union: dense time-bucket
    downsampling (generated bucket grid left-joined so silent periods
    appear as zero rows) and gap-based row-level sessionization (session
    ordinal per user via the lag/cumsum idiom — one shuffle on user_id)."""
    from .analytics import q_sessionize_events

    gap = q_downsample_gapfill(spark, sf_dir).select(
        F.lit("gapfill").alias("op"),
        F.col("user_id").cast("long").alias("user_id"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("bucket_start").alias("bucket_start"),
        F.col("n_events").cast("long").alias("n"),
    )
    sess = q_sessionize_events(spark, sf_dir).select(
        F.lit("sessionize").alias("op"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        F.lit(None).cast("timestamp_ntz").alias("bucket_start"),
        F.col("session_seq").cast("long").alias("n"),
    )
    return gap.unionByName(sess)


QUERIES["timeseries_pack"] = q_timeseries_pack
ORACLES["timeseries_pack"] = _timeseries_oracle()
