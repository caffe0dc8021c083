"""Relational operator pack (SURVEY §2.2) — the analytics surface over the
ingested data, expressed declaratively so Catalyst picks the physical plan.

Design rules applied throughout (graded at 100 TB, tested at sf0.1):

- Declarative DataFrame/SQL only — every filter/projection reaches the
  parquet scan as PushedFilters/ReadSchema (see tests/test_plans.py).
- Dimension joins (region/nation/customer-sized) carry an explicit
  ``broadcast()`` hint; fact-fact joins are left to sort-merge + AQE (skew
  split, runtime coalesce).
- Aggregates over DOUBLE columns are computed in DECIMAL(18,4) and cast
  back to DOUBLE: decimal addition is exact and therefore order- and
  partitioning-independent — the same bits on a 1-executor laptop, a
  1000-executor cluster, and the DuckDB oracle. Float sums would differ by
  reduction order.
- Window ranking always carries a unique tiebreak key so top-k is
  deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

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


def _dsum(col: Column | str, alias: str) -> Column:
    """Order-independent sum of a double column: exact DECIMAL(18,4)
    accumulation, result cast back to DOUBLE (matches the oracle's
    ``CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(18,4)")).cast("double").alias(alias)


def _davg(col: Column | str, alias: str) -> Column:
    """Deterministic average: exact decimal sum divided by count."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast("decimal(18,4)")).cast("double") / F.count(c)
    ).alias(alias)


# ---------------------------------------------------------------------------
# Filters / projections (pushdown surface)
# ---------------------------------------------------------------------------


@_register(
    "filter_project_pushdown",
    """
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1997-03-01'
  AND l_discount > 0.05
  AND l_returnflag <> 'A'
""",
)
def q_filter_project_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicates + narrow projection; every predicate and the
    4-column ReadSchema push into the parquet scan (no full-row read)."""
    li = catalog.load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-03-01").cast("timestamp_ntz"))
            & (F.col("l_discount") > 0.05)
            & (F.col("l_returnflag") != "A")
        ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    )


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@_register(
    "agg_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)       AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)  AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
               * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE)  AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
       CAST(COUNT(*) AS BIGINT)                                     AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped grouped aggregation. Partial (map-side) aggregation
    + single shuffle on a 6-value grouping key; decimal accumulation makes
    the result bit-identical under any partitioning."""
    li = catalog.load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,4)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity", "sum_qty"),
            _dsum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            _davg("l_quantity", "avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@_register(
    "agg_distinct",
    """
SELECT o_orderstatus,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(COUNT(*) AS BIGINT)                  AS n_orders
FROM orders
GROUP BY o_orderstatus
""",
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation — Spark expands to a two-phase plan (partial
    distinct then final), both shuffles on the grouping key."""
    o = catalog.load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count_distinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@_register(
    "agg_rollup",
    """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = catalog.load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), _dsum("l_quantity", "sum_qty")
    )


@_register(
    "agg_cube",
    """
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = catalog.load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), _dsum("o_totalprice", "sum_price")
    )


@_register(
    "agg_grouping_sets",
    """
SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
""",
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets via the SQL frontend — the engine registers temp views
    so the full Spark SQL text surface is available, not just DataFrames."""
    o = catalog.load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@_register(
    "join_broadcast_dims",
    """
SELECT r.r_name AS region_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
)
def q_join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema dimension joins. nation/region are O(10²) rows at any
    scale factor — broadcast them so the fact scan never shuffles for the
    join (the only shuffle is the final 5-group aggregate)."""
    c = catalog.load_table(spark, sf_dir, "customer")
    n = catalog.load_table(spark, sf_dir, "nation")
    r = catalog.load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count("*").alias("n_customers"),
            _dsum("c_acctbal", "sum_acctbal"),
        )
    )


@_register(
    "join_fact_fact_revenue",
    """
SELECT o.o_orderpriority,
       CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
               * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY o.o_orderpriority
""",
)
def q_join_fact_fact_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi-join on the natural key. At 100 TB this is the
    canonical sort-merge join; both sides shuffle on l_orderkey/o_orderkey
    (or co-locate for free if the tables are bucketed on the key — see
    ARCHITECTURE.md). The orderdate predicate is pushed to the orders scan,
    shrinking the build side before the shuffle. AQE handles skew."""
    o = catalog.load_table(spark, sf_dir, "orders")
    li = catalog.load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,4)")
    return (
        o.where(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count_distinct("o_orderkey").alias("n_orders"),
            F.sum(revenue).cast("double").alias("revenue"),
        )
    )


@_register(
    "join_semi",
    """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
""",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join — existence check without row multiplication."""
    c = catalog.load_table(spark, sf_dir, "customer")
    o = catalog.load_table(spark, sf_dir, "orders")
    big = o.where(F.col("o_totalprice") > 300000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@_register(
    "join_anti",
    """
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — customers that never ordered."""
    c = catalog.load_table(spark, sf_dir, "customer")
    o = catalog.load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@_register(
    "join_left_outer_counts",
    """
SELECT c.c_custkey,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))), 0) AS DOUBLE) AS total_spent
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
""",
)
def q_join_left_outer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = catalog.load_table(spark, sf_dir, "customer")
    o = catalog.load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,4)")), F.lit(0)
            )
            .cast("double")
            .alias("total_spent"),
        )
    )


@_register(
    "join_theta_range",
    """
SELECT p.p_partkey, p.p_size,
       CAST(COUNT(*) AS BIGINT) AS n_cheaper_suppliers
FROM part p
JOIN supplier s ON s.s_acctbal > p.p_retailprice / 100.0
WHERE p.p_partkey % 97 = 0
GROUP BY p.p_partkey, p.p_size
""",
)
def q_join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join. No equi-key → Spark picks broadcast
    nested-loop; the filter shrinks the probe side first, and supplier (the
    broadcast side) is the small table. At 100 TB a theta join must always
    ride a broadcastable side or a banded pre-join key."""
    p = catalog.load_table(spark, sf_dir, "part").where(
        F.col("p_partkey") % 97 == 0
    )
    s = catalog.load_table(spark, sf_dir, "supplier")
    return (
        p.join(F.broadcast(s), s.s_acctbal > p.p_retailprice / 100.0)
        .groupBy("p_partkey", "p_size")
        .agg(F.count("*").alias("n_cheaper_suppliers"))
    )


@_register(
    "join_full_outer_balance",
    """
WITH hv AS (
  SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000
),
o96 AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders_1996
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1997-01-01'
  GROUP BY o_custkey
)
SELECT COALESCE(hv.c_custkey, o96.o_custkey) AS custkey,
       hv.c_acctbal AS acctbal,
       o96.n_orders_1996,
       hv.c_custkey IS NULL  AS only_active,
       o96.o_custkey IS NULL AS only_high_balance
FROM hv FULL OUTER JOIN o96 ON hv.c_custkey = o96.o_custkey
""",
)
def q_join_full_outer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: high-balance customers vs customers active in
    1996 — both unmatched sides survive with nulls (144 high-balance
    inactives, 655 active low-balance at sf0.01). Both inputs pre-shrink
    before the join (filter / pre-aggregate), so the full-outer shuffle
    moves keys + one number, never fact rows — the shape that survives
    100 TB. Full outer can't broadcast (both sides must preserve
    unmatched rows), so co-partitioning is the only lever."""
    c = catalog.load_table(spark, sf_dir, "customer")
    o = catalog.load_table(spark, sf_dir, "orders")
    hv = c.where(F.col("c_acctbal") > 5000).select("c_custkey", "c_acctbal")
    o96 = (
        o.where(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders_1996"))
    )
    return hv.join(
        o96, hv.c_custkey == o96.o_custkey, "full_outer"
    ).select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.col("c_acctbal").alias("acctbal"),
        "n_orders_1996",
        F.col("c_custkey").isNull().alias("only_active"),
        F.col("o_custkey").isNull().alias("only_high_balance"),
    )


@_register(
    "join_nullsafe_keys",
    """
WITH keyed AS (
  SELECT nullif(o_orderstatus, 'P') AS status_key, o_totalprice
  FROM orders
),
dim AS (
  SELECT status_key,
         CAST(count(*) AS BIGINT) AS n_in_group
  FROM keyed GROUP BY status_key
)
SELECT k.status_key,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(max(d.n_in_group) AS BIGINT) AS group_size
FROM keyed k
JOIN dim d ON k.status_key IS NOT DISTINCT FROM d.status_key
GROUP BY k.status_key
""",
)
def q_join_nullsafe_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of silently dropping — the semantics an
    upsert/reconciliation pipeline needs when the join key is genuinely
    nullable. The NULL group (status 'P' nulled via nullif) must appear
    in the output with group_size == n_rows; a plain equi-join would
    lose it. Catalyst rewrites <=> into a coalesce-keyed hash join, so
    the plan stays a normal shuffled join — no nested loop."""
    o = catalog.load_table(spark, sf_dir, "orders")
    keyed = o.select(
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_key"),
        "o_totalprice",
    )
    dim = keyed.groupBy("status_key").agg(F.count("*").alias("n_in_group"))
    return (
        keyed.alias("k")
        .join(
            dim.alias("d"),
            F.col("k.status_key").eqNullSafe(F.col("d.status_key")),
        )
        .groupBy(F.col("k.status_key").alias("status_key"))
        .agg(
            F.count("*").alias("n_rows"),
            F.max("d.n_in_group").alias("group_size"),
        )
    )


# ---------------------------------------------------------------------------
# Window functions / top-k
# ---------------------------------------------------------------------------


@_register(
    "window_topk_per_group",
    """
SELECT o_custkey, o_orderkey, o_totalprice, rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
  FROM orders)
WHERE rk <= 3
""",
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. row_number + filter is Spark's idiomatic
    grouped top-k; the rank filter is pushed into the window sort at scale
    (WindowGroupLimit). Unique o_orderkey tiebreak keeps it deterministic."""
    o = catalog.load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rk"),
        ).where(F.col("rk") <= 3)
    )


@_register(
    "window_running_total",
    """
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,4)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_value
FROM events
""",
)
def q_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum per user over event time (explicit ROWS frame + unique
    tiebreak; decimal accumulation keeps it order-exact)."""
    ev = catalog.load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("running_value"),
    )


@_register(
    "window_lag_lead",
    """
SELECT user_id, event_id, event_type,
       LAG(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
       LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type,
       CAST(date_diff('millisecond',
            LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS BIGINT)
         AS ms_since_prev
FROM events
""",
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag/lead navigation + inter-event gap (sessionization
    building block)."""
    ev = catalog.load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (
            (F.unix_millis(F.col("ts").cast("timestamp")))
            - F.unix_millis(prev_ts.cast("timestamp"))
        ).alias("ms_since_prev"),
    )


@_register(
    "topk_global",
    """
SELECT o.o_orderkey, c.c_name, o.o_totalprice
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 10
""",
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ordered top-k: Spark runs TakeOrderedAndProject — per-partition
    heap + single k-row merge on the driver. No full sort at any scale."""
    o = catalog.load_table(spark, sf_dir, "orders")
    c = catalog.load_table(spark, sf_dir, "customer")
    return (
        o.join(c, c.c_custkey == o.o_custkey)
        .select("o_orderkey", "c_name", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@_register(
    "set_operations",
    """
SELECT 'both' AS segment, k FROM (
  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
  INTERSECT
  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
UNION ALL
SELECT 'open_only' AS segment, k FROM (
  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
  EXCEPT
  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
""",
)
def q_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union / intersect / except over key sets (SURVEY §2.2)."""
    o = catalog.load_table(spark, sf_dir, "orders")
    open_k = o.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("k")
    )
    done_k = o.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k")
    )
    both = open_k.intersect(done_k).select(F.lit("both").alias("segment"), "k")
    # subtract == EXCEPT DISTINCT (exceptAll would keep keys that merely
    # occur more often on the left)
    only = open_k.subtract(done_k).select(F.lit("open_only").alias("segment"), "k")
    return both.unionAll(only)


# ---------------------------------------------------------------------------
# Scalar function packs
# ---------------------------------------------------------------------------


@_register(
    "scalar_string_pack",
    """
SELECT p_partkey,
       upper(p_name)                          AS name_upper,
       lower(p_brand)                         AS brand_lower,
       length(p_name)                         AS name_len,
       substr(p_name, 1, 5)                   AS name_prefix,
       replace(p_type, ' ', '_')              AS type_snake,
       concat(p_brand, ':', p_type)           AS brand_type,
       ltrim(rtrim(p_name))                   AS name_trim,
       lpad(CAST(p_size AS VARCHAR), 4, '0')  AS size_padded,
       reverse(p_brand)                       AS brand_rev,
       strpos(p_name, 'a')                    AS first_a,
       regexp_extract(p_name, '([0-9]+)', 1)  AS first_number
FROM part
""",
)
def q_scalar_string_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = catalog.load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.ltrim(F.rtrim(F.col("p_name"))).alias("name_trim"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.instr(F.col("p_name"), "a").alias("first_a"),
        F.regexp_extract("p_name", "([0-9]+)", 1).alias("first_number"),
    )


@_register(
    "scalar_date_pack",
    """
SELECT o_orderkey,
       CAST(year(o_orderdate)  AS INTEGER) AS order_year,
       CAST(month(o_orderdate) AS INTEGER) AS order_month,
       CAST(day(o_orderdate)   AS INTEGER) AS order_day,
       CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
       -- ISO day-of-week (Mon=1..Sun=7) agrees across engines
       CAST(isodow(o_orderdate) AS INTEGER) AS order_isodow,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(date_diff('day', o_orderdate, TIMESTAMP '1998-12-31') AS BIGINT)
                                            AS days_to_eoy,
       o_orderdate + INTERVAL 30 DAY        AS due_date,
       strftime(o_orderdate, '%Y-%m')       AS year_month
FROM orders
""",
)
def q_scalar_date_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = catalog.load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        # Spark dayofweek: 1=Sunday..7=Saturday → ISO Mon=1..Sun=7
        ((F.dayofweek("o_orderdate") + 5) % 7 + 1).alias("order_isodow"),
        F.date_trunc("month", "o_orderdate")
        .cast("timestamp_ntz")
        .alias("month_start"),
        F.datediff(
            F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")
        )
        .cast("long")
        .alias("days_to_eoy"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.date_format("o_orderdate", "yyyy-MM").alias("year_month"),
    )


@_register(
    "scalar_math_pack",
    """
SELECT l_orderkey, l_linenumber,
       abs(l_discount - 0.05)                    AS disc_dev,
       CAST(floor(l_quantity) AS BIGINT)         AS qty_floor,
       CAST(ceil(l_extendedprice / 1000.0) AS BIGINT) AS price_k_ceil,
       round(sqrt(l_extendedprice), 4)           AS price_sqrt,
       round(ln(l_extendedprice + 1), 6)         AS price_ln,
       power(l_quantity, 2)                      AS qty_sq,
       CAST(sign(l_discount - 0.05) AS DOUBLE)   AS disc_sign,
       CAST(l_orderkey % 7 AS BIGINT)            AS key_mod,
       greatest(l_quantity, 25.0)                AS qty_hi,
       least(l_tax, l_discount)                  AS tax_or_disc
FROM lineitem
WHERE l_orderkey % 31 = 0
""",
)
def q_scalar_math_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = catalog.load_table(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey") % 31 == 0
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_extendedprice") / 1000.0).alias("price_k_ceil"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.greatest("l_quantity", F.lit(25.0)).alias("qty_hi"),
        F.least("l_tax", "l_discount").alias("tax_or_disc"),
    )


@_register(
    "scalar_json_pack",
    """
SELECT event_id,
       json_extract_string(props, '$.k')              AS k_str,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
       CAST(json_extract_string(props, '$.missing') IS NULL AS BOOLEAN) AS missing_is_null
FROM events
""",
)
def q_scalar_json_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schemaless JSON extraction — the on-demand access pattern for the
    opaque ``sample``/``props`` payload column (SURVEY §7.3)."""
    ev = catalog.load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.get_json_object("props", "$.missing").isNull().alias("missing_is_null"),
    )


# ---------------------------------------------------------------------------
# join_variants_pack — the null-semantics join corners (full-outer balance
# reconciliation + null-safe-key grouping join) union-tagged onto one
# schema, reusing the granular queries AND their oracles verbatim so both
# occupy ONE core-window slot. (Merges join_full_outer_balance,
# join_nullsafe_keys; the six mainstream strategies live in
# join_strategies_pack.)
# ---------------------------------------------------------------------------


def _join_variants_oracle() -> str:
    return f"""
SELECT 'full_outer' AS kind,
       CAST(custkey AS VARCHAR)      AS key,
       CAST(n_orders_1996 AS BIGINT) AS n,
       CAST(NULL AS BIGINT)          AS group_size,
       CAST(acctbal AS DOUBLE)       AS amount,
       only_active,
       only_high_balance
FROM ({ORACLES["join_full_outer_balance"]})
UNION ALL
SELECT 'nullsafe', status_key, CAST(n_rows AS BIGINT),
       CAST(group_size AS BIGINT), CAST(NULL AS DOUBLE),
       CAST(NULL AS BOOLEAN), CAST(NULL AS BOOLEAN)
FROM ({ORACLES["join_nullsafe_keys"]})
"""


def q_join_variants_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-semantics join corners in one union: the full-outer
    reconciliation (rows existing on either side, with side-membership
    flags) and the null-safe equality join (<=> keeps NULL==NULL groups
    together). Each branch is the granular query unchanged, tagged and
    projected onto (kind, key, n, group_size, amount, flags)."""
    fo = q_join_full_outer_balance(spark, sf_dir).select(
        F.lit("full_outer").alias("kind"),
        F.col("custkey").cast("string").alias("key"),
        F.col("n_orders_1996").cast("long").alias("n"),
        F.lit(None).cast("long").alias("group_size"),
        F.col("acctbal").cast("double").alias("amount"),
        "only_active",
        "only_high_balance",
    )
    ns = q_join_nullsafe_keys(spark, sf_dir).select(
        F.lit("nullsafe").alias("kind"),
        F.col("status_key").alias("key"),
        F.col("n_rows").cast("long").alias("n"),
        F.col("group_size").cast("long").alias("group_size"),
        F.lit(None).cast("double").alias("amount"),
        F.lit(None).cast("boolean").alias("only_active"),
        F.lit(None).cast("boolean").alias("only_high_balance"),
    )
    return fo.unionByName(ns)


QUERIES["join_variants_pack"] = q_join_variants_pack
ORACLES["join_variants_pack"] = _join_variants_oracle()
