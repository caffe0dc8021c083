"""Time-trend / cohort-value analytics over the orders fact table.

The warehouse consumers of the reference's landed data run exactly these
report shapes: period-over-period growth, top-N-plus-other contribution
rollups, inter-purchase cadence, and cohort lifetime-value curves.

Money is quantized to integer cents per ROW (``floor(x*100 + 0.5)`` —
identical IEEE ops in both engines) before any aggregation, so every sum
here is exact 64-bit integer arithmetic: order- and partition-
independent, no float parity surface at all (the lesson from
segments.q_pareto_revenue_share, where both round()-on-double and
rounding an unordered double sum flipped cents between engines).

Scale shape:

- **period_over_period**: facts reduce to one row per (segment, month)
  ≈ hundreds of rows; MoM/YoY comparisons are explicit calendar
  self-joins on (segment, month−1/−12) — no lag() window, so missing
  months can never silently misalign periods.
- **topn_plus_other**: per-segment rank over the customer-sized rollup
  (WindowGroupLimit prunes to k+1 per group before the union of the
  top-k branch and the OTHER remainder aggregate).
- **interpurchase_intervals**: one per-customer lag window over orders
  sorted by date — bounded partitions (orders per customer), no global
  sort; the per-customer median gap is an exact small-group percentile.
- **cohort_ltv_curve**: two grouped aggs (first-order cohort, monthly
  activity) + a cohort-sized cumulative window; cumulative cents stay
  integer-exact.
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


_CENTS = "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"


# ---------------------------------------------------------------------------
# period_over_period — MoM / YoY growth per market segment
# ---------------------------------------------------------------------------

_POP_ORACLE = f"""
WITH m AS (
  SELECT c.c_mktsegment AS segment,
         CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
         sum({_CENTS}) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
)
SELECT cur.segment, cur.month,
       CAST(cur.cents AS DOUBLE) / 100.0e0 AS revenue,
       round(CASE WHEN prev.cents IS NOT NULL AND prev.cents <> 0
             THEN (CAST(cur.cents AS DOUBLE) - CAST(prev.cents AS DOUBLE))
                  / CAST(prev.cents AS DOUBLE) END, 6) AS mom_pct,
       round(CASE WHEN yr.cents IS NOT NULL AND yr.cents <> 0
             THEN (CAST(cur.cents AS DOUBLE) - CAST(yr.cents AS DOUBLE))
                  / CAST(yr.cents AS DOUBLE) END, 6) AS yoy_pct
FROM m cur
LEFT JOIN m prev ON prev.segment = cur.segment
                AND prev.month = cur.month - INTERVAL 1 MONTH
LEFT JOIN m yr   ON yr.segment = cur.segment
                AND yr.month = cur.month - INTERVAL 12 MONTH
"""


@_register("period_over_period", _POP_ORACLE)
def q_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month and year-over-year revenue growth per market
    segment. The comparison periods are explicit calendar self-joins
    (month − 1, month − 12) on the month-sized rollup — a ``lag()``
    window would silently compare against the previous *present* month
    when a month is missing; the calendar join yields NULL instead."""
    o = catalog.load_table(spark, sf_dir, "orders")
    c = catalog.load_table(spark, sf_dir, "customer")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    # Staged: the month-sized rollup is self-joined three ways (current,
    # month−1, month−12) — one materialization instead of three fact
    # scans (the aliased subplans' differing outputs defeat ReuseExchange)
    m = session.stage(
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        )
        .agg(F.sum(cents).alias("cents"))
    )
    cur, prev, yr = m.alias("cur"), m.alias("prev"), m.alias("yr")
    pct = lambda a, b: F.round(  # noqa: E731
        F.when(
            b.isNotNull() & (b != 0),
            (a.cast("double") - b.cast("double")) / b.cast("double"),
        ),
        6,
    )
    return (
        cur.join(
            prev,
            (F.col("prev.segment") == F.col("cur.segment"))
            & (F.col("prev.month") == F.add_months(F.col("cur.month"), -1)),
            "left",
        )
        .join(
            yr,
            (F.col("yr.segment") == F.col("cur.segment"))
            & (F.col("yr.month") == F.add_months(F.col("cur.month"), -12)),
            "left",
        )
        .select(
            F.col("cur.segment").alias("segment"),
            F.col("cur.month").alias("month"),
            (F.col("cur.cents").cast("double") / 100.0).alias("revenue"),
            pct(F.col("cur.cents"), F.col("prev.cents")).alias("mom_pct"),
            pct(F.col("cur.cents"), F.col("yr.cents")).alias("yoy_pct"),
        )
    )


# ---------------------------------------------------------------------------
# topn_plus_other — top-3 customers per segment + OTHER remainder
# ---------------------------------------------------------------------------

_TOPN_ORACLE = f"""
WITH rev AS (
  SELECT c.c_mktsegment AS segment, o.o_custkey, min(c.c_name) AS c_name,
         sum({_CENTS}) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT segment, o_custkey, c_name, cents,
         row_number() OVER (PARTITION BY segment
                            ORDER BY cents DESC, o_custkey) AS rnk
  FROM rev
)
SELECT segment, CAST(rnk AS INTEGER) AS rnk, c_name AS label,
       CAST(cents AS DOUBLE) / 100.0e0 AS revenue
FROM ranked WHERE rnk <= 3
UNION ALL
SELECT segment, 0 AS rnk, 'OTHER' AS label,
       CAST(sum(cents) AS DOUBLE) / 100.0e0 AS revenue
FROM ranked WHERE rnk > 3
GROUP BY segment
"""


@_register("topn_plus_other", _TOPN_ORACLE)
def q_topn_plus_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers per segment by exact-cents revenue plus an OTHER
    remainder row per segment (the standard BI contribution rollup).
    Both branches read ONE ranked customer-sized rollup; the top branch
    is WindowGroupLimit-prunable, the remainder is a re-aggregation of
    the same exchange."""
    o = catalog.load_table(spark, sf_dir, "orders")
    c = catalog.load_table(spark, sf_dir, "customer")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(F.min("c_name").alias("c_name"), F.sum(cents).alias("cents"))
    )
    w = Window.partitionBy("segment").orderBy(
        F.col("cents").desc(), "o_custkey"
    )
    # Staged: the top-k branch and the OTHER remainder both consume the
    # ranked rollup, and their differing column pruning (c_name) defeats
    # ReuseExchange — without the materialization point the fact-side
    # join + aggregation executes twice.
    ranked = session.stage(rev.withColumn("rnk", F.row_number().over(w)))
    top = ranked.where(F.col("rnk") <= 3).select(
        "segment",
        F.col("rnk").cast("int").alias("rnk"),
        F.col("c_name").alias("label"),
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
    )
    other = (
        ranked.where(F.col("rnk") > 3)
        .groupBy("segment")
        .agg(F.sum("cents").alias("cents"))
        .select(
            "segment",
            F.lit(0).alias("rnk"),
            F.lit("OTHER").alias("label"),
            (F.col("cents").cast("double") / 100.0).alias("revenue"),
        )
    )
    return top.unionAll(other)


# ---------------------------------------------------------------------------
# interpurchase_intervals — per-customer order cadence
# ---------------------------------------------------------------------------

_GAP_ORACLE = """
WITH seq AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         lag(CAST(o_orderdate AS DATE)) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS pd
  FROM orders
),
gaps AS (
  SELECT o_custkey, date_diff('day', pd, d) AS gap
  FROM seq WHERE pd IS NOT NULL
)
SELECT o_custkey,
       CAST(count(*) + 1 AS BIGINT)       AS n_orders,
       round(avg(gap), 6)                 AS avg_gap_days,
       quantile_cont(gap, 0.5)            AS median_gap_days,
       CAST(max(gap) AS BIGINT)           AS max_gap_days
FROM gaps GROUP BY o_custkey
"""


@_register("interpurchase_intervals", _GAP_ORACLE)
def q_interpurchase_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer inter-purchase cadence: mean / exact-median / max
    days between consecutive orders (customers with ≥ 2 orders). One
    per-customer lag window over bounded partitions, then a grouped
    aggregate — the standard churn-model feature block."""
    o = catalog.load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        F.lag(F.to_date("o_orderdate")).over(w).alias("pd"),
    )
    gaps = seq.where(F.col("pd").isNotNull()).select(
        "o_custkey", F.datediff("d", "pd").alias("gap")
    )
    return gaps.groupBy("o_custkey").agg(
        (F.count(F.lit(1)) + 1).cast("long").alias("n_orders"),
        F.round(F.avg("gap"), 6).alias("avg_gap_days"),
        F.percentile("gap", F.lit(0.5)).alias("median_gap_days"),
        F.max("gap").cast("long").alias("max_gap_days"),
    )


# ---------------------------------------------------------------------------
# cohort_ltv_curve — cumulative revenue per acquisition cohort
# ---------------------------------------------------------------------------

_LTV_ORACLE = f"""
WITH cohort AS (
  SELECT o_custkey,
         CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS cohort_month
  FROM orders GROUP BY o_custkey
),
csize AS (
  SELECT cohort_month, count(*) AS cohort_size
  FROM cohort GROUP BY cohort_month
),
act AS (
  SELECT ch.cohort_month,
         (year(CAST(date_trunc('month', o.o_orderdate) AS DATE))
          - year(ch.cohort_month)) * 12
         + (month(CAST(date_trunc('month', o.o_orderdate) AS DATE))
            - month(ch.cohort_month))                     AS month_index,
         count(DISTINCT o.o_custkey)                      AS n_active,
         sum({_CENTS})                                    AS cents
  FROM orders o JOIN cohort ch ON ch.o_custkey = o.o_custkey
  GROUP BY 1, 2
)
SELECT a.cohort_month, CAST(a.month_index AS INTEGER) AS month_index,
       CAST(s.cohort_size AS BIGINT) AS cohort_size,
       CAST(a.n_active AS BIGINT) AS n_active,
       CAST(a.cents AS DOUBLE) / 100.0e0 AS revenue,
       round(CAST(sum(a.cents) OVER (PARTITION BY a.cohort_month
                                     ORDER BY a.month_index
                                     ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / 100.0e0 / s.cohort_size, 6) AS cum_ltv_per_customer
FROM act a JOIN csize s USING (cohort_month)
"""


@_register("cohort_ltv_curve", _LTV_ORACLE)
def q_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: customers cohorted by first-order
    month; per (cohort, month-index) active count, revenue, and the
    cumulative LTV per cohort customer. Month index is pure integer
    calendar arithmetic ((Δyear)*12 + Δmonth — ``months_between``'s
    fractional doubles never enter); cumulative cents stay integer-exact
    under the ordered window."""
    o = catalog.load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    # Staged: consumed by the cohort-size rollup AND the activity join
    cohort = session.stage(
        o.groupBy("o_custkey").agg(
            F.date_trunc("month", F.min("o_orderdate")).cast("date")
            .alias("cohort_month")
        )
    )
    csize = cohort.groupBy("cohort_month").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    omonth = F.date_trunc("month", "o_orderdate").cast("date")
    act = (
        o.join(cohort, "o_custkey")
        .select(
            "cohort_month",
            (
                (F.year(omonth) - F.year("cohort_month")) * 12
                + (F.month(omonth) - F.month("cohort_month"))
            ).alias("month_index"),
            "o_custkey",
            cents.alias("cents"),
        )
        .groupBy("cohort_month", "month_index")
        .agg(
            F.countDistinct("o_custkey").alias("n_active"),
            F.sum("cents").alias("cents"),
        )
    )
    wc = (
        Window.partitionBy("cohort_month")
        .orderBy("month_index")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        act.join(F.broadcast(csize), "cohort_month")
        .select(
            "cohort_month",
            F.col("month_index").cast("int").alias("month_index"),
            F.col("cohort_size").cast("long").alias("cohort_size"),
            F.col("n_active").cast("long").alias("n_active"),
            (F.col("cents").cast("double") / 100.0).alias("revenue"),
            F.round(
                F.sum("cents").over(wc).cast("double")
                / 100.0
                / F.col("cohort_size"),
                6,
            ).alias("cum_ltv_per_customer"),
        )
    )


# ---------------------------------------------------------------------------
# geo_revenue_shares — percent-of-parent in the region → nation hierarchy
# ---------------------------------------------------------------------------

_GEO_ORACLE = """
WITH rev AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n   ON n.n_nationkey = c.c_nationkey
  JOIN region r   ON r.r_regionkey = n.n_regionkey
  GROUP BY 1, 2
)
SELECT region, nation,
       CAST(cents AS DOUBLE) / 100.0e0 AS revenue,
       round(CAST(cents AS DOUBLE)
             / CAST(sum(cents) OVER (PARTITION BY region) AS DOUBLE),
             6) AS share_of_region,
       CAST(row_number() OVER (PARTITION BY region
                               ORDER BY cents DESC, nation) AS INTEGER)
         AS rank_in_region
FROM rev
"""


@_register("geo_revenue_shares", _GEO_ORACLE)
def q_geo_revenue_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent rollup over the region → nation hierarchy:
    per-nation revenue (exact integer cents), its share of the region
    total, and its rank within the region. Both dimension joins
    broadcast; the share/rank windows run over the |nations|-sized
    rollup."""
    o = catalog.load_table(spark, sf_dir, "orders")
    c = catalog.load_table(spark, sf_dir, "customer")
    n = catalog.load_table(spark, sf_dir, "nation")
    r = catalog.load_table(spark, sf_dir, "region")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.sum(cents).alias("cents"))
    )
    wreg = Window.partitionBy("region")
    wrank = Window.partitionBy("region").orderBy(
        F.col("cents").desc(), "nation"
    )
    return rev.select(
        "region",
        "nation",
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        F.round(
            F.col("cents").cast("double")
            / F.sum("cents").over(wreg).cast("double"),
            6,
        ).alias("share_of_region"),
        F.row_number().over(wrank).cast("int").alias("rank_in_region"),
    )


# ---------------------------------------------------------------------------
# concurrent_intervals_timeline — open-order backlog over time
# ---------------------------------------------------------------------------

_BACKLOG_ORACLE = """
WITH life AS (
  SELECT o.o_orderkey,
         CAST(date_trunc('month', o.o_orderdate) AS DATE) AS open_m,
         greatest(CAST(date_trunc('month', s.sd) AS DATE),
                  CAST(date_trunc('month', o.o_orderdate) AS DATE))
           AS close_m
  FROM orders o
  JOIN (SELECT l_orderkey, max(l_shipdate) AS sd
        FROM lineitem GROUP BY l_orderkey) s
    ON s.l_orderkey = o.o_orderkey
),
deltas AS (
  SELECT open_m AS month, 1 AS delta FROM life
  UNION ALL
  SELECT CAST(close_m + INTERVAL 1 MONTH AS DATE), -1 FROM life
),
monthly AS (
  SELECT month, sum(delta) AS net FROM deltas GROUP BY month
)
SELECT month,
       CAST(net AS BIGINT) AS net_change,
       CAST(sum(net) OVER (ORDER BY month ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS open_orders
FROM monthly
"""


@_register("concurrent_intervals_timeline", _BACKLOG_ORACLE)
def q_concurrent_intervals_timeline(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Interval-concurrency counting: how many orders are open (placed,
    not yet fully shipped) in each month — the sweep-line +1/−1 delta
    union with a cumulative sum, the standard way to count overlapping
    intervals WITHOUT an interval self-join (which is quadratic in the
    overlap degree). An order ships its last line in ``close_m`` and
    stops counting the month after; degenerate intervals (shipped
    before placed in the fixture) clamp to their open month.

    Facts reduce to per-order lifetimes, then to one row per month —
    the cumulative window runs over the month timeline. All integer
    arithmetic."""
    o = catalog.load_table(spark, sf_dir, "orders")
    li = catalog.load_table(spark, sf_dir, "lineitem")
    ship = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("sd"))
    life = (
        o.join(ship, o.o_orderkey == ship.l_orderkey)
        .select(
            F.date_trunc("month", "o_orderdate").cast("date").alias("open_m"),
            F.greatest(
                F.date_trunc("month", "sd").cast("date"),
                F.date_trunc("month", "o_orderdate").cast("date"),
            ).alias("close_m"),
        )
    )
    deltas = life.select(
        F.col("open_m").alias("month"), F.lit(1).alias("delta")
    ).unionAll(
        life.select(
            F.add_months("close_m", 1).alias("month"),
            F.lit(-1).alias("delta"),
        )
    )
    monthly = deltas.groupBy("month").agg(F.sum("delta").alias("net"))
    w = Window.orderBy("month").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return monthly.select(
        "month",
        F.col("net").cast("long").alias("net_change"),
        F.sum("net").over(w).cast("long").alias("open_orders"),
    )


# ---------------------------------------------------------------------------
# trending_items_decay — recency-weighted popularity
# ---------------------------------------------------------------------------

_DECAY_HALF_LIFE_DAYS = 90
_TRENDING_TOP = 25

_TRENDING_ORACLE = f"""
WITH anchor AS (SELECT max(o_orderdate) AS t1 FROM orders),
w AS (
  SELECT l.l_partkey,
         exp(-ln(2.0e0)
             * (CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                     CAST((SELECT t1 FROM anchor) AS DATE)) AS DOUBLE)
                / {_DECAY_HALF_LIFE_DAYS}.0e0)) AS wt,
         l.l_quantity
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT l_partkey,
       round(sum(wt * l_quantity), 6) AS decayed_qty,
       CAST(count(*) AS BIGINT) AS n_lines
FROM w GROUP BY l_partkey
ORDER BY decayed_qty DESC, l_partkey
LIMIT {_TRENDING_TOP}
"""


@_register("trending_items_decay", _TRENDING_ORACLE)
def q_trending_items_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending parts: order quantities weighted by an exponential
    time-decay (half-life {_DECAY_HALF_LIFE_DAYS} days, anchored at the
    data's max order date so the query is reproducible), top
    {_TRENDING_TOP} by decayed quantity — the standard recency-weighted
    popularity ranking behind 'trending now' surfaces.

    One fact join + one aggregation; the decay weight is computed
    scan-side from integer day differences (identical doubles both
    engines), and the top-k runs TakeOrderedAndProject over the
    part-sized rollup."""
    li = catalog.load_table(spark, sf_dir, "lineitem")
    o = catalog.load_table(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("t1"))
    import math

    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .crossJoin(F.broadcast(anchor))
        .select(
            "l_partkey",
            "l_quantity",
            F.exp(
                -F.lit(math.log(2.0))
                * (
                    F.datediff(
                        F.to_date("t1"), F.to_date("o_orderdate")
                    ).cast("double")
                    / _DECAY_HALF_LIFE_DAYS
                )
            ).alias("wt"),
        )
    )
    return (
        joined.groupBy("l_partkey")
        .agg(
            F.round(F.sum(F.col("wt") * F.col("l_quantity")), 6)
            .alias("decayed_qty"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
        .orderBy(F.col("decayed_qty").desc(), "l_partkey")
        .limit(_TRENDING_TOP)
    )


# ---------------------------------------------------------------------------
# new_vs_repeat_revenue — monthly revenue split by customer tenure
# ---------------------------------------------------------------------------

_NVR_ORACLE = f"""
WITH firsts AS (
  SELECT o_custkey,
         CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS first_m
  FROM orders GROUP BY o_custkey
),
split AS (
  SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
         CASE WHEN CAST(date_trunc('month', o.o_orderdate) AS DATE)
                   = f.first_m
              THEN 'new' ELSE 'repeat' END AS tenure,
         {_CENTS} AS cents
  FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
),
m AS (
  SELECT month, tenure, sum(cents) AS cents, count(*) AS n_orders
  FROM split GROUP BY month, tenure
)
SELECT month, tenure,
       CAST(cents AS DOUBLE) / 100.0e0 AS revenue,
       CAST(n_orders AS BIGINT) AS n_orders,
       round(CAST(cents AS DOUBLE)
             / CAST(sum(cents) OVER (PARTITION BY month) AS DOUBLE), 6)
         AS share_of_month
FROM m
"""


@_register("new_vs_repeat_revenue", _NVR_ORACLE)
def q_new_vs_repeat_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue split into new-customer (first-order month) vs
    repeat business, with each side's share of the month — the
    growth-quality decomposition behind every board deck. One
    customer-sized first-order rollup joined back (broadcastable),
    exact-cents sums, share window over the month-sized result."""
    o = catalog.load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).cast("date")
        .alias("first_m")
    )
    omonth = F.date_trunc("month", "o_orderdate").cast("date")
    split = o.join(F.broadcast(firsts), "o_custkey").select(
        omonth.alias("month"),
        F.when(omonth == F.col("first_m"), "new")
        .otherwise("repeat")
        .alias("tenure"),
        cents.alias("cents"),
    )
    m = split.groupBy("month", "tenure").agg(
        F.sum("cents").alias("cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.partitionBy("month")
    return m.select(
        "month",
        "tenure",
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        F.col("n_orders").cast("long").alias("n_orders"),
        F.round(
            F.col("cents").cast("double")
            / F.sum("cents").over(w).cast("double"),
            6,
        ).alias("share_of_month"),
    )


# ---------------------------------------------------------------------------
# ols_elasticity_by_segment — least-squares discount response per brand
# ---------------------------------------------------------------------------

_OLS_ORACLE = """
WITH pts AS (
  SELECT p.p_brand, l.l_discount AS x, l.l_quantity AS y
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
)
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n,
       round(covar_pop(x, y) / nullif(var_pop(x), 0), 6) AS slope,
       round(avg(y) - covar_pop(x, y) / nullif(var_pop(x), 0) * avg(x), 6)
         AS intercept,
       -- covar²/(varx·vary) instead of corr²: Spark's corr RAISES under
       -- ANSI on a zero-variance group, and this form keeps the two
       -- engines term-for-term identical
       round(covar_pop(x, y) * covar_pop(x, y)
             / nullif(var_pop(x) * var_pop(y), 0), 6) AS r2
FROM pts GROUP BY p_brand
"""


@_register("ols_elasticity_by_segment", _OLS_ORACLE)
def q_ols_elasticity_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-brand least-squares discount response: slope/intercept of
    quantity on discount plus R² — the parametric counterpart of
    ``theil_sen_trend`` (which is robust but O(k²) per key; OLS is the
    O(k) sufficient-statistics version you run on every segment first,
    reserving Theil-Sen for segments the R² flags as outlier-ridden).

    One grouped pass over the joined facts computes every sufficient
    statistic (n, means, co-moments) — raw points never shuffle twice;
    the part side of the join broadcasts. try_divide/nullif guard the
    constant-discount segment (NULL slope, per the ANSI convention)."""
    li = catalog.load_table(spark, sf_dir, "lineitem")
    p = catalog.load_table(spark, sf_dir, "part")
    pts = li.join(
        F.broadcast(p.select("p_partkey", "p_brand")),
        li.l_partkey == p.p_partkey,
    ).select(
        "p_brand",
        F.col("l_discount").alias("x"),
        F.col("l_quantity").alias("y"),
    )
    slope = F.try_divide(F.covar_pop("x", "y"), F.var_pop("x"))
    return pts.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(F.avg("y") - slope * F.avg("x"), 6).alias("intercept"),
        F.round(
            F.try_divide(
                F.covar_pop("x", "y") * F.covar_pop("x", "y"),
                F.var_pop("x") * F.var_pop("y"),
            ),
            6,
        ).alias("r2"),
    )
