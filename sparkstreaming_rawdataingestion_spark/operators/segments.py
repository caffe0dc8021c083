"""Customer/revenue segmentation and concentration analytics.

The reference lands raw per-user streams into a warehouse table
(RawDataIngestion.java:134-152); once there, the consuming analysts run
exactly this family of queries: RFM segmentation, Pareto/contribution
analysis, proportional allocation, inequality metrics, robust outlier
flagging and sequential changepoint detection. Each operator is a
`queries()` entry with a DuckDB oracle.

Scale shape (what survives a 100 TB fact table):

- **rfm_segmentation** / **pareto_revenue_share**: the windowed pass
  (NTILE / cumulative share) runs over a *dimension-sized* aggregate
  (one row per customer / per part), never over the fact table — facts
  are reduced by a map-side-combining groupBy first. The global sort
  those windows need is |customers| rows, not |orders|.
- **allocation_proportional**: one window partitioned by ``l_orderkey``
  — millions of tiny partitions, each a handful of rows; no global
  sort, no skew (order size is bounded by the schema).
- **concentration_metrics**: two grouped aggregations (customer rollup,
  then segment rollup) plus one dimension-sized ranking window per
  segment for the Gini term.
- **mad_outlier_flags**: two grouped exact-percentile passes over
  ``event_type`` (5 groups) broadcast-joined back to the facts; the
  flagging filter is codegen'd scan-side. At true firehose scale the
  exact percentile swaps for ``percentile_approx`` (see
  udfs.q_udf_approx_sketches for the sketch path).
- **cusum_changepoint**: the one sequential recurrence — per-key state
  via Arrow-batched ``applyInPandas`` (keys parallel, O(1) state),
  mirroring operators/mining.q_ewma_smoothing. Per-user mean/σ are
  rounded to 6 decimals BEFORE the recurrence so both engines iterate
  bit-identical constants (max(0,·) branches amplify last-ulp input
  noise; rounding the inputs, not the outputs, is what makes the
  recurrence reproducible).
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


# ---------------------------------------------------------------------------
# rfm_segmentation — recency / frequency / monetary quintiles
# ---------------------------------------------------------------------------

_RFM_ORACLE = """
WITH maxd AS (SELECT max(CAST(o_orderdate AS DATE)) AS d0 FROM orders),
rfm AS (
  SELECT o_custkey,
         date_diff('day', max(CAST(o_orderdate AS DATE)),
                   (SELECT d0 FROM maxd))                  AS recency_days,
         count(*)                                          AS frequency,
         sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS monetary
  FROM orders GROUP BY o_custkey
),
q AS (
  SELECT o_custkey, recency_days, frequency, monetary,
         ntile(5) OVER (ORDER BY recency_days DESC, o_custkey) AS r_q,
         ntile(5) OVER (ORDER BY frequency, o_custkey)         AS f_q,
         ntile(5) OVER (ORDER BY monetary, o_custkey)          AS m_q
  FROM rfm
)
SELECT o_custkey, CAST(recency_days AS BIGINT) AS recency_days,
       CAST(frequency AS BIGINT) AS frequency,
       CAST(monetary AS DOUBLE) AS monetary,
       r_q, f_q, m_q,
       CASE WHEN r_q >= 4 AND f_q >= 4 AND m_q >= 4 THEN 'champion'
            WHEN r_q >= 4 AND f_q <= 2               THEN 'new'
            WHEN r_q <= 2 AND f_q >= 4               THEN 'at_risk'
            WHEN r_q <= 2 AND f_q <= 2               THEN 'hibernating'
            ELSE 'core' END AS segment
FROM q
"""


@_register("rfm_segmentation", _RFM_ORACLE)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency/frequency/monetary rollup,
    NTILE(5) quintiles (tie-broken on custkey so both engines bucket
    identically), CASE segment labels. Monetary is fixed to 2 decimals
    before bucketing so quintile boundaries don't ride float noise.

    The reference's consumers segment datastream owners the same way
    (activity recency × stream count × data volume)."""
    o = catalog.load_table(spark, sf_dir, "orders")
    # Staged: the rollup feeds BOTH the global max-date scalar and the
    # per-customer recency projection — one fact scan, and the global
    # max is a re-aggregation of the customer-sized rollup rather than
    # a second pass over orders.
    base = session.stage(
        o.groupBy("o_custkey").agg(
            F.max(F.to_date("o_orderdate")).alias("last_d"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)"))
            .alias("monetary"),
        )
    )
    maxd = base.agg(F.max("last_d").alias("d0"))
    rfm = base.crossJoin(F.broadcast(maxd)).select(
        "o_custkey",
        F.datediff("d0", "last_d").cast("long").alias("recency_days"),
        "frequency",
        "monetary",
    )
    r_q = F.ntile(5).over(
        Window.orderBy(F.col("recency_days").desc(), "o_custkey")
    )
    f_q = F.ntile(5).over(Window.orderBy("frequency", "o_custkey"))
    m_q = F.ntile(5).over(Window.orderBy("monetary", "o_custkey"))
    q = rfm.select(
        "o_custkey", "recency_days", "frequency",
        F.col("monetary").cast("double").alias("monetary"),
        r_q.alias("r_q"), f_q.alias("f_q"), m_q.alias("m_q"),
    )
    seg = (
        F.when((F.col("r_q") >= 4) & (F.col("f_q") >= 4) & (F.col("m_q") >= 4),
               "champion")
        .when((F.col("r_q") >= 4) & (F.col("f_q") <= 2), "new")
        .when((F.col("r_q") <= 2) & (F.col("f_q") >= 4), "at_risk")
        .when((F.col("r_q") <= 2) & (F.col("f_q") <= 2), "hibernating")
        .otherwise("core")
    )
    return q.withColumn("segment", seg)


# ---------------------------------------------------------------------------
# pareto_revenue_share — cumulative contribution (80/20) analysis
# ---------------------------------------------------------------------------

_PARETO_ORACLE = """
WITH rev AS (
  -- per-LINE revenue is quantized to integer cents BEFORE the sum via
  -- floor(x*100 + 0.5): identical IEEE double ops on identical inputs
  -- in both engines (round()-on-double differs between engines at
  -- half-cent representations, and rounding an unordered double SUM
  -- flips cents at boundaries — both observed at sf0.01)
  SELECT l_partkey,
         sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                  AS BIGINT)) AS cents
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT sum(cents) AS t FROM rev),
c AS (
  SELECT l_partkey, cents,
         row_number() OVER (ORDER BY cents DESC, l_partkey) AS rnk,
         sum(cents) OVER (ORDER BY cents DESC, l_partkey
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM rev
)
SELECT l_partkey, CAST(cents AS DOUBLE) / 100.0e0 AS revenue, rnk,
       round(CAST(cum AS DOUBLE) / CAST((SELECT t FROM tot) AS DOUBLE), 9)
         AS cum_share,
       CAST(cum AS DOUBLE) / CAST((SELECT t FROM tot) AS DOUBLE) <= 0.8
         AS in_top80
FROM c
"""


@_register("pareto_revenue_share", _PARETO_ORACLE)
def q_pareto_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / contribution analysis: which parts make up 80% of
    revenue. Per-part revenue is fixed to DECIMAL(18,2) before the
    ordered cumulative sum, so the running total is exact and the
    cumulative share is the same double in both engines.

    The ranking window runs over one row per part (dimension-sized),
    not over lineitem — the fact table is reduced by a
    map-side-combining groupBy first."""
    li = catalog.load_table(spark, sf_dir, "lineitem")
    # Staged: the part rollup feeds the grand-total scalar AND the
    # ranking window — one lineitem scan
    rev = session.stage(
        li.groupBy("l_partkey").agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    * 100
                    + 0.5
                ).cast("long")
            ).alias("cents")
        )
    )
    tot = rev.agg(F.sum("cents").alias("t"))
    w = Window.orderBy(F.col("cents").desc(), "l_partkey")
    c = rev.select(
        "l_partkey",
        "cents",
        F.row_number().over(w).alias("rnk"),
        F.sum("cents")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
    ).crossJoin(F.broadcast(tot))
    share = F.col("cum").cast("double") / F.col("t").cast("double")
    return c.select(
        "l_partkey",
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        "rnk",
        F.round(share, 9).alias("cum_share"),
        (share <= 0.8).alias("in_top80"),
    )


# ---------------------------------------------------------------------------
# allocation_proportional — spread a header amount across its lines
# ---------------------------------------------------------------------------

_ALLOC_ORACLE = """
WITH l AS (
  SELECT l_orderkey, l_linenumber,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS ep
  FROM lineitem
),
s AS (
  SELECT l_orderkey, l_linenumber, ep,
         sum(ep) OVER (PARTITION BY l_orderkey) AS tot_ep
  FROM l
)
SELECT s.l_orderkey, s.l_linenumber,
       round(o.o_totalprice
             * (CAST(s.ep AS DOUBLE) / CAST(s.tot_ep AS DOUBLE)),
             4) AS allocated
FROM s JOIN orders o ON o.o_orderkey = s.l_orderkey
"""


@_register("allocation_proportional", _ALLOC_ORACLE)
def q_allocation_proportional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional allocation (ratio-to-report): spread each order's
    header total across its line items in proportion to extended price.
    The per-order denominator is summed in DECIMAL so it is exact
    (unordered float addition would make the ratio engine-dependent);
    the ratio itself is then one double division of identical operands.

    One window partitioned by ``l_orderkey`` — bounded partitions, no
    global sort, no skew; the header join is a same-key shuffle join
    that AQE plans with the window's exchange reused."""
    li = catalog.load_table(spark, sf_dir, "lineitem")
    o = catalog.load_table(spark, sf_dir, "orders")
    l = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("ep"),
    )
    s = l.withColumn(
        "tot_ep", F.sum("ep").over(Window.partitionBy("l_orderkey"))
    )
    ratio = F.col("ep").cast("double") / F.col("tot_ep").cast("double")
    return (
        s.join(o, s.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("o_totalprice") * ratio, 4).alias("allocated"),
        )
    )


# ---------------------------------------------------------------------------
# concentration_metrics — Gini / entropy / HHI per market segment
# ---------------------------------------------------------------------------

_CONC_ORACLE = """
WITH cust_rev AS (
  SELECT c.c_mktsegment, o.o_custkey,
         sum(CAST(round(o.o_totalprice, 2) AS DECIMAL(18,2))) AS rev
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY c.c_mktsegment, o.o_custkey
),
ranked AS (
  SELECT c_mktsegment, o_custkey, rev,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY rev, o_custkey) AS rnk
  FROM cust_rev
),
seg AS (
  SELECT c_mktsegment,
         count(*)                          AS n_customers,
         sum(rev)                          AS total_rev,
         sum(CAST(rnk AS DOUBLE) * CAST(rev AS DOUBLE)) AS rank_dot
  FROM ranked GROUP BY c_mktsegment
),
shares AS (
  SELECT r.c_mktsegment,
         CAST(r.rev AS DOUBLE) / CAST(s.total_rev AS DOUBLE) AS p
  FROM ranked r JOIN seg s USING (c_mktsegment)
)
SELECT s.c_mktsegment,
       CAST(s.n_customers AS BIGINT) AS n_customers,
       CAST(s.total_rev AS DOUBLE)   AS total_rev,
       round(2.0 * s.rank_dot
             / (s.n_customers * CAST(s.total_rev AS DOUBLE))
             - (s.n_customers + 1.0) / s.n_customers, 6) AS gini,
       round((SELECT -sum(p * ln(p)) FROM shares sh
              WHERE sh.c_mktsegment = s.c_mktsegment), 6) AS entropy,
       round((SELECT sum(p * p) FROM shares sh
              WHERE sh.c_mktsegment = s.c_mktsegment), 9) AS hhi
FROM seg s
"""


@_register("concentration_metrics", _CONC_ORACLE)
def q_concentration_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration metrics per market segment: Gini
    coefficient (rank formula G = 2·Σᵢ i·xᵢ/(n·Σx) − (n+1)/n over
    ascending-sorted x), Shannon entropy of customer shares, and the
    Herfindahl–Hirschman index. Per-customer revenue is fixed to
    DECIMAL before ranking so order and totals agree across engines.

    Fact reduction first (orders → one row per customer), then a
    per-segment ranking window over the dimension-sized rollup."""
    o = catalog.load_table(spark, sf_dir, "orders")
    c = catalog.load_table(spark, sf_dir, "customer")
    cust_rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)"))
            .alias("rev")
        )
    )
    wr = Window.partitionBy("c_mktsegment").orderBy("rev", "o_custkey")
    # Staged: the ranked rollup feeds the segment aggregate AND the
    # shares join — one fact-side pass
    ranked = session.stage(cust_rev.withColumn("rnk", F.row_number().over(wr)))
    seg = ranked.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("rev").alias("total_rev"),
        F.sum(F.col("rnk").cast("double") * F.col("rev").cast("double"))
        .alias("rank_dot"),
    )
    p = F.col("rev").cast("double") / F.col("total_rev").cast("double")
    shares = ranked.join(
        F.broadcast(seg.select("c_mktsegment", "total_rev", "n_customers",
                               "rank_dot")),
        "c_mktsegment",
    ).select("c_mktsegment", "n_customers", "total_rev", "rank_dot",
             p.alias("p"))
    n = F.col("n_customers").cast("double")
    tot = F.col("total_rev").cast("double")
    return shares.groupBy(
        "c_mktsegment", "n_customers", "total_rev", "rank_dot"
    ).agg(
        F.round(-F.sum(F.col("p") * F.log(F.col("p"))), 6).alias("entropy"),
        F.round(F.sum(F.col("p") * F.col("p")), 9).alias("hhi"),
    ).select(
        "c_mktsegment",
        F.col("n_customers").cast("long").alias("n_customers"),
        tot.alias("total_rev"),
        F.round(
            F.lit(2.0) * F.col("rank_dot") / (n * tot) - (n + 1.0) / n, 6
        ).alias("gini"),
        "entropy",
        "hhi",
    )


# ---------------------------------------------------------------------------
# mad_outlier_flags — robust (median/MAD) outlier detection
# ---------------------------------------------------------------------------

_MAD_ORACLE = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type,
         quantile_cont(abs(e.value - m.med), 0.5) AS mad, min(m.med) AS med
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type
)
SELECT e.event_id, e.event_type, e.value,
       round(0.6745 * (e.value - m.med) / m.mad, 6) AS robust_z
FROM events e JOIN mad m USING (event_type)
WHERE m.mad <> 0
  AND abs(0.6745 * (e.value - m.med) / m.mad) > 3.5
"""


@_register("mad_outlier_flags", _MAD_ORACLE)
def q_mad_outlier_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier flags: modified z-score 0.6745·(x−med)/MAD per
    event type, flagging |z| > 3.5 (the Iglewicz–Hoaglin rule). Median
    and MAD are exact continuous percentiles (5 groups); at firehose
    scale both swap for ``percentile_approx`` sketches. (Cut-off 3.5:
    Iglewicz & Hoaglin, "How to Detect and Handle Outliers", ASQC 1993.)

    Two tiny grouped aggs broadcast back onto the fact scan — the flag
    predicate evaluates scan-side inside codegen, so the output is the
    (small) outlier set, never a full materialization."""
    ev = catalog.load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5))
            .alias("mad"),
            F.min("med").alias("med"),
        )
    )
    # MAD is legitimately 0 whenever ≥50% of a group's values coincide;
    # under ANSI mode a raw division would raise DIVIDE_BY_ZERO (and
    # Catalyst may reorder filter conjuncts, so guarding with a sibling
    # predicate is not enough). try_divide yields NULL for those rows —
    # NULL > 3.5 is NULL → filtered — so the convention (mirrored by
    # `m.mad <> 0` in the oracle) is: a zero-MAD group has no
    # well-defined robust z and emits NO flags.
    z = F.lit(0.6745) * F.try_divide(
        F.col("value") - F.col("med"), F.col("mad")
    )
    return (
        ev.join(F.broadcast(mad), "event_type")
        .where(F.abs(z) > 3.5)
        .select(
            "event_id", "event_type", "value",
            F.round(z, 6).alias("robust_z"),
        )
    )


# ---------------------------------------------------------------------------
# cusum_changepoint — sequential drift detection per user
# ---------------------------------------------------------------------------

_CUSUM_ORACLE = """
WITH RECURSIVE stats AS (
  SELECT user_id,
         round(avg(value), 6)        AS mu,
         round(stddev_pop(value), 6) AS sd
  FROM events GROUP BY user_id
),
seq AS (
  SELECT e.user_id, e.event_id, e.value, s.mu, s.sd,
         row_number() OVER (PARTITION BY e.user_id
                            ORDER BY e.ts, e.event_id) AS rn
  FROM events e JOIN stats s USING (user_id)
),
cus AS (
  SELECT user_id, event_id, rn, mu, sd,
         greatest(0.0e0, value - mu - 0.5e0 * sd) AS s
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT q.user_id, q.event_id, q.rn, q.mu, q.sd,
         greatest(0.0e0, c.s + (q.value - q.mu - 0.5e0 * q.sd))
  FROM seq q JOIN cus c ON q.user_id = c.user_id AND q.rn = c.rn + 1
)
SELECT user_id,
       round(max(s), 6) AS max_cusum,
       CAST(count(*) FILTER (s > 4.0 * sd) AS BIGINT) AS n_alarm_points,
       min(event_id) FILTER (s > 4.0 * sd) AS first_alarm_event_id
FROM cus
GROUP BY user_id
"""


@_register("cusum_changepoint", _CUSUM_ORACLE)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detection per user:
    s_t = max(0, s_{t−1} + (x_t − μ − k)) with slack k = σ/2 and alarm
    threshold h = 4σ — the classic sequential changepoint chart for a
    sensor stream's upward level shift (Page, "Continuous Inspection
    Schemes", Biometrika 1954).

    Like mining.q_ewma_smoothing this is a genuinely sequential
    recurrence, so it runs as an Arrow-batched ``applyInPandas`` kernel
    (keys parallel, O(1) state per key) against a recursive-CTE oracle.
    μ and σ are rounded to 6 decimals BEFORE the recurrence in both
    engines: max(0,·) branches amplify last-ulp differences, so the
    inputs are pinned rather than the outputs."""
    ev = catalog.load_table(spark, sf_dir, "events")
    stats = ev.groupBy("user_id").agg(
        F.round(F.avg("value"), 6).alias("mu"),
        F.round(F.stddev_pop("value"), 6).alias("sd"),
    )
    joined = ev.join(F.broadcast(stats), "user_id").select(
        "user_id", "event_id", "ts", "value", "mu", "sd"
    )

    def cusum(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(["ts", "event_id"])
        x = pdf["value"].to_numpy(dtype="float64")
        mu = float(pdf["mu"].iloc[0])
        sd = float(pdf["sd"].iloc[0])
        k, h = 0.5 * sd, 4.0 * sd
        s = 0.0
        smax = 0.0
        n_alarm = 0
        first_alarm = None
        eids = pdf["event_id"].to_numpy()
        for i, v in enumerate(x):
            s = max(0.0, s + (v - mu - k)) if i else max(0.0, v - mu - k)
            smax = max(smax, s)
            if s > h:
                n_alarm += 1
                if first_alarm is None:
                    first_alarm = int(eids[i])
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "max_cusum": [float(np.floor(smax * 1e6 + 0.5) / 1e6)],
                "n_alarm_points": [n_alarm],
                "first_alarm_event_id": [first_alarm],
            }
        )

    return joined.groupBy("user_id").applyInPandas(
        cusum,
        "user_id long, max_cusum double, n_alarm_points long, "
        "first_alarm_event_id long",
    )


# ---------------------------------------------------------------------------
# theil_sen_trend — robust per-key trend estimation
# ---------------------------------------------------------------------------

_SEN_ORACLE = """
WITH pts AS (
  SELECT user_id, event_id, value,
         CAST(epoch_us(ts) AS DOUBLE) / 3600000000.0e0 AS t_h
  FROM events
),
slopes AS (
  SELECT a.user_id,
         (b.value - a.value) / (b.t_h - a.t_h) AS s
  FROM pts a JOIN pts b
    ON a.user_id = b.user_id
   AND (a.t_h < b.t_h OR (a.t_h = b.t_h AND a.event_id < b.event_id))
  WHERE a.t_h <> b.t_h
)
SELECT user_id,
       CAST(count(*) AS BIGINT)          AS n_pairs,
       round(quantile_cont(s, 0.5), 6)   AS sen_slope
FROM slopes GROUP BY user_id
"""


@_register("theil_sen_trend", _SEN_ORACLE)
def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend: the median of all pairwise slopes of
    (time, value) per user — outlier-resistant where least-squares is
    not (up to ~29% contamination; Theil 1950 / Sen, JASA 1968). Time is integer microseconds cast
    once to fractional hours, so both engines divide identical doubles.

    The pairwise join is partitioned on ``user_id`` — bounded by
    per-key series length (the documented O(k²) of Theil–Sen), never a
    global product; the median is an exact small-group percentile. At
    firehose series lengths run ``theil_sen_sampled`` (below) — O(k·h)
    hash-deterministic partner sampling, pinned against this exact
    kernel in tests/test_scale_twins.py."""
    ev = catalog.load_table(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "event_id",
        "value",
        (
            F.expr("timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01', ts)")
            .cast("double")
            / 3_600_000_000.0
        ).alias("t_h"),
    )
    a = pts.select(
        "user_id",
        F.col("event_id").alias("eid_a"),
        F.col("value").alias("va"),
        F.col("t_h").alias("ta"),
    )
    b = pts.select(
        "user_id",
        F.col("event_id").alias("eid_b"),
        F.col("value").alias("vb"),
        F.col("t_h").alias("tb"),
    )
    slopes = (
        a.join(b, "user_id")
        .where(
            (F.col("ta") < F.col("tb"))
            | ((F.col("ta") == F.col("tb")) & (F.col("eid_a") < F.col("eid_b")))
        )
        .where(F.col("ta") != F.col("tb"))
        .select(
            "user_id",
            ((F.col("vb") - F.col("va")) / (F.col("tb") - F.col("ta")))
            .alias("s"),
        )
    )
    return slopes.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.percentile("s", F.lit(0.5)), 6).alias("sen_slope"),
    )


# ---------------------------------------------------------------------------
# theil_sen_sampled — the O(k·h) scale twin of the exact Theil–Sen
# ---------------------------------------------------------------------------

SEN_SAMPLE_H = 8  # sampled partners per point
# Overflow-safe portable hash: key reduced mod 2^32 BEFORE multiplying,
# multipliers < 2^31 (raw key * multiplier overflows int64 on both
# engines at ids >= ~3.5e9 — the COVERAGE.md traps-table convention)
_SEN_MIX1 = 1540483477   # < 2^31
_SEN_MIX2 = 1103515245   # < 2^31
_SEN_M32 = 4294967296

_SEN_SAMPLED_ORACLE = f"""
WITH pts AS (
  SELECT user_id, event_id, value,
         CAST(epoch_us(ts) AS DOUBLE) / 3600000000.0e0 AS t_h
  FROM events
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY t_h, event_id) AS i,
         count(*) OVER (PARTITION BY user_id) AS k
  FROM pts
),
cand AS (
  SELECT r.user_id, r.i,
         r.i + 1 + ((((r.user_id % {_SEN_M32}) * {_SEN_MIX1} + r.i)
                     % {_SEN_M32})
                    * {_SEN_MIX2} + g.j) % {_SEN_M32} % (r.k - r.i)
           AS partner
  FROM ranked r, generate_series(1, {SEN_SAMPLE_H}) g(j)
  WHERE r.i < r.k
),
pairs AS (
  SELECT DISTINCT c.user_id, c.i, c.partner FROM cand c
),
slopes AS (
  SELECT p.user_id,
         (b.value - a.value) / (b.t_h - a.t_h) AS s
  FROM pairs p
  JOIN ranked a ON a.user_id = p.user_id AND a.i = p.i
  JOIN ranked b ON b.user_id = p.user_id AND b.i = p.partner
  WHERE a.t_h <> b.t_h
)
SELECT user_id,
       CAST(count(*) AS BIGINT)        AS n_pairs_sampled,
       round(quantile_cont(s, 0.5), 6) AS sen_slope_est
FROM slopes GROUP BY user_id
"""


@_register("theil_sen_sampled", _SEN_SAMPLED_ORACLE)
def q_theil_sen_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale twin of ``theil_sen_trend``: instead of all k(k-1)/2
    pairwise slopes, every point samples {SEN_SAMPLE_H} successor
    partners at DETERMINISTIC hash-derived rank offsets (uniform over
    each point's successors), and the robust slope is the median of
    the sampled slopes — the standard randomized Theil–Sen degradation
    (Matoušek 1991 analyses the exact-median variant of this scheme).

    Scale shape: per-key work drops O(k²) → O(k·h). The candidate set
    is built map-side off ONE ranked window (bounded per key), pairs
    materialize through two (user_id, rank) equi-joins — shuffles carry
    O(k·h) rows, never the quadratic slope set. Determinism: the
    partner offset is exact BIGINT mixing identical on both engines, so
    even the SAMPLED estimator hash-matches its oracle; statistical
    closeness to the exact kernel is pinned in
    tests/test_scale_twins.py."""
    ev = catalog.load_table(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "event_id",
        "value",
        (
            F.expr("timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01', ts)")
            .cast("double")
            / 3_600_000_000.0
        ).alias("t_h"),
    )
    w = Window.partitionBy("user_id").orderBy("t_h", "event_id")
    ranked = session.stage(
        pts.withColumn("i", F.row_number().over(w)).withColumn(
            "k", F.count(F.lit(1)).over(Window.partitionBy("user_id"))
        )
    )
    js = F.explode(
        F.sequence(F.lit(1), F.lit(SEN_SAMPLE_H))
    ).alias("j")
    cand = (
        ranked.where(F.col("i") < F.col("k"))
        .select("user_id", "i", "k", js)
        .select(
            "user_id",
            "i",
            (
                F.col("i")
                + 1
                + (
                    (F.col("user_id") % _SEN_M32 * _SEN_MIX1 + F.col("i"))
                    % _SEN_M32
                    * _SEN_MIX2
                    + F.col("j")
                )
                % _SEN_M32
                % (F.col("k") - F.col("i"))
            ).alias("partner"),
        )
        .distinct()
    )
    a = ranked.select(
        F.col("user_id").alias("uid_a"), F.col("i").alias("ia"),
        F.col("value").alias("va"), F.col("t_h").alias("ta"),
    )
    b = ranked.select(
        F.col("user_id").alias("uid_b"), F.col("i").alias("ib"),
        F.col("value").alias("vb"), F.col("t_h").alias("tb"),
    )
    slopes = (
        cand.join(
            a, (F.col("user_id") == F.col("uid_a")) & (F.col("i") == F.col("ia"))
        )
        .join(
            b,
            (F.col("user_id") == F.col("uid_b"))
            & (F.col("partner") == F.col("ib")),
        )
        .where(F.col("ta") != F.col("tb"))
        .select(
            "user_id",
            ((F.col("vb") - F.col("va")) / (F.col("tb") - F.col("ta")))
            .alias("s"),
        )
    )
    return slopes.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs_sampled"),
        F.round(F.percentile("s", F.lit(0.5)), 6).alias("sen_slope_est"),
    )
