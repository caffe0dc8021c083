"""ML feature-engineering operators over the event stream — the
feature-prep layer between the warehouse tables the reference's ingest
lands (RawDataIngestion.java:134-152) and a model trainer: lagged/rolling
per-key features, leakage-safe target encoding, and per-key rank
normalization.

Scale shape: every operator is one (or two stacked) per-key window over
the same partitioning — per-key local sorts, exchanges reused, no global
sort, no join against the fact table except a 1-row global-prior
broadcast. Rolling/category sums accumulate in DECIMAL so results are
exact under any partitioning (the stats_moments_pack engineering); only
final divisions are float.
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
# ml_lag_features — lagged + rolling per-key model features
# ---------------------------------------------------------------------------

_ROLL_N = 5  # rolling frame: current + 4 preceding rows

_LAG_ORACLE = f"""
WITH v AS (
  SELECT event_id, user_id, ts,
         CAST(value AS DECIMAL(18,6)) AS dv, value
  FROM events
),
f AS (
  SELECT event_id, user_id, value,
         lag(value)    OVER w AS lag1,
         lag(value, 2) OVER w AS lag2,
         CAST(floor(epoch(ts - lag(ts) OVER w)) AS BIGINT) AS delta_sec,
         CAST(count(*) OVER r AS BIGINT)  AS roll_n,
         sum(dv)       OVER r AS rsum,
         sum(dv * dv)  OVER r AS rsum2
  FROM v
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
         r AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {_ROLL_N - 1} PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, value, lag1, lag2, delta_sec, roll_n,
       round(CAST(rsum AS DOUBLE) / roll_n, 6) AS roll_mean,
       CASE WHEN roll_n > 1 THEN round(sqrt(greatest(
             (CAST(rsum2 AS DOUBLE)
              - CAST(rsum AS DOUBLE) * CAST(rsum AS DOUBLE) / roll_n)
             / (roll_n - 1), 0.0e0)), 6) END AS roll_std
FROM f
"""


@_register("ml_lag_features", _LAG_ORACLE)
def q_ml_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key lag/rolling features: lag-1/lag-2 values, seconds since
    the previous event, and the rolling {_ROLL_N}-row mean/stddev — the
    standard feature block for sequence models over sensor streams.

    Both window specs share one (user_id × time) partitioning — a single
    exchange and sort feed every feature column. Rolling sums accumulate
    in DECIMAL(18,6) (and its square in the widened product scale), so
    mean/std are exact in any partition layout; the variance is the
    explicit (Σx² − (Σx)²/n)/(n−1) double expression, clamped at 0 before
    sqrt, identical algebra on both engines."""
    ev = catalog.load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = w.rowsBetween(-(_ROLL_N - 1), Window.currentRow)
    dv = F.col("value").cast("decimal(18,6)")
    base = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("lag1"),
        F.lag("value", 2).over(w).alias("lag2"),
        (F.col("ts") - F.lag("ts").over(w)).cast("long").alias("delta_sec"),
        F.count(F.lit(1)).over(r).alias("roll_n"),
        F.sum(dv).over(r).alias("rsum"),
        F.sum(dv * dv).over(r).alias("rsum2"),
    )
    rsum_d = F.col("rsum").cast("double")
    var = (
        F.col("rsum2").cast("double") - rsum_d * rsum_d / F.col("roll_n")
    ) / (F.col("roll_n") - 1)
    return base.select(
        "event_id",
        "user_id",
        "value",
        "lag1",
        "lag2",
        "delta_sec",
        "roll_n",
        F.round(rsum_d / F.col("roll_n"), 6).alias("roll_mean"),
        F.when(
            F.col("roll_n") > 1,
            F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 6),
        ).alias("roll_std"),
    )


# ---------------------------------------------------------------------------
# target_encode_loo — leakage-safe smoothed target encoding
# ---------------------------------------------------------------------------

_TE_SMOOTH = 10  # pseudo-observations of the global prior

_TE_ORACLE = f"""
WITH v AS (
  SELECT event_id, event_type, CAST(value AS DECIMAL(18,6)) AS dv, value
  FROM events WHERE value IS NOT NULL
),
g AS (
  SELECT CAST(sum(dv) AS DOUBLE) / count(*) AS prior FROM v
),
c AS (
  SELECT event_id, event_type, value,
         sum(dv)  OVER (PARTITION BY event_type) AS cat_sum,
         count(*) OVER (PARTITION BY event_type) AS cat_n
  FROM v
)
SELECT event_id, event_type,
       round((CAST(cat_sum AS DOUBLE) - value + g.prior * {_TE_SMOOTH})
             / (cat_n - 1 + {_TE_SMOOTH}), 6) AS te
FROM c, g
"""


@_register("target_encode_loo", _TE_ORACLE)
def q_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe target encoding: each row's category is encoded as
    the smoothed mean target of OTHER rows in the category
    ((Σ_cat − own) + m·prior) / (n_cat − 1 + m) — leave-one-out plus
    m = {_TE_SMOOTH} pseudo-observations of the global prior, the
    standard high-cardinality categorical feature that a naive
    category-mean would leak the row's own target into.

    Plan: category sums/counts ride one window over the category key
    (exact DECIMAL accumulation), the global prior is a 1-row broadcast,
    and the LOO arithmetic is map-side double algebra — no per-row
    subquery, no self-join."""
    ev = catalog.load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    dv = F.col("value").cast("decimal(18,6)")
    g = ev.agg(
        (F.sum(dv).cast("double") / F.count(F.lit(1))).alias("prior")
    )
    wc = Window.partitionBy("event_type")
    c = ev.select(
        "event_id",
        "event_type",
        "value",
        F.sum(dv).over(wc).alias("cat_sum"),
        F.count(F.lit(1)).over(wc).alias("cat_n"),
    )
    te = (
        F.col("cat_sum").cast("double")
        - F.col("value")
        + F.col("prior") * F.lit(_TE_SMOOTH)
    ) / (F.col("cat_n") - 1 + F.lit(_TE_SMOOTH))
    return c.crossJoin(F.broadcast(g)).select(
        "event_id", "event_type", F.round(te, 6).alias("te")
    )


# ---------------------------------------------------------------------------
# rank_normalize — per-key percent-rank normalization
# ---------------------------------------------------------------------------

_RANKNORM_ORACLE = """
SELECT event_id, event_type,
       round(percent_rank() OVER (PARTITION BY event_type
                                  ORDER BY value), 6) AS pr
FROM events WHERE value IS NOT NULL
"""


@_register("rank_normalize", _RANKNORM_ORACLE)
def q_rank_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank normalization per series: value → percent_rank in [0, 1] —
    the distribution-free rescaling that makes heterogeneous sensor
    series comparable (robust to outliers where min-max scaling is not;
    ties share a rank, so the map is deterministic). One window per
    series key, per-key local sorts only."""
    ev = catalog.load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    w = Window.partitionBy("event_type").orderBy("value")
    return ev.select(
        "event_id",
        "event_type",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
    )


# ---------------------------------------------------------------------------
# mutual_information_features — filter-method feature selection
# ---------------------------------------------------------------------------

# (name, shared SQL expression) — the reduced fixture schema has one
# native categorical besides the label, so the other candidates are the
# standard derived discretizations; every expression is valid verbatim
# on both engines and casts to STRING so the melted value column has
# one type
_MI_FEATURES = (
    ("l_linestatus", "CAST(l_linestatus AS STRING)"),
    ("qty_band", "CAST(CAST(floor(l_quantity / 10) AS INT) AS STRING)"),
    ("ship_month", "CAST(month(l_shipdate) AS STRING)"),
)

_MI_CELLS_SQL = " UNION ALL ".join(
    f"SELECT '{name}' AS feature, {expr} AS val, l_returnflag AS label"
    " FROM lineitem"
    for name, expr in _MI_FEATURES
)

_MI_ORACLE = f"""
WITH melted AS ({_MI_CELLS_SQL}),
joint AS (
  SELECT feature, val, label, count(*) AS c
  FROM melted GROUP BY 1, 2, 3
),
cells AS (
  SELECT feature, c,
         sum(c) OVER (PARTITION BY feature, val)   AS cx,
         sum(c) OVER (PARTITION BY feature, label) AS cy,
         sum(c) OVER (PARTITION BY feature)        AS n
  FROM joint
),
mi AS (
  SELECT feature,
         sum(CAST(round((CAST(c AS DOUBLE) / n)
                        * ln(CAST(c * n AS DOUBLE)
                             / CAST(cx * cy AS DOUBLE)), 9)
                  AS DECIMAL(18,9))) AS mi
  FROM cells GROUP BY feature
),
lbl AS (
  SELECT feature, label, sum(c) AS cy, sum(sum(c)) OVER (PARTITION BY feature) AS n
  FROM joint GROUP BY feature, label
),
h AS (
  SELECT feature,
         sum(CAST(round(-(CAST(cy AS DOUBLE) / n)
                        * ln(CAST(cy AS DOUBLE) / n), 9)
                  AS DECIMAL(18,9))) AS h_label
  FROM lbl GROUP BY feature
)
SELECT mi.feature,
       round(CAST(mi.mi AS DOUBLE), 6) AS mi,
       round(CAST(h.h_label AS DOUBLE), 6) AS label_entropy,
       round(CAST(mi.mi AS DOUBLE) / nullif(CAST(h.h_label AS DOUBLE), 0), 6)
         AS nmi
FROM mi JOIN h ON h.feature = mi.feature
"""


@_register("mutual_information_features", _MI_ORACLE)
def q_mutual_information_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Filter-method feature selection: mutual information I(X; Y) in
    nats between each candidate categorical feature and the label
    (``l_returnflag``), plus the label entropy H(Y) and the normalized
    score I/H — the standard pre-training relevance ranking that needs
    no model fit (Cover & Thomas, Elements of Information Theory, ch.2).

    Plan: ONE fact scan — features melt map-side into (feature, value,
    label) rows (a 3× row explode that partial-aggregates before the
    shuffle), so adding a feature never adds a scan (the oracle's
    UNION ALL per feature is the semantic spec, not the plan). All
    marginals are windows over the joint-count table, which is bounded
    by Σ|dom(X)|·|dom(Y)| cells (~50 rows here) regardless of fact
    cardinality. Per-cell MI terms round to 9 dp and accumulate in
    DECIMAL — order-independent sums, exact cross-engine parity; ln
    operands are exact-integer ratios so both engines round the same
    double."""
    li = catalog.load_table(spark, sf_dir, "lineitem")
    melted = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("feature"),
                        F.expr(expr).alias("val"),
                    )
                    for name, expr in _MI_FEATURES
                ]
            )
        ).alias("fv"),
        F.col("l_returnflag").alias("label"),
    ).select("fv.feature", "fv.val", "label")
    joint = melted.groupBy("feature", "val", "label").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_feature = Window.partitionBy("feature")
    cells = joint.select(
        "feature",
        "c",
        F.sum("c").over(Window.partitionBy("feature", "val")).alias("cx"),
        F.sum("c").over(Window.partitionBy("feature", "label")).alias("cy"),
        F.sum("c").over(per_feature).alias("n"),
    )
    term = F.round(
        (F.col("c").cast("double") / F.col("n"))
        * F.log(
            (F.col("c") * F.col("n")).cast("double")
            / (F.col("cx") * F.col("cy")).cast("double")
        ),
        9,
    ).cast("decimal(18,9)")
    mi = cells.groupBy("feature").agg(F.sum(term).alias("mi"))
    lbl = joint.groupBy("feature", "label").agg(F.sum("c").alias("cy"))
    lbl = lbl.withColumn("n", F.sum("cy").over(per_feature))
    h_term = F.round(
        -(F.col("cy").cast("double") / F.col("n"))
        * F.log(F.col("cy").cast("double") / F.col("n")),
        9,
    ).cast("decimal(18,9)")
    h = lbl.groupBy("feature").agg(F.sum(h_term).alias("h_label"))
    return mi.join(h, "feature").select(
        "feature",
        F.round(F.col("mi").cast("double"), 6).alias("mi"),
        F.round(F.col("h_label").cast("double"), 6).alias("label_entropy"),
        F.round(
            F.try_divide(
                F.col("mi").cast("double"), F.col("h_label").cast("double")
            ),
            6,
        ).alias("nmi"),
    )
