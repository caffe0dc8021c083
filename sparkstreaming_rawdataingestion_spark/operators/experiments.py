"""Experimentation / survival / activity-streak analytics over events.

The product teams consuming the reference's landed event streams run
exactly these: A/B readouts with CUPED variance reduction, time-to-
conversion survival curves, and consecutive-day activity streaks.

Scale shape:

- **ab_cuped_adjusted**: facts reduce to one (x, y) row per user; θ and
  the arm readout are two tiny aggregations over that rollup. θ is
  rounded to 6 dp before the adjustment is applied so both engines
  adjust with the identical constant (the covariance quotient is the
  only cross-engine float hazard here — pin the input, not the output).
- **survival_km_curve**: one row per user (duration, event flag) →
  one row per distinct event time; the risk set is an ordered
  cumulative window over that tiny table. The Kaplan-Meier product is
  computed as exp(Σ ln(1−dᵢ/nᵢ)) — a cumulative SUM (prefix-
  reassociation-safe in the ordered window) instead of a cumulative
  product, which neither engine offers as an aggregate.
- **gaps_islands_streaks**: the classic rn-difference islands trick —
  distinct (user, day) activity matrix, day − row_number() island key,
  two grouped aggregations. Pure integer arithmetic, zero float parity
  surface, and the window partitions are bounded by per-user activity.
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
# ab_cuped_adjusted — CUPED variance-reduced experiment readout
# ---------------------------------------------------------------------------

_CUPED_CUTOFF = "2024-01-15 00:00:00"

_CUPED_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(user_id % 2 AS INTEGER) AS arm,
         sum(CASE WHEN ts <  TIMESTAMP '{_CUPED_CUTOFF}'
                  THEN value ELSE 0 END) AS x,
         sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_CUTOFF}'
                  THEN value ELSE 0 END) AS y
  FROM events GROUP BY user_id
),
theta AS (
  SELECT coalesce(round(covar_pop(x, y) / nullif(var_pop(x), 0), 6),
                  0.0e0) AS th,
         avg(x) AS xbar
  FROM per_user
),
adj AS (
  SELECT p.arm, p.y,
         p.y - t.th * (p.x - t.xbar) AS y_adj
  FROM per_user p CROSS JOIN theta t
)
SELECT arm,
       CAST(count(*) AS BIGINT) AS n_users,
       round(avg(y), 6)        AS mean_y,
       round(avg(y_adj), 6)    AS mean_y_adj,
       round(var_pop(y_adj) / nullif(var_pop(y), 0), 6) AS var_ratio
FROM adj GROUP BY arm
"""


@_register("ab_cuped_adjusted", _CUPED_ORACLE)
def q_ab_cuped_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted A/B readout: per-user pre-period covariate x and
    post-period metric y, θ = cov(x,y)/var(x) fitted on all users
    (rounded to 6 dp before use — both engines then adjust with the
    identical constant), per-arm adjusted means and the achieved
    variance-reduction ratio. Assignment is the deterministic
    ``user_id % 2`` hash arm. (CUPED: Deng, Xu, Kohavi & Walker,
    "Improving the Sensitivity of Online Controlled Experiments by
    Utilizing Pre-Experiment Data", WSDM 2013.)"""
    ev = catalog.load_table(spark, sf_dir, "events")
    cutoff = F.lit(_CUPED_CUTOFF).cast("timestamp_ntz")
    # Staged: the per-user rollup feeds the θ fit AND the adjustment —
    # one fact scan
    per_user = session.stage(
        ev.groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("ts") < cutoff, F.col("value")).otherwise(0.0)
            ).alias("x"),
            F.sum(
                F.when(F.col("ts") >= cutoff, F.col("value")).otherwise(0.0)
            ).alias("y"),
        )
        .select((F.col("user_id") % 2).cast("int").alias("arm"), "x", "y")
    )
    # try_divide + coalesce (mirrored by nullif/coalesce in the oracle):
    # a degenerate slice with a CONSTANT pre-period covariate has
    # var_pop(x) = 0 — under ANSI mode a raw `/` would raise; the
    # statistically right fallback is θ = 0, i.e. CUPED degenerates to
    # the unadjusted readout
    theta = per_user.agg(
        F.coalesce(
            F.round(
                F.try_divide(F.covar_pop("x", "y"), F.var_pop("x")), 6
            ),
            F.lit(0.0),
        ).alias("th"),
        F.avg("x").alias("xbar"),
    )
    adj = per_user.crossJoin(F.broadcast(theta)).select(
        "arm",
        "y",
        (F.col("y") - F.col("th") * (F.col("x") - F.col("xbar")))
        .alias("y_adj"),
    )
    return adj.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.round(F.avg("y"), 6).alias("mean_y"),
        F.round(F.avg("y_adj"), 6).alias("mean_y_adj"),
        F.round(
            F.try_divide(F.var_pop("y_adj"), F.var_pop("y")), 6
        ).alias("var_ratio"),
    )


# ---------------------------------------------------------------------------
# survival_km_curve — Kaplan-Meier time-to-conversion
# ---------------------------------------------------------------------------

_KM_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         min(ts) AS t0,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_conv,
         max(ts) AS t_last
  FROM events GROUP BY user_id
),
durations AS (
  SELECT user_id,
         CASE WHEN t_conv IS NOT NULL
              THEN CAST(floor(epoch(t_conv - t0) / 3600.0) AS BIGINT)
              ELSE CAST(floor(epoch(t_last - t0) / 3600.0) AS BIGINT)
         END AS t_hours,
         CASE WHEN t_conv IS NOT NULL THEN 1 ELSE 0 END AS converted
  FROM per_user
),
n_total AS (SELECT count(*) AS n FROM durations),
by_t AS (
  SELECT t_hours,
         sum(converted)          AS d,
         count(*)                AS removed
  FROM durations GROUP BY t_hours
),
risk AS (
  SELECT t_hours, d,
         (SELECT n FROM n_total)
           - coalesce(sum(removed) OVER (ORDER BY t_hours
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), 0) AS n_risk
  FROM by_t
)
SELECT t_hours, CAST(n_risk AS BIGINT) AS n_risk, CAST(d AS BIGINT) AS d,
       CASE WHEN max(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
                 OVER (ORDER BY t_hours ROWS UNBOUNDED PRECEDING) = 1
            THEN 0.0e0
            ELSE round(exp(sum(CASE WHEN d < n_risk
                               THEN ln(1.0e0 - CAST(d AS DOUBLE)
                                       / CAST(n_risk AS DOUBLE)) END)
                           OVER (ORDER BY t_hours
                                 ROWS UNBOUNDED PRECEDING)), 6)
       END AS survival
FROM risk
WHERE d > 0
"""


@_register("survival_km_curve", _KM_ORACLE)
def q_survival_km_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-first-purchase: per-user duration in hours
    from first activity (censored at last activity when no purchase),
    risk sets from one ordered cumulative window over the duration-
    grouped rollup, survival as exp of the cumulative Σ ln(1−d/n)
    (prefix sums reassociate safely; a floating cumulative *product*
    would not be available as a window aggregate in either engine).
    (Kaplan & Meier, "Nonparametric Estimation from Incomplete
    Observations", JASA 1958.)"""
    ev = catalog.load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("t_conv"),
        F.max("ts").alias("t_last"),
    )
    # Staged: the duration table feeds the N scalar AND the event-time
    # rollup — one fact scan
    durations = session.stage(per_user.select(
        # timestampdiff(HOUR): integer microsecond arithmetic on NTZ —
        # truncating division == the oracle's floor(epoch/3600) for the
        # positive durations here, with no timezone surface at all
        F.expr(
            "timestampdiff(HOUR, t0, coalesce(t_conv, t_last))"
        ).cast("long").alias("t_hours"),
        F.when(F.col("t_conv").isNotNull(), 1).otherwise(0).alias(
            "converted"
        ),
    ))
    n_total = durations.agg(F.count(F.lit(1)).alias("n"))
    by_t = durations.groupBy("t_hours").agg(
        F.sum("converted").alias("d"), F.count(F.lit(1)).alias("removed")
    )
    w_prev = Window.orderBy("t_hours").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = by_t.crossJoin(F.broadcast(n_total)).select(
        "t_hours",
        "d",
        (
            F.col("n")
            - F.coalesce(F.sum("removed").over(w_prev), F.lit(0))
        ).alias("n_risk"),
    )
    w_cum = Window.orderBy("t_hours").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # once d == n_risk (everyone remaining converts) survival is exactly
    # 0 and ln(1−d/n) is undefined — the cumulative zero flag pins it
    hit_zero = (
        F.max(F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0))
        .over(w_cum)
        == 1
    )
    log_term = F.when(
        F.col("d") < F.col("n_risk"),
        F.log(
            F.lit(1.0)
            - F.col("d").cast("double") / F.col("n_risk").cast("double")
        ),
    )
    return risk.select(
        "t_hours",
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("d"),
        F.when(hit_zero, F.lit(0.0))
        .otherwise(F.round(F.exp(F.sum(log_term).over(w_cum)), 6))
        .alias("survival"),
    ).where(F.col("d") > 0)


# ---------------------------------------------------------------------------
# gaps_islands_streaks — consecutive-day activity islands
# ---------------------------------------------------------------------------

_STREAK_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
islands AS (
  SELECT user_id, day,
         day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                    AS INTEGER) AS grp
  FROM days
),
runs AS (
  SELECT user_id, grp, count(*) AS run_len
  FROM islands GROUP BY user_id, grp
)
SELECT user_id,
       CAST(sum(run_len) AS BIGINT) AS n_active_days,
       CAST(max(run_len) AS BIGINT) AS longest_streak,
       CAST(count(*) AS BIGINT)     AS n_islands
FROM runs GROUP BY user_id
"""


@_register("gaps_islands_streaks", _STREAK_ORACLE)
def q_gaps_islands_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-day activity streaks per user via the rn-difference
    islands trick: distinct active days, ``day − row_number()`` is
    constant within a consecutive run, two grouped counts give run
    lengths and island counts. All integer/date arithmetic."""
    ev = catalog.load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.select(
        "user_id",
        "day",
        F.date_sub("day", F.row_number().over(w)).alias("grp"),
    )
    runs = islands.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return runs.groupBy("user_id").agg(
        F.sum("run_len").cast("long").alias("n_active_days"),
        F.max("run_len").cast("long").alias("longest_streak"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
    )


# ---------------------------------------------------------------------------
# welch_ttest_report — two-sample mean comparison (the A/B significance)
# ---------------------------------------------------------------------------

_TTEST_ORACLE = """
WITH arms AS (
  SELECT CAST(user_id % 2 AS INTEGER) AS arm, value FROM events
),
s AS (
  SELECT arm, count(*) AS n, avg(value) AS mean, var_samp(value) AS var
  FROM arms GROUP BY arm
),
w AS (
  SELECT a.n AS n0, a.mean AS mean0, a.var AS var0,
         b.n AS n1, b.mean AS mean1, b.var AS var1,
         a.var / a.n + b.var / b.n AS se2
  FROM s a JOIN s b ON a.arm = 0 AND b.arm = 1
)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       round(mean0, 6) AS mean0, round(mean1, 6) AS mean1,
       round((mean1 - mean0) / nullif(sqrt(se2), 0), 6) AS t_stat,
       round(se2 * se2
             / nullif((var0 / n0) * (var0 / n0) / nullif(n0 - 1, 0)
                + (var1 / n1) * (var1 / n1) / nullif(n1 - 1, 0), 0),
             6) AS welch_df
FROM w
"""


@_register("welch_ttest_report", _TTEST_ORACLE)
def q_welch_ttest_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t: the significance readout
    behind the CUPED-adjusted means above — t statistic and the
    Welch–Satterthwaite degrees of freedom, computed from ONE grouped
    (n, mean, var) pass per arm (sufficient statistics; raw values
    never leave their partitions twice)."""
    ev = catalog.load_table(spark, sf_dir, "events")
    s = (
        ev.select(
            (F.col("user_id") % 2).cast("int").alias("arm"), "value"
        )
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("mean"),
            F.var_samp("value").alias("var"),
        )
    )
    a = s.where(F.col("arm") == 0).select(
        F.col("n").alias("n0"), F.col("mean").alias("mean0"),
        F.col("var").alias("var0"),
    )
    b = s.where(F.col("arm") == 1).select(
        F.col("n").alias("n1"), F.col("mean").alias("mean1"),
        F.col("var").alias("var1"),
    )
    w = a.crossJoin(b).withColumn(
        "se2", F.col("var0") / F.col("n0") + F.col("var1") / F.col("n1")
    )
    n0, n1 = F.col("n0"), F.col("n1")
    v0n, v1n = F.col("var0") / n0, F.col("var1") / n1
    # try_divide on every data-dependent denominator (mirrored by nullif
    # in the oracle): two zero-variance arms give se2 = 0, a single-row
    # arm gives n−1 = 0 — under ANSI mode raw `/` raises where the
    # report should emit NULL (no defined t / df)
    return w.select(
        n0.cast("long").alias("n0"),
        n1.cast("long").alias("n1"),
        F.round("mean0", 6).alias("mean0"),
        F.round("mean1", 6).alias("mean1"),
        F.round(
            F.try_divide(
                F.col("mean1") - F.col("mean0"), F.sqrt(F.col("se2"))
            ),
            6,
        ).alias("t_stat"),
        F.round(
            F.try_divide(
                F.col("se2") * F.col("se2"),
                F.try_divide(v0n * v0n, n0 - 1)
                + F.try_divide(v1n * v1n, n1 - 1),
            ),
            6,
        ).alias("welch_df"),
    )


# ---------------------------------------------------------------------------
# chisq_independence_test — contingency-table independence
# ---------------------------------------------------------------------------

_CHISQ_ORACLE = """
WITH obs AS (
  SELECT event_type, CAST(user_id % 2 AS INTEGER) AS arm,
         count(*) AS o
  FROM events GROUP BY 1, 2
),
margins AS (
  SELECT o.event_type, o.arm, o.o,
         sum(o.o) OVER (PARTITION BY o.event_type) AS row_t,
         sum(o.o) OVER (PARTITION BY o.arm)        AS col_t,
         sum(o.o) OVER ()                          AS n
  FROM obs o
),
cells AS (
  SELECT CAST(row_t AS DOUBLE) * col_t / n AS e, o FROM margins
)
SELECT round(sum((o - e) * (o - e) / e), 6) AS chi2,
       CAST((SELECT count(DISTINCT event_type) - 1 FROM obs)
            * (SELECT count(DISTINCT arm) - 1 FROM obs) AS BIGINT) AS dof
FROM cells
"""


@_register("chisq_independence_test", _CHISQ_ORACLE)
def q_chisq_independence_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson χ² test of independence between event type and the hash
    arm (the guardrail that catches broken randomization — sample-ratio
    mismatch shows up here before any metric moves). One contingency
    aggregation; expected counts from margin windows over the
    |types|×|arms| table."""
    ev = catalog.load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", (F.col("user_id") % 2).cast("int").alias("arm")
    ).agg(F.count(F.lit(1)).alias("o"))
    margins = obs.select(
        "event_type",
        "arm",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("row_t"),
        F.sum("o").over(Window.partitionBy("arm")).alias("col_t"),
        F.sum("o").over(
            Window.partitionBy()
        ).alias("n"),
    )
    e = F.col("row_t").cast("double") * F.col("col_t") / F.col("n")
    cells = margins.select(((F.col("o") - e) * (F.col("o") - e) / e).alias(
        "term"
    ))
    dims = obs.agg(
        (
            (F.countDistinct("event_type") - 1)
            * (F.countDistinct("arm") - 1)
        ).cast("long").alias("dof")
    )
    return cells.agg(F.round(F.sum("term"), 6).alias("chi2")).crossJoin(
        F.broadcast(dims)
    )


# ---------------------------------------------------------------------------
# bootstrap_mean_ci — deterministic Poisson bootstrap for metric CIs
# ---------------------------------------------------------------------------

BOOT_B = 200  # bootstrap replicas
# Overflow-safe portable hash (the COVERAGE.md traps-table convention:
# reduce the key mod 2^32 BEFORE multiplying, multipliers < 2^31 —
# (2^32-1)*(2^31-1) still fits int64, while key*multiplier on a raw
# 64-bit id overflows both engines at ids ≥ ~3.5e9, i.e. at exactly
# the 100 TB scale these ops are documented for).
_BOOT_MIX1 = 1540483477   # < 2^31
_BOOT_MIX2 = 1103515245   # < 2^31
_BOOT_M32 = 4294967296
# Poisson(1) CDF thresholds scaled to 2^32 (w = 0..4, else 5):
# P(0)=.36788, P(<=1)=.73576, P(<=2)=.91970, P(<=3)=.98101, P(<=4)=.99634
_BOOT_T = (1580030168, 3160060337, 3950075421, 4213413783, 4279248374)

_BOOT_W_SQL = f"""
  CASE WHEN h < {_BOOT_T[0]} THEN 0
       WHEN h < {_BOOT_T[1]} THEN 1
       WHEN h < {_BOOT_T[2]} THEN 2
       WHEN h < {_BOOT_T[3]} THEN 3
       WHEN h < {_BOOT_T[4]} THEN 4
       ELSE 5 END
"""

_BOOT_ORACLE = f"""
WITH u AS (SELECT event_id, value FROM events),
rep AS (
  SELECT g.b,
         (((u.event_id % {_BOOT_M32}) * {_BOOT_MIX1} + g.b) % {_BOOT_M32}
          * {_BOOT_MIX2} + u.event_id % {_BOOT_M32}) % {_BOOT_M32} AS h,
         u.value
  FROM u, generate_series(1, {BOOT_B}) g(b)
),
w AS (SELECT b, value, {_BOOT_W_SQL} AS w FROM rep),
means AS (
  SELECT b,
         sum(CAST(w * value AS DECIMAL(32, 12)))
           / nullif(sum(w), 0) AS m
  FROM w GROUP BY b
)
SELECT CAST(count(*) AS BIGINT)                  AS n_replicas,
       round(avg(CAST(m AS DOUBLE)), 6)          AS boot_mean,
       round(quantile_cont(CAST(m AS DOUBLE), 0.025), 6) AS ci_lo,
       round(quantile_cont(CAST(m AS DOUBLE), 0.975), 6) AS ci_hi
FROM means
"""


def boot_weighted_replicas(u: DataFrame) -> DataFrame:
    """(event_id, value) → (b, value, w): the deterministic Poisson(1)
    replica weights, exploded map-side. Shared verbatim by the batch
    query and the streaming twin (streaming/bootstrap_stream.py) so the
    resampling is identical in both execution modes."""
    rep = u.select(
        "event_id",
        "value",
        F.explode(F.sequence(F.lit(1), F.lit(BOOT_B))).alias("b"),
    ).select(
        "b",
        "value",
        (
            (
                (F.col("event_id") % _BOOT_M32 * _BOOT_MIX1 + F.col("b"))
                % _BOOT_M32
                * _BOOT_MIX2
                + F.col("event_id") % _BOOT_M32
            )
            % _BOOT_M32
        ).alias("h"),
    )
    w = (
        F.when(F.col("h") < _BOOT_T[0], 0)
        .when(F.col("h") < _BOOT_T[1], 1)
        .when(F.col("h") < _BOOT_T[2], 2)
        .when(F.col("h") < _BOOT_T[3], 3)
        .when(F.col("h") < _BOOT_T[4], 4)
        .otherwise(5)
    )
    return rep.select("b", "value", w.alias("w"))


def boot_replica_sums(weighted: DataFrame) -> DataFrame:
    """(b, value, w) → (b, swv, sw): the per-replica running sums. Both
    are exact (DECIMAL / integer), so they are mergeable across
    micro-batches — the property the streaming twin's state relies on."""
    return weighted.groupBy("b").agg(
        F.sum((F.col("w") * F.col("value")).cast("decimal(32,12)")).alias(
            "swv"
        ),
        F.sum("w").alias("sw"),
    )


def boot_ci_from_sums(sums: DataFrame) -> DataFrame:
    """(b, swv, sw) → the 1-row CI report (same math as the oracle)."""
    means = sums.select(
        (F.col("swv") / F.nullif(F.col("sw"), F.lit(0))).alias("m")
    )
    m = F.col("m").cast("double")
    return means.agg(
        F.count(F.lit(1)).cast("long").alias("n_replicas"),
        F.round(F.avg(m), 6).alias("boot_mean"),
        F.round(F.percentile(m, F.lit(0.025)), 6).alias("ci_lo"),
        F.round(F.percentile(m, F.lit(0.975)), 6).alias("ci_hi"),
    )


@_register("bootstrap_mean_ci", _BOOT_ORACLE)
def q_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap CI for the mean event value via the POISSON
    bootstrap (Chamandy et al. 2012, "Estimating uncertainty for
    massive data streams" — the resampling scheme built for exactly
    this setting): each unit's weight in replica b is an independent
    Poisson(1) draw, realized here from a DETERMINISTIC hash of
    (event_id, b) against the scaled Poisson CDF, so the whole
    resampling is replayable and engine-exact. Replica sums accumulate
    in DECIMAL (reduction-order-exact), the replica table is B rows,
    and the CI is an exact percentile over it.

    Scale shape: the B-fanout happens map-side (explode feeding a
    partial aggregate in the same stage — no shuffle amplification);
    the only shuffle carries B partial sums per map task. This is the
    canonical cluster bootstrap: no per-replica pass over the data,
    one pass total. The same exact-sum decomposition makes the state
    mergeable across micro-batches — streaming/bootstrap_stream.py is
    the incremental twin built on these helpers."""
    ev = catalog.load_table(spark, sf_dir, "events")
    u = ev.select("event_id", "value")
    return boot_ci_from_sums(boot_replica_sums(boot_weighted_replicas(u)))
