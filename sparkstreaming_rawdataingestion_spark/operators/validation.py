"""Data-quality validation, SCD2 dimension history, time-series anomaly
detection, and key-skew diagnostics — the guardrail layer a production
pipeline runs before/around ingestion (generalizes the reference's
implicit trust in upstream data, RawDataIngestion.java:113-126, where a
single malformed record killed the batch, into declared + measured
expectations).

Scale design:

- **data_quality_checks**: every single-table constraint (completeness,
  uniqueness, range, accepted-values) folds into ONE conditional
  aggregation over ONE scan — a 100 TB audit costs a single reduce, not
  one job per rule (the Deequ design: arXiv 1812.04577 computes all
  constraint metrics in a shared scan). The referential-integrity rule
  is the only join, and the dim side broadcasts.
- **scd2_dimension_history**: changelog → type-2 validity intervals via
  two window passes over the SAME (key × time) partitioning — Catalyst
  reuses one exchange, so history reconstruction is one shuffle no
  matter how many snapshots it serves.
- **timeseries_anomaly_zscore**: per-key moments from decimal partial
  sums (exact, order-independent — safe under AQE re-partitioning),
  broadcast back over the raw scan; nothing quadratic, no window over
  the full table.
- **key_skew_report**: the diagnostic that decides salting/AQE-skew
  strategy upstream: per-key counts are map-side-combined, the total
  rides a broadcast scalar, and top-k is TakeOrderedAndProject (never a
  global sort).
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
# data_quality_checks — Deequ-style constraint suite in one scan
# ---------------------------------------------------------------------------

# (check_name, violation predicate as Spark SQL expr over ``orders``)
_ORDER_CHECKS = (
    ("complete_custkey", "o_custkey IS NULL"),
    ("positive_totalprice", "o_totalprice <= 0"),
    ("accepted_status", "o_orderstatus NOT IN ('F','O','P')"),
    ("price_below_cap", "o_totalprice > 25000"),
    ("date_in_window", "o_orderdate > TIMESTAMP '1998-12-31 00:00:00'"),
)


def check_suite(df: DataFrame, checks, unique_key: str) -> DataFrame:
    """All declared constraints as ONE conditional aggregation (single
    scan, single reduce), melted map-side into one row per check; the
    uniqueness rule rides the same pass via count - count_distinct."""
    aggs = [
        F.count(F.lit(1)).alias("__n"),
        (F.count(F.lit(1)) - F.count_distinct(F.col(unique_key)))
        .cast("long")
        .alias("__dup"),
    ]
    for name, pred in checks:
        aggs.append(
            F.sum(F.when(F.expr(pred), 1).otherwise(0))
            .cast("long")
            .alias(f"__{name}")
        )
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(f"unique_{unique_key}").alias("check_name"),
            F.col("__n").alias("n_rows"),
            F.col("__dup").alias("n_violations"),
        )
    ]
    for name, _ in checks:
        rows.append(
            F.struct(
                F.lit(name).alias("check_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__{name}").alias("n_violations"),
            )
        )
    melted = wide.select(F.explode(F.array(*rows)).alias("c")).select("c.*")
    return melted.withColumn("passed", F.col("n_violations") == 0)


_QUALITY_ORACLE = (
    "\nUNION ALL\n".join(
        ["""
SELECT 'unique_o_orderkey' AS check_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_violations
FROM orders"""]
        + [
            f"""
SELECT '{name}' AS check_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
FROM orders"""
            for name, pred in _ORDER_CHECKS
        ]
        + ["""
SELECT 'ri_custkey_in_customer' AS check_name,
       CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_violations
FROM orders o
WHERE o.o_custkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)"""]
    )
)

_QUALITY_ORACLE = f"""
SELECT check_name, n_rows, n_violations, n_violations = 0 AS passed
FROM ({_QUALITY_ORACLE})
"""


@_register("data_quality_checks", _QUALITY_ORACLE)
def q_data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint suite over ``orders``: completeness, uniqueness, value
    ranges, accepted values (one shared scan), plus referential
    integrity against ``customer`` (broadcast left-anti count)."""
    orders = catalog.load_table(spark, sf_dir, "orders")
    customer = catalog.load_table(spark, sf_dir, "customer")

    suite = check_suite(orders, _ORDER_CHECKS, unique_key="o_orderkey")

    # Referential integrity: fact-side orphans. The dim key set is small
    # relative to the fact (always broadcast-able after distinct).
    orphans = (
        orders.where(F.col("o_custkey").isNotNull())
        .join(
            F.broadcast(customer.select("c_custkey").distinct()),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
    )
    n_rows = orders.agg(F.count(F.lit(1)).alias("n_rows"))
    ri = (
        orphans.crossJoin(F.broadcast(n_rows))
        .select(
            F.lit("ri_custkey_in_customer").alias("check_name"),
            "n_rows",
            "n_violations",
        )
        .withColumn("passed", F.col("n_violations") == 0)
    )
    return suite.unionByName(ri)


# ---------------------------------------------------------------------------
# scd2_dimension_history — changelog → type-2 validity intervals
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
WITH changes AS (
  SELECT user_id, event_id, ts, value,
         lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
versions AS (
  SELECT user_id, event_id, value, ts AS effective_from
  FROM changes
  WHERE rn = 1 OR value IS DISTINCT FROM prev
)
SELECT user_id, event_id, value,
       effective_from,
       lead(effective_from) OVER (PARTITION BY user_id ORDER BY effective_from, event_id)
         AS effective_to,
       lead(effective_from) OVER (PARTITION BY user_id ORDER BY effective_from, event_id)
         IS NULL AS is_current
FROM versions
"""


@_register("scd2_dimension_history", _SCD2_ORACLE)
def q_scd2_dimension_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension reconstruction from a changelog:
    collapse no-op updates (value unchanged vs previous version,
    null-safe — a genuine transition to or from NULL opens a new version,
    a NULL→NULL repeat does not), then close each version with the next
    one's start. All window passes share the (user_id × time) sort, so
    Catalyst reuses one exchange — history reconstruction is ONE shuffle
    (the batch twin of ``cdc_latest_per_key``, which keeps only the open
    version)."""
    ev = catalog.load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            "value",
            F.lag("value").over(w).alias("prev"),
            F.row_number().over(w).alias("rn"),
        )
        # first version always opens; afterwards a null-safe inequality
        # (NOT value <=> prev) so NULL-valued changelogs behave
        .where((F.col("rn") == 1) | ~F.col("value").eqNullSafe(F.col("prev")))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "event_id",
        "value",
        F.col("ts").alias("effective_from"),
        F.lead("ts").over(w2).alias("effective_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# timeseries_anomaly_zscore — per-key z-score outliers
# ---------------------------------------------------------------------------

# Moments accumulate in DECIMAL (exact, reduction-order-independent); the
# closed-form mean/variance is then evaluated in float64 with the SAME
# expression shape on both engines, so the doubles match bit-for-bit.
_ANOMALY_ORACLE = """
WITH s AS (
  SELECT event_type,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv,
         CAST(sum(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS svv
  FROM events GROUP BY event_type
)
SELECT event_id, e.event_type, ts, value, z
FROM (
  SELECT e.event_id, e.event_type, e.ts, e.value,
         round((CAST(CAST(e.value AS DECIMAL(18,4)) AS DOUBLE) - sv / n)
               / nullif(sqrt((svv - sv * sv / n) / nullif(n - 1, 0)), 0),
               6) AS z
  FROM events e JOIN s USING (event_type)
) e
WHERE abs(z) > 2.5
"""


@_register("timeseries_anomaly_zscore", _ANOMALY_ORACLE)
def q_timeseries_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outliers (|z| > 2.5). The per-key moments
    are ONE aggregation producing a handful of rows, broadcast back over
    the raw scan — at 100 TB this is a scan + tiny broadcast join, with
    no window over the full table and no second shuffle."""
    ev = catalog.load_table(spark, sf_dir, "events")
    vdec = F.col("value").cast("decimal(18,4)")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(vdec).cast("double").alias("sv"),
        F.sum(vdec * vdec).cast("double").alias("svv"),
    )
    mean = F.col("sv") / F.col("n")
    # try_divide: a single-row group has n - 1 = 0 → NULL sd → NULL z
    sd = F.sqrt(
        F.try_divide(
            F.col("svv") - F.col("sv") * F.col("sv") / F.col("n"),
            F.col("n") - 1,
        )
    )
    # try_divide: a zero-variance group has sd = 0 → NULL z (dropped
    # by the |z| threshold), never DIVIDE_BY_ZERO
    z = F.round(F.try_divide(vdec.cast("double") - mean, sd), 6)
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select("event_id", "event_type", "ts", "value", z.alias("z"))
        .where(F.abs(F.col("z")) > 2.5)
    )


# ---------------------------------------------------------------------------
# key_skew_report — heavy-hitter diagnostic for join/agg planning
# ---------------------------------------------------------------------------

_SKEW_ORACLE = """
SELECT l_orderkey AS key,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(count(*) / (SELECT CAST(count(*) AS DOUBLE) FROM lineitem), 9) AS share
FROM lineitem
GROUP BY l_orderkey
ORDER BY n_rows DESC, key ASC
LIMIT 20
"""


@_register("key_skew_report", _SKEW_ORACLE)
def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 heavy-hitter keys with their share of the table — the
    measurement that decides whether a downstream join needs salting or
    AQE skew handling. Counts are map-side combined, the total is a
    broadcast scalar, and the top-k is TakeOrderedAndProject (no global
    sort). Deterministic tiebreak on key keeps the cut stable."""
    li = catalog.load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy(F.col("l_orderkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    total = li.agg(F.count(F.lit(1)).cast("double").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "key",
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 9).alias("share"),
        )
        .orderBy(F.desc("n_rows"), F.asc("key"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# distribution_drift_ks — two-sample Kolmogorov-Smirnov drift per key
# ---------------------------------------------------------------------------

_DRIFT_ORACLE = """
WITH tagged AS (
  SELECT event_type, value,
         CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS in_a
  FROM events
  WHERE value IS NOT NULL
),
cum AS (
  SELECT event_type, value, in_a,
         sum(in_a)     OVER w AS ca,
         sum(1 - in_a) OVER w AS cb,
         sum(in_a)     OVER (PARTITION BY event_type) AS na,
         sum(1 - in_a) OVER (PARTITION BY event_type) AS nb
  FROM tagged
  WINDOW w AS (PARTITION BY event_type ORDER BY value
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
  -- single-cohort keys must be dropped BEFORE the outer select's decimal
  -- division evaluates (DuckDB errors on decimal division by zero)
  QUALIFY na > 0 AND nb > 0
)
SELECT event_type,
       round(max(abs(ca * 1.0 / nullif(na, 0)
                     - cb * 1.0 / nullif(nb, 0))), 6) AS ks_stat,
       CAST(max(na) AS BIGINT) AS n_a,
       CAST(max(nb) AS BIGINT) AS n_b
FROM cum
GROUP BY event_type
HAVING max(na) > 0 AND max(nb) > 0
"""


@_register("distribution_drift_ks", _DRIFT_ORACLE)
def q_distribution_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic per key: split each
    event_type's values into two cohorts (hash split here; in production,
    yesterday-vs-today) and compute sup|F̂_a − F̂_b| exactly — the
    standard distribution-drift gate a data-quality pipeline runs before
    training jobs consume a table.

    Exact and single-shuffle: a RANGE-framed cumulative count (peers
    share the count, so ties are handled per the empirical CDF
    definition) gives both CDFs in one window over (event_type, value);
    the sup is a plain max aggregation. The window is PARTITIONED BY the
    drift key — per-key local sorts, never a global sort — so the
    operator parallelizes across keys at 100 TB.

    Totality guards: NULL values are excluded (Spark sorts NULLS FIRST,
    DuckDB NULLS LAST — and a NULL has no place in an empirical CDF), and
    keys whose events all land in one cohort are dropped (na or nb = 0
    would make the statistic 0/0)."""
    ev = catalog.load_table(spark, sf_dir, "events")
    tagged = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        "value",
        F.when(F.col("event_id") % 2 == 0, 1).otherwise(0).alias("in_a"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wp = Window.partitionBy("event_type")
    cum = tagged.select(
        "event_type",
        F.sum("in_a").over(w).alias("ca"),
        F.sum(1 - F.col("in_a")).over(w).alias("cb"),
        F.sum("in_a").over(wp).alias("na"),
        F.sum(1 - F.col("in_a")).over(wp).alias("nb"),
    )
    # try_divide: a group whose rows are all one cohort has na or nb
    # = 0 → NULL KS stat for that group (oracle mirrors)
    d = F.abs(
        F.try_divide(F.col("ca") * F.lit(1.0), F.col("na"))
        - F.try_divide(F.col("cb") * F.lit(1.0), F.col("nb"))
    )
    return (
        cum.groupBy("event_type")
        .agg(
            F.round(F.max(d), 6).alias("ks_stat"),
            F.max("na").cast("long").alias("n_a"),
            F.max("nb").cast("long").alias("n_b"),
        )
        .where((F.col("n_a") > 0) & (F.col("n_b") > 0))
    )


# ---------------------------------------------------------------------------
# validation_pack — the data-quality/observability surface (rule-based
# quality checks, SCD2 dimension history, z-score anomaly detection,
# key-skew report) union-tagged onto one schema, reusing the granular
# queries and oracles verbatim. (Merges data_quality_checks,
# scd2_dimension_history, timeseries_anomaly_zscore, key_skew_report.)
# ---------------------------------------------------------------------------


def _validation_pack_oracle() -> str:
    return f"""
SELECT 'quality_check' AS op, check_name AS key,
       CAST(n_violations AS BIGINT)   AS k2,
       CAST(NULL AS TIMESTAMP)        AS ts,
       CAST(NULL AS TIMESTAMP)        AS ts2,
       CAST(n_rows AS BIGINT)         AS n,
       CAST(NULL AS DOUBLE)           AS amount,
       CAST(NULL AS DOUBLE)           AS amount2,
       passed                         AS flag,
       CAST(NULL AS VARCHAR)          AS s1
FROM ({ORACLES["data_quality_checks"]})
UNION ALL
SELECT 'scd2', CAST(user_id AS VARCHAR), CAST(event_id AS BIGINT),
       CAST(effective_from AS TIMESTAMP), CAST(effective_to AS TIMESTAMP),
       CAST(NULL AS BIGINT), CAST(value AS DOUBLE), CAST(NULL AS DOUBLE),
       is_current, CAST(NULL AS VARCHAR)
FROM ({ORACLES["scd2_dimension_history"]})
UNION ALL
SELECT 'zscore_anomaly', CAST(event_id AS VARCHAR), CAST(event_id AS BIGINT),
       CAST(ts AS TIMESTAMP), CAST(NULL AS TIMESTAMP),
       CAST(NULL AS BIGINT), CAST(value AS DOUBLE), CAST(z AS DOUBLE),
       CAST(NULL AS BOOLEAN), event_type
FROM ({ORACLES["timeseries_anomaly_zscore"]})
UNION ALL
SELECT 'key_skew', CAST(key AS VARCHAR), CAST(NULL AS BIGINT),
       CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP),
       CAST(n_rows AS BIGINT), CAST(share AS DOUBLE), CAST(NULL AS DOUBLE),
       CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR)
FROM ({ORACLES["key_skew_report"]})
"""


def q_validation_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality & observability surface in one union: rule-based
    quality checks (each rule one map-side predicate aggregated in a
    single pass), type-2 slowly-changing-dimension history (effective
    ranges via lead()), per-key z-score anomaly flags (mean/stddev from
    one grouped pass re-joined map-side), and the key-skew report the
    salting threshold feeds on."""
    dq = q_data_quality_checks(spark, sf_dir).select(
        F.lit("quality_check").alias("op"),
        F.col("check_name").alias("key"),
        F.col("n_violations").cast("long").alias("k2"),
        F.lit(None).cast("timestamp_ntz").alias("ts"),
        F.lit(None).cast("timestamp_ntz").alias("ts2"),
        F.col("n_rows").cast("long").alias("n"),
        F.lit(None).cast("double").alias("amount"),
        F.lit(None).cast("double").alias("amount2"),
        F.col("passed").alias("flag"),
        F.lit(None).cast("string").alias("s1"),
    )
    scd = q_scd2_dimension_history(spark, sf_dir).select(
        F.lit("scd2").alias("op"),
        F.col("user_id").cast("string").alias("key"),
        F.col("event_id").cast("long").alias("k2"),
        F.col("effective_from").alias("ts"),
        F.col("effective_to").alias("ts2"),
        F.lit(None).cast("long").alias("n"),
        F.col("value").cast("double").alias("amount"),
        F.lit(None).cast("double").alias("amount2"),
        F.col("is_current").alias("flag"),
        F.lit(None).cast("string").alias("s1"),
    )
    z = q_timeseries_anomaly_zscore(spark, sf_dir).select(
        F.lit("zscore_anomaly").alias("op"),
        F.col("event_id").cast("string").alias("key"),
        F.col("event_id").cast("long").alias("k2"),
        F.col("ts").alias("ts"),
        F.lit(None).cast("timestamp_ntz").alias("ts2"),
        F.lit(None).cast("long").alias("n"),
        F.col("value").cast("double").alias("amount"),
        F.col("z").cast("double").alias("amount2"),
        F.lit(None).cast("boolean").alias("flag"),
        F.col("event_type").alias("s1"),
    )
    skew = q_key_skew_report(spark, sf_dir).select(
        F.lit("key_skew").alias("op"),
        F.col("key").cast("string").alias("key"),
        F.lit(None).cast("long").alias("k2"),
        F.lit(None).cast("timestamp_ntz").alias("ts"),
        F.lit(None).cast("timestamp_ntz").alias("ts2"),
        F.col("n_rows").cast("long").alias("n"),
        F.col("share").cast("double").alias("amount"),
        F.lit(None).cast("double").alias("amount2"),
        F.lit(None).cast("boolean").alias("flag"),
        F.lit(None).cast("string").alias("s1"),
    )
    return dq.unionByName(scd).unionByName(z).unionByName(skew)


QUERIES["validation_pack"] = q_validation_pack
ORACLES["validation_pack"] = _validation_pack_oracle()


# ---------------------------------------------------------------------------
# snapshot_diff — table reconciliation between two snapshots
# ---------------------------------------------------------------------------

# Two overlapping activity windows play the role of two snapshot versions
# of a per-user summary table (the fixture stream spans Jan 1-30).
_DIFF_OLD = ("2024-01-01", "2024-01-21")
_DIFF_NEW = ("2024-01-11", "2024-01-31")

_DIFF_SNAP_SQL = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS DOUBLE)
         AS total
FROM events
WHERE ts >= TIMESTAMP '{lo} 00:00:00' AND ts < TIMESTAMP '{hi} 00:00:00'
GROUP BY user_id
"""

_DIFF_ORACLE = f"""
WITH old AS ({_DIFF_SNAP_SQL.format(lo=_DIFF_OLD[0], hi=_DIFF_OLD[1])}),
new AS ({_DIFF_SNAP_SQL.format(lo=_DIFF_NEW[0], hi=_DIFF_NEW[1])})
SELECT coalesce(o.user_id, n.user_id) AS user_id,
       CASE WHEN o.user_id IS NULL THEN 'added'
            WHEN n.user_id IS NULL THEN 'removed'
            WHEN o.n_events = n.n_events AND o.total = n.total
              THEN 'unchanged'
            ELSE 'changed' END AS change_type,
       CASE WHEN o.user_id IS NOT NULL AND n.user_id IS NOT NULL
             AND NOT (o.n_events = n.n_events AND o.total = n.total)
            THEN concat_ws(',',
                 CASE WHEN o.n_events IS DISTINCT FROM n.n_events
                      THEN 'n_events' END,
                 CASE WHEN o.total IS DISTINCT FROM n.total
                      THEN 'total' END) END AS changed_cols,
       o.n_events AS n_events_old, n.n_events AS n_events_new,
       o.total AS total_old, n.total AS total_new
FROM old o FULL OUTER JOIN new n ON n.user_id = o.user_id
"""


@_register("snapshot_diff", _DIFF_ORACLE)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table reconciliation: diff two snapshot versions of a keyed
    summary table into added / removed / changed / unchanged rows with a
    per-row list of which columns changed — the audit primitive behind
    CDC validation, migration sign-off and "what did yesterday's
    pipeline change" reports.

    Plan: both snapshots aggregate per key, then ONE full-outer join on
    the key (the same single shuffle a MERGE would pay); the change
    classification and column mask are map-side CASE expressions. The
    compared measure accumulates in DECIMAL(18,6) before a final double
    cast, so equality is exact under any partitioning — a float
    accumulation would misclassify 'changed' vs 'unchanged'
    nondeterministically at scale."""
    ev = catalog.load_table(spark, sf_dir, "events")

    def snap(lo: str, hi: str) -> DataFrame:
        return (
            ev.where(
                (F.col("ts") >= F.lit(f"{lo} 00:00:00").cast("timestamp_ntz"))
                & (F.col("ts") < F.lit(f"{hi} 00:00:00").cast("timestamp_ntz"))
            )
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,6)"))
                .cast("double")
                .alias("total"),
            )
        )

    o = snap(*_DIFF_OLD).select(
        F.col("user_id").alias("o_uid"),
        F.col("n_events").alias("n_events_old"),
        F.col("total").alias("total_old"),
    )
    n = snap(*_DIFF_NEW).select(
        F.col("user_id").alias("n_uid"),
        F.col("n_events").alias("n_events_new"),
        F.col("total").alias("total_new"),
    )
    j = o.join(n, F.col("n_uid") == F.col("o_uid"), "full_outer")
    same = (F.col("n_events_old") == F.col("n_events_new")) & (
        F.col("total_old") == F.col("total_new")
    )
    both = F.col("o_uid").isNotNull() & F.col("n_uid").isNotNull()
    return j.select(
        F.coalesce(F.col("o_uid"), F.col("n_uid")).alias("user_id"),
        F.when(F.col("o_uid").isNull(), "added")
        .when(F.col("n_uid").isNull(), "removed")
        .when(same, "unchanged")
        .otherwise("changed")
        .alias("change_type"),
        F.when(
            both & ~same,
            F.concat_ws(
                ",",
                F.when(
                    ~F.col("n_events_old").eqNullSafe(F.col("n_events_new")),
                    F.lit("n_events"),
                ),
                F.when(
                    ~F.col("total_old").eqNullSafe(F.col("total_new")),
                    F.lit("total"),
                ),
            ),
        ).alias("changed_cols"),
        "n_events_old",
        "n_events_new",
        "total_old",
        "total_new",
    )


# ---------------------------------------------------------------------------
# seasonal_baseline_anomaly — hour-of-day conditioned outlier detection
# ---------------------------------------------------------------------------

_SEASONAL_ORACLE = """
WITH s AS (
  SELECT event_type, CAST(hour(ts) AS INTEGER) AS hr,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv,
         CAST(sum(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS svv
  FROM events GROUP BY 1, 2
)
SELECT event_id, event_type, hr, value, slot_mean, z
FROM (
  SELECT e.event_id, e.event_type, CAST(hour(e.ts) AS INTEGER) AS hr,
         e.value,
         round(s.sv / s.n, 6) AS slot_mean,
         round((CAST(CAST(e.value AS DECIMAL(18,4)) AS DOUBLE) - s.sv / s.n)
               / nullif(sqrt((s.svv - s.sv * s.sv / s.n) / (s.n - 1)), 0), 6) AS z
  FROM events e
  JOIN s ON s.event_type = e.event_type
        AND s.hr = CAST(hour(e.ts) AS INTEGER)
  WHERE s.n > 1
)
WHERE abs(z) > 3
"""


@_register("seasonal_baseline_anomaly", _SEASONAL_ORACLE)
def q_seasonal_baseline_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware outliers: the baseline is conditioned on the
    (event_type, hour-of-day) slot, so a value that is normal at the
    daily peak but absurd at 4am flags — the failure mode the global
    per-type z-score (``timeseries_anomaly_zscore``) is blind to.
    |z| > 3 against the slot's own mean/stddev; single-member slots are
    excluded (no variance estimate).

    Plan: identical scale shape to the global z-score — the slot
    moments are ONE aggregation producing ≤ |types|·24 rows from exact
    DECIMAL partial sums (order-independent under AQE re-partitioning),
    broadcast back over the raw scan. No window over the full table, no
    second shuffle; the only growth with data volume is the scan."""
    ev = catalog.load_table(spark, sf_dir, "events")
    hr = F.hour("ts").cast("int")
    vdec = F.col("value").cast("decimal(18,4)")
    stats = (
        ev.groupBy("event_type", hr.alias("hr")).agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(vdec).cast("double").alias("sv"),
            F.sum(vdec * vdec).cast("double").alias("svv"),
        )
    ).where(F.col("n") > 1)
    mean = F.col("sv") / F.col("n")
    sd = F.sqrt(
        (F.col("svv") - F.col("sv") * F.col("sv") / F.col("n"))
        / (F.col("n") - 1)
    )
    # try_divide: a zero-variance group has sd = 0 → NULL z (dropped
    # by the |z| threshold), never DIVIDE_BY_ZERO
    z = F.round(F.try_divide(vdec.cast("double") - mean, sd), 6)
    return (
        ev.withColumn("hr", hr)
        .join(F.broadcast(stats), ["event_type", "hr"])
        .select(
            "event_id",
            "event_type",
            "hr",
            "value",
            F.round(mean, 6).alias("slot_mean"),
            z.alias("z"),
        )
        .where(F.abs(F.col("z")) > 3)
    )


# ---------------------------------------------------------------------------
# benford_digit_audit — first-significant-digit fraud/quality screen
# ---------------------------------------------------------------------------

_BENFORD_ORACLE = """
WITH digits AS (
  SELECT regexp_extract(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
                        '[1-9]') AS digit
  FROM orders
  WHERE o_totalprice > 0
),
counts AS (
  SELECT digit, count(*) AS n_obs FROM digits GROUP BY digit
),
total AS (SELECT sum(n_obs) AS n_total FROM counts)
SELECT digit,
       CAST(n_obs AS BIGINT) AS n_obs,
       round(CAST(n_obs AS DOUBLE) / n_total, 6) AS obs_share,
       round(ln((CAST(digit AS DOUBLE) + 1e0) / CAST(digit AS DOUBLE))
             / ln(10e0), 6) AS exp_share,
       round(
         (n_obs - n_total * (ln((CAST(digit AS DOUBLE) + 1e0)
                                 / CAST(digit AS DOUBLE)) / ln(10e0)))
         * (n_obs - n_total * (ln((CAST(digit AS DOUBLE) + 1e0)
                                  / CAST(digit AS DOUBLE)) / ln(10e0)))
         / (n_total * (ln((CAST(digit AS DOUBLE) + 1e0)
                          / CAST(digit AS DOUBLE)) / ln(10e0))), 6)
         AS chi2_term
FROM counts CROSS JOIN total
"""


@_register("benford_digit_audit", _BENFORD_ORACLE)
def q_benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals: the distribution of first
    significant digits of naturally occurring amounts follows
    P(d) = log10(1 + 1/d); fabricated or truncated monetary columns
    deviate hard. Reports, per digit, the observed count/share, the
    Benford expectation, and the chi-square contribution — the standard
    forensic-accounting / data-quality screen for value columns.

    Digit extraction goes through an exact DECIMAL(18,2) rendering
    (identical text on both engines — never the engine-specific double
    format) and a first-[1-9] regexp, so '0.0042' → 4 and trailing
    zeros never matter. Plan: one scan → one 9-row map-side-combined
    aggregate; the total is a window-free broadcast scalar; everything
    after the count is constant-space arithmetic on 9 rows. Expected
    shares are ln-ratio algebra (same spelling both engines)."""
    o = catalog.load_table(spark, sf_dir, "orders")
    digit = F.regexp_extract(
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
        "[1-9]",
        0,
    )
    counts = (
        o.where(F.col("o_totalprice") > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    total = counts.agg(F.sum("n_obs").alias("n_total"))
    d = F.col("digit").cast("double")
    p = F.log((d + 1.0) / d) / F.log(F.lit(10.0))
    exp_n = F.col("n_total") * p
    return counts.crossJoin(F.broadcast(total)).select(
        "digit",
        F.col("n_obs").cast("long").alias("n_obs"),
        F.round(F.col("n_obs").cast("double") / F.col("n_total"), 6).alias(
            "obs_share"
        ),
        F.round(p, 6).alias("exp_share"),
        F.round(
            (F.col("n_obs") - exp_n) * (F.col("n_obs") - exp_n) / exp_n, 6
        ).alias("chi2_term"),
    )


# ---------------------------------------------------------------------------
# pii_redaction_stats — digit-run scrubbing audit over event payloads
# ---------------------------------------------------------------------------

# A PII scrub's first pass in any training pipeline is pattern-based
# (digit runs: account/phone/ID numbers; the fixture's props payloads
# carry synthetic integers standing in for them). The operator reports,
# per event_type, how much a `[0-9]+` redaction would remove — the audit
# a privacy review reads BEFORE the destructive scrub runs. The regex is
# deliberately dialect-portable (a plain character class + quantifier,
# identical semantics in Java regex and RE2/DuckDB).
PII_DIGIT_RUN = "[0-9]+"

_PII_ORACLE = f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(len(regexp_extract_all(props, '{PII_DIGIT_RUN}')))
            AS BIGINT)          AS n_matches,
       CAST(sum(length(props)
                - length(regexp_replace(props, '{PII_DIGIT_RUN}', '', 'g')))
            AS BIGINT)          AS chars_redacted,
       round(sum(len(regexp_extract_all(props, '{PII_DIGIT_RUN}'))) * 1.0
             / count(*), 6)     AS matches_per_event
FROM events
GROUP BY event_type
"""


@_register("pii_redaction_stats", _PII_ORACLE)
def q_pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction audit for the digit-run scrub: per event_type, how many
    `[0-9]+` matches a redaction pass would hit and how many characters
    it would remove. Pure per-row regex algebra folded into one grouped
    aggregation — one scan, one |event_types|-key reduce, no joins; at
    100 TB this is the same single-reduce shape as data_quality_checks
    (the audit never materializes redacted payloads)."""
    ev = catalog.load_table(spark, sf_dir, "events")
    n_matches = F.regexp_count("props", F.lit(PII_DIGIT_RUN))
    removed = F.length("props") - F.length(
        F.regexp_replace("props", PII_DIGIT_RUN, "")
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(n_matches).cast("long").alias("n_matches"),
        F.sum(removed).cast("long").alias("chars_redacted"),
        F.round(
            F.sum(n_matches) * F.lit(1.0) / F.count(F.lit(1)), 6
        ).alias("matches_per_event"),
    )


# ---------------------------------------------------------------------------
# pii_redact_text — the destructive scrub the audit above previews
# ---------------------------------------------------------------------------

PII_REDACTION_TOKEN = "<NUM>"

_PII_REDACT_ORACLE = f"""
SELECT event_id, event_type,
       regexp_replace(props, '{PII_DIGIT_RUN}',
                      '{PII_REDACTION_TOKEN}', 'g') AS props_redacted,
       CAST(len(regexp_extract_all(props, '{PII_DIGIT_RUN}')) AS BIGINT)
         AS n_redacted
FROM events
"""


@_register("pii_redact_text", _PII_REDACT_ORACLE)
def q_pii_redact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The redaction pass itself — every digit run replaced by
    {PII_REDACTION_TOKEN}, with a per-row match count so downstream
    joins can threshold or audit (pii_redaction_stats is this pass's
    dry-run aggregate, sharing PII_DIGIT_RUN so the audit can never
    disagree with the scrub). Pure map-side regex projection: zero
    shuffles, zero joins, whole-stage codegen — the embarrassingly
    parallel shape a 100 TB scrub needs. The pattern stays
    dialect-portable (plain character class + quantifier, identical in
    Java regex and DuckDB/RE2)."""
    ev = catalog.load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.regexp_replace("props", PII_DIGIT_RUN, PII_REDACTION_TOKEN).alias(
            "props_redacted"
        ),
        F.regexp_count("props", F.lit(PII_DIGIT_RUN))
        .cast("long")
        .alias("n_redacted"),
    )


# ---------------------------------------------------------------------------
# score_drift_psi — population stability index between the drift cohorts
# ---------------------------------------------------------------------------

# PSI is the binned companion of the KS statistic above (same
# event_id-parity cohorts standing in for expected-vs-actual windows):
# Σ (p_a − p_b)·ln(p_a/p_b) over 10 equal-width bins of each
# event_type's own score range. Shares are Laplace-smoothed
# ((c + 0.5)/(n + 5)) so empty bins keep ln defined — and the sum runs
# over ALL 10 bins via an explicit grid (a bin empty in both cohorts
# still contributes its smoothed term when n_a ≠ n_b; dropping absent
# rows would silently change the statistic). Industry reading: < 0.1
# stable, 0.1-0.25 moderate shift, > 0.25 action.
PSI_BINS = 10

_PSI_ORACLE = f"""
WITH tagged AS (
  SELECT event_type, value,
         CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS in_a
  FROM events
  WHERE value IS NOT NULL
),
bounds AS (
  SELECT event_type, min(value) AS lo, max(value) AS hi,
         sum(in_a) AS na, sum(1 - in_a) AS nb
  FROM tagged GROUP BY event_type
),
binned AS (
  SELECT t.event_type,
         least(CAST(floor(coalesce((t.value - b.lo)
                                   / nullif(b.hi - b.lo, 0), 0.0e0)
                          * {PSI_BINS}) AS INTEGER), {PSI_BINS} - 1) AS bin,
         t.in_a
  FROM tagged t JOIN bounds b USING (event_type)
),
counts AS (
  SELECT event_type, bin, sum(in_a) AS ca, sum(1 - in_a) AS cb
  FROM binned GROUP BY event_type, bin
),
grid AS (
  SELECT b.event_type, g.k AS bin, b.na, b.nb
  FROM bounds b, generate_series(0, {PSI_BINS} - 1) g(k)
),
terms AS (
  SELECT g.event_type, g.na, g.nb,
         (coalesce(c.ca, 0) + 0.5e0) / (g.na + {PSI_BINS} * 0.5e0) AS pa,
         (coalesce(c.cb, 0) + 0.5e0) / (g.nb + {PSI_BINS} * 0.5e0) AS pb
  FROM grid g LEFT JOIN counts c USING (event_type, bin)
)
SELECT event_type,
       round(CAST(sum(CAST((pa - pb) * ln(pa / pb)
                           AS DECIMAL(32, 18))) AS DOUBLE), 6) AS psi,
       CAST(max(na) AS BIGINT) AS n_a,
       CAST(max(nb) AS BIGINT) AS n_b
FROM terms
GROUP BY event_type
"""


@_register("score_drift_psi", _PSI_ORACLE)
def q_score_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event_type between the two drift
    cohorts — the binned drift gate model-monitoring dashboards
    threshold on (KS above is its continuous sibling). Laplace-smoothed
    shares over an explicit 10-bin grid; per-bin terms are identical
    per-row double algebra on both engines, and the cross-bin sum
    accumulates in DECIMAL so the statistic is reduction-order-exact.
    Plan: one grouped count, a bounds/grid broadcast, one
    |event_types|-key reduce — the corpus is scanned once (the tagged
    projection is staged and feeds both the bounds aggregate and the
    binning pass — later consumers read the cache, so bounds' two uses
    cost cache scans, not corpus scans)."""
    dec = "decimal(32,18)"
    ev = catalog.load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    tagged = session.stage(
        ev.select(
            "event_type",
            "value",
            F.when(F.col("event_id") % 2 == 0, 1).otherwise(0).alias("in_a"),
        )
    )
    bounds = tagged.groupBy("event_type").agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.sum("in_a").alias("na"),
        F.sum(1 - F.col("in_a")).alias("nb"),
    )
    binned = tagged.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        F.least(
            F.floor(
                F.coalesce(
                    F.try_divide(
                        F.col("value") - F.col("lo"),
                        F.col("hi") - F.col("lo"),
                    ),
                    F.lit(0.0),
                )
                * PSI_BINS
            ).cast("int"),
            F.lit(PSI_BINS - 1),
        ).alias("bin"),
        "in_a",
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.sum("in_a").alias("ca"), F.sum(1 - F.col("in_a")).alias("cb")
    )
    grid = bounds.select("event_type", "na", "nb").crossJoin(
        F.broadcast(
            ev.sparkSession.range(PSI_BINS).select(
                F.col("id").cast("int").alias("bin")
            )
        )
    )
    smooth = float(PSI_BINS * 0.5)
    terms = grid.join(counts, ["event_type", "bin"], "left").select(
        "event_type",
        "na",
        "nb",
        (
            (F.coalesce(F.col("ca"), F.lit(0)) + F.lit(0.5))
            / (F.col("na") + F.lit(smooth))
        ).alias("pa"),
        (
            (F.coalesce(F.col("cb"), F.lit(0)) + F.lit(0.5))
            / (F.col("nb") + F.lit(smooth))
        ).alias("pb"),
    )
    return terms.groupBy("event_type").agg(
        F.round(
            F.sum(
                (
                    (F.col("pa") - F.col("pb"))
                    * F.log(F.col("pa") / F.col("pb"))
                ).cast(dec)
            ).cast("double"),
            6,
        ).alias("psi"),
        F.max("na").cast("long").alias("n_a"),
        F.max("nb").cast("long").alias("n_b"),
    )
