"""As-of and interval (range) joins — composite operators Spark lacks as
built-ins (SURVEY §2.2, §4.2 item 3).

The as-of join is implemented as a **union-merge**, not a range cross-join:
tag both inputs, union them, and carry the latest right-side payload forward
with ``last(..., ignoreNulls)`` over a per-key window ordered by (ts, tag).
Cost profile: ONE shuffle on the join key + a linear scan per key — the
same asymptotics as a sort-merge join, with no quadratic range expansion.
This is the only formulation that survives 100 TB with dense right sides
(a broadcast-range trick dies when the right side outgrows memory, and a
banded cross-join multiplies rows).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .. import catalog

QUERIES: dict = {}
ORACLES: dict = {}


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    how: str = "inner",
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row whose timestamp
    is <= the left timestamp, matching on the equi-keys ``on``.

    ``right_cols`` are the right-side payload columns to carry (emitted as
    ``<name><suffix>``, plus ``<right_ts><suffix>`` for the matched time).
    ``how``: 'inner' drops unmatched left rows, 'left' keeps them (nulls).
    """
    key_cols = list(on)
    payload = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c).alias(c) for c in right_cols]
    )
    r = right.select(
        *key_cols,
        F.col(right_ts).alias("__evt_ts"),
        F.lit(0).alias("__tag"),
        payload.alias("__payload"),
        *[F.lit(None).cast(t.dataType).alias(f"__l_{t.name}")
          for t in left.schema.fields],
    )
    l = left.select(
        *key_cols,
        F.col(left_ts).alias("__evt_ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(t.name).alias(f"__l_{t.name}") for t in left.schema.fields],
    )
    # tag=0 sorts before tag=1 at equal timestamps → right rows at exactly
    # the left timestamp are visible to it (allow_exact_matches semantics,
    # same as DuckDB ASOF ... ON l.ts >= r.ts).
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("__evt_ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = r.unionByName(l).withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    out = merged.where(F.col("__tag") == 1).select(
        *[F.col(f"__l_{t.name}").alias(t.name) for t in left.schema.fields],
        F.col(f"__match.__ts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    if how == "inner":
        out = out.where(F.col(f"{right_ts}{suffix}").isNotNull())
    return out


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


@_register(
    "asof_join_purchase_click",
    """
SELECT l.event_id, l.user_id, l.ts AS purchase_ts,
       r.ts AS ts_right, r.value AS value_right
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
""",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase matched to the user's most recent prior (or same-time)
    click — the canonical sensor/event alignment as-of join."""
    ev = catalog.load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    return asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="purchase_ts",
        right_ts="ts",
        right_cols=["value"],
        how="inner",
    )


@_register(
    "range_join_recent_clicks",
    """
SELECT p.event_id, p.user_id,
       CAST(COUNT(c.event_id) AS BIGINT) AS n_recent_clicks
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
GROUP BY p.event_id, p.user_id
""",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: clicks in the hour before each purchase. The equi-key
    (user_id) rides the shuffle; the range predicate is evaluated inside
    the sort-merge join, so no cross product materializes."""
    ev = catalog.load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_id"),
    )
    joined = p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") < F.col("p_ts")),
        "left",
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.count("c_id").alias("n_recent_clicks")
    )


# ---------------------------------------------------------------------------
# asof_nearest_tolerance — nearest-in-time join (both directions + bound)
# ---------------------------------------------------------------------------

NEAREST_TOLERANCE_S = 600

_NEAREST_ORACLE = f"""
WITH tagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS tag
  FROM events WHERE event_type IN ('click', 'purchase')
),
passes AS (
  SELECT user_id, ts, event_id, tag,
         last_value(CASE WHEN tag = 0 THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, tag, event_id
                 ROWS UNBOUNDED PRECEDING) AS prev_ts,
         last_value(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, tag, event_id
                 ROWS UNBOUNDED PRECEDING) AS prev_id,
         first_value(CASE WHEN tag = 0 THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, tag, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS next_ts,
         first_value(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, tag, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS next_id
  FROM tagged
),
chosen AS (
  SELECT event_id, user_id, ts,
         CASE
           WHEN prev_ts IS NULL AND next_ts IS NULL THEN NULL
           WHEN next_ts IS NULL THEN prev_id
           WHEN prev_ts IS NULL THEN next_id
           WHEN (epoch_us(ts) - epoch_us(prev_ts))
                <= (epoch_us(next_ts) - epoch_us(ts)) THEN prev_id
           ELSE next_id
         END AS cand_id,
         CASE
           WHEN prev_ts IS NULL AND next_ts IS NULL THEN NULL
           WHEN next_ts IS NULL THEN epoch_us(ts) - epoch_us(prev_ts)
           WHEN prev_ts IS NULL THEN epoch_us(next_ts) - epoch_us(ts)
           ELSE least(epoch_us(ts) - epoch_us(prev_ts),
                      epoch_us(next_ts) - epoch_us(ts))
         END AS gap_us
  FROM passes WHERE tag = 1
)
SELECT event_id, user_id, ts,
       CASE WHEN gap_us <= {NEAREST_TOLERANCE_S}::BIGINT * 1000000
            THEN cand_id END AS nearest_click_id,
       CASE WHEN gap_us <= {NEAREST_TOLERANCE_S}::BIGINT * 1000000
            THEN CAST(gap_us AS BIGINT) END AS gap_us
FROM chosen
"""


@_register("asof_nearest_tolerance", _NEAREST_ORACLE)
def q_asof_nearest_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time join: each purchase matched to its CLOSEST click
    in either direction, only within a ±{NEAREST_TOLERANCE_S}s
    tolerance (the sensor-fusion variant of as-of — backward-only as-of
    silently matches stale rows; nearest + bound is what aligning two
    irregular streams actually needs; ties break backward).

    Same union-merge shape as ``asof_join``: ONE shuffle on user_id,
    one shared per-key sort feeding a backward carry-forward AND a
    forward carry-backward window — never a range join. The gap
    comparison is integer microseconds (engine-exact)."""
    ev = catalog.load_table(spark, sf_dir, "events")
    tagged = ev.where(
        F.col("event_type").isin("click", "purchase")
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("tag"),
    )
    order = ["ts", "tag", "event_id"]
    wb = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    click_ts = F.when(F.col("tag") == 0, F.col("ts"))
    click_id = F.when(F.col("tag") == 0, F.col("event_id"))
    passes = tagged.select(
        "user_id",
        "ts",
        "event_id",
        "tag",
        F.last(click_ts, ignorenulls=True).over(wb).alias("prev_ts"),
        F.last(click_id, ignorenulls=True).over(wb).alias("prev_id"),
        F.first(click_ts, ignorenulls=True).over(wf).alias("next_ts"),
        F.first(click_id, ignorenulls=True).over(wf).alias("next_id"),
    ).where(F.col("tag") == 1)
    back_gap = F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
    fwd_gap = F.expr("timestampdiff(MICROSECOND, ts, next_ts)")
    cand_id = (
        F.when(F.col("prev_ts").isNull() & F.col("next_ts").isNull(),
               F.lit(None).cast("long"))
        .when(F.col("next_ts").isNull(), F.col("prev_id"))
        .when(F.col("prev_ts").isNull(), F.col("next_id"))
        .when(back_gap <= fwd_gap, F.col("prev_id"))
        .otherwise(F.col("next_id"))
    )
    gap = (
        F.when(F.col("prev_ts").isNull() & F.col("next_ts").isNull(),
               F.lit(None).cast("long"))
        .when(F.col("next_ts").isNull(), back_gap)
        .when(F.col("prev_ts").isNull(), fwd_gap)
        .otherwise(F.least(back_gap, fwd_gap))
    )
    tol = F.lit(NEAREST_TOLERANCE_S * 1_000_000).cast("long")
    return passes.select(
        "event_id",
        "user_id",
        "ts",
        F.when(gap <= tol, cand_id).alias("nearest_click_id"),
        F.when(gap <= tol, gap.cast("long")).alias("gap_us"),
    )
