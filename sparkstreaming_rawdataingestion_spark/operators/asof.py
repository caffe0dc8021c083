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
