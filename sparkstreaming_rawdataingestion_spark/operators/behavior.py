"""Behavioral / event-sequence analytics over the events stream.

The reference pipeline lands per-user event streams (DataPoint rows keyed
on datastream_id — RawDataIngestion.java:134-152); these operators are the
standard questions a product/analytics consumer asks of that table once it
is in the warehouse: ordered-funnel completion, cohort retention, event
lateness (the watermark-sizing diagnostic), and OHLC time-bucket
downsampling.

Scale shape — every operator here shuffles on ``user_id`` (or the
bucket/type key) exactly once and stays inside whole-stage codegen:

- **funnel_pattern_match**: three grouped passes re-joined on ``user_id``
  — the join keys are identical, so the exchanges are reused, and each
  stage's state is one row per qualifying user (monotonically shrinking).
  Never a per-user sort of full event arrays.
- **retention_cohorts**: one grouped min per user (the cohort
  assignment), one fact-side join on ``user_id`` (broadcastable — the
  cohort table is |users| rows), one count-distinct aggregation.
- **event_lateness_audit**: per-user RANGE/ROWS window over arrival
  order — per-key local sorts, no global sort; this is the exact
  measurement that sizes ``withWatermark`` for the streaming twins
  (streaming/windows.py).
- **ohlc_downsample**: single groupBy over (series, bucket); open/close
  are struct-min/max aggregates (lexicographic (ts, event_id, value)
  ordering — deterministic under timestamp ties), so no window pass and
  no per-bucket sorting.
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
# funnel_pattern_match — ordered view → click → purchase completion
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, min(ts) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(v.t_view) AS t_view, min(e.ts) AS t_click
  FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t_view
  WHERE e.event_type = 'click'
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(c.t_view) AS t_view, min(c.t_click) AS t_click,
         min(e.ts) AS t_purchase
  FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t_click
  WHERE e.event_type = 'purchase'
  GROUP BY e.user_id
)
SELECT user_id, t_view, t_click, t_purchase,
       CAST(floor(epoch(t_purchase - t_view)) AS BIGINT) AS funnel_sec
FROM p
"""


@_register("funnel_pattern_match", _FUNNEL_ORACLE)
def q_funnel_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel completion: users whose events contain
    view → click → purchase in strict timestamp order, with the greedy
    (first-completion) timestamps of each stage.

    Greedy semantics — first view, then first click strictly after it,
    then first purchase strictly after that — make the answer unique and
    SQL-checkable (pattern-matching engines like MATCH_RECOGNIZE default
    to the same skip-to-first semantics).

    Plan: three grouped min-aggregations chained by joins on ``user_id``.
    All three exchanges hash the same key, so the shuffle is effectively
    one; intermediate state is one row per still-qualifying user. The
    funnel duration is a DayTimeInterval cast to seconds — pure interval
    arithmetic on TIMESTAMP_NTZ, no timezone involvement."""
    ev = catalog.load_table(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("t_view").alias("t_view"), F.min("ts").alias("t_click"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(
            F.min("t_view").alias("t_view"),
            F.min("t_click").alias("t_click"),
            F.min("ts").alias("t_purchase"),
        )
    )
    return p.select(
        "user_id",
        "t_view",
        "t_click",
        "t_purchase",
        (F.col("t_purchase") - F.col("t_view"))
        .cast("long")
        .alias("funnel_sec"),
    )


# ---------------------------------------------------------------------------
# retention_cohorts — first-activity cohort × day-offset retention
# ---------------------------------------------------------------------------

_RETENTION_ORACLE = """
WITH firsts AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
)
SELECT f.cohort_day,
       CAST(date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS BIGINT)
         AS day_offset,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM events e JOIN firsts f ON f.user_id = e.user_id
WHERE date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) <= 7
GROUP BY 1, 2
"""


@_register("retention_cohorts", _RETENTION_ORACLE)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: users cohorted by first-activity day,
    counted distinct on each of the next 7 day offsets.

    The cohort table is one row per user (grouped min), so the fact-side
    join is node-sized and broadcastable; the distinct count shuffles
    (cohort_day, offset, user_id) triples — partial distinct runs
    map-side. Date arithmetic is field-level (CAST ts AS DATE), so the
    operator is timezone-free on NTZ timestamps."""
    ev = catalog.load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    joined = ev.join(firsts, "user_id").select(
        "user_id",
        "cohort_day",
        F.datediff(F.to_date("ts"), F.col("cohort_day")).cast("long").alias(
            "day_offset"
        ),
    )
    return (
        joined.where(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# event_lateness_audit — out-of-orderness measurement (watermark sizing)
# ---------------------------------------------------------------------------

_LATENESS_ORACLE = """
WITH seq AS (
  SELECT user_id, ts,
         max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS seen_max
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (WHERE ts < seen_max) AS BIGINT) AS n_late,
       CAST(coalesce(max(CASE WHEN ts < seen_max
                              THEN CAST(floor(epoch(seen_max - ts)) AS BIGINT)
                         END), 0) AS BIGINT) AS max_lateness_sec
FROM seq
GROUP BY user_id
"""


@_register("event_lateness_audit", _LATENESS_ORACLE)
def q_event_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How out-of-order is each user's stream? An event is *late* if an
    event with a LATER timestamp already arrived (arrival order =
    event_id). Reports per-user late counts and the maximum lateness in
    whole seconds — exactly the statistic that sizes
    ``withWatermark('ts', ...)`` in the streaming twins: a watermark
    below the observed p-max lateness silently drops those events.

    Plan: one per-user window over arrival order (per-key local sort —
    parallel across users at any scale), one grouped aggregation on the
    same key, exchange reused. Lateness is interval arithmetic on NTZ —
    timezone-free."""
    ev = catalog.load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.select(
        "user_id", "ts", F.max("ts").over(w).alias("seen_max")
    )
    late = F.col("ts") < F.col("seen_max")
    return seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_if(late).alias("n_late"),
        F.coalesce(
            F.max(
                F.when(late, (F.col("seen_max") - F.col("ts")).cast("long"))
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("max_lateness_sec"),
    )


# ---------------------------------------------------------------------------
# ohlc_downsample — open/high/low/close per (event_type, hour) bucket
# ---------------------------------------------------------------------------

_OHLC_ORACLE = """
SELECT event_type,
       date_trunc('hour', ts) AS bucket,
       (min(struct_pack(t := ts, eid := event_id, v := value))).v AS open,
       max(value)  AS high,
       min(value)  AS low,
       (max(struct_pack(t := ts, eid := event_id, v := value))).v AS close,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 6) AS volume
FROM events
GROUP BY 1, 2
"""


@_register("ohlc_downsample", _OHLC_ORACLE)
def q_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series OHLC downsampling: per (series, hour) bucket the
    opening/closing values plus high/low/count/volume — the canonical
    lossy compaction for dashboarding a 100 TB metric stream down to
    bucket rows.

    Open/close are struct-min/max over (ts, event_id, value): one
    aggregation pass, no per-bucket sort, and the event_id tie-break
    keeps the answer deterministic even with duplicate timestamps inside
    a bucket. (min_by(value, ts) alone would be nondeterministic on
    ties — the same trap as any unordered first()/last().)"""
    ev = catalog.load_table(spark, sf_dir, "events")
    tagged = F.struct(
        F.col("ts").alias("t"),
        F.col("event_id").alias("eid"),
        F.col("value").alias("v"),
    )
    return ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(
        F.min(tagged).getField("v").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(tagged).getField("v").alias("close"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 6).alias("volume"),
    )


# ---------------------------------------------------------------------------
# timeseries_twap — time-weighted average per (series, day)
# ---------------------------------------------------------------------------

_TWAP_ORACLE = """
WITH iv AS (
  SELECT event_type,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(value AS DECIMAL(18,6)) AS v,
         CAST(floor(epoch(
             lead(ts) OVER (PARTITION BY event_type, date_trunc('day', ts)
                            ORDER BY ts, event_id) - ts)) AS BIGINT) AS w
  FROM events
)
SELECT event_type, day,
       CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(sum(w) AS BIGINT)   AS covered_sec,
       round(CAST(sum(v * w) AS DOUBLE) / sum(w), 6) AS twap
FROM iv
WHERE w IS NOT NULL
GROUP BY event_type, day
HAVING sum(w) > 0
"""


@_register("timeseries_twap", _TWAP_ORACLE)
def q_timeseries_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per (series, day) — the correct mean
    for irregularly sampled sensor streams (a plain avg over-weights
    bursts; the reference's DataPoint rows are exactly such a stream).

    Each sample holds its value until the next sample: weight = whole
    seconds to the successor inside the partition (lead over one per-key
    window — local sorts only). The weighted sum accumulates in
    DECIMAL(18,6)·seconds, so the aggregate is EXACT under any partition
    or reduction order (same engineering as stats_moments_pack) and only
    the final division is float. Last sample of a day carries no
    interval and is excluded; single-sample days drop via the sum(w) > 0
    guard."""
    ev = catalog.load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    w_next = (
        Window.partitionBy("event_type", day)
        .orderBy("ts", "event_id")
    )
    iv = ev.select(
        "event_type",
        day.cast("date").alias("day"),
        F.col("value").cast("decimal(18,6)").alias("v"),
        (F.lead("ts").over(w_next) - F.col("ts")).cast("long").alias("w"),
    ).where(F.col("w").isNotNull())
    return (
        iv.groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("w").cast("long").alias("covered_sec"),
            F.round(
                F.sum(F.col("v") * F.col("w")).cast("double") / F.sum("w"), 6
            ).alias("twap"),
        )
        .where(F.col("covered_sec") > 0)
    )


# ---------------------------------------------------------------------------
# upsample_interpolate — hourly grid with linear interpolation (union-merge)
# ---------------------------------------------------------------------------

_INTERP_ORACLE = """
WITH bounds AS (
  SELECT user_id,
         date_trunc('hour', min(ts)) AS lo,
         date_trunc('hour', max(ts)) AS hi
  FROM events GROUP BY user_id
),
grid AS (
  SELECT user_id, u.g AS g
  FROM bounds, unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS u(g)
),
u AS (
  SELECT user_id, ts, value, 0 AS is_grid FROM events
  UNION ALL
  SELECT user_id, g, NULL, 1 FROM grid
),
filled AS (
  SELECT user_id, ts, is_grid,
         last_value(value IGNORE NULLS) OVER wp AS prev_val,
         last_value(CASE WHEN is_grid = 0 THEN ts END IGNORE NULLS)
           OVER wp AS prev_ts,
         first_value(value IGNORE NULLS) OVER wf AS next_val,
         first_value(CASE WHEN is_grid = 0 THEN ts END IGNORE NULLS)
           OVER wf AS next_ts
  FROM u
  WINDOW wp AS (PARTITION BY user_id ORDER BY ts, is_grid
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY user_id ORDER BY ts, is_grid
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
)
SELECT user_id, ts AS grid_ts,
       floor((prev_val + (next_val - prev_val)
              * (CAST(floor(epoch(ts - prev_ts)) AS BIGINT) * 1.0e0
                 / CAST(floor(epoch(next_ts - prev_ts)) AS BIGINT)))
             * 1.0e6) / 1.0e6
         AS value_interp
FROM filled
WHERE is_grid = 1 AND prev_ts IS NOT NULL AND next_ts IS NOT NULL
"""


@_register("upsample_interpolate", _INTERP_ORACLE)
def q_upsample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each user's irregular stream onto an hourly grid with
    linear interpolation between the surrounding samples.

    The neighbor search is the UNION-MERGE as-of pattern (asof.py):
    grid points are unioned into the stream and one forward + one
    backward IGNORE-NULLS window fills the surrounding (ts, value)
    pairs — no range join, no per-grid-point probe; cost is one per-user
    sort, linear in |events| + |grid|. Events sort before grid points on
    timestamp ties (is_grid ordinal), so a sample exactly on a grid line
    interpolates to itself (fraction 0). Grid points before the first or
    at/after the last sample are dropped (no extrapolation). The
    interpolation fraction uses whole-second offsets (identical floor
    algebra in the oracle), and the value algebra is parenthesized
    identically on both engines."""
    ev = catalog.load_table(spark, sf_dir, "events")
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    # integer sequence + timestamp_add, NOT sequence(lo, hi, interval):
    # the temporal sequence expression is interpreted per element
    # (measured 2.2 s vs 0.4 s for the ~1M-point grid at sf0.1)
    n_hours = ((F.col("hi") - F.col("lo")).cast("long") / F.lit(3600)).cast(
        "long"
    )
    grid = bounds.select(
        "user_id",
        "lo",
        F.explode(F.sequence(F.lit(0).cast("long"), n_hours)).alias("k"),
    ).select(
        "user_id",
        F.timestamp_add("HOUR", F.col("k").cast("int"), F.col("lo")).alias(
            "ts"
        ),
    )
    u = ev.select(
        "user_id", "ts", "value", F.lit(0).alias("is_grid")
    ).unionByName(
        grid.select(
            "user_id", "ts", F.lit(None).cast("double").alias("value"),
            F.lit(1).alias("is_grid"),
        )
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_grid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # "first following" expressed as a CUMULATIVE frame over the REVERSED
    # ordering: Spark evaluates [1 FOLLOWING, UNBOUNDED FOLLOWING] frames
    # by rescanning to the partition end for every row — O(n²) per user
    # (measured 4.6 s at sf0.1); the descending cumulative frame keeps
    # running state — O(n) — at the cost of a second sort (4.6 → 1.5 s).
    # The oracle keeps the straightforward FOLLOWING spelling (DuckDB
    # evaluates it fine); results are identical.
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("is_grid").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ev_ts = F.when(F.col("is_grid") == 0, F.col("ts"))
    filled = u.select(
        "user_id",
        "ts",
        "is_grid",
        F.last("value", ignorenulls=True).over(wp).alias("prev_val"),
        F.last(ev_ts, ignorenulls=True).over(wp).alias("prev_ts"),
        F.last("value", ignorenulls=True).over(wf).alias("next_val"),
        F.last(ev_ts, ignorenulls=True).over(wf).alias("next_ts"),
    )
    frac = (
        (F.col("ts") - F.col("prev_ts")).cast("long") * F.lit(1.0)
        / (F.col("next_ts") - F.col("prev_ts")).cast("long")
    )
    filled_rows = filled.where(
        (F.col("is_grid") == 1)
        & F.col("prev_ts").isNotNull()
        & F.col("next_ts").isNotNull()
    )
    interp = F.col("prev_val") + (F.col("next_val") - F.col("prev_val")) * frac
    return filled_rows.select(
        "user_id",
        F.col("ts").alias("grid_ts"),
        # floor-truncate to 6dp instead of round(): round() half-breaking
        # on doubles differs between Spark (BigDecimal HALF_UP) and
        # DuckDB when the product lands EXACTLY on a .5 ulp boundary
        # (observed: 33.5271875); floor has no tie to break
        (F.floor(interp * F.lit(1.0e6)) / F.lit(1.0e6)).alias(
            "value_interp"
        ),
    )


# ---------------------------------------------------------------------------
# growth_accounting — daily new / returning / resurrected actives
# ---------------------------------------------------------------------------

_GROWTH_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
seq AS (
  SELECT user_id, d,
         lag(d)  OVER (PARTITION BY user_id ORDER BY d) AS prev_d,
         min(d)  OVER (PARTITION BY user_id)            AS first_d
  FROM days
)
SELECT d AS day,
       CAST(count(*) AS BIGINT)                                 AS active,
       CAST(count(*) FILTER (WHERE d = first_d) AS BIGINT)      AS new_users,
       CAST(count(*) FILTER (WHERE prev_d = d - 1) AS BIGINT)   AS returning,
       CAST(count(*) FILTER (WHERE prev_d IS NOT NULL
                               AND prev_d < d - 1) AS BIGINT)   AS resurrected
FROM seq
GROUP BY d
"""


@_register("growth_accounting", _GROWTH_ORACLE)
def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth accounting — the standard active-user decomposition:
    every active user on day d is NEW (first activity), RETURNING
    (active yesterday) or RESURRECTED (active before, but not
    yesterday). active = new + returning + resurrected, per day.

    Plan: the distinct (user, day) activity matrix (one aggregation —
    state bounded by users × days, not events), a per-user lag/min
    window (local sorts on the same user_id partitioning — exchange
    reused from the distinct), and a day-grouped conditional count.
    Pure integer counts: no float parity surface at all."""
    ev = catalog.load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    wp = Window.partitionBy("user_id")
    seq = days.select(
        "user_id",
        "d",
        F.lag("d").over(w).alias("prev_d"),
        F.min("d").over(wp).alias("first_d"),
    )
    day_before = F.date_sub(F.col("d"), 1)
    return seq.groupBy(F.col("d").alias("day")).agg(
        F.count(F.lit(1)).alias("active"),
        F.count_if(F.col("d") == F.col("first_d")).alias("new_users"),
        F.count_if(F.col("prev_d") == day_before).alias("returning"),
        F.count_if(
            F.col("prev_d").isNotNull() & (F.col("prev_d") < day_before)
        ).alias("resurrected"),
    )


# ---------------------------------------------------------------------------
# attribution_last_touch — marketing attribution with lookback window
# ---------------------------------------------------------------------------

_ATTRIB_WINDOW_SEC = 7 * 24 * 3600

_ATTRIB_ORACLE = f"""
WITH touches AS (
  SELECT user_id, ts AS tts,
         (max(struct_pack(eid := event_id, et := event_type))).et AS channel0
  FROM events WHERE event_type IN ('view', 'click')
  GROUP BY user_id, ts
),
p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts,
       CASE WHEN t.tts IS NOT NULL
             AND floor(epoch(p.ts - t.tts)) <= {_ATTRIB_WINDOW_SEC}
            THEN t.channel0 ELSE 'direct' END AS channel,
       CASE WHEN t.tts IS NOT NULL
             AND floor(epoch(p.ts - t.tts)) <= {_ATTRIB_WINDOW_SEC}
            THEN t.tts END AS touch_ts
FROM p ASOF LEFT JOIN touches t
  ON p.user_id = t.user_id AND p.ts >= t.tts
"""


@_register("attribution_last_touch", _ATTRIB_ORACLE)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase is credited to
    the user's most recent view-or-click at or before it, but only
    within a 7-day lookback — otherwise the purchase is 'direct'.

    The as-of probe is the union-merge kernel (asof.asof_join — one
    per-user sorted window, no range join, no per-purchase probe).
    Competing touchstones at the exact same timestamp are collapsed
    first (struct-max by event_id per (user, ts)) so the as-of match is
    deterministic on both engines; the lookback guard is whole-second
    interval arithmetic applied AFTER the match — semantically "latest
    touch, then test the window", the standard last-touch rule (a
    window-filtered as-of would instead skip past stale touches to even
    staler ones)."""
    from .asof import asof_join

    ev = catalog.load_table(spark, sf_dir, "events")
    touches = (
        ev.where(F.col("event_type").isin("view", "click"))
        .groupBy("user_id", F.col("ts").alias("tts"))
        .agg(
            F.max(
                F.struct(
                    F.col("event_id").alias("eid"),
                    F.col("event_type").alias("et"),
                )
            )
            .getField("et")
            .alias("channel0")
        )
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    matched = asof_join(
        purchases,
        touches,
        on=["user_id"],
        left_ts="ts",
        right_ts="tts",
        right_cols=["channel0"],
        how="left",
    )
    within = F.col("tts_right").isNotNull() & (
        (F.col("ts") - F.col("tts_right")).cast("long")
        <= F.lit(_ATTRIB_WINDOW_SEC)
    )
    return matched.select(
        "event_id",
        "user_id",
        "ts",
        F.when(within, F.col("channel0_right"))
        .otherwise(F.lit("direct"))
        .alias("channel"),
        F.when(within, F.col("tts_right")).alias("touch_ts"),
    )


# ---------------------------------------------------------------------------
# event_path_trigrams — most common 3-step behavioral paths
# ---------------------------------------------------------------------------

_PATHS_TOP = 20

_PATHS_ORACLE = f"""
WITH seq AS (
  SELECT event_type AS t0,
         lead(event_type)    OVER w AS t1,
         lead(event_type, 2) OVER w AS t2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT concat_ws('>', t0, t1, t2) AS path,
       CAST(count(*) AS BIGINT) AS n
FROM seq WHERE t2 IS NOT NULL
GROUP BY 1
ORDER BY n DESC, path
LIMIT {_PATHS_TOP}
"""


@_register("event_path_trigrams", _PATHS_ORACLE)
def q_event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top behavioral 3-step paths: sliding trigrams over each user's
    ordered event-type sequence, counted corpus-wide — the "what do
    users actually do" report that complements the one-step Markov
    matrix (mining.py) with multi-step context.

    One per-user window produces both leads (shared sort), the trigram
    count shuffles |types|³-bounded keys, and the top-{_PATHS_TOP} is a
    TakeOrderedAndProject over that tiny aggregate — never a sort of
    the event stream."""
    ev = catalog.load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("t0"),
        F.lead("event_type").over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
    ).where(F.col("t2").isNotNull())
    return (
        seq.groupBy(
            F.concat_ws(">", "t0", "t1", "t2").alias("path")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(_PATHS_TOP)
    )


# ---------------------------------------------------------------------------
# attribution_linear — fractional multi-touch credit
# ---------------------------------------------------------------------------

_LINEAR_ORACLE = f"""
WITH touches AS (
  SELECT user_id, event_id, event_type AS channel, ts AS tts
  FROM events WHERE event_type IN ('view', 'click')
),
p AS (
  SELECT event_id AS p_id, user_id, ts AS pts
  FROM events WHERE event_type = 'purchase'
),
credits AS (
  SELECT p.p_id, t.channel,
         1.0e0 / count(*) OVER (PARTITION BY p.p_id) AS credit
  FROM p JOIN touches t
    ON t.user_id = p.user_id
   AND t.tts < p.pts
   AND (epoch_us(p.pts) - epoch_us(t.tts))
       <= {_ATTRIB_WINDOW_SEC}::BIGINT * 1000000
)
SELECT channel,
       round(sum(credit), 6)                    AS total_credit,
       CAST(count(DISTINCT p_id) AS BIGINT)     AS n_conversions
FROM credits GROUP BY channel
"""


@_register("attribution_linear", _LINEAR_ORACLE)
def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every view/click STRICTLY before
    a purchase and within the 7-day lookback shares the conversion
    credit equally (1/n per touch) — the fractional complement of
    ``attribution_last_touch``.

    The purchase×touch pairing is a per-user range join: partitioned on
    ``user_id`` it is bounded by per-user activity (never a global
    cross product), and the credit denominator rides one per-purchase
    window over the matched pairs. The lookback gap compares integer
    microseconds (see signals.debounce_events for why)."""
    ev = catalog.load_table(spark, sf_dir, "events")
    touches = ev.where(
        F.col("event_type").isin("view", "click")
    ).select(
        "user_id",
        F.col("event_type").alias("channel"),
        F.col("ts").alias("tts"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("pts"),
    )
    gap_us = F.expr("timestampdiff(MICROSECOND, tts, pts)")
    pairs = p.join(
        touches,
        (p.user_id == touches.user_id)
        & (F.col("tts") < F.col("pts")),
    ).where(gap_us <= F.lit(_ATTRIB_WINDOW_SEC * 1_000_000).cast("long"))
    credit = F.lit(1.0) / F.count(F.lit(1)).over(
        Window.partitionBy("p_id")
    )
    credits = pairs.select("p_id", "channel", credit.alias("credit"))
    return credits.groupBy("channel").agg(
        F.round(F.sum("credit"), 6).alias("total_credit"),
        F.countDistinct("p_id").cast("long").alias("n_conversions"),
    )


# ---------------------------------------------------------------------------
# bot_rate_flags — sustained-rate abuse detection
# ---------------------------------------------------------------------------

_BOT_RATE_PER_DAY = 5
_BOT_SUSTAINED_DAYS = 2

_BOT_ORACLE = f"""
WITH per_day AS (
  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
),
runs AS (
  SELECT user_id, day, n,
         day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                    AS INTEGER) AS grp
  FROM per_day
  WHERE n >= {_BOT_RATE_PER_DAY}
),
streaks AS (
  SELECT user_id, grp, count(*) AS run_len, max(n) AS peak_rate
  FROM runs GROUP BY user_id, grp
)
SELECT user_id,
       CAST(max(run_len) AS BIGINT)  AS longest_hot_streak_days,
       CAST(max(peak_rate) AS BIGINT) AS peak_events_per_day,
       max(run_len) >= {_BOT_SUSTAINED_DAYS} AS flagged
FROM streaks GROUP BY user_id
"""


@_register("bot_rate_flags", _BOT_ORACLE)
def q_bot_rate_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sustained-rate abuse flags: users with ≥ {_BOT_RATE_PER_DAY}
    events/day on ≥ {_BOT_SUSTAINED_DAYS} CONSECUTIVE days (the islands
    trick over hot days — one busy day is a spike, a sustained plateau
    is automation; calibrated to the fixture's daily cadence, the same
    shape runs per-minute on a real firehose). Facts reduce to
    (user, day) counts; the streak window runs over hot days only."""
    ev = catalog.load_table(spark, sf_dir, "events")
    per_day = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    hot = per_day.where(F.col("n") >= _BOT_RATE_PER_DAY)
    w = Window.partitionBy("user_id").orderBy("day")
    runs = hot.select(
        "user_id",
        "n",
        F.date_sub("day", F.row_number().over(w)).alias("grp"),
    )
    streaks = runs.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("run_len"), F.max("n").alias("peak_rate")
    )
    return streaks.groupBy("user_id").agg(
        F.max("run_len").cast("long").alias("longest_hot_streak_days"),
        F.max("peak_rate").cast("long").alias("peak_events_per_day"),
        (F.max("run_len") >= _BOT_SUSTAINED_DAYS).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# stickiness_wau_dau — engagement ratio over trailing windows
# ---------------------------------------------------------------------------

_STICKINESS_ORACLE = """
WITH activity AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
days AS (SELECT DISTINCT day FROM activity),
dau AS (
  SELECT day, count(*) AS dau FROM activity GROUP BY day
),
wau AS (
  SELECT d.day, count(DISTINCT a.user_id) AS wau
  FROM days d JOIN activity a
    ON a.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
  GROUP BY d.day
)
SELECT d.day, CAST(d.dau AS BIGINT) AS dau, CAST(w.wau AS BIGINT) AS wau,
       round(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
FROM dau d JOIN wau w USING (day)
"""


@_register("stickiness_wau_dau", _STICKINESS_ORACLE)
def q_stickiness_wau_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU stickiness per day — the canonical
    engagement-intensity ratio. COUNT(DISTINCT) over a trailing RANGE
    window is not a window aggregate in either engine, so the WAU side
    is a day-spine × activity-matrix range join: both inputs are
    (user, day)-distinct rollups (facts reduce first), the join fans
    out at most 7× the activity matrix, and the distinct count shuffles
    (day, user) pairs."""
    ev = catalog.load_table(spark, sf_dir, "events")
    activity = ev.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    days = activity.select("day").distinct()
    dau = activity.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    a = activity.select(
        F.col("day").alias("a_day"), "user_id"
    )
    wau = (
        days.join(
            a,
            (F.col("a_day") >= F.date_sub(F.col("day"), 6))
            & (F.col("a_day") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return dau.join(wau, "day").select(
        "day",
        F.col("dau").cast("long").alias("dau"),
        F.col("wau").cast("long").alias("wau"),
        F.round(F.col("dau").cast("double") / F.col("wau"), 6)
        .alias("stickiness"),
    )


# ---------------------------------------------------------------------------
# session_diversity_entropy — behavioral diversity per user
# ---------------------------------------------------------------------------

_DIVERSITY_ORACLE = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS c
  FROM events GROUP BY user_id, event_type
),
p AS (
  SELECT user_id, c,
         sum(c) OVER (PARTITION BY user_id) AS n
  FROM c
)
SELECT user_id,
       CAST(max(n) AS BIGINT)   AS n_events,
       CAST(count(*) AS BIGINT) AS n_types,
       round(CAST(sum(CAST(round(-(CAST(c AS DOUBLE) / n)
                                 * ln(CAST(c AS DOUBLE) / n), 9)
                          AS DECIMAL(18,9))) AS DOUBLE), 6) AS entropy,
       round(CAST(1 AS DOUBLE)
             - CAST(sum(c * c) AS DOUBLE) / (max(n) * max(n)), 6)
         AS gini_simpson
FROM p GROUP BY user_id
"""


@_register("session_diversity_entropy", _DIVERSITY_ORACLE)
def q_session_diversity_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Behavioral-diversity features per user: Shannon entropy and the
    Gini-Simpson index of the event-type distribution plus type/event
    counts — the standard segmentation inputs separating single-action
    bots (entropy 0) from diverse organic users, feeding the same model
    table as rfm_segmentation.

    One grouped count (|users|·|types| keys), a per-user total window
    over that rollup, one final per-user aggregation. Entropy terms
    round to 9 dp and sum in DECIMAL (order-independent, ≤|types|
    terms); Gini-Simpson is exact integer algebra until one division."""
    ev = catalog.load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    p = c.withColumn(
        "n", F.sum("c").over(Window.partitionBy("user_id"))
    )
    h_term = F.round(
        -(F.col("c").cast("double") / F.col("n"))
        * F.log(F.col("c").cast("double") / F.col("n")),
        9,
    ).cast("decimal(18,9)")
    return p.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.round(F.sum(h_term).cast("double"), 6).alias("entropy"),
        F.round(
            F.lit(1.0)
            - F.sum(F.col("c") * F.col("c")).cast("double")
            / (F.max("n") * F.max("n")),
            6,
        ).alias("gini_simpson"),
    )


# ---------------------------------------------------------------------------
# conversion_latency_percentiles — how fast do cohorts convert?
# ---------------------------------------------------------------------------

_CONV_LATENCY_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         CAST(date_trunc('month', min(ts)) AS DATE) AS cohort_month,
         min(CASE WHEN event_type = 'view' THEN ts END)     AS t_view,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
  FROM events GROUP BY user_id
),
conv AS (
  SELECT cohort_month,
         date_diff('microsecond', t_view, t_buy) // 3600000000 AS latency_h
  FROM per_user
  WHERE t_view IS NOT NULL AND t_buy IS NOT NULL AND t_buy > t_view
)
SELECT cohort_month,
       CAST(count(*) AS BIGINT) AS n_converted,
       CAST(quantile_disc(latency_h, 0.5) AS BIGINT) AS p50_hours,
       CAST(quantile_disc(latency_h, 0.9) AS BIGINT) AS p90_hours,
       CAST(max(latency_h) AS BIGINT)                AS max_hours
FROM conv GROUP BY cohort_month
"""


@_register("conversion_latency_percentiles", _CONV_LATENCY_ORACLE)
def q_conversion_latency_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-view → first-purchase latency distribution per acquisition
    cohort: the speed companion to retention_cohorts (which measures
    WHETHER users come back; this measures HOW FAST intent converts,
    and a p90 drifting up across cohorts is the classic early regression
    signal product teams watch).

    One grouped min-pass reduces the facts to a per-user row; latency
    is a tz-free integer hour diff; witnessed percentiles over the
    month-sized cohort groups. The strict t_buy > t_view guard drops
    users whose first purchase precedes any view (no defined funnel
    latency), matching the funnel operators' ordering semantics."""
    ev = catalog.load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("month", F.min("ts"))).alias("cohort_month"),
        F.min(
            F.when(F.col("event_type") == "view", F.col("ts"))
        ).alias("t_view"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("t_buy"),
    )
    conv = per_user.where(
        F.col("t_view").isNotNull()
        & F.col("t_buy").isNotNull()
        & (F.col("t_buy") > F.col("t_view"))
    ).select(
        "cohort_month",
        # exact elapsed hours as integer-µs floor division — DuckDB's
        # date_diff('hour') counts boundary CROSSINGS, not elapsed hours,
        # so both sides spell the µs diff // 3.6e9 explicitly
        F.expr(
            "timestampdiff(MICROSECOND, t_view, t_buy) div 3600000000"
        ).alias("latency_h"),
    )
    return conv.groupBy("cohort_month").agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY latency_h)")
        .cast("long")
        .alias("p50_hours"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY latency_h)")
        .cast("long")
        .alias("p90_hours"),
        F.max("latency_h").cast("long").alias("max_hours"),
    )


# ---------------------------------------------------------------------------
# user_burstiness_profile — Goh-Barabási burstiness of event cadence
# ---------------------------------------------------------------------------

_BURST_ORACLE = """
WITH seq AS (
  SELECT user_id,
         lag(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev_ts,
         ts
  FROM events
),
gaps AS (
  -- integer-millisecond gaps: exact on both engines (µs diff is a
  -- bigint; // 1000 truncates identically for the non-negative gaps)
  SELECT user_id,
         (epoch_us(ts) - epoch_us(prev_ts)) // 1000 AS gap_ms
  FROM seq WHERE prev_ts IS NOT NULL
),
per_user AS (
  -- Σx and Σx² accumulate as DECIMAL: exact integer sums under any
  -- reduction order. gap_ms is cast to DECIMAL(19,0) BEFORE squaring —
  -- an int64 gap_ms * gap_ms overflows at a single ~35.1-day gap
  -- (3.04e9 ms squared > 2^63), entirely reachable on long-horizon data
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_gaps,
         sum(CAST(gap_ms AS DECIMAL(38,0))) AS s1,
         sum(CAST(gap_ms AS DECIMAL(19,0))
             * CAST(gap_ms AS DECIMAL(19,0))) AS s2
  FROM gaps GROUP BY user_id HAVING count(*) >= 2
),
b AS (
  SELECT user_id, n_gaps,
         (sqrt(greatest(CAST(s2 AS DOUBLE) / n_gaps
                        - (CAST(s1 AS DOUBLE) / n_gaps)
                          * (CAST(s1 AS DOUBLE) / n_gaps), 0.0))
          - CAST(s1 AS DOUBLE) / n_gaps)
         / nullif(sqrt(greatest(CAST(s2 AS DOUBLE) / n_gaps
                                - (CAST(s1 AS DOUBLE) / n_gaps)
                                  * (CAST(s1 AS DOUBLE) / n_gaps), 0.0))
                  + CAST(s1 AS DOUBLE) / n_gaps, 0.0) AS burstiness
  FROM per_user
)
SELECT CAST(floor(burstiness * 10) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_users,
       round(CAST(sum(CAST(round(burstiness, 6) AS DECIMAL(18,6)))
                  AS DOUBLE) / count(*), 6) AS mean_burstiness,
       CAST(sum(n_gaps) AS BIGINT) AS n_gaps
FROM b
GROUP BY 1
"""


@_register("user_burstiness_profile", _BURST_ORACLE)
def q_user_burstiness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness of each user's event cadence, B = (σ−μ)/(σ+μ) over
    inter-event gaps (Goh & Barabási 2008, "Burstiness and memory in
    complex systems"): B→−1 is a metronome, B≈0 Poisson, B→1 bursty.
    Reported as a bucketed histogram (floor(B·10)) with per-bucket mean
    — the population profile that separates bot-like regular traffic
    from organic bursty sessions (complements bot_rate_flags and
    debounce_events, which act on the extremes this measures).

    Engine-exactness: gaps are integer milliseconds; Σx and Σx² are
    exact DECIMAL(38,0) integer sums, so μ and σ come from identical
    doubles on both engines (sqrt is IEEE-correctly-rounded); bucket
    means use the round→DECIMAL(18,6) exact-sum trick.

    Scale shape: one user-keyed lag window (bounded partitions), one
    grouped reduce per user, one reduce over ≤20 buckets — shuffles on
    user_id once; nothing global."""
    ev = catalog.load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "ts", F.lag("ts").over(w).alias("prev_ts")
    ).where(F.col("prev_ts").isNotNull())
    gap_ms = F.expr("timestampdiff(MICROSECOND, prev_ts, ts) div 1000")
    per_user = (
        seq.select("user_id", gap_ms.alias("gap_ms"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.sum(F.col("gap_ms").cast("decimal(38,0)")).alias("s1"),
            F.sum(
                # cast BEFORE squaring: int64 gap² overflows at one
                # ~35.1-day gap; DECIMAL(19,0)² is exact at any horizon
                F.col("gap_ms").cast("decimal(19,0)")
                * F.col("gap_ms").cast("decimal(19,0)")
            ).alias("s2"),
        )
        .where(F.col("n_gaps") >= 2)
    )
    n = F.col("n_gaps")
    mu = F.col("s1").cast("double") / n
    var = F.col("s2").cast("double") / n - mu * mu
    sigma = F.sqrt(F.greatest(var, F.lit(0.0)))
    b = per_user.select(
        "n_gaps",
        (
            (sigma - mu) / F.nullif(sigma + mu, F.lit(0.0))
        ).alias("burstiness"),
    )
    return b.groupBy(
        F.floor(F.col("burstiness") * 10).cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.round(
            F.sum(
                F.round(F.col("burstiness"), 6).cast("decimal(18,6)")
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_burstiness"),
        F.sum("n_gaps").cast("long").alias("n_gaps"),
    )
