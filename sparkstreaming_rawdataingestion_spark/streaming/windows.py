"""Event-time windowing — capabilities the reference *implies* but never
had (it carried a per-record ``dateTime`` yet only ever batched by
processing time — SURVEY §2.2 'Streaming' row).

Each helper takes any DataFrame (batch or streaming) so the same code path
is (a) DuckDB-oracle-checked in batch mode via the registered queries and
(b) run as a genuine watermark-bounded streaming query in tests.

Scale note: streaming state is bounded by the watermark — Spark drops
window state older than ``watermark`` — and lives in the state store
(RocksDB-backed in production) keyed by (group, window), so state size
follows active-window cardinality, not stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

QUERIES: dict = {}
ORACLES: dict = {}

DEFAULT_WATERMARK = "10 minutes"


def with_watermark(events: DataFrame, column: str = "ts") -> DataFrame:
    """Watermarks require TIMESTAMP (tz-aware); the engine's NTZ event time
    is reinterpreted as UTC (session TZ is pinned UTC)."""
    df = events.withColumn(column, F.col(column).cast("timestamp"))
    if df.isStreaming:
        df = df.withWatermark(column, DEFAULT_WATERMARK)
    return df


def tumbling_counts(events: DataFrame, width: str = "6 hours") -> DataFrame:
    """Tumbling event-time windows: per-window count and exact value sum."""
    df = with_watermark(events)
    return (
        df.groupBy(F.window("ts", width), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            F.col("window.end").cast("timestamp_ntz").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame, width: str = "12 hours", slide: str = "6 hours"
) -> DataFrame:
    """Sliding windows — each event lands in width/slide overlapping
    windows (explode happens inside the window expression)."""
    df = with_watermark(events)
    return (
        df.groupBy(F.window("ts", width, slide))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            F.col("window.end").cast("timestamp_ntz").alias("window_end"),
            "n_events",
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows: a session extends while consecutive events arrive
    within ``gap``; ``session_window.end`` = last event + gap."""
    df = with_watermark(events)
    return (
        df.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start")
            .cast("timestamp_ntz")
            .alias("session_start"),
            F.col("session_window.end").cast("timestamp_ntz").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def stream_dedup(events: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Streaming exact dedup within the watermark horizon — state holds one
    key per event inside the watermark, dropped as the watermark passes."""
    df = with_watermark(events)
    return df.dropDuplicates(keys or ["event_id"])


# ---------------------------------------------------------------------------
# Batch-twin registered queries (oracle-checked; same helpers the streaming
# tests run with a real watermark)
# ---------------------------------------------------------------------------


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


@_register(
    "tumbling_window_counts",
    """
SELECT time_bucket(INTERVAL '6 hours', ts)                    AS window_start,
       time_bucket(INTERVAL '6 hours', ts) + INTERVAL 6 HOUR  AS window_end,
       event_type,
       CAST(count(*) AS BIGINT)                               AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)      AS sum_value
FROM events
GROUP BY 1, 2, 3
""",
)
def q_tumbling_window_counts(spark, sf_dir):
    from .. import catalog

    return tumbling_counts(catalog.load_table(spark, sf_dir, "events"))


@_register(
    "sliding_window_counts",
    """
WITH assigned AS (
  SELECT time_bucket(INTERVAL '6 hours', ts) AS w FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '6 hours', ts) - INTERVAL 6 HOUR FROM events
)
SELECT w                        AS window_start,
       w + INTERVAL 12 HOUR     AS window_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM assigned
GROUP BY 1, 2
""",
)
def q_sliding_window_counts(spark, sf_dir):
    from .. import catalog

    return sliding_counts(catalog.load_table(spark, sf_dir, "events"))


@_register(
    "session_window_agg",
    """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
), numbered AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM flagged
)
SELECT min(ts)                        AS session_start,
       max(ts) + INTERVAL 30 MINUTE   AS session_end,
       user_id,
       CAST(count(*) AS BIGINT)       AS n_events
FROM numbered
GROUP BY user_id, session_id
""",
)
def q_session_window_agg(spark, sf_dir):
    from .. import catalog

    return session_windows(catalog.load_table(spark, sf_dir, "events"))


def ohlc_windows(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Streaming/batch OHLC downsampling (the streaming twin of
    operators/behavior.py::q_ohlc_downsample): open/close are struct
    min/max over (ts, event_id, value) — per-window state is two tagged
    structs plus three scalars, so the state store stays O(1) per
    (window, series) whatever the event rate."""
    df = with_watermark(events)
    tagged = F.struct(
        F.col("ts").alias("t"), F.col("event_id").alias("eid"),
        F.col("value").alias("v"),
    )
    return (
        df.groupBy(F.window("ts", width), "event_type")
        .agg(
            F.min(tagged).getField("v").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(tagged).getField("v").alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("bucket"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n",
        )
    )
