"""The ingest-normalize pipeline — the reference's entire job as one
DataFrame expression (SURVEY §2.1 ops 3-10, §7.0).

Reference flow (RawDataIngestion.java:100-152):
  Kafka value string → Gson parse → iterate ``data`` array → build one
  ``DataPoint(datastream_id, day, datetime, offset, sample)`` per element →
  upsert to Cassandra ``rawdata`` keyed on (datastream_id, day, datetime).

Engine flow (all built-in expressions, one whole-stage-codegen pipeline,
zero shuffles — identical shuffle profile to the reference, SURVEY §3.3):
  value → from_json(MESSAGE_SCHEMA)      [op 4 — PERMISSIVE: corrupt input
          becomes a null ``data`` field and is filtered, instead of the
          reference's crash-the-batch behavior, SURVEY §0]
        → explode(data)                  [op 5 — correlated flatten; drops
          empty arrays exactly like the reference's zero-iteration loop]
        → scalar normalization           [ops 6-9, functions/]
        → DataPoint projection           [op 10]

Scale notes: this plan is embarrassingly parallel — it scales linearly with
Kafka partitions / input splits, with no shuffle and no state. The ``day``
column is the downstream partition key (sinks.py) so the 100 TB archive
prunes by day at the metadata level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import day_bucket, epoch_ms_to_ts, ms_to_offset_minutes
from ..schemas import MESSAGE_SCHEMA


def parse_messages(values: DataFrame) -> DataFrame:
    """Op 4 — lenient JSON parse of message values (column ``value``).

    PERMISSIVE mode turns malformed documents into all-null structs; the
    not-null filter on ``data`` drops them. This is the well-defined version
    of the reference's catch-and-emit-empty-object (which then NPE'd
    downstream, RawDataIngestion.java:117-126,134).
    """
    return values.select(
        F.from_json(F.col("value"), MESSAGE_SCHEMA).alias("m")
    ).where(F.col("m.data").isNotNull())


def flatten_datapoints(parsed: DataFrame) -> DataFrame:
    """Ops 5-10 — correlated flatten of the ``data`` array plus scalar
    normalization into the DataPoint schema (DataPoint.java:33-37)."""
    exploded = parsed.select(
        F.col("m.datastream_id").alias("datastream_id"),
        F.explode(F.col("m.data")).alias("e"),
    )
    return exploded.select(
        F.col("datastream_id"),
        day_bucket(epoch_ms_to_ts(F.col("e.dateTime"))).alias("day"),
        epoch_ms_to_ts(F.col("e.dateTime")).alias("datetime"),
        ms_to_offset_minutes(F.col("e.offset")).alias("offset"),
        F.col("e.sample").alias("sample"),
    )


def ingest_normalize(values: DataFrame) -> DataFrame:
    """The full value-string → DataPoint pipeline (ops 3-10)."""
    return flatten_datapoints(parse_messages(values))


def observed_ingest_normalize(values: DataFrame):
    """ingest_normalize with parse-error observability: returns
    ``(datapoints, observation)`` where the Observation carries
    ``n_messages`` / ``n_parsed`` / ``n_dropped`` after the first action.

    The reference's only visibility into bad input was a stacktrace print
    before the batch died (RawDataIngestion.java:121); ``df.observe``
    attaches the counts to the SAME job (no second pass over the data —
    metrics ride the task metrics channel), which is the shape a 100 TB
    ingest needs: you cannot afford a separate count() over the firehose
    just to know the drop rate.

    The JSON parse happens exactly ONCE per row: the parsed struct is
    projected first, the CollectMetrics node counts on that column, and
    the normalize path below it reuses the same column (common-subexpression
    elimination does not span the observe boundary, so counting on a fresh
    ``from_json(value, ...)`` would parse the firehose twice — and JSON
    parsing is the dominant ingest cost at 100 TB)."""
    from pyspark.sql import Observation

    obs = Observation("ingest")
    parsed = values.select(F.from_json(F.col("value"), MESSAGE_SCHEMA).alias("m"))
    observed = parsed.observe(
        obs,
        F.count(F.lit(1)).alias("n_messages"),
        F.count_if(F.col("m.data").isNotNull()).alias("n_parsed"),
        F.count_if(F.col("m.data").isNull()).alias("n_dropped"),
    )
    datapoints = flatten_datapoints(observed.where(F.col("m.data").isNotNull()))
    return datapoints, obs
