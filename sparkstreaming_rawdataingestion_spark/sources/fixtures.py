"""Kafka-shaped fixture messages generated from the ``events`` table.

The reference's native input is a Kafka message whose value is one JSON
document ``{"datastream_id": int, "data": [{"dateTime": ms, "offset": ms,
"sample": <json>}, ...]}`` (RawDataIngestion.java:134-141, FIXTURES.md §A.1).
No Kafka broker exists in the test environment, so this module wraps the
deterministic ``events`` rows into exactly that shape; the ingest pipeline
then consumes the wrapped messages the same way it would consume
``CAST(value AS STRING)`` from a real Kafka source.

Mapping (FIXTURES.md §A.1):
  datastream_id = user_id
  dateTime      = epoch milliseconds of ts (µs truncated)
  offset        = ((event_id % 7) - 3) * 37000  ms — deterministic, includes
                  negative and non-multiple-of-60000 values to exercise the
                  truncating division of op 8
  sample        = props (a JSON object, embedded raw — not string-escaped)

Scale note: the groupBy/collect_list here is *fixture scaffolding* (one
message per user, bounded by the per-user event count); the engine's ingest
path itself is shuffle-free (SURVEY §3.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Deterministic per-event offset expression, shared with the oracle SQL.
OFFSET_MS_EXPR = "((event_id % 7) - 3) * 37000"

# Edge-case messages (SURVEY §0 error paths): one malformed JSON value, one
# message with an empty data array. Both must produce zero output rows.
MALFORMED_MESSAGE = '{"datastream_id": oops'
EMPTY_DATA_MESSAGE = '{"datastream_id": -1, "data": []}'


# (session-id, sf_dir, edge_cases) → materialized message DataFrame; the
# ingest-family queries all start from the same wrapped messages, so the
# wrap (a fixture cost, not an engine cost) is computed once per session.
_MESSAGE_CACHE: dict = {}


def cached_messages(
    spark, sf_dir: str, include_edge_cases: bool = True
) -> DataFrame:
    from .. import catalog, session

    key = (id(spark._jsparkSession), sf_dir, include_edge_cases)
    df = _MESSAGE_CACHE.get(key)
    if df is None:
        events = catalog.load_table(spark, sf_dir, "events")
        df = events_to_messages(events, include_edge_cases)
        _MESSAGE_CACHE[key] = df
    # Persisted directly — deliberately NOT via session.stage, so
    # release_staged() (which drops dead per-query operator staging
    # between registry entries) leaves this cache alone: it is a bounded
    # session-lifetime fixture cache (one entry per (session, sf_dir)),
    # and the Kafka-message wrap it amortizes is a fixture cost shared by
    # every ingest-family query, not an engine cost. Re-persist if some
    # caller unpersisted it — at the same storage level the engine's
    # stage() uses, so SPARK_GRAFT_SCALE_MODE=disk governs this cache too.
    lvl = df.storageLevel
    if not (lvl.useMemory or lvl.useDisk):
        df = df.persist(session.staging_storage_level())
        _MESSAGE_CACHE[key] = df
    return df


def events_to_messages(events: DataFrame, include_edge_cases: bool = True) -> DataFrame:
    """Wrap events into Kafka-shaped JSON message values (one per user).

    Returns a single-column DataFrame ``value: string``, mirroring
    ``CAST(value AS STRING)`` of a Kafka scan (SURVEY §2.1 op 3).
    """
    elements = events.select(
        F.col("user_id"),
        F.struct(
            F.unix_millis(F.col("ts").cast("timestamp")).alias("dateTime"),
            F.expr(OFFSET_MS_EXPR).try_cast("int").alias("offset"),
            # Parse the single-key props JSON so to_json embeds it as a raw
            # object (not an escaped string). Fixture-only schema; the
            # engine itself never imposes a schema on the payload.
            F.from_json(F.col("props"), "k INT").alias("sample"),
        ).alias("e"),
    )
    messages = (
        elements.groupBy("user_id")
        .agg(F.collect_list("e").alias("data"))
        .select(
            F.to_json(
                F.struct(
                    # try_cast: an id past int range becomes a null
                    # datastream_id in the message — i.e. a MALFORMED
                    # message the engine's lenient parse drops (op 4),
                    # mirroring what any upstream producer bug yields
                    F.col("user_id").try_cast("int").alias("datastream_id"),
                    F.col("data"),
                )
            ).alias("value")
        )
    )
    if include_edge_cases:
        spark = events.sparkSession
        edge = spark.createDataFrame(
            [(MALFORMED_MESSAGE,), (EMPTY_DATA_MESSAGE,)], "value string"
        )
        messages = messages.unionAll(edge)
    return messages


# (session-id, sf_dir) → broker log dir holding the fixture messages; a
# fresh mkdtemp per session so a stale dir from an earlier process can
# never double-append (produce() appends to partition logs).
_SIM_LOG_CACHE: dict = {}

SIM_TOPIC = "raw-events"
SIM_PARTITIONS = 3


def sim_message_log(spark, sf_dir: str) -> str:
    """Materialize the fixture messages into a kafka_sim broker log —
    SIM_PARTITIONS partition files of one topic, values round-robined in
    sorted order so the log content is deterministic per sf_dir. This is
    fixture plumbing (a test producer writing a small per-user message
    set), not an engine path: the engine reads it back through the
    DataSource API exactly as it would a real broker."""
    import tempfile

    from . import kafka_sim

    key = (id(spark._jsparkSession), sf_dir)
    log = _SIM_LOG_CACHE.get(key)
    if log is None:
        log = tempfile.mkdtemp(prefix="spark_graft_kafka_sim_")
        values = sorted(
            r["value"]
            for r in cached_messages(spark, sf_dir, True).collect()
        )
        for p in range(SIM_PARTITIONS):
            kafka_sim.produce(log, SIM_TOPIC, values[p::SIM_PARTITIONS], p)
        _SIM_LOG_CACHE[key] = log
    return log


def write_message_files(events: DataFrame, path: str, num_files: int = 4) -> None:
    """Materialize fixture messages as JSON-lines text files — the streaming
    tests replay these through a file source standing in for Kafka."""
    events_to_messages(events).repartition(num_files).write.mode("overwrite").text(path)


def sim_message_count(log: str) -> int:
    """Messages in a sim_message_log dir (offsets are line numbers)."""
    import os

    return sum(
        1
        for p in range(SIM_PARTITIONS)
        for _ in open(os.path.join(log, SIM_TOPIC, f"p{p}.jsonl"))
    )
