"""Structured Streaming tests — the reference's modality, end-to-end:
fixture messages replayed through a file source (Kafka stand-in),
checkpointed sinks, exactly-once restart, watermarked windows, streaming
dedup. Batch/stream parity is the core assertion throughout."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from sparkstreaming_rawdataingestion_spark import catalog
from sparkstreaming_rawdataingestion_spark.operators.ingest import ingest_normalize
from sparkstreaming_rawdataingestion_spark.sources import fixtures, kafka
from sparkstreaming_rawdataingestion_spark.streaming import ingest_stream, windows

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def message_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("messages"))
    events = catalog.load_table(spark, SF, "events")
    fixtures.write_message_files(events, path, num_files=4)
    return path


def _drain(query):
    query.awaitTermination()


def test_stream_file_sink_matches_batch(spark, message_dir, tmp_path):
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream = kafka.message_file_stream(spark, message_dir, max_files_per_trigger=2)
    q = ingest_stream.start_ingest_file_sink(stream, sink, ckpt)
    _drain(q)

    got = spark.read.parquet(sink)
    events = catalog.load_table(spark, SF, "events")
    want = ingest_normalize(fixtures.events_to_messages(events))
    assert got.count() == want.count()
    # full value parity (day comes back as partition column → reorder)
    cols = sorted(want.columns)
    assert sorted(map(tuple, got.select(cols).collect())) == sorted(
        map(tuple, want.select(cols).collect())
    )


def test_stream_restart_is_exactly_once(spark, message_dir, tmp_path):
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream = kafka.message_file_stream(spark, message_dir)
    _drain(ingest_stream.start_ingest_file_sink(stream, sink, ckpt))
    n1 = spark.read.parquet(sink).count()
    # restart against the same checkpoint: no new input → no new rows
    stream2 = kafka.message_file_stream(spark, message_dir)
    _drain(ingest_stream.start_ingest_file_sink(stream2, sink, ckpt))
    n2 = spark.read.parquet(sink).count()
    assert n1 == n2 > 0


def test_stream_upsert_sink_parity(spark, message_dir, tmp_path):
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream = kafka.message_file_stream(spark, message_dir, max_files_per_trigger=1)
    q = ingest_stream.start_ingest_upsert_sink(stream, sink, ckpt)
    _drain(q)
    got = spark.read.parquet(sink)
    events = catalog.load_table(spark, SF, "events")
    want = ingest_normalize(fixtures.events_to_messages(events))
    assert got.count() == want.count()


def test_streaming_tumbling_window_matches_batch(spark, tmp_path):
    """The SAME helper runs as a watermarked streaming agg and a batch agg;
    results must be identical once the stream drains."""
    events = catalog.load_table(spark, SF, "events")
    stage = str(tmp_path / "events_parquet")
    events.write.parquet(stage)
    stream = spark.readStream.schema(
        spark.read.parquet(stage).schema
    ).parquet(stage)

    out = str(tmp_path / "window_sink")
    ckpt = str(tmp_path / "window_ckpt")
    q = (
        windows.tumbling_counts(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = spark.read.parquet(out)
    want = windows.tumbling_counts(events)
    # append mode emits exactly the watermark-closed windows: those ending
    # at or before max(event time) - watermark
    max_ts = events.agg(F.max("ts")).first()[0]
    closed = want.where(
        F.col("window_end")
        <= F.lit(max_ts) - F.expr(f"INTERVAL {windows.DEFAULT_WATERMARK}")
    )
    cols = sorted(want.columns)
    got_set = set(map(tuple, got.select(cols).collect()))
    want_set = set(map(tuple, want.select(cols).collect()))
    closed_set = set(map(tuple, closed.select(cols).collect()))
    assert closed_set <= got_set <= want_set


def test_streaming_dedup_drops_redelivery(spark, message_dir, tmp_path):
    """at-least-once redelivery absorbed by streaming dropDuplicates —
    the watermark-bounded engine-side version of the Cassandra upsert."""
    events = catalog.load_table(spark, SF, "events")
    stage = str(tmp_path / "dup_events")
    events.unionAll(events).repartition(4).write.parquet(stage)
    stream = spark.readStream.schema(events.schema).parquet(stage)
    deduped = windows.stream_dedup(stream, keys=["event_id"])
    out = str(tmp_path / "dedup_sink")
    ckpt = str(tmp_path / "dedup_ckpt")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    assert spark.read.parquet(out).count() == events.count()


def test_processing_time_trigger_runs(spark, message_dir, tmp_path):
    """Op 14 — the reference's 5 s cadence (scaled to 1 s for the test):
    a processing-time-triggered query actually fires batches."""
    sink = str(tmp_path / "pt_sink")
    ckpt = str(tmp_path / "pt_ckpt")
    stream = kafka.message_file_stream(spark, message_dir)
    q = ingest_stream.start_ingest_file_sink(
        stream, sink, ckpt, trigger_seconds=1
    )
    try:
        q.processAllAvailable()  # drain so stop() never aborts a mid-write batch
        deadline = time.time() + 30
        while time.time() < deadline:
            if any(p["numInputRows"] > 0 for p in q.recentProgress):
                break
            time.sleep(0.5)
        assert any(p["numInputRows"] > 0 for p in q.recentProgress)
    finally:
        q.stop()
        q.awaitTermination()
