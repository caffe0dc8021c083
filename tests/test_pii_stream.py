"""Streaming PII scrub: batch/stream parity, no-survivor guarantee,
observed redaction metrics, exactly-once restart."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkstreaming_rawdataingestion_spark import catalog
from sparkstreaming_rawdataingestion_spark.operators.ingest import (
    ingest_normalize,
)
from sparkstreaming_rawdataingestion_spark.sources import fixtures, kafka
from sparkstreaming_rawdataingestion_spark.streaming import pii_stream

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def message_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pii_messages"))
    events = catalog.load_table(spark, SF, "events")
    fixtures.write_message_files(events, path, num_files=4)
    return path


def test_scrubbed_stream_matches_batch_scrub(spark, message_dir, tmp_path):
    """The stream's sink must equal scrub_datapoints applied to the
    batch ingest output — same kernel, both modes — and no digit run
    may survive into durable storage."""
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream = kafka.message_file_stream(
        spark, message_dir, max_files_per_trigger=2
    )
    q = pii_stream.start_scrubbed_ingest(stream, sink, ckpt)
    q.awaitTermination()

    got = spark.read.parquet(sink)
    events = catalog.load_table(spark, SF, "events")
    want = pii_stream.scrub_datapoints(
        ingest_normalize(fixtures.events_to_messages(events))
    )
    cols = sorted(want.columns)
    assert sorted(map(tuple, got.select(cols).collect())) == sorted(
        map(tuple, want.select(cols).collect())
    )
    assert got.where(F.col("sample").rlike("[0-9]")).count() == 0
    # the fixture payloads are single-key integer JSON objects, so the
    # scrub must have actually redacted something on every row
    assert got.where(F.col("n_redacted") >= 1).count() == got.count()


def test_scrubbed_stream_observes_redaction_volume(
    spark, message_dir, tmp_path
):
    """The observe() channel must report the exact total redaction
    count across the run — the alarm signal costs no second pass."""
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream = kafka.message_file_stream(spark, message_dir)
    q = pii_stream.start_scrubbed_ingest(stream, sink, ckpt)
    q.awaitTermination()

    observed = sum(
        m["total_redacted"]
        for m in (
            p.observedMetrics.get(pii_stream.OBSERVATION_NAME)
            for p in q.recentProgress
        )
        if m is not None and m["total_redacted"] is not None
    )
    want = (
        spark.read.parquet(sink)
        .agg(F.sum("n_redacted"))
        .collect()[0][0]
    )
    assert observed == want > 0


def test_scrubbed_stream_restart_is_exactly_once(
    spark, message_dir, tmp_path
):
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream = kafka.message_file_stream(spark, message_dir)
    pii_stream.start_scrubbed_ingest(stream, sink, ckpt).awaitTermination()
    n1 = spark.read.parquet(sink).count()
    stream2 = kafka.message_file_stream(spark, message_dir)
    pii_stream.start_scrubbed_ingest(stream2, sink, ckpt).awaitTermination()
    n2 = spark.read.parquet(sink).count()
    assert n1 == n2 > 0
