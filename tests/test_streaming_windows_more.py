"""Sliding and session windows in genuine streaming mode (tumbling is
covered in test_streaming.py) — emitted set must be a subset of the batch
twin, with all watermark-closed windows present."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkstreaming_rawdataingestion_spark import catalog
from sparkstreaming_rawdataingestion_spark.streaming import windows

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def staged_events(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ev"))
    catalog.load_table(spark, SF, "events").write.mode("overwrite").parquet(path)
    return path


def _run_stream(spark, staged, helper, tmp_path, name):
    schema = spark.read.parquet(staged).schema
    stream = spark.readStream.schema(schema).parquet(staged)
    out = str(tmp_path / f"{name}_out")
    q = (
        helper(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / f"{name}_ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


def test_sliding_windows_streaming(spark, staged_events, tmp_path):
    got = _run_stream(spark, staged_events, windows.sliding_counts, tmp_path, "slide")
    want = windows.sliding_counts(catalog.load_table(spark, SF, "events"))
    cols = sorted(want.columns)
    got_set = set(map(tuple, got.select(cols).collect()))
    want_set = set(map(tuple, want.select(cols).collect()))
    assert got_set <= want_set
    assert len(got_set) >= len(want_set) - 4  # ≤ width/slide windows open


def test_session_windows_streaming(spark, staged_events, tmp_path):
    got = _run_stream(
        spark, staged_events, windows.session_windows, tmp_path, "sess"
    )
    want = windows.session_windows(catalog.load_table(spark, SF, "events"))
    cols = sorted(want.columns)
    got_set = set(map(tuple, got.select(cols).collect()))
    want_set = set(map(tuple, want.select(cols).collect()))
    assert got_set <= want_set
    # all sessions ending before the final watermark must have been emitted
    max_ts = (
        catalog.load_table(spark, SF, "events").agg(F.max("ts")).first()[0]
    )
    closed = want.where(
        F.col("session_end")
        <= F.lit(max_ts) - F.expr(f"INTERVAL {windows.DEFAULT_WATERMARK}")
    )
    closed_set = set(map(tuple, closed.select(cols).collect()))
    assert closed_set <= got_set


def test_ohlc_streaming_matches_batch(spark, staged_events, tmp_path):
    """Streaming OHLC (struct-min/max open/close in windowed state) —
    watermark-closed buckets must match the batch twin exactly."""
    got = _run_stream(spark, staged_events, windows.ohlc_windows, tmp_path, "ohlc")
    batch = windows.ohlc_windows(spark.read.parquet(staged_events))
    want = {
        (r.bucket, r.event_type): (r.open, r.high, r.low, r.close, r.n)
        for r in batch.collect()
    }
    emitted = {
        (r.bucket, r.event_type): (r.open, r.high, r.low, r.close, r.n)
        for r in got.collect()
    }
    # availableNow closes every window whose end precedes final watermark
    assert emitted.items() <= want.items()
    wm_end = max(b for b, _ in want)  # newest bucket stays open
    closed = {k: v for k, v in want.items() if k[0] < wm_end}
    assert closed.items() <= emitted.items()
