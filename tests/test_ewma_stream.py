"""Streaming EWMA vs its batch twin — the carried double accumulator must
make the streamed output bit-identical to the batch recurrence under
micro-batch slicing, and late arrivals must be dropped, not folded."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from sparkstreaming_rawdataingestion_spark import catalog
from sparkstreaming_rawdataingestion_spark.operators import mining
from sparkstreaming_rawdataingestion_spark.streaming import ewma_stream

D = datetime.datetime
SF = "/root/testdata/sf0.001"


def _run_stream(spark, src, out, ckpt):
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        ewma_stream.ewma_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_streamed_ewma_matches_batch_twin(spark, tmp_path):
    """Events split into three time-ordered micro-batch files: the
    streamed per-event EWMA equals the batch operator exactly."""
    ev = catalog.load_table(spark, SF, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    src = str(tmp_path / "src")
    cuts = ("2024-01-08 00:00:00", "2024-01-17 00:00:00")
    lo = F.lit(cuts[0]).cast("timestamp_ntz")
    hi = F.lit(cuts[1]).cast("timestamp_ntz")
    for part in (
        ev.where(F.col("ts") < lo),
        ev.where((F.col("ts") >= lo) & (F.col("ts") < hi)),
        ev.where(F.col("ts") >= hi),
    ):
        part.coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "out")
    _run_stream(spark, src, out, str(tmp_path / "ckpt"))

    got = {
        (r.user_id, r.event_id): r.ewma
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.user_id, r.event_id): r.ewma
        for r in mining.q_ewma_smoothing(spark, SF).collect()
    }
    assert got == want  # bit-identical, not approximately equal


def test_late_event_dropped_not_folded(spark, tmp_path):
    """A second batch whose event predates the key's last seen time is
    dropped; the accumulator is unaffected for subsequent events."""
    rows1 = [
        (1, 1, D(2024, 1, 1, 0, 0, 1), 10.0),
        (2, 1, D(2024, 1, 1, 0, 10, 0), 20.0),
    ]
    rows2 = [
        (3, 1, D(2024, 1, 1, 0, 5, 0), 99.0),   # LATE — before event 2
        (4, 1, D(2024, 1, 1, 0, 20, 0), 30.0),  # on time
    ]
    schema = "user_id long, event_id long, ts timestamp_ntz, value double"
    src = str(tmp_path / "src")
    for rows in (rows1, rows2):
        spark.createDataFrame(
            [(u, e, t, v) for e, u, t, v in rows], schema
        ).coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "out")
    _run_stream(spark, src, out, str(tmp_path / "ckpt"))
    got = {
        r.event_id: r.ewma for r in spark.read.parquet(out).collect()
    }
    a = mining._EWMA_ALPHA
    y1 = 10.0
    y2 = a * 20.0 + (1 - a) * y1
    y4 = a * 30.0 + (1 - a) * y2  # event 3 skipped entirely
    assert set(got) == {1, 2, 4}
    assert abs(got[4] - y4) < 1e-6


def test_same_microsecond_tie_folds_in_not_dropped(spark, tmp_path):
    """Two events sharing a key's exact timestamp, split across
    micro-batches: the second is a TIE in the batch twin's (ts,
    event_id) order — it must fold into the recurrence, while an event
    at the same timestamp but a lower event_id than the frontier is
    genuinely late and drops."""
    t = D(2024, 1, 1, 0, 0, 1)
    rows1 = [(2, 1, t, 10.0)]
    rows2 = [
        (1, 1, t, 99.0),  # same ts, LOWER id than frontier → late, drop
        (3, 1, t, 20.0),  # same ts, higher id → tie, folds in
    ]
    schema = "user_id long, event_id long, ts timestamp_ntz, value double"
    src = str(tmp_path / "src")
    for rows in (rows1, rows2):
        spark.createDataFrame(
            [(u, e, ts, v) for e, u, ts, v in rows], schema
        ).coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "out")
    _run_stream(spark, src, out, str(tmp_path / "ckpt"))
    got = {
        r.event_id: r.ewma for r in spark.read.parquet(out).collect()
    }
    a = mining._EWMA_ALPHA
    assert set(got) == {2, 3}
    assert abs(got[3] - (a * 20.0 + (1 - a) * 10.0)) < 1e-6
