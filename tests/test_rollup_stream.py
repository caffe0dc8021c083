"""Incremental continuous-aggregate maintenance: the streamed rollup must
equal a batch recompute, stay correct across incremental runs, and be
idempotent under replay."""

from __future__ import annotations

from sparkstreaming_rawdataingestion_spark import catalog
from sparkstreaming_rawdataingestion_spark.operators.ingest import ingest_normalize
from sparkstreaming_rawdataingestion_spark.sources import fixtures, kafka
from sparkstreaming_rawdataingestion_spark.streaming import rollup_stream

SF = "/root/testdata/sf0.001"


def _rollup_rows(spark, rollup_dir):
    rows = spark.read.parquet(rollup_dir).collect()
    return sorted(
        (r["datastream_id"], r["hour_start"], r["n_points"]) for r in rows
    )


def _batch_truth(spark):
    events = catalog.load_table(spark, SF, "events")
    dp = ingest_normalize(fixtures.events_to_messages(events))
    rows = rollup_stream.hourly_rollup(dp).collect()
    return sorted(
        (r["datastream_id"], r["hour_start"], r["n_points"]) for r in rows
    )


def test_incremental_rollup_matches_batch_and_is_idempotent(spark, tmp_path):
    msg_dir = str(tmp_path / "msgs")
    rollup_dir = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    events = catalog.load_table(spark, SF, "events")
    fixtures.write_message_files(events, msg_dir, num_files=4)

    # incremental: 2 files per trigger -> at least two merge batches
    stream = kafka.message_file_stream(spark, msg_dir, max_files_per_trigger=2)
    q = rollup_stream.start_rollup_maintenance(stream, rollup_dir, ckpt)
    q.awaitTermination()

    want = _batch_truth(spark)
    assert _rollup_rows(spark, rollup_dir) == want

    # replay from the same checkpoint: no new input -> table unchanged
    stream2 = kafka.message_file_stream(spark, msg_dir)
    q2 = rollup_stream.start_rollup_maintenance(stream2, rollup_dir, ckpt)
    q2.awaitTermination()
    assert _rollup_rows(spark, rollup_dir) == want

    # fresh checkpoint over the same input (full at-least-once replay):
    # replace-not-add keeps the totals identical
    q3 = rollup_stream.start_rollup_maintenance(
        kafka.message_file_stream(spark, msg_dir),
        rollup_dir,
        str(tmp_path / "ckpt2"),
    )
    q3.awaitTermination()
    assert _rollup_rows(spark, rollup_dir) == want
