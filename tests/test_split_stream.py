"""Streaming split router vs the batch manifest: identical assignment
(the leakage guarantee), split-partitioned layout on disk, and restart
idempotency via the file sink's exactly-once commit log."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sparkstreaming_rawdataingestion_spark import catalog
from sparkstreaming_rawdataingestion_spark.operators import layout
from sparkstreaming_rawdataingestion_spark.streaming import split_stream

SF = "/root/testdata/sf0.001"


def _run(spark, src, out, ckpt):
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = split_stream.start_split_router(stream, out, ckpt)
    q.awaitTermination()


def test_streamed_assignment_equals_batch_manifest(spark, tmp_path):
    d = catalog.load_table(spark, SF, "documents")
    src = str(tmp_path / "src")
    # three arrival-order micro-batches, deliberately NOT doc_id-ordered
    for part in (
        d.where(F.col("doc_id") % 3 == 1),
        d.where(F.col("doc_id") % 3 == 2),
        d.where(F.col("doc_id") % 3 == 0),
    ):
        part.coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "out")
    _run(spark, src, out, str(tmp_path / "ckpt"))

    got = {
        r.doc_id: r.split
        for r in spark.read.parquet(out).select("doc_id", "split").collect()
    }
    want = {
        r.doc_id: r.split
        for r in layout.QUERIES["train_val_test_split"](spark, SF).collect()
    }
    assert got == want
    # the layout is physically split-partitioned (per-split directories)
    subdirs = {p for p in os.listdir(out) if p.startswith("split=")}
    assert subdirs == {"split=train", "split=val", "split=test"}


def test_replay_appends_nothing(spark, tmp_path):
    """Re-running the drained query over the same source (same
    checkpoint) must not duplicate rows — file-sink exactly-once."""
    d = catalog.load_table(spark, SF, "documents").limit(50)
    src = str(tmp_path / "src")
    d.coalesce(1).write.parquet(src)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run(spark, src, out, ckpt)
    n1 = spark.read.parquet(out).count()
    _run(spark, src, out, ckpt)  # replay — no new source files
    assert spark.read.parquet(out).count() == n1 == 50
