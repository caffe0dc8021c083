"""Streaming Misra-Gries heavy hitters: per-bucket sketch guarantees vs
exact counts, heavy-item presence on a skewed stream, and full-replay
idempotency of the maintained sketch table."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_rawdataingestion_spark.streaming import topk_stream


def _run(spark, src, sketch, ckpt):
    stream = (
        spark.readStream.schema("tok string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = topk_stream.start_sketch_maintenance(
        topk_stream.heavy_hitters_stream(stream),
        sketch,
        ckpt,
        availableNow=True,
    )
    q.awaitTermination()


def _write_stream_files(spark, src, docs):
    for chunk in docs:
        (
            spark.createDataFrame([(t,) for t in chunk], "tok string")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )


def test_sketch_bounds_and_heavy_presence(spark, tmp_path):
    """Skewed stream across 3 micro-batches: every estimate obeys
    est ≤ true ≤ est + its bucket's decrement, and the dominant items
    (true count > bucket decrement) are guaranteed present."""
    # 3 heavy items + a long tail, sliced into 3 arrival chunks
    chunks = []
    for part in range(3):
        chunk = (
            ["alpha"] * 120
            + ["beta"] * 80
            + ["gamma"] * 60
            + [f"tail{part}_{i}" for i in range(100)]
        )
        chunks.append(chunk)
    src = str(tmp_path / "src")
    _write_stream_files(spark, src, chunks)
    sketch = str(tmp_path / "sketch")
    _run(spark, src, sketch, str(tmp_path / "ckpt"))

    true = {}
    for chunk in chunks:
        for t in chunk:
            true[t] = true.get(t, 0) + 1
    rows = spark.read.parquet(sketch).collect()
    assert rows
    by_bucket_decr = {}
    for r in rows:
        by_bucket_decr[r.bucket] = r.decr
        assert r.est <= true[r.tok], (r.tok, r.est, true[r.tok])
        assert true[r.tok] <= r.est + r.decr, (r.tok, r.est, r.decr)
        assert len(
            [x for x in rows if x.bucket == r.bucket]
        ) <= topk_stream.TOPK_K
    present = {r.tok for r in rows}
    for heavy in ("alpha", "beta", "gamma"):
        assert heavy in present
    report = topk_stream.heavy_hitters_report(spark, sketch).collect()
    assert report[0].tok == "alpha"
    assert {r.tok for r in report[:3]} >= {"alpha", "beta"}


def test_full_replay_converges_to_same_sketch(spark, tmp_path):
    """Re-running the whole stream with a FRESH checkpoint must produce
    a byte-equal sketch table (bucket replacement, deterministic fold)."""
    chunks = [
        ["a"] * 50 + ["b"] * 30 + [f"t{i}" for i in range(40)],
        ["a"] * 20 + ["c"] * 25 + [f"u{i}" for i in range(40)],
    ]
    src = str(tmp_path / "src")
    _write_stream_files(spark, src, chunks)
    sketch = str(tmp_path / "sketch")
    _run(spark, src, sketch, str(tmp_path / "ckpt1"))
    first = sorted(
        (r.bucket, r.tok, r.est, r.decr)
        for r in spark.read.parquet(sketch).collect()
    )
    _run(spark, src, sketch, str(tmp_path / "ckpt2"))
    second = sorted(
        (r.bucket, r.tok, r.est, r.decr)
        for r in spark.read.parquet(sketch).collect()
    )
    assert first == second


def test_streamed_bound_never_looser_than_batch_merge(spark, tmp_path):
    """The per-bucket decrement bound is tighter than (or equal to) the
    batch sketch's summed global undercount on the same data."""
    from sparkstreaming_rawdataingestion_spark.operators.stats import (
        mg_partial_summaries,
    )

    toks = ["x"] * 100 + ["y"] * 60 + [f"z{i}" for i in range(200)]
    src = str(tmp_path / "src")
    _write_stream_files(spark, src, [toks])
    sketch = str(tmp_path / "sketch")
    _run(spark, src, sketch, str(tmp_path / "ckpt"))
    stream_rows = spark.read.parquet(sketch).collect()

    batch_partials = mg_partial_summaries(
        spark.createDataFrame([(t,) for t in toks], "tok string")
    ).collect()
    batch_bound = sum(r.decr for r in batch_partials)
    assert all(r.decr <= batch_bound for r in stream_rows)
