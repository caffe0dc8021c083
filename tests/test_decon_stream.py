"""Streaming decontamination monitor: batch parity (the drained stream's
report equals the batch kernel over the same split), and replay
idempotency (an at-least-once redelivery appends nothing — the pair
anti-join absorbs it)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkstreaming_rawdataingestion_spark import catalog
from sparkstreaming_rawdataingestion_spark.operators.dedup import (
    DECON_EVAL_MOD,
    build_eval_index,
    decontamination_pairs,
)
from sparkstreaming_rawdataingestion_spark.streaming import decon_stream as ds

SF01 = "/root/testdata/sf0.01"  # sf0.001 has no contaminated pairs


@pytest.fixture()
def split_corpus(spark, tmp_path):
    """The fixture corpus split on the registry's eval rule, the train
    side written as 3 doc_id-ordered files (one micro-batch each)."""
    docs = catalog.load_table(spark, SF01, "documents")
    is_eval = F.col("doc_id") % DECON_EVAL_MOD == 0
    eval_docs = docs.where(is_eval)
    train = docs.where(~is_eval)
    src = tmp_path / "incoming"
    rows = train.orderBy("doc_id").collect()
    n = len(rows)
    for i in range(3):
        chunk = rows[i * n // 3:(i + 1) * n // 3]
        spark.createDataFrame(chunk, train.schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    return train, eval_docs, str(src)


def _run(spark, src, schema, eval_docs, report, ckpt):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = ds.start_decon_stream(stream, eval_docs, report, ckpt)
    assert q.awaitTermination(120), "drain timed out"
    q.stop()


def _report_rows(spark, report):
    return {
        (r.train_doc_id, r.eval_doc_id): (r.shared_ngrams, r.eval_coverage)
        for r in spark.read.parquet(report).collect()
    }


def test_stream_report_equals_batch_kernel(spark, tmp_path, split_corpus):
    train, eval_docs, src = split_corpus
    report, ckpt = str(tmp_path / "report"), str(tmp_path / "ckpt")
    _run(spark, src, train.schema, eval_docs, report, ckpt)

    ev, ev_sizes = build_eval_index(eval_docs)
    batch = {
        (r.train_doc_id, r.eval_doc_id): (r.shared_ngrams, r.eval_coverage)
        for r in decontamination_pairs(train, ev, ev_sizes).collect()
    }
    assert batch, "fixture must contain contaminated pairs"
    assert _report_rows(spark, report) == batch


def test_replay_appends_nothing(spark, tmp_path, split_corpus):
    train, eval_docs, src = split_corpus
    report = str(tmp_path / "report")
    _run(spark, src, train.schema, eval_docs, report, str(tmp_path / "c1"))
    first = _report_rows(spark, report)
    # fresh checkpoint = the whole stream redelivered (at-least-once);
    # the pair anti-join must absorb every replayed row
    _run(spark, src, train.schema, eval_docs, report, str(tmp_path / "c2"))
    assert _report_rows(spark, report) == first
    assert spark.read.parquet(report).count() == len(first)


def test_intra_batch_duplicate_doc_not_double_counted(spark):
    """ADVICE r7: a train document delivered TWICE inside one micro-batch
    (producer duplicates under at-least-once) must not double its gram
    rows — decon_increment drops duplicate doc_ids before the kernel, so
    the persisted shared_ngrams/eval_coverage equal the single-copy
    values."""
    eval_docs = spark.createDataFrame(
        [(100, "a b c d e f g h i j", "web")],
        "doc_id long, text string, source string",
    )
    train_once = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l", "web")],
        "doc_id long, text string, source string",
    )
    train_dup = train_once.unionAll(train_once)
    ev, ev_sizes = build_eval_index(eval_docs)
    once = {
        (r.train_doc_id, r.eval_doc_id): (r.shared_ngrams, r.eval_coverage)
        for r in ds.decon_increment(train_once, ev, ev_sizes, None).collect()
    }
    dup = {
        (r.train_doc_id, r.eval_doc_id): (r.shared_ngrams, r.eval_coverage)
        for r in ds.decon_increment(train_dup, ev, ev_sizes, None).collect()
    }
    assert once, "fixture pair must be contaminated"
    assert dup == once
