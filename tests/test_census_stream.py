"""Incremental streaming vocab census — archive semantics the batch
oracle can't cover: cross-batch additivity, replay absorption via the
seen index, and the retry guard.
"""

from __future__ import annotations

import pytest

from sparkstreaming_rawdataingestion_spark.streaming import (
    census_stream as cs,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def chunked_docs(spark, tmp_path):
    """The documents corpus split into 3 doc_id-ordered chunks, one
    parquet file each (the file stream feeds them as separate
    micro-batches)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    src = tmp_path / "incoming"
    rows = docs.orderBy("doc_id").collect()
    n = len(rows)
    bounds = [0, n // 3, 2 * n // 3, n + 1]
    for i in range(3):
        chunk = rows[bounds[i]:bounds[i + 1]]
        spark.createDataFrame(chunk, docs.schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    return docs, str(src)


def _run_stream(spark, src, schema, sink, ckpt):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = cs.start_incremental_census(stream, sink, ckpt)
    q.awaitTermination(120)
    q.stop()


def _census(spark, sink):
    return {
        r.piece: (r.n_occurrences, r.n_docs)
        for r in spark.read.parquet(f"{sink}/census").collect()
    }


def test_streamed_census_equals_the_batch_query(spark, chunked_docs, tmp_path):
    """Addition commutes: the 3-batch streamed census must equal
    tokenizer_piece_frequencies over the whole corpus in one shot."""
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        q_tokenizer_piece_frequencies,
    )

    docs, src = chunked_docs
    sink, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    _run_stream(spark, src, docs.schema, sink, ckpt)

    batch = {
        r.piece: (r.n_occurrences, r.n_docs)
        for r in q_tokenizer_piece_frequencies(spark, SF).collect()
    }
    assert _census(spark, sink) == batch


def test_census_full_replay_changes_nothing(spark, chunked_docs, tmp_path):
    """At-least-once worst case: a full replay with a fresh checkpoint
    must be absorbed by the seen index — every count unchanged."""
    docs, src = chunked_docs
    sink = str(tmp_path / "state")
    _run_stream(spark, src, docs.schema, sink, str(tmp_path / "c1"))
    first = _census(spark, sink)
    _run_stream(spark, src, docs.schema, sink, str(tmp_path / "c2"))
    assert _census(spark, sink) == first


def test_same_batch_duplicate_delivery_counts_once(spark):
    """A duplicate delivery of the same doc inside one micro-batch
    must contribute once (the pre-encode doc_id dedup)."""
    docs = spark.createDataFrame(
        [(1, "spark spark"), (1, "spark spark")],
        "doc_id long, text string",
    )
    out, new_ids = cs.census_increment(docs, None, None)
    got = {
        r.piece: (r.n_occurrences, r.n_docs) for r in out.collect()
    }
    assert got == {"spark": (2, 1)}
    assert [r.doc_id for r in new_ids.collect()] == [1]


def test_retry_with_own_seen_partition_still_counts_the_batch(spark):
    """The failed-attempt shape: a retry reads a seen index that
    already holds ITS OWN ids (written by the failed attempt) — the
    caller excludes the current batch partition, so census_increment
    must be fed only the OTHER partitions and count the docs fully.
    With the own partition wrongly included, the count would be 0."""
    docs = spark.createDataFrame(
        [(7, "row row key")], "doc_id long, text string"
    )
    other = spark.createDataFrame([(3,)], "doc_id long")
    out, _ = cs.census_increment(docs, None, other)
    got = {r.piece: (r.n_occurrences, r.n_docs) for r in out.collect()}
    assert got == {"row": (2, 1), "key": (1, 1)}
