"""Incremental streaming curation — archive semantics the batch oracles
can't cover: cross-batch dedup, archive-wins resolution, replay
idempotency, and parity with the batch pipeline under id-ordered arrival.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkstreaming_rawdataingestion_spark import catalog
from sparkstreaming_rawdataingestion_spark.operators import pipeline
from sparkstreaming_rawdataingestion_spark.operators.dedup import count_verified_pairs
from sparkstreaming_rawdataingestion_spark.streaming import curation_stream as cs


@pytest.fixture()
def chunked_docs(spark, sf_dir, tmp_path):
    """documents split into 3 doc_id-ordered chunks, one file each (the
    file stream feeds them as separate micro-batches)."""
    docs = catalog.load_table(spark, sf_dir, "documents")
    src = tmp_path / "incoming"
    n = docs.count()
    bounds = [0, n // 3, 2 * n // 3, n + 1]
    rows = docs.orderBy("doc_id").collect()
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
    q = cs.start_incremental_curation(stream, sink, ckpt)
    q.awaitTermination(120)
    q.stop()


def test_incremental_matches_invariants_and_batch_pipeline(
    spark, sf_dir, tmp_path, chunked_docs
):
    docs, src = chunked_docs
    sink, ckpt = str(tmp_path / "archive"), str(tmp_path / "ckpt")
    _run_stream(spark, src, docs.schema, sink, ckpt)

    archive = spark.read.parquet(sink)
    rows = archive.collect()
    assert len(rows) > 0
    # filters hold, ids and content unique
    assert all(r.predicted_lang == "en" for r in rows)
    assert all(r.quality_score >= pipeline.QUALITY_MIN for r in rows)
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))
    shas = [r.text_sha256 for r in rows]
    assert len(shas) == len(set(shas))
    # archive is pairwise near-dup-free (stronger than the batch pipeline's
    # greedy guarantee, because the archive always wins)
    assert count_verified_pairs(archive.select("doc_id", "shingles")).count() == 0
    # id-ordered arrival: every batch-pipeline survivor that streaming also
    # saw must be curated identically at the exact-dedup stage; spot-check
    # the strongest comparable property — identical exact+filter stage sets
    batch_final = {
        r.doc_id for r in pipeline._stages(spark, sf_dir)["near_dedup"].collect()
    }
    # streaming survivors may differ on chain clusters (greedy vs
    # archive-wins), but never disagree on docs with no near-dup at all:
    pairs = count_verified_pairs(
        pipeline._stages(spark, sf_dir)["exact_dedup"]
        .select("doc_id", pipeline._shingles().alias("shingles"))
    )
    contested = {
        r.doc_id
        for r in pairs.select(
            F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
        ).collect()
    }
    assert set(ids) - contested == batch_final - contested


def test_replay_appends_nothing(spark, sf_dir, tmp_path, chunked_docs):
    docs, src = chunked_docs
    sink = str(tmp_path / "archive")
    _run_stream(spark, src, docs.schema, sink, str(tmp_path / "ckpt1"))
    n1 = spark.read.parquet(sink).count()
    # fresh checkpoint = full replay (at-least-once worst case)
    _run_stream(spark, src, docs.schema, sink, str(tmp_path / "ckpt2"))
    n2 = spark.read.parquet(sink).count()
    assert n2 == n1


def _run_classified_stream(spark, src, schema, sink, ckpt):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = cs.start_incremental_curation(stream, sink, ckpt, classifier_gate=True)
    q.awaitTermination(120)
    q.stop()


def test_classified_stream_parity_with_batch_gate(
    spark, sf_dir, tmp_path, chunked_docs
):
    """The round-8 model gate, incrementally (VERDICT r8 item 6): the
    streaming archive with classifier_gate=True must (a) contain ONLY
    docs the classifier keeps, (b) apply the gate at the batch stage
    order — uncontested docs (no near-dup pair anywhere) agree exactly
    with pipeline._stages(classifier_gate=True)['near_dedup'], the
    same strongest-comparable property the unclassified parity test
    pins."""
    docs, src = chunked_docs
    sink, ckpt = str(tmp_path / "arc_clf"), str(tmp_path / "ckpt_clf")
    _run_classified_stream(spark, src, docs.schema, sink, ckpt)
    archive = spark.read.parquet(sink)
    ids = {r.doc_id for r in archive.select("doc_id").collect()}
    assert ids

    from sparkstreaming_rawdataingestion_spark.operators.text import (
        quality_classifier_score,
    )

    clf_keep = {
        r.doc_id
        for r in quality_classifier_score(
            catalog.load_table(spark, sf_dir, "documents").select(
                "doc_id", "text"
            )
        )
        .where(F.col("keep"))
        .collect()
    }
    assert ids <= clf_keep  # (a) nothing the model drops is archived

    stages = pipeline._stages(spark, sf_dir, classifier_gate=True)
    batch_final = {r.doc_id for r in stages["near_dedup"].collect()}
    pairs = count_verified_pairs(
        stages["exact_dedup"]
        .select("doc_id", pipeline._shingles().alias("shingles"))
    )
    contested = {
        r.doc_id
        for r in pairs.select(
            F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
        ).collect()
    }
    assert ids - contested == batch_final - contested  # (b)


def test_classified_stream_replay_appends_nothing(
    spark, sf_dir, tmp_path, chunked_docs
):
    """Replay idempotency must survive the extra stage: the classifier
    is deterministic per doc, so a full at-least-once replay re-drops
    everything at the exact-sha anti-join."""
    docs, src = chunked_docs
    sink = str(tmp_path / "arc_clf")
    _run_classified_stream(spark, src, docs.schema, sink, str(tmp_path / "c1"))
    n1 = spark.read.parquet(sink).count()
    _run_classified_stream(spark, src, docs.schema, sink, str(tmp_path / "c2"))
    n2 = spark.read.parquet(sink).count()
    assert n2 == n1
