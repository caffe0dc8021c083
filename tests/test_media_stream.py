"""Incremental streaming image dedup — archive semantics the batch
oracles can't cover: cross-batch dedup via the band index, archive-wins
resolution, replay idempotency, and parity with the batch canonical
ladder under id-ordered arrival.
"""

from __future__ import annotations

import pytest

from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
    synthesize_dhash_media,
)
from sparkstreaming_rawdataingestion_spark.streaming import media_stream as ms

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def chunked_media(spark, tmp_path):
    """The synthesized dHash PNG corpus split into 3 media_id-ordered
    chunks, one parquet file each (the file stream feeds them as
    separate micro-batches) — families of 4 straddle chunk borders."""
    media = synthesize_dhash_media(spark, SF)
    src = tmp_path / "incoming"
    rows = media.orderBy("media_id").collect()
    n = len(rows)
    bounds = [0, n // 3, 2 * n // 3, n + 1]
    for i in range(3):
        chunk = rows[bounds[i]:bounds[i + 1]]
        spark.createDataFrame(chunk, media.schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    return media, str(src)


def _run_stream(spark, src, schema, sink, ckpt):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = ms.start_incremental_media_dedup(stream, sink, ckpt)
    q.awaitTermination(120)
    q.stop()


def test_incremental_media_dedup_matches_batch_canonicals(
    spark, chunked_media, tmp_path
):
    """Under media_id-ordered arrival the archive must hold EXACTLY the
    batch ladder's canonical set: one (lowest-id) member per dHash
    family — whether the family arrived inside one micro-batch (greedy
    within-batch rule) or split across batches (archive-wins rule)."""
    media, src = chunked_media
    sink, ckpt = str(tmp_path / "bands"), str(tmp_path / "ckpt")
    _run_stream(spark, src, media.schema, sink, ckpt)

    archive = spark.read.parquet(sink)
    ids = sorted(r.media_id for r in archive.select("media_id").collect())
    assert len(ids) == len(set(ids))

    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        q_multimodal_image_dedup_clusters,
    )

    batch_canon = sorted(
        r.media_id
        for r in q_multimodal_image_dedup_clusters(spark, SF).collect()
        if r.is_canonical
    )
    assert ids == batch_canon


def test_media_replay_appends_nothing(spark, chunked_media, tmp_path):
    """At-least-once worst case: a full replay with a fresh checkpoint
    must be absorbed — every replayed image band-matches its own
    archived hash at hamming 0."""
    media, src = chunked_media
    sink = str(tmp_path / "bands")
    _run_stream(spark, src, media.schema, sink, str(tmp_path / "c1"))
    n1 = spark.read.parquet(sink).count()
    _run_stream(spark, src, media.schema, sink, str(tmp_path / "c2"))
    n2 = spark.read.parquet(sink).count()
    assert n2 == n1
