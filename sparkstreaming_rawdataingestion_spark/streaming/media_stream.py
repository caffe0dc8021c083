"""Incremental (streaming) image dedup — the micro-batch form of the
``multimodal_image_dhash_pairs`` / ``multimodal_image_dedup_clusters``
ladder: each arriving batch of media is perceptually hashed, deduped
against BOTH itself (drop anything matching a lower media_id — the
greedy rule) and the accumulated archive's band index (the archive
always wins), then its surviving BAND ROWS are appended.

The archive stores hashes, not payloads: 4 small ints per image (the
dHash bands) are the only cross-batch state — at 100 TB of media the
index is ~32 bytes/image, parquet-pruned to exactly those columns on
every read, while the images themselves stay wherever the lake keeps
them. This is the curation_stream design (the dedup state IS the
archive table, not a state store) applied to the perceptual-hash
domain.

Invariant (the curation_stream contract, transplanted): the archive is
PAIRWISE near-dup-free — any two kept images would make the higher id
a loser at its own admission, so no two archived hashes are within the
hamming bar of each other. For CLIQUE-shaped near-dup families (every
member similar to every member — the synthesized fixture, and the
overwhelming real shape for brightness/re-encode copies) this equals
the batch ladder's canonical set exactly under id-ordered arrival. For
CHAIN-shaped components (A~C, B~C, A!~B — hamming balls are not
transitive) the two POLICIES legitimately differ: connected components
keeps one representative per chain (merging genuinely-dissimilar A and
B), while this stream keeps every image that matches nothing kept
before it — more survivors, each pairwise distinct. The divergence is
the same greedy-vs-components gap curation_stream documents for its
contested text clusters; tests pin both the clique equality and the
chain behavior.

Guarantee: at-least-once delivery absorbed idempotently — a replayed
image band-matches its own archived hash at hamming 0 and is dropped
by the archive check (the content-addressed absorption the text
stream gets from its exact-sha anti-join); a duplicate delivery
landing INSIDE one micro-batch is collapsed by the per-batch
media_id dedup before pairing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.multimodal import (
    DHASH_BANDS,
    dhash_band_pairs,
    image_dhash_bands,
)
from .curation_stream import read_archive
from .ingest_stream import _trigger_kwargs

ARCHIVE_COLUMNS = ("media_id",) + tuple(
    f"band{k}" for k in range(DHASH_BANDS)
)


def media_dedup_increment(
    batch_media: DataFrame, archive: DataFrame | None
) -> DataFrame:
    """Dedup one micro-batch of media against the archive; returns the
    band rows to append (ARCHIVE_COLUMNS)."""
    from ..session import stage

    # staged: feeds the within-batch pair check (two legs) and the
    # kept anti-join; released by the caller. The media_id dedup
    # collapses same-batch duplicate deliveries BEFORE pairing —
    # identical ids never pair (a < b), so without it both copies
    # would be archived and the unique-id invariant broken forever.
    bands = stage(
        image_dhash_bands(batch_media).dropDuplicates(["media_id"])
    )
    # within-batch near-dup: drop anything matching a lower media_id
    # (the greedy rule; kept rows are pairwise non-similar — see the
    # module invariant)
    batch_losers = (
        dhash_band_pairs(bands)
        .select(F.col("media_b").alias("media_id"))
        .distinct()
    )
    # staged too: the archive cross-check reads kept for its candidate
    # AND verify legs plus the final anti-join — unstaged, each
    # reference would re-execute the within-batch pair shuffle
    kept = stage(bands.join(batch_losers, "media_id", "left_anti"))
    if archive is not None:
        # cross-batch: batch hashes vs the archived band index — the
        # archive always wins (a replayed image matches itself at
        # hamming 0 and is absorbed here)
        arch_losers = (
            dhash_band_pairs(kept, archive.select(*ARCHIVE_COLUMNS))
            .select(F.col("media_a").alias("media_id"))
            .distinct()
        )
        kept = kept.join(arch_losers, "media_id", "left_anti")
    return kept.select(*ARCHIVE_COLUMNS)


def start_incremental_media_dedup(
    media_stream: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Streaming image-dedup query: media stream → canonical band index.

    foreachBatch is sequential across triggers, so the read-archive /
    append-survivors cycle is race-free within one query."""

    def process(batch: DataFrame, _batch_id: int) -> None:
        from ..session import release_staged

        spark = batch.sparkSession
        out = media_dedup_increment(batch, read_archive(spark, sink_dir))
        out.write.mode("append").parquet(sink_dir)
        release_staged()

    return (
        media_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**_trigger_kwargs(trigger_seconds))
        .start()
    )
