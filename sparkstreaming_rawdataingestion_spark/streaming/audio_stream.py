"""Incremental (streaming) audio dedup — the micro-batch form of the
``multimodal_audio_window_matches`` ladder, and the audio twin of
media_stream.py's image dedup: each arriving batch of clips is
windowed-fingerprinted, deduped against the accumulated archive's
WINDOW-print index first (the archive always wins), then within itself
by the sequential greedy rule, and its surviving window-print rows are
appended.

What the windowed index buys over the image stream's whole-object
hashes: CONTAINMENT absorption. The archive stores one 64-bit print
per 16-frame hop, so an EXCERPT arriving after its original band-
matches one of the original's archived window prints and is dropped —
the "re-clipped highlight / re-posted segment" class that whole-clip
fingerprints structurally miss (a shorter clip never hashes equal to
its source). The archive check joins on the full (window, band)
composite via ``dhash_band_pairs(..., extra_key=("win",))`` — the same
generalized pair kernel the batch matcher uses; clip-level matching
within a batch is ``audio_window_match_pairs`` itself.

POLICY: identical to media_stream.py (one greedy kernel,
``greedy_batch_losers``, imported not copied): sequential greedy
admission in media_id order — a clip is KEPT iff it window-matches no
already-KEPT clip; the archive check runs BEFORE the within-batch
pass, making the survivor set invariant to micro-batch boundaries
under id-ordered arrival. The greedy-vs-components divergence for
chain-shaped families is the same documented policy gap.

Archive scale shape: 4 small ints per WINDOW — size grows with total
audio duration (one row per hop), not clip count alone; reads prune to
the print columns, payloads never enter the state. Guarantee:
at-least-once delivery absorbed (a replayed clip matches its own
archived prints at hamming 0); same-batch duplicate deliveries
collapse via the (media_id, win) dedup before pairing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.multimodal import (
    DHASH_BANDS,
    audio_window_match_pairs,
    audio_windowed_fingerprint_bands,
    dhash_band_pairs,
)
from .curation_stream import read_archive
from .ingest_stream import _trigger_kwargs
from .media_stream import greedy_batch_losers

AUDIO_ARCHIVE_COLUMNS = ("media_id", "win") + tuple(
    f"band{k}" for k in range(DHASH_BANDS)
)


def audio_dedup_increment(
    batch_media: DataFrame, archive: DataFrame | None
) -> DataFrame:
    """Dedup one micro-batch of clips against the archive; returns the
    window-print rows to append (AUDIO_ARCHIVE_COLUMNS). Order is
    load-bearing exactly as in media_dedup_increment: archive losers
    leave BEFORE the within-batch greedy pass."""
    from ..session import stage

    wbands = stage(
        audio_windowed_fingerprint_bands(batch_media).dropDuplicates(
            ["media_id", "win"]
        )
    )
    if archive is not None:
        # cross-batch FIRST: any window of a batch clip matching any
        # archived window print drops the WHOLE clip — this is where
        # both replays (self-match at hamming 0) and excerpts of
        # archived clips (containment) are absorbed
        arch_losers = (
            dhash_band_pairs(
                wbands,
                archive.select(*AUDIO_ARCHIVE_COLUMNS),
                extra_key=("win",),
            )
            .select(F.col("media_a").alias("media_id"))
            .distinct()
        )
        wbands = stage(wbands.join(arch_losers, "media_id", "left_anti"))
    # within-batch: sequential greedy over clip-level window matches
    batch_losers = greedy_batch_losers(
        audio_window_match_pairs(wbands).select("media_a", "media_b")
    )
    kept = wbands.join(batch_losers, "media_id", "left_anti")
    return kept.select(*AUDIO_ARCHIVE_COLUMNS)


def start_incremental_audio_dedup(
    media_stream: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Streaming audio-dedup query: clip stream → canonical window-print
    index. foreachBatch is sequential across triggers, so the
    read-archive / append-survivors cycle is race-free."""

    def process(batch: DataFrame, _batch_id: int) -> None:
        from ..session import release_staged

        spark = batch.sparkSession
        out = audio_dedup_increment(batch, read_archive(spark, sink_dir))
        out.write.mode("append").parquet(sink_dir)
        release_staged()

    return (
        media_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**_trigger_kwargs(trigger_seconds))
        .start()
    )
