"""Incremental (streaming) audio dedup — the micro-batch form of the
``multimodal_audio_window_matches`` ladder, and the audio twin of
media_stream.py's image dedup: each arriving batch of clips is
windowed-fingerprinted, deduped against the accumulated archive's
WINDOW-print index first (the archive always wins), then within itself
by the sequential greedy rule, and its surviving window-print rows are
appended.

What the windowed index buys over the image stream's whole-object
hashes: CONTAINMENT absorption. The archive stores one 64-bit print
per 16-frame (128-sample) hop; arriving clips are additionally
fingerprinted at SAMPLE hop 1 — overlapping analysis frames, the
round-13 sub-frame probe (round 12 probed at FRAME hop 1 and was
structurally blind to excerpts cut mid-frame; the round-13 batch
matcher's fixture measures that blindness) — so an EXCERPT arriving
after its original is dropped even when it starts at an ARBITRARY
SAMPLE: an offset of S samples is caught when the excerpt carries at
least 520 + ((-S) mod 128) samples, the length at which a probe
window's analysis frames land exactly on an archived window
(whole-frame offsets reduce to the round-12 bound of
65 + ((-o) mod 16) frames; the bound is UNIFORM between the archive
check and the within-batch pass — both run the same
newer-probes-older geometry — so survivor sets stay batch-boundary
invariant either way). The bound is a DETECTION guarantee, not a
keep guarantee: a shorter excerpt has no exactly-aligned probe
window, but for ~1-4% of envelope families a sub-frame BLEND
window matches all 64 delta signs by luck (the round-13 batch
matcher measured this class; its exact-scale witness exists to
disambiguate the OFFSET) and such an excerpt may be absorbed
early — still a true duplicate, still boundary-invariant (the
luck fires identically on both passes), just ahead of the bound. Clip lengths also need no frame alignment any
more — a clip cut at any sample fingerprints fine. This is the
"re-clipped highlight / re-posted segment" class that whole-clip
fingerprints structurally miss. The drop decision needs no
exact-scale energy witness (that invariant disambiguates the
OFFSET in the batch matcher's vote; absorption is binary), so
archive rows stay 4 small ints + keys and REMAIN BIT-COMPATIBLE
with round-12 archives: a sample-grid window starting at u = 128k
is the frame-grid window k, so replays still self-match at hamming
0 against pre-upgrade prints. All matching joins through
``dhash_band_pairs(..., extra_key=("win",))`` — the same generalized
pair kernel the batch queries use (win units differ per side —
samples on the probe, hops in the archive — which is fine: win is
print identity, never a join key); the dense side is always the
bounded micro-batch, never the archive, now 8x the round-12 probe
density (one print per sample instead of per frame).

POLICY: identical to media_stream.py (one greedy kernel,
``greedy_batch_losers``, imported not copied): sequential greedy
admission in media_id order — a clip is KEPT iff it window-matches no
already-KEPT clip; the archive check runs BEFORE the within-batch
pass, making the survivor set invariant to micro-batch boundaries
under id-ordered arrival. The greedy-vs-components divergence for
chain-shaped families is the same documented policy gap.

Archive scale shape: the BUCKETED print index (print_index module):
one row per (window print, band) carrying the full print, partitioned
by (band_idx, band_val % PRINT_BUCKETS) — size grows with total audio
duration (4 rows per hop), not clip count alone, and a micro-batch's
archive read is bounded at |archive| x |touched buckets| / (bands x
PRINT_BUCKETS) via the batch's bounded touched-bucket list (the census
recipe; pruning is exact because a print can only band-match the batch
through a band value the batch itself contains). Payloads never enter
the state. Guarantee:
at-least-once delivery absorbed (a replayed clip matches its own
archived prints at hamming 0); same-batch duplicate deliveries
collapse via the (media_id, win) dedup before pairing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.multimodal import (
    DHASH_BANDS,
    audio_subframe_fingerprint_bands,
    dhash_band_pairs,
)
from .ingest_stream import _trigger_kwargs
from .media_stream import greedy_batch_losers

AUDIO_ARCHIVE_COLUMNS = ("media_id", "win") + tuple(
    f"band{k}" for k in range(DHASH_BANDS)
)


def _asym_batch_pairs(probe: DataFrame, wbands: DataFrame) -> DataFrame:
    """Within-batch clip pairs under the ASYMMETRIC probe — ONE
    direction only: the HIGHER id's dense hop-1 prints against the
    LOWER id's hop-grid prints. This is exactly the archive check's
    geometry (the newer clip probes the admitted clip's sparse
    prints), which is what batch-boundary invariance requires: the
    match relation must not depend on which side of a batch boundary
    the pair lands. A bidirectional within-batch pass would
    additionally catch short excerpts via the original-probes-excerpt
    direction — matches the archive check can NEVER see, making the
    survivor set boundary-dependent (r12 review). The detection bound
    is therefore uniform everywhere: an excerpt at sample offset S
    needs >= 520 + ((-S) mod 128) samples for its aligned probe
    window to exist."""
    return (
        dhash_band_pairs(probe, wbands, extra_key=("win",))
        .where(F.col("media_a") > F.col("media_b"))
        .select(
            F.col("media_b").alias("media_a"),
            F.col("media_a").alias("media_b"),
        )
        .distinct()
    )


def _audio_prints(batch_media: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Stage one batch's two print frames: the archive-hop prints
    (what survivors append; win in 128-sample-hop units — the
    round-12 archive layout, unchanged) and the dense SAMPLE-hop-1
    probe prints (win in samples). The payloads are decoded and
    fingerprinted ONCE — an archive-grid window starting at sample
    128k IS the sample-hop window with win == 128k, so the archive
    frame is a pure projection of the probe frame (win %
    hop_samples == 0, win renumbered to hop units), not a second
    decode pass (r12 review: the duplicated decode was the dominant
    per-batch CPU cost). The probe's energy-witness columns are
    dropped — absorption is a binary decision, no offset vote here —
    keeping archive rows bit-compatible with round-12 archives."""
    from ..operators.multimodal import AFP_FRAME_SIZE, AFPW_HOP_FRAMES
    from ..session import stage

    hop_samples = AFPW_HOP_FRAMES * AFP_FRAME_SIZE
    probe = stage(
        audio_subframe_fingerprint_bands(batch_media, sample_hop=1)
        .select(*AUDIO_ARCHIVE_COLUMNS)
        .dropDuplicates(["media_id", "win"])
    )
    wbands = stage(
        probe.where(F.pmod(F.col("win"), F.lit(hop_samples)) == 0)
        .withColumn(
            "win",
            (F.col("win") / F.lit(hop_samples)).cast("int"),
        )
        .select(*AUDIO_ARCHIVE_COLUMNS)
    )
    return wbands, probe


def audio_dedup_increment(
    batch_media: DataFrame, archive: DataFrame | None
) -> DataFrame:
    """Dedup one micro-batch of clips against the archive; returns the
    window-print rows to append (AUDIO_ARCHIVE_COLUMNS). Order is
    load-bearing exactly as in media_dedup_increment: archive losers
    leave BEFORE the within-batch greedy pass.

    ASYMMETRIC PROBE (round 12, sub-frame since round 13): the batch
    is fingerprinted ONCE at SAMPLE hop 1 (the probe side); the
    compact archive-hop prints survivors append are a projection of
    that frame (_audio_prints). Matching always joins dense probe
    prints against sparse hop-grid prints, so an excerpt of an
    archived (or lower-id batch-mate) clip is caught at ANY SAMPLE
    offset once it clears the module docstring's length bound — the
    Haitsma-Kalker lookup asymmetry with overlapping analysis frames.
    The densification cost rides the bounded micro-batch, never the
    archive."""
    wbands, probe = _audio_prints(batch_media)
    return _audio_dedup_core(wbands, probe, archive)


def _audio_dedup_core(
    wbands: DataFrame, probe: DataFrame, archive: DataFrame | None
) -> DataFrame:
    from ..session import stage

    if archive is not None:
        # cross-batch FIRST: any hop-1 probe window of a batch clip
        # matching any archived window print drops the WHOLE clip —
        # this is where replays (self-match at hamming 0, the probe's
        # hop-grid windows equal the archived ones) and excerpts of
        # archived clips (at any offset, above the length bound) are
        # absorbed
        arch_losers = (
            dhash_band_pairs(
                probe,
                archive.select(*AUDIO_ARCHIVE_COLUMNS),
                extra_key=("win",),
            )
            .select(F.col("media_a").alias("media_id"))
            .distinct()
        )
        wbands = stage(wbands.join(arch_losers, "media_id", "left_anti"))
        probe = stage(probe.join(arch_losers, "media_id", "left_anti"))
    # within-batch: sequential greedy over asymmetric clip matches
    batch_losers = greedy_batch_losers(_asym_batch_pairs(probe, wbands))
    kept = wbands.join(batch_losers, "media_id", "left_anti")
    return kept.select(*AUDIO_ARCHIVE_COLUMNS)


def start_incremental_audio_dedup(
    media_stream: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Streaming audio-dedup query: clip stream → canonical window-print
    index under the BUCKETED print-index layout (print_index module):
    the per-batch archive read prunes to the batch's touched
    (band_idx, band_bucket) partitions — |archive| x |touched| /
    ({DHASH_BANDS} x PRINT_BUCKETS) instead of a full scan of an index
    that grows with total archived audio duration. foreachBatch is
    sequential across triggers, so the read-prune-append cycle is
    race-free."""

    def process(batch: DataFrame, _batch_id: int) -> None:
        from ..session import release_staged
        from .print_index import (
            append_print_index,
            read_pruned_prints,
            touched_buckets,
        )

        spark = batch.sparkSession
        wbands, probe = _audio_prints(batch)
        archive = read_pruned_prints(
            spark, sink_dir, touched_buckets(probe), ("media_id", "win")
        )
        out = _audio_dedup_core(wbands, probe, archive)
        append_print_index(out, sink_dir, ("media_id", "win"))
        release_staged()

    return (
        media_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**_trigger_kwargs(trigger_seconds))
        .start()
    )
