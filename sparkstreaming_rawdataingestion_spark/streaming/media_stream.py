"""Incremental (streaming) image dedup — the micro-batch form of the
``multimodal_image_dhash_pairs`` / ``multimodal_image_dedup_clusters``
ladder: each arriving batch of media is perceptually hashed, deduped
against the accumulated archive's band index FIRST (the archive always
wins), then within itself by the SEQUENTIAL greedy rule, and its
surviving BAND ROWS are appended.

The archive stores hashes, not payloads: the BUCKETED print index
(print_index module) — one row per (hash, band) carrying the full
4-band print, partitioned by (band_idx, band_val % PRINT_BUCKETS) —
is the only cross-batch state; at 100 TB of media it is ~130
bytes/image while the images stay wherever the lake keeps them, and a
micro-batch's archive read is bounded by the batch's touched-bucket
list (the census recipe — exact pruning, because an archived hash can
only band-match the batch through a band value the batch itself
contains), never a full scan of state that grows with everything ever
archived. This is the curation_stream design (the dedup state IS the
archive table, not a state store) applied to the perceptual-hash
domain.

POLICY (the round-9 chain-gap fix, stated exactly): the stream
implements sequential greedy admission — processing images in
media_id order, an image is KEPT iff it matches no already-KEPT
image. Within a batch this is computed by wave-parallel greedy MIS
(``greedy_batch_losers``): a loser must match a lower image that
itself KEPT, so an image whose only lower matches all lost survives.
Because the archive check runs BEFORE the within-batch pass (an image
that loses to the archive cannot drop a batch-mate), the survivor set
under id-ordered arrival is INVARIANT to micro-batch boundaries — the
same images are kept whether a match chain arrives in one batch or
split across many (test-pinned both ways).

Invariant (the curation_stream contract, transplanted): the archive is
PAIRWISE near-dup-free — greedy admission only ever keeps an image
matching nothing kept, so no two archived hashes are within the
hamming bar of each other. For CLIQUE-shaped near-dup families (every
member similar to every member — the synthesized fixture, and the
overwhelming real shape for brightness/re-encode copies) this equals
the batch ladder's canonical set exactly under id-ordered arrival. For
CHAIN-shaped components (A~C, B~C, A!~B — hamming balls are not
transitive) the two POLICIES legitimately differ, and must: connected
components keeps one representative per chain (merging genuinely-
dissimilar A and B), while sequential greedy keeps every image that
matches nothing kept before it — more survivors, each pairwise
distinct. No online rule can match the components answer for chains:
the component min can become reachable only through a HIGHER-id image
that arrives later (2-3-1 paths), after the stream already had to
decide on 2. The divergence is the same greedy-vs-components gap
curation_stream documents for its contested text clusters; tests pin
the clique equality, the chain behavior, and the boundary invariance.

Guarantee: at-least-once delivery absorbed idempotently — a replayed
image band-matches its own archived hash at hamming 0 and is dropped
by the archive check (the content-addressed absorption the text
stream gets from its exact-sha anti-join); a duplicate delivery
landing INSIDE one micro-batch is collapsed by the per-batch
media_id dedup before pairing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.multimodal import (
    DHASH_BANDS,
    dhash_band_pairs,
    image_dhash_bands,
)
from .ingest_stream import _trigger_kwargs

ARCHIVE_COLUMNS = ("media_id",) + tuple(
    f"band{k}" for k in range(DHASH_BANDS)
)


def greedy_batch_losers(pairs: DataFrame, max_waves: int = 64) -> DataFrame:
    """Loser set of the SEQUENTIAL greedy rule over one batch's pair
    edges (media_a < media_b): processing ids in ascending order, an
    image loses iff it matches some lower image that itself KEPT — an
    image whose every lower match already lost SURVIVES (the round-9
    chain gap: the old drop-any-media_b rule killed it).

    Wave-parallel greedy MIS over the id-ordered edge DAG, the
    connected_components loop discipline (driver-side control flow
    over lazily built plans): each wave keeps every a-side node with
    no remaining incoming edge (the DAG's minimum always qualifies, so
    progress is guaranteed while edges remain), marks its b-side
    neighbors losers, and removes every decided node's edges. Waves
    are bounded by the longest match chain — near-dup graphs are tiny
    cliques and short chains; a clique resolves in ONE wave. All joins
    run on the PAIR graph only, never the batch."""
    from ..session import stage

    edges = stage(pairs.select("media_a", "media_b").distinct())
    losers: DataFrame | None = None
    for _ in range(max_waves):
        if edges.isEmpty():
            break
        targets = edges.select(
            F.col("media_b").alias("media_id")
        ).distinct()
        winners = (
            edges.select(F.col("media_a").alias("media_id"))
            .distinct()
            .join(targets, "media_id", "left_anti")
        )
        new_losers = (
            edges.join(
                winners.withColumnRenamed("media_id", "media_a"),
                "media_a",
            )
            .select(F.col("media_b").alias("media_id"))
            .distinct()
        )
        losers = stage(
            new_losers
            if losers is None
            else losers.union(new_losers).distinct()
        )
        # an edge survives only while BOTH ends are undecided: a-side
        # winners already dropped their neighbors, and a-side/b-side
        # losers must not drop anyone (exactly the sequential rule)
        edges = stage(
            edges.join(
                winners.union(losers)
                .distinct()
                .withColumnRenamed("media_id", "media_a"),
                "media_a",
                "left_anti",
            ).join(
                losers.withColumnRenamed("media_id", "media_b"),
                "media_b",
                "left_anti",
            )
        )
    else:
        # the loop body never observed an empty graph — but the LAST
        # wave may have finished the job (the emptiness probe sits at
        # the top of the next iteration), so only a genuinely
        # non-empty residue is a convergence failure
        if not edges.isEmpty():
            raise RuntimeError(
                f"greedy MIS did not converge in {max_waves} waves — a "
                "match chain deeper than the bound (raise max_waves)"
            )
    if losers is None:
        return pairs.select(
            F.col("media_b").alias("media_id")
        ).where(F.lit(False))
    return losers


def media_dedup_increment(
    batch_media: DataFrame, archive: DataFrame | None
) -> DataFrame:
    """Dedup one micro-batch of media against the archive; returns the
    band rows to append (ARCHIVE_COLUMNS). Order is load-bearing:
    archive losers leave BEFORE the within-batch greedy pass, so a
    batch-mate of an archive loser is judged only against images that
    actually kept — the condition for micro-batch-boundary invariance
    (module docstring)."""
    # staged: feeds the archive check, the pair check (two legs each)
    # and the kept anti-join; released by the caller. The media_id
    # dedup collapses same-batch duplicate deliveries BEFORE pairing —
    # identical ids never pair (a < b), so without it both copies
    # would be archived and the unique-id invariant broken forever.
    bands = _media_prints(batch_media)
    return _media_dedup_core(bands, archive)


def _media_prints(batch_media: DataFrame) -> DataFrame:
    from ..session import stage

    return stage(
        image_dhash_bands(batch_media).dropDuplicates(["media_id"])
    )


def _media_dedup_core(
    bands: DataFrame, archive: DataFrame | None
) -> DataFrame:
    from ..session import stage

    if archive is not None:
        # cross-batch FIRST: batch hashes vs the archived band index —
        # the archive always wins (a replayed image matches itself at
        # hamming 0 and is absorbed here)
        arch_losers = (
            dhash_band_pairs(bands, archive.select(*ARCHIVE_COLUMNS))
            .select(F.col("media_a").alias("media_id"))
            .distinct()
        )
        bands = stage(bands.join(arch_losers, "media_id", "left_anti"))
    # within-batch: sequential greedy over the survivors' pair graph
    batch_losers = greedy_batch_losers(dhash_band_pairs(bands))
    kept = bands.join(batch_losers, "media_id", "left_anti")
    return kept.select(*ARCHIVE_COLUMNS)


def start_incremental_media_dedup(
    media_stream: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Streaming image-dedup query: media stream → canonical band index
    under the BUCKETED print-index layout (print_index module): the
    per-batch archive read prunes to the batch's touched (band_idx,
    band_bucket) partitions instead of full-scanning an index that
    grows with everything ever archived.

    foreachBatch is sequential across triggers, so the read-prune /
    append-survivors cycle is race-free within one query."""

    def process(batch: DataFrame, _batch_id: int) -> None:
        from ..session import release_staged
        from .print_index import (
            append_print_index,
            read_pruned_prints,
            touched_buckets,
        )

        spark = batch.sparkSession
        bands = _media_prints(batch)
        archive = read_pruned_prints(
            spark, sink_dir, touched_buckets(bands), ("media_id",)
        )
        out = _media_dedup_core(bands, archive)
        append_print_index(out, sink_dir, ("media_id",))
        release_staged()

    return (
        media_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**_trigger_kwargs(trigger_seconds))
        .start()
    )
