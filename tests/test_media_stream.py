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

    from sparkstreaming_rawdataingestion_spark.streaming.print_index import (
        read_print_index_wide,
    )

    archive = read_print_index_wide(spark, sink, ("media_id",))
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
    n1 = spark.read.parquet(sink).count()  # long rows — layout-stable
    _run_stream(spark, src, media.schema, sink, str(tmp_path / "c2"))
    n2 = spark.read.parquet(sink).count()
    assert n2 == n1


def test_archive_is_pairwise_near_dup_free(spark, chunked_media, tmp_path):
    """THE archive invariant: no two archived hashes are within the
    hamming bar of each other — any two kept images would have made
    the higher id a loser at its own admission."""
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        dhash_band_pairs,
    )

    media, src = chunked_media
    sink = str(tmp_path / "bands")
    from sparkstreaming_rawdataingestion_spark.streaming.print_index import (
        read_print_index_wide,
    )

    _run_stream(spark, src, media.schema, sink, str(tmp_path / "ckpt"))
    archive = read_print_index_wide(spark, sink, ("media_id",))
    assert dhash_band_pairs(archive).count() == 0


def test_chain_components_pin_the_greedy_policy(spark):
    """Hamming balls are not transitive: with A~C and B~C but A!~B (a
    chain), the batch components ladder keeps only the component min,
    while the stream's greedy rule keeps BOTH A and B (they are
    genuinely dissimilar) and drops C — the policy gap the module
    docstring documents. Construction note: hamming distance obeys the
    triangle inequality, so a strict A~C~B chain at bar 3 needs
    d(A,B) <= 6 — hence 6/3/3."""
    from sparkstreaming_rawdataingestion_spark.streaming.media_stream import (
        media_dedup_increment,
    )

    A = (0b000000, 0, 0, 0)
    B = (0b111111, 0, 0, 0)  # d(A,B) = 6 > 3: not near-dups
    C = (0b000111, 0, 0, 0)  # d(A,C) = 3, d(B,C) = 3: C matches both
    rows = [(1, *A), (2, *B), (3, *C)]
    bands = spark.createDataFrame(
        rows,
        "media_id long, band0 long, band1 long, band2 long, band3 long",
    )
    # feed the increment the BANDS directly via a stub hash stage
    import sparkstreaming_rawdataingestion_spark.streaming.media_stream as ms_mod

    orig = ms_mod.image_dhash_bands
    ms_mod.image_dhash_bands = lambda df: df
    try:
        kept = {
            r.media_id
            for r in media_dedup_increment(bands, None).collect()
        }
    finally:
        ms_mod.image_dhash_bands = orig
    # greedy: C (id 3) matches lower ids 1 and 2 → dropped; A and B are
    # dissimilar → both kept. Components would keep only {1}.
    assert kept == {1, 2}


def test_same_batch_duplicate_delivery_absorbed(spark, tmp_path):
    """A duplicate delivery of the SAME media_id landing inside one
    micro-batch must collapse to one archive row (identical ids never
    pair under a < b, so only the pre-pairing dedup can absorb it)."""
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        synthesize_dhash_media,
    )
    from sparkstreaming_rawdataingestion_spark.streaming.media_stream import (
        media_dedup_increment,
    )

    one = synthesize_dhash_media(spark, SF).where("media_id = 0")
    doubled = one.union(one)
    out = media_dedup_increment(doubled, None).collect()
    assert len(out) == 1 and out[0].media_id == 0


def _increment_on_bands(spark, rows, archive_rows=None):
    """Feed media_dedup_increment raw BAND rows via a stub hash stage."""
    import sparkstreaming_rawdataingestion_spark.streaming.media_stream as m

    schema = (
        "media_id long, band0 long, band1 long, band2 long, band3 long"
    )
    bands = spark.createDataFrame(rows, schema)
    archive = (
        spark.createDataFrame(archive_rows, schema)
        if archive_rows is not None
        else None
    )
    orig = m.image_dhash_bands
    m.image_dhash_bands = lambda df: df
    try:
        return {
            r.media_id
            for r in m.media_dedup_increment(bands, archive).collect()
        }
    finally:
        m.image_dhash_bands = orig


def test_sequential_greedy_chain_is_batch_boundary_invariant(spark):
    """The round-9 ADVICE chain: A~B, B~C, A!~C (ids 1,2,3). Sequential
    greedy keeps {A, C} — B loses to kept A, C's only match B already
    lost — and the stream must produce EXACTLY that set whether the
    chain arrives in one micro-batch or split across three."""
    A = (1, 0b000000, 0, 0, 0)
    B = (2, 0b000111, 0, 0, 0)  # d(A,B) = 3: match
    C = (3, 0b111111, 0, 0, 0)  # d(B,C) = 3: match; d(A,C) = 6: no
    # one batch
    assert _increment_on_bands(spark, [A, B, C]) == {1, 3}
    # split: batch {A} → archive; batch {B} vs {A} → dropped;
    # batch {C} vs {A} → kept (B never archived)
    assert _increment_on_bands(spark, [B], [A]) == set()
    assert _increment_on_bands(spark, [C], [A]) == {3}


def test_archive_loser_cannot_drop_its_batch_mates(spark):
    """Order-of-checks pin: archive holds A; one batch delivers B (~A)
    and C (~B, !~A). B loses to the archive FIRST, so it must not drop
    C in the within-batch pass — global sequential greedy keeps C."""
    A = (1, 0b000000, 0, 0, 0)
    B = (2, 0b000111, 0, 0, 0)
    C = (3, 0b111111, 0, 0, 0)
    assert _increment_on_bands(spark, [B, C], [A]) == {3}


def test_greedy_mis_resolves_a_clique_in_one_wave_and_deep_chains(spark):
    """greedy_batch_losers directly: a 4-clique loses everyone but the
    min; a 5-deep alternating chain (1~2~3~4~5, nothing else) loses
    exactly the even ids — the wave loop must iterate past one round."""
    from sparkstreaming_rawdataingestion_spark.streaming.media_stream import (
        greedy_batch_losers,
    )

    clique = spark.createDataFrame(
        [(a, b) for a in range(1, 5) for b in range(a + 1, 5)],
        "media_a long, media_b long",
    )
    assert {
        r.media_id for r in greedy_batch_losers(clique).collect()
    } == {2, 3, 4}

    chain = spark.createDataFrame(
        [(k, k + 1) for k in range(1, 5)], "media_a long, media_b long"
    )
    # sequential: 1 kept, 2 loses, 3 kept (2 lost), 4 loses, 5 kept
    assert {
        r.media_id for r in greedy_batch_losers(chain).collect()
    } == {2, 4}


def test_greedy_mis_converging_on_the_last_wave_does_not_raise(spark):
    """Off-by-one guard (round-10 review): a graph that resolves fully
    DURING wave max_waves must succeed — the emptiness probe sits at
    the top of the next iteration, so the else-clause must re-check
    instead of raising on exhaustion alone."""
    from sparkstreaming_rawdataingestion_spark.streaming.media_stream import (
        greedy_batch_losers,
    )

    one_edge = spark.createDataFrame(
        [(1, 2)], "media_a long, media_b long"
    )
    got = {
        r.media_id
        for r in greedy_batch_losers(one_edge, max_waves=1).collect()
    }
    assert got == {2}
