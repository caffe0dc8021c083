"""Incremental streaming audio dedup — what the batch oracle can't
cover: cross-batch archive-wins admission over WINDOW prints, and the
containment absorption (an excerpt arriving after its original is
dropped because one of its window prints matches an archived one) that
whole-clip fingerprints structurally miss.
"""

from __future__ import annotations

import pytest

from sparkstreaming_rawdataingestion_spark.streaming.audio_stream import (
    AUDIO_ARCHIVE_COLUMNS,
    audio_dedup_increment,
)
from tests.test_round11_ops import _hand_afpw_media

MEDIA_SCHEMA_DDL = "media_id long, mime string, payload binary"


def _kept(df):
    return sorted({r.media_id for r in df.collect()})


def _clips(spark):
    """The hand ramp corpus (test_round11_ops): 0 = 81-frame original
    (2 windows), 1 = head excerpt, 2 = excerpt x3, 3 = near-dup,
    4 = decreasing ramp (matches nobody)."""
    rows = {r.media_id: r for r in _hand_afpw_media(spark).collect()}
    return rows


def _batch(spark, rows, ids):
    return spark.createDataFrame(
        [(i, rows[i].mime, rows[i].payload) for i in ids],
        MEDIA_SCHEMA_DDL,
    )


def test_one_batch_greedy_keeps_first_of_each_family(spark):
    """All five clips in one batch: 0 is kept (lowest id), 1/2/3 all
    window-match 0 and lose; 4 matches nobody and is kept."""
    rows = _clips(spark)
    out = audio_dedup_increment(_batch(spark, rows, [0, 1, 2, 3, 4]), None)
    assert _kept(out) == [0, 4]
    assert list(out.columns) == list(AUDIO_ARCHIVE_COLUMNS)


def test_containment_excerpt_absorbed_across_batches(spark):
    """THE windowed-index payoff: the original (0) archives in batch 1;
    the hop-aligned excerpt (1), the rescaled excerpt (2) and the
    near-dup (3) arrive in batch 2 and are ALL absorbed by archived
    window prints — a whole-clip hash could never match the shorter
    excerpts against the longer original."""
    rows = _clips(spark)
    archive = audio_dedup_increment(_batch(spark, rows, [0]), None)
    out = audio_dedup_increment(_batch(spark, rows, [1, 2, 3, 4]), archive)
    assert _kept(out) == [4]


def test_replay_appends_nothing(spark):
    """At-least-once absorption: redelivering archived clips yields an
    empty increment (each matches its own prints at hamming 0)."""
    rows = _clips(spark)
    archive = audio_dedup_increment(
        _batch(spark, rows, [0, 1, 2, 3, 4]), None
    )
    out = audio_dedup_increment(
        _batch(spark, rows, [0, 4]), archive
    )
    assert _kept(out) == []


def test_batch_boundary_invariance(spark):
    """One batch vs id-ordered split batches keep the same clips —
    the media_stream invariance transplanted to the windowed index."""
    rows = _clips(spark)
    one = audio_dedup_increment(_batch(spark, rows, [0, 1, 2, 3, 4]), None)
    a = audio_dedup_increment(_batch(spark, rows, [0, 1]), None)
    b = audio_dedup_increment(_batch(spark, rows, [2, 3, 4]), a)
    assert _kept(one) == sorted(_kept(a) + _kept(b)) == [0, 4]


def test_same_batch_duplicate_delivery_absorbed(spark):
    """A duplicate delivery of one clip inside a single micro-batch
    collapses via the (media_id, win) dedup — the archive gets ONE
    print row per window."""
    rows = _clips(spark)
    doubled = spark.createDataFrame(
        [(4, rows[4].mime, rows[4].payload)] * 2, MEDIA_SCHEMA_DDL
    )
    out = audio_dedup_increment(doubled, None)
    assert out.count() == 1  # one 65-frame clip → one window print


def test_streamed_archive_has_no_cross_clip_window_matches(spark, tmp_path):
    """The archive invariant through the real streaming query: after
    file-stream chunks drain, no two ARCHIVED clips window-match (any
    match would have made the higher id a loser at admission)."""
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        audio_window_match_pairs,
    )
    from sparkstreaming_rawdataingestion_spark.streaming.audio_stream import (
        start_incremental_audio_dedup,
    )

    rows = _clips(spark)
    src = tmp_path / "incoming"
    for ids in ([0, 1], [2, 3], [4]):
        _batch(spark, rows, ids).coalesce(1).write.mode("append").parquet(
            str(src)
        )
    stream = (
        spark.readStream.schema(MEDIA_SCHEMA_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    sink = str(tmp_path / "prints")
    q = start_incremental_audio_dedup(
        stream, sink, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    q.stop()
    from sparkstreaming_rawdataingestion_spark.streaming.print_index import (
        read_print_index_wide,
    )

    archive = read_print_index_wide(spark, sink, ("media_id", "win"))
    kept = sorted({r.media_id for r in archive.collect()})
    # clips 0-3 are a pairwise-matching clique, so greedy admission
    # keeps exactly ONE of them under ANY batch delivery order (the
    # file stream orders batches by file mtime, which equal-timestamp
    # appends make nondeterministic — don't pin WHICH one); clip 4
    # matches nobody and always survives
    assert len(kept) == 2 and kept[1] == 4 and kept[0] in (0, 1, 2, 3)
    assert audio_window_match_pairs(archive).count() == 0


# ---------------------------------------------------------------------------
# round-12 asymmetric probe: misaligned excerpts
# ---------------------------------------------------------------------------


def _asym_clips(spark):
    """Zigzag corpus from test_round12_ops: 0 = 97-frame original,
    1 = 80-frame x2 excerpt starting at frame 5 (OFF the hop grid),
    2 = reversed control (matches nobody)."""
    from tests.test_round12_ops import _asym_media

    return {r.media_id: r for r in _asym_media(spark).collect()}


def test_misaligned_excerpt_absorbed_across_batches(spark):
    """THE round-12 payoff: the original archives in batch 1; its
    OFF-grid excerpt arrives in batch 2 and is absorbed because the
    excerpt's hop-1 probe window 11 lands exactly on the original's
    archived window 1 — the hop-aligned check was structurally blind
    to this clip (pinned in test_round12_ops)."""
    rows = _asym_clips(spark)
    archive = audio_dedup_increment(_batch(spark, rows, [0]), None)
    out = audio_dedup_increment(_batch(spark, rows, [1, 2]), archive)
    assert _kept(out) == [2]


def test_misaligned_excerpt_batch_boundary_invariance(spark):
    """Same survivors whether the misaligned family arrives in one
    batch or split — requires the within-batch pass to run the SAME
    asymmetric probe as the archive check."""
    rows = _asym_clips(spark)
    one = audio_dedup_increment(_batch(spark, rows, [0, 1, 2]), None)
    a = audio_dedup_increment(_batch(spark, rows, [0]), None)
    b = audio_dedup_increment(_batch(spark, rows, [1, 2]), a)
    assert _kept(one) == sorted(_kept(a) + _kept(b)) == [0, 2]


def test_short_misaligned_excerpt_uniform_detection_bound(spark):
    """A 65-frame x2 excerpt at offset 5 has NO aligned hop-1 probe
    window against its original's hop-grid prints (needs >= 65 + 11
    frames) — below the asymmetric probe's detection bound. The bound
    must be UNIFORM: the excerpt survives both across batches AND
    within one batch (the one-directional within-batch pass — r12
    review: a bidirectional pass caught it in-batch only, making the
    survivor set depend on where the boundary fell)."""
    from tests.test_round12_ops import _asym_amps

    from sparkstreaming_rawdataingestion_spark.operators import (
        media_codecs,
    )

    orig, _, control = _asym_amps()
    short_excerpt = [2 * a for a in orig[5:70]]  # 65 frames, offset 5

    def clip(amps):
        samples = []
        for a in amps:
            samples.extend([a] * 8)
        return media_codecs.wav_encode(samples)

    rows = {
        0: (0, "audio/wav", clip(orig)),
        1: (1, "audio/wav", clip(short_excerpt)),
        2: (2, "audio/wav", clip(control)),
    }

    def batch(ids):
        return spark.createDataFrame(
            [rows[i] for i in ids], MEDIA_SCHEMA_DDL
        )

    one = audio_dedup_increment(batch([0, 1, 2]), None)
    a = audio_dedup_increment(batch([0]), None)
    b = audio_dedup_increment(batch([1, 2]), a)
    assert _kept(one) == sorted(_kept(a) + _kept(b)) == [0, 1, 2]


def test_streamed_misaligned_excerpt_absorbed_end_to_end(spark, tmp_path):
    """The whole round-12 stack through a real streaming query: file
    stream in id order (original first, then its OFF-grid excerpt +
    control), bucketed print-index sink, asymmetric archive probe —
    the excerpt must be absorbed and the archive must hold exactly the
    original's and control's hop-grid prints."""
    from sparkstreaming_rawdataingestion_spark.streaming.audio_stream import (
        start_incremental_audio_dedup,
    )
    from sparkstreaming_rawdataingestion_spark.streaming.print_index import (
        read_print_index_wide,
    )

    rows = _asym_clips(spark)
    src = tmp_path / "incoming"
    for ids in ([0], [1, 2]):
        _batch(spark, rows, ids).coalesce(1).write.mode("append").parquet(
            str(src)
        )
    stream = (
        spark.readStream.schema(MEDIA_SCHEMA_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    sink = str(tmp_path / "prints")
    q = start_incremental_audio_dedup(stream, sink, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    q.stop()
    archive = read_print_index_wide(spark, sink, ("media_id", "win"))
    kept = sorted({r.media_id for r in archive.collect()})
    # file-stream batch order is mtime-nondeterministic for the two
    # chunks, but every order absorbs the excerpt: original-first via
    # the archive probe, same-batch via the one-directional pass, and
    # excerpt-first leaves the original probing the excerpt's archived
    # prints (contained -> original loses). Exactly two clips survive.
    assert len(kept) == 2 and kept[1] == 2 and kept[0] in (0, 1)


# ---------------------------------------------------------------------------
# round-13 sub-frame probe: excerpts cut MID-frame, arbitrary-sample clips
# ---------------------------------------------------------------------------


def _subframe_stream_media(excerpt_samples=784):
    """The round-13 hand corpus as stream clips: 0 = 113-frame
    quadratic original, 1 = x2 excerpt starting at SAMPLE 43 (5 frames
    + 3 samples — mid-frame, the class the round-12 frame-hop probe
    was structurally blind to), 2 = reversed control. The excerpt is
    truncated to ``excerpt_samples`` (need >= 520 + ((-43) mod 128) =
    605 samples for the aligned probe window to exist)."""
    from sparkstreaming_rawdataingestion_spark.operators import (
        media_codecs,
    )
    from tests.test_round13_ops import _subframe_samples

    orig, excerpt, control, _ = _subframe_samples()
    rows = [
        (0, "audio/wav", media_codecs.wav_encode(orig)),
        (1, "audio/wav", media_codecs.wav_encode(excerpt[:excerpt_samples])),
        (2, "audio/wav", media_codecs.wav_encode(control)),
    ]
    return {
        r[0]: type("R", (), {"mime": r[1], "payload": r[2]})()
        for r in rows
    }


def test_subframe_excerpt_absorbed_across_batches(spark):
    """A mid-frame excerpt arriving AFTER its original is absorbed:
    its sample-hop probe window u = 85 lands exactly on the
    original's archived window 1 — the round-12 frame-hop probe had
    no such window (every frame-grid window blends two original
    frames; blindness measured in test_round13_ops)."""
    rows = _subframe_stream_media()
    archive = audio_dedup_increment(_batch(spark, rows, [0, 2]), None)
    out = audio_dedup_increment(_batch(spark, rows, [1]), archive)
    assert _kept(out) == []


def test_subframe_excerpt_same_batch_and_boundary_invariance(spark):
    """Same survivors whether the sub-frame family arrives in one
    batch or split across batches (the one-directional within-batch
    pass shares the archive check's geometry)."""
    rows = _subframe_stream_media()
    one = audio_dedup_increment(_batch(spark, rows, [0, 1, 2]), None)
    a = audio_dedup_increment(_batch(spark, rows, [0]), None)
    b = audio_dedup_increment(_batch(spark, rows, [1, 2]), a)
    assert _kept(one) == sorted(_kept(a) + _kept(b)) == [0, 2]


def test_short_subframe_excerpt_uniform_detection_bound(spark):
    """A 600-sample excerpt at sample offset 43 has NO aligned probe
    window (needs >= 605 samples) — below the sub-frame detection
    bound, so it is consistently KEPT in both the one-batch and the
    split arrangement (uniform bound; a 608-sample excerpt clears it
    and is consistently dropped). Also exercises clip lengths that
    are NOT a whole number of frames — legal input since round 13."""
    below = _subframe_stream_media(excerpt_samples=600)
    one = audio_dedup_increment(_batch(spark, below, [0, 1, 2]), None)
    a = audio_dedup_increment(_batch(spark, below, [0, 2]), None)
    b = audio_dedup_increment(_batch(spark, below, [1]), a)
    assert _kept(one) == [0, 1, 2]
    assert sorted(_kept(a) + _kept(b)) == [0, 1, 2]

    above = _subframe_stream_media(excerpt_samples=608)
    one = audio_dedup_increment(_batch(spark, above, [0, 1, 2]), None)
    a = audio_dedup_increment(_batch(spark, above, [0, 2]), None)
    b = audio_dedup_increment(_batch(spark, above, [1]), a)
    assert _kept(one) == [0, 2]
    assert sorted(_kept(a) + _kept(b)) == [0, 2]


def test_round12_archive_prints_bit_compatible(spark):
    """ROW-SET equality between the old frame-grid stage and the new
    sample-grid projection — including the win column in HOP UNITS —
    plus replay absorption against a round-12-shaped archive. The
    row-set pin is load-bearing: win is print IDENTITY in the pair
    kernel (never a join key), so a broken renumbering would keep
    every match test green while corrupting the archive layout
    (r13 review, confirmed by mutation: persisting win in samples
    passed the whole suite). Collected-multiset comparison — the
    shared-lineage exceptAll Catalyst trip."""
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        audio_windowed_fingerprint_bands,
    )
    from sparkstreaming_rawdataingestion_spark.streaming.audio_stream import (
        _audio_prints,
    )

    rows = _clips(spark)
    old_rows = sorted(
        tuple(r)
        for r in audio_windowed_fingerprint_bands(_batch(spark, rows, [0, 4]))
        .select(*AUDIO_ARCHIVE_COLUMNS)
        .collect()
    )
    wbands, _ = _audio_prints(_batch(spark, rows, [0, 4]))
    new_rows = sorted(tuple(r) for r in wbands.collect())
    assert new_rows == old_rows and len(new_rows) > 0

    old_archive = (
        audio_windowed_fingerprint_bands(_batch(spark, rows, [0, 4]))
        .select(*AUDIO_ARCHIVE_COLUMNS)
    )
    out = audio_dedup_increment(_batch(spark, rows, [0, 4]), old_archive)
    assert _kept(out) == []


def test_cross_family_false_absorb_rate_at_probe_density(spark):
    """Round-13 advice: the streaming absorb path drops the exact-scale
    energy witnesses while densifying probes to sample hop 1, so
    absorption rests on band hamming alone — pin the cross-family
    (unrelated-clip) margin at the NEW probe density so regressions in
    false-absorb rate are caught. 24 unrelated registry-envelope
    originals produce real collision pressure (measured in-session:
    ~6k single-band collisions, >100 all-band-matched cross window
    pairs at the archive geometry) yet the minimum cross-family
    hamming stays far above the absorb threshold (measured 13 vs <= 3)
    and NO unrelated clip is absorbed end to end."""
    from pyspark.sql import functions as F

    from sparkstreaming_rawdataingestion_spark.operators import (
        media_codecs,
    )
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        AFP_FRAME_SIZE,
        AFPS_ORIG_FRAMES,
        DHASH_MAX_HAMMING,
        _afp_env,
        audio_subframe_fingerprint_bands,
    )

    def orig_clip(f):
        s = []
        for j in range(AFPS_ORIG_FRAMES):
            a = _afp_env(f, j)
            s.extend(
                a if t % 2 == 0 else -a for t in range(AFP_FRAME_SIZE)
            )
        return s

    n_clips = 24
    media = spark.createDataFrame(
        [
            (f, "audio/wav", media_codecs.wav_encode(orig_clip(f)))
            for f in range(n_clips)
        ],
        MEDIA_SCHEMA_DDL,
    )

    # the probe-density margin: every cross-clip all-band-matched
    # candidate pair (dense hop-1 probe vs hop-grid archive print —
    # the absorb path's geometry) must sit ABOVE the absorb threshold
    pr = audio_subframe_fingerprint_bands(media, sample_hop=1)
    bands = [F.col(f"band{k}") for k in range(4)]
    long = pr.select(
        "media_id",
        "win",
        F.posexplode(F.array(*bands)).alias("bi", "bv"),
    )
    arch = pr.where(F.pmod(F.col("win"), F.lit(128)) == 0)
    arch_long = arch.select(
        "media_id",
        "win",
        F.posexplode(F.array(*bands)).alias("bi", "bv"),
    )
    cand = (
        long.alias("a")
        .join(
            arch_long.alias("b"),
            (F.col("a.bi") == F.col("b.bi"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.media_id") != F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("ma"),
            F.col("a.win").alias("wa"),
            F.col("b.media_id").alias("mb"),
            F.col("b.win").alias("wb"),
        )
        .distinct()
    )
    pa = pr.select(
        F.col("media_id").alias("ma"),
        F.col("win").alias("wa"),
        *[F.col(f"band{k}").alias(f"a{k}") for k in range(4)],
    )
    pb = arch.select(
        F.col("media_id").alias("mb"),
        F.col("win").alias("wb"),
        *[F.col(f"band{k}").alias(f"b{k}") for k in range(4)],
    )
    ham = (
        cand.join(pa, ["ma", "wa"])
        .join(pb, ["mb", "wb"])
        .select(
            sum(
                F.bit_count(F.col(f"a{k}").bitwiseXOR(F.col(f"b{k}")))
                for k in range(4)
            ).alias("h")
        )
        .agg(F.count("*").alias("n"), F.min("h").alias("mn"))
        .collect()[0]
    )
    assert ham["n"] > 50, "no collision pressure: the pin is vacuous"
    assert ham["mn"] > DHASH_MAX_HAMMING, (
        f"cross-family hamming margin collapsed: min {ham['mn']} vs "
        f"absorb threshold {DHASH_MAX_HAMMING}"
    )

    # end to end: nothing unrelated is absorbed, either across the
    # archive boundary or within a batch
    half = n_clips // 2
    archived = audio_dedup_increment(
        media.where(F.col("media_id") < half), None
    )
    out = audio_dedup_increment(
        media.where(F.col("media_id") >= half), archived
    )
    assert _kept(archived) == list(range(half))
    assert _kept(out) == list(range(half, n_clips))
