"""Band-bucketed print-index layout (round 12) — the census recipe
applied to the image/audio dedup archives: layout on disk, exact
pruning, bounded per-batch reads, append-only untouched buckets.
"""

from __future__ import annotations

import glob
import hashlib
import os

import pytest

from sparkstreaming_rawdataingestion_spark.streaming.print_index import (
    PRINT_BUCKETS,
    append_print_index,
    read_print_index_wide,
    read_pruned_prints,
    touched_buckets,
)

BANDS_DDL = "media_id long, band0 long, band1 long, band2 long, band3 long"


def _bands(spark, rows):
    return spark.createDataFrame(rows, BANDS_DDL)


def _dir_state(sink):
    """{relative file path: sha1} for every parquet part file."""
    out = {}
    for f in glob.glob(f"{sink}/**/*.parquet", recursive=True):
        with open(f, "rb") as fh:
            out[os.path.relpath(f, sink)] = hashlib.sha1(
                fh.read()
            ).hexdigest()
    return out


def test_layout_partitions_and_carried_prints(spark, tmp_path):
    """One print lands as DHASH_BANDS long rows, each in the partition
    named by its band value's bucket, each carrying the FULL print."""
    sink = str(tmp_path / "prints")
    append_print_index(
        _bands(spark, [(7, 100, 101, 102, 103)]), sink, ("media_id",)
    )
    dirs = sorted(
        os.path.relpath(d, sink)
        for d in glob.glob(f"{sink}/band_idx=*/band_bucket=*")
    )
    assert dirs == [
        f"band_idx={k}/band_bucket={(100 + k) % PRINT_BUCKETS}"
        for k in range(4)
    ]
    wide = read_print_index_wide(spark, sink, ("media_id",))
    assert [tuple(r) for r in wide.collect()] == [(7, 100, 101, 102, 103)]


def test_untouched_buckets_byte_identical_across_appends(spark, tmp_path):
    """Append-only invariant: a second batch only ADDS files; every
    file present before it is byte-identical after (no rewrite of
    untouched — or even touched — buckets)."""
    sink = str(tmp_path / "prints")
    append_print_index(
        _bands(spark, [(1, 0, 1, 2, 3)]), sink, ("media_id",)
    )
    before = _dir_state(sink)
    append_print_index(
        _bands(spark, [(2, 16, 17, 18, 19)]), sink, ("media_id",)
    )
    after = _dir_state(sink)
    assert set(before) <= set(after)
    for f, sha in before.items():
        assert after[f] == sha
    # the second print's band values share buckets 0-3 with the first:
    # same partitions, new files only
    assert len(after) > len(before)


def test_pruned_read_is_exact_vs_full_read(spark, tmp_path):
    """Pruning exactness: for any probe batch, the pruned archive
    yields the SAME band-join matches as the full wide archive — rows
    outside the touched buckets cannot band-match the batch."""
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        dhash_band_pairs,
    )

    sink = str(tmp_path / "prints")
    archived = [
        (1, 0, 100, 200, 300),
        (2, 16, 116, 216, 316),
        (3, 5000, 5100, 5200, 5300),
    ]
    append_print_index(_bands(spark, archived), sink, ("media_id",))
    # probe matches archived id 2 exactly; ids 1/3 share no band value
    probe = _bands(spark, [(9, 16, 116, 216, 316)])
    touched = touched_buckets(probe)
    pruned = read_pruned_prints(spark, sink, touched, ("media_id",))
    full = read_print_index_wide(spark, sink, ("media_id",))
    got_pruned = sorted(
        (r.media_a, r.media_b, r.hamming)
        for r in dhash_band_pairs(probe, pruned).collect()
    )
    got_full = sorted(
        (r.media_a, r.media_b, r.hamming)
        for r in dhash_band_pairs(probe, full).collect()
    )
    assert got_pruned == got_full == [(9, 2, 0)]


def test_pruned_read_prunes_partitions_in_the_scan(spark, tmp_path):
    """THE bound: the pruning predicate lands as PartitionFilters on
    the parquet scan (file-listing pruning, not a post-scan filter),
    and only the touched bucket's prints come back — the archive read
    is |touched|/|all| of the index."""
    sink = str(tmp_path / "prints")
    rows = [
        (i, i, 16 + i, 32 + i, 48 + i)  # every band of id i -> bucket i
        for i in range(1, 9)
    ]
    append_print_index(_bands(spark, rows), sink, ("media_id",))
    probe = _bands(spark, [(99, 1, 17, 33, 49)])  # bucket 1: id 1 only
    touched = touched_buckets(probe)
    assert set(touched) == {(k, 1) for k in range(4)}
    pruned = read_pruned_prints(spark, sink, touched, ("media_id",))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan and "band_bucket" in scan[0]
    assert "PartitionFilters: []" not in scan[0]
    assert sorted(r.media_id for r in pruned.collect()) == [1]


def test_empty_touched_and_missing_dir(spark, tmp_path):
    assert (
        read_pruned_prints(
            spark, str(tmp_path / "absent"), [(0, 0)], ("media_id",)
        )
        is None
    )
    sink = str(tmp_path / "prints")
    append_print_index(
        _bands(spark, [(1, 0, 1, 2, 3)]), sink, ("media_id",)
    )
    assert read_pruned_prints(spark, sink, [], ("media_id",)) is None


def test_empty_first_batch_does_not_wedge_the_sink(spark, tmp_path):
    """A zero-row first batch must NOT create a schema-less sink
    directory (a partitioned append of an empty frame writes no
    parquet footers and every later read dies with
    UNABLE_TO_INFER_SCHEMA): the write is skipped, the sink stays
    absent-or-readable, and a later real batch lands normally (r12
    review)."""
    sink = str(tmp_path / "prints")
    empty = _bands(spark, []).where("media_id IS NOT NULL").limit(0)
    append_print_index(empty, sink, ("media_id",))
    assert (
        read_pruned_prints(spark, sink, [(0, 0)], ("media_id",)) is None
    )
    append_print_index(
        _bands(spark, [(1, 0, 1, 2, 3)]), sink, ("media_id",)
    )
    wide = read_print_index_wide(spark, sink, ("media_id",))
    assert [tuple(r) for r in wide.collect()] == [(1, 0, 1, 2, 3)]


def test_bucket_migration_round_trip(spark, tmp_path, monkeypatch):
    """migrate_print_buckets rewrites an archive to a new bucket count
    with data equivalence: after migration (16 -> 32), a session
    running PRINT_BUCKETS=32 reads the SAME wide prints and the SAME
    exact pruned sets; a session still on 16 refuses loudly with the
    marker guard (round-12 verdict Next #5)."""
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "tools")
    )
    import migrate_print_buckets as mig

    from sparkstreaming_rawdataingestion_spark.streaming import (
        print_index as pi,
    )

    sink = str(tmp_path / "prints")
    rows = [
        (m, 100 + m, 2000 + 3 * m, 40 + m, 65000 - m) for m in range(24)
    ]
    append_print_index(_bands(spark, rows), sink, ("media_id",))
    before = sorted(
        tuple(r)
        for r in read_print_index_wide(
            spark, sink, ("media_id",)
        ).collect()
    )

    mig.migrate(spark, sink, 32)

    # old-constant session: the guard refuses read AND append
    with pytest.raises(ValueError, match="migrate_print_buckets"):
        read_print_index_wide(spark, sink, ("media_id",))
    with pytest.raises(ValueError, match="migrate_print_buckets"):
        append_print_index(
            _bands(spark, [(99, 1, 2, 3, 4)]), sink, ("media_id",)
        )

    # new-constant session: identical wide prints, exact pruning
    monkeypatch.setattr(pi, "PRINT_BUCKETS", 32)
    after = sorted(
        tuple(r)
        for r in pi.read_print_index_wide(
            spark, sink, ("media_id",)
        ).collect()
    )
    assert after == before
    probe = _bands(spark, rows[:3])
    touched = pi.touched_buckets(probe)
    pruned = pi.read_pruned_prints(spark, sink, touched, ("media_id",))
    assert sorted(tuple(r) for r in pruned.collect() if r.media_id < 3) == (
        sorted(t for t in before if t[0] < 3)
    )
    # the partition layout really is 32-bucketed now
    dirs = glob.glob(f"{sink}/band_idx=0/band_bucket=*")
    assert any(
        int(d.rsplit("=", 1)[1]) >= 16 for d in dirs
    ), "no bucket >= 16: the rewrite did not change the modulus"


def test_legacy_markerless_backfill_cross_check(
    spark, tmp_path, monkeypatch
):
    """Round-13 advice: a marker-less (pre-round-13) archive must NOT
    be blindly stamped with the session's constant on first guarded
    append. The backfill cross-check reads the observed partition
    values: a session whose constant is SMALLER than the written
    modulus refuses on the observed max; a session whose constant is
    LARGER (the silent-miss case — every observed bucket is also
    below the larger modulus) refuses on the row spot-check
    (band_val % session-buckets does not reproduce the directory
    bucket); the TRUE constant passes and the append then backfills
    the marker."""
    from sparkstreaming_rawdataingestion_spark.streaming import (
        print_index as pi,
    )

    sink = str(tmp_path / "prints")
    rows = [
        (m, 100 + m, 2000 + 3 * m, 40 + m, 65000 - m) for m in range(24)
    ]
    append_print_index(_bands(spark, rows), sink, ("media_id",))
    # simulate a pre-marker legacy archive (written at 16)
    marker = glob.glob(f"{sink}/.print_buckets.*")
    assert len(marker) == 1
    os.remove(marker[0])

    # larger session constant: observed buckets all < 32, only the
    # spot-check can catch it — and must
    monkeypatch.setattr(pi, "PRINT_BUCKETS", 32)
    with pytest.raises(ValueError, match="do not reproduce"):
        pi.check_print_layout(spark, sink)

    # smaller session constant: observed max >= 8 refuses on listing
    monkeypatch.setattr(pi, "PRINT_BUCKETS", 8)
    with pytest.raises(ValueError, match=">="):
        pi.check_print_layout(spark, sink)

    # true constant: passes, and an append backfills the marker
    monkeypatch.setattr(pi, "PRINT_BUCKETS", 16)
    assert pi.check_print_layout(spark, sink) is False
    pi.append_print_index(
        _bands(spark, [(99, 1, 2, 3, 4)]), sink, ("media_id",)
    )
    assert glob.glob(f"{sink}/.print_buckets.16")


def test_multiple_markers_reported_in_error(spark, tmp_path):
    """Round-13 advice: when an interrupted migration leaves two
    markers, the refusal must name BOTH, not just the first."""
    from sparkstreaming_rawdataingestion_spark.streaming import (
        print_index as pi,
    )

    sink = str(tmp_path / "prints")
    append_print_index(
        _bands(spark, [(1, 10, 20, 30, 40)]), sink, ("media_id",)
    )
    open(f"{sink}/.print_buckets.32", "w").close()
    with pytest.raises(ValueError) as ei:
        pi.check_print_layout(spark, sink)
    msg = str(ei.value)
    assert ".print_buckets.16" in msg and ".print_buckets.32" in msg
    assert "Multiple markers" in msg
