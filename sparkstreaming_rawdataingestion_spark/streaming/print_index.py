"""Band-bucketed perceptual-print index — the shared archive layout of
the image (media_stream) and audio (audio_stream) dedup streams, round
12. The census seen-index recipe applied to print archives: partition
the state table so a micro-batch's archive read is bounded by the
buckets the batch can actually hit, instead of full-scanning state
that grows with everything ever archived.

Layout — an inverted index with carried prints: ONE ROW PER (print,
band), columns = key cols (media_id [, win]) + ``band_val`` + the full
print ``band0..band{DHASH_BANDS - 1}``, partitioned by ``band_idx``
and ``band_bucket = band_val % PRINT_BUCKETS``. Carrying the whole
print on every long row costs {DHASH_BANDS}x the wide layout's bytes
(still 4 small ints per row — nothing next to payloads) and buys two
things: (1) partition PRUNING by band value — a batch print can only
ever band-match archive rows sharing one of its own (band_idx,
band_val) pairs, and every such row lives in a partition named by
(band_idx, band_val % PRINT_BUCKETS), so the batch's bounded
touched-bucket list (<= {DHASH_BANDS} * PRINT_BUCKETS entries, layout
metadata not data — the census discipline) makes the per-batch read
|archive| x |touched| / ({DHASH_BANDS} * PRINT_BUCKETS) instead of
|archive|; (2) the pruned rows reconstruct the WIDE print frame with a
projection + per-key dedup — no second lookup join against the
archive — and feed the standard ``dhash_band_pairs`` kernel unchanged
(one pair algebra, one storage layout).

Append-only: survivors only ever ADD files to their partitions;
untouched partitions are byte-identical across batches (layout test).
Pruning is EXACT, not approximate — ids outside the touched buckets
cannot band-match the batch, so the absorbed/kept sets equal the
full-scan ones (equivalence test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.multimodal import DHASH_BANDS
from .curation_stream import read_archive

#: bucket count per band for the directory layout (census
#: SEEN_BUCKETS discipline: a layout constant — raise it so a bucket's
#: print set fits an executor at the target archive size). Total
#: partitions = DHASH_BANDS * PRINT_BUCKETS. A deployed archive
#: records its bucket count in a ``.print_buckets.N`` marker file;
#: changing this constant over an existing archive raises at
#: read/append time (check_print_layout) instead of silently missing
#: rows — rewrite the archive first with
#: ``tools/migrate_print_buckets.py`` (round-13 migration path).
PRINT_BUCKETS = 16

_PRINT_COLS = tuple(f"band{k}" for k in range(DHASH_BANDS))


from .bucket_layout import (  # noqa: E402 — layout discipline shared
    check_bucket_marker,
    hadoop_fs as _hadoop_fs,
    write_bucket_marker,
)

PRINT_MARKER = "print_buckets"


def write_print_layout_marker(
    spark: SparkSession, sink_dir: str, buckets: int | None = None
) -> None:
    """Record the archive's bucket count (bucket_layout module — the
    marker discipline shared with the census seen index)."""
    write_bucket_marker(
        spark,
        sink_dir,
        PRINT_MARKER,
        PRINT_BUCKETS if buckets is None else buckets,
    )


def check_print_layout(
    spark: SparkSession,
    sink_dir: str,
    expected: int | None = None,
    _hfs=None,
    _exists: bool | None = None,
) -> bool:
    """Refuse to read or append when the archive's recorded bucket
    count disagrees with the session's PRINT_BUCKETS (a mismatch
    silently MISSES matches — bucket_layout module); marker-less
    legacy archives are cross-checked against their observed
    band_bucket partition values and a bounded row spot-check
    (band_val % session-buckets must reproduce the directory bucket)
    before the return value lets appenders backfill the marker."""
    exp = PRINT_BUCKETS if expected is None else expected
    return check_bucket_marker(
        spark,
        sink_dir,
        PRINT_MARKER,
        exp,
        "tools/migrate_print_buckets.py",
        _hfs=_hfs,
        _exists=_exists,
        bucket_col="band_bucket",
        recompute=lambda df: F.pmod(
            F.col("band_val"), F.lit(exp)
        ).cast("int"),
    )


def _long_carry(bands_wide: DataFrame, key_cols: tuple[str, ...]) -> DataFrame:
    """Explode a wide band frame to the inverted-index rows, carrying
    the full print alongside each (band_idx, band_val)."""
    return bands_wide.select(
        *key_cols,
        F.posexplode(
            F.array(*[F.col(c) for c in _PRINT_COLS])
        ).alias("band_idx", "band_val"),
        *_PRINT_COLS,
    )


def append_print_index(
    out_wide: DataFrame, sink_dir: str, key_cols: tuple[str, ...]
) -> None:
    """Append a batch's surviving wide print rows under the bucketed
    layout. A ZERO-ROW FIRST batch is NOT written (the census
    precedent): a partitioned append of an empty frame creates a
    directory with no parquet footers, which wedges every later read
    with UNABLE_TO_INFER_SCHEMA — read_archive deliberately maps only
    PATH_NOT_FOUND to None. The emptiness probe (an extra job that
    re-executes the dedup tail) is paid ONLY while the sink does not
    exist yet — once footers exist, an empty append is harmless, so
    the common-case batch never pays it (r12 second review)."""
    spark = out_wide.sparkSession
    hfs = _hadoop_fs(spark, sink_dir)
    existed = hfs[1].exists(hfs[2])
    if not existed and out_wide.isEmpty():
        return
    marked = check_print_layout(spark, sink_dir, _hfs=hfs, _exists=existed)
    (
        _long_carry(out_wide, key_cols)
        .withColumn(
            "band_bucket",
            F.pmod(F.col("band_val"), F.lit(PRINT_BUCKETS)).cast("int"),
        )
        .write.mode("append")
        .partitionBy("band_idx", "band_bucket")
        .parquet(sink_dir)
    )
    if not marked:
        # first write records the layout; a legacy pre-marker archive
        # is backfilled on its first guarded append (idempotent file
        # creation — the appender's constant matched the guard above)
        write_print_layout_marker(spark, sink_dir)


def touched_buckets(probe_wide: DataFrame) -> list[tuple[int, int]]:
    """The batch's (band_idx, band_bucket) list — bounded by
    DHASH_BANDS * PRINT_BUCKETS, layout metadata not data."""
    rows = (
        probe_wide.select(
            F.posexplode(
                F.array(*[F.col(c) for c in _PRINT_COLS])
            ).alias("band_idx", "band_val")
        )
        .select(
            "band_idx",
            F.pmod(F.col("band_val"), F.lit(PRINT_BUCKETS))
            .cast("int")
            .alias("band_bucket"),
        )
        .distinct()
        .collect()
    )
    return [(int(r.band_idx), int(r.band_bucket)) for r in rows]


def read_pruned_prints(
    spark: SparkSession,
    sink_dir: str,
    touched: list[tuple[int, int]],
    key_cols: tuple[str, ...],
) -> DataFrame | None:
    """The archived WIDE print frame restricted to prints that share a
    touched partition with the batch — exact for any band join against
    the batch (module docstring). None before the first append or for
    an empty touched list (nothing can match). The isin filters land
    on the partition columns and prune the file listing."""
    check_print_layout(spark, sink_dir)
    table = read_archive(spark, sink_dir)
    if table is None or not touched:
        return None
    by_idx: dict[int, list[int]] = {}
    for idx, bucket in touched:
        by_idx.setdefault(idx, []).append(bucket)
    pred = None
    for idx, buckets in sorted(by_idx.items()):
        leg = (F.col("band_idx") == idx) & F.col("band_bucket").isin(
            buckets
        )
        pred = leg if pred is None else (pred | leg)
    return (
        table.where(pred)
        .select(*key_cols, *_PRINT_COLS)
        .dropDuplicates(list(key_cols))
    )


def read_print_index_wide(
    spark: SparkSession, sink_dir: str, key_cols: tuple[str, ...]
) -> DataFrame | None:
    """The full archive as ONE wide row per print (consumer/test view:
    dashboards, invariant checks). band_idx = 0 rows carry the whole
    print, so the projection needs no dedup-by-band."""
    check_print_layout(spark, sink_dir)
    table = read_archive(spark, sink_dir)
    if table is None:
        return None
    return table.where(F.col("band_idx") == 0).select(
        *key_cols, *_PRINT_COLS
    )
