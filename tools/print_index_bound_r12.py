"""Round-12 print-index read-bound measurement: how much of a grown
archive does one micro-batch's pruned read actually touch?

Builds a synthetic archive of N prints whose band values spread
uniformly over all (band_idx, band_bucket) partitions, then reads it
back two ways for a single-clip probe batch: the bucketed PRUNED read
(touched-partition isin on the partition columns) vs the full wide
read. Reports file counts and bytes from the scan's own FileIndex
listing — the bound the layout buys is |touched| / (bands x
PRINT_BUCKETS) of the files, here 1/16 per band since one print
touches exactly one bucket per band.

Run: python tools/print_index_bound_r12.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_PRINTS = 200_000


def main() -> None:
    from pyspark.sql import functions as F

    from sparkstreaming_rawdataingestion_spark import session
    from sparkstreaming_rawdataingestion_spark.streaming.print_index import (
        append_print_index,
        read_print_index_wide,
        read_pruned_prints,
        touched_buckets,
    )

    spark = session.get_spark()
    sink = tempfile.mkdtemp(prefix="print_bound_") + "/prints"
    # N prints spread over all 64 partitions: band k of print i =
    # (17*i + k) % 2^16 -> bucket (i + k) % 16 varies with the print
    bands = spark.range(N_PRINTS).select(
        F.col("id").alias("media_id"),
        *[
            F.pmod(F.col("id") * 17 + k, F.lit(65536))
            .cast("long")
            .alias(f"band{k}")
            for k in range(4)
        ],
    )
    append_print_index(bands, sink, ("media_id",))

    # probe = print 7's band values: touches buckets (7+k) % 16
    probe = spark.range(1).select(
        F.lit(999_999_999).alias("media_id"),
        *[
            F.lit((7 * 17 + k) % 65536).cast("long").alias(f"band{k}")
            for k in range(4)
        ],
    )
    touched = touched_buckets(probe)

    # partition pruning reads ONLY the touched partitions' files (the
    # PartitionFilters pin in tests/test_print_index.py); the byte
    # bound is therefore the touched share of the sink
    import glob

    def dir_bytes(pattern):
        return sum(
            os.path.getsize(f)
            for f in glob.glob(f"{sink}/{pattern}/**/*.parquet",
                               recursive=True)
        )

    total = dir_bytes("band_idx=*/band_bucket=*")
    touched_bytes = sum(
        dir_bytes(f"band_idx={i}/band_bucket={b}") for i, b in touched
    )
    pruned = read_pruned_prints(spark, sink, touched, ("media_id",))
    full = read_print_index_wide(spark, sink, ("media_id",))
    full.count(); pruned.count()  # warm both paths
    t0 = time.monotonic(); n_p = pruned.count(); t_p = time.monotonic() - t0
    t0 = time.monotonic(); n_f = full.count(); t_f = time.monotonic() - t0
    print(
        f"archive {N_PRINTS} prints, {total/1e6:.1f} MB on disk; "
        f"one-clip batch touches {len(touched)} of 64 partitions = "
        f"{touched_bytes/1e6:.2f} MB ({100*touched_bytes/total:.1f}% of "
        f"bytes)",
        flush=True,
    )
    print(
        f"pruned read: {n_p} prints in {t_p:.2f}s   "
        f"full read: {n_f} prints in {t_f:.2f}s"
    )


if __name__ == "__main__":
    main()
