"""Interleaved A/B of the round-14 dhash_band_pairs kernel rewrite.

Alternates LEGACY (candidate join -> distinct -> x/y verify joins) and
NEW (bands carried through the join -> groupBy dedup) within ONE session,
on the named registry queries, so host drift hits both variants equally.

Usage: python tools/ab_dhash_r14.py [--reps N] name [name ...]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def legacy_dhash_band_pairs(bands, other=None, max_hamming=None, extra_key=()):
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        DHASH_BANDS,
        DHASH_MAX_HAMMING,
    )

    if max_hamming is None:
        max_hamming = DHASH_MAX_HAMMING

    def _bands_long(b, ek=()):
        return b.select(
            "media_id",
            *ek,
            F.posexplode(
                F.array(*[F.col(f"band{k}") for k in range(DHASH_BANDS)])
            ).alias("band_idx", "band_val"),
        )

    key_a = ["media_a", *[f"{k}_a" for k in extra_key]]
    key_b = ["media_b", *[f"{k}_b" for k in extra_key]]
    long_a = _bands_long(bands, extra_key)
    long_b = _bands_long(other, extra_key) if other is not None else long_a
    id_cond = (
        F.col("a.media_id") < F.col("b.media_id")
        if other is None
        else F.lit(True)
    )
    cand = (
        long_a.alias("a")
        .join(
            long_b.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & id_cond,
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            *[F.col(f"a.{k}").alias(f"{k}_a") for k in extra_key],
            F.col("b.media_id").alias("media_b"),
            *[F.col(f"b.{k}").alias(f"{k}_b") for k in extra_key],
        )
        .distinct()
    )
    x = bands.select(
        F.col("media_id").alias("media_a"),
        *[F.col(k).alias(f"{k}_a") for k in extra_key],
        *[F.col(f"band{k}").alias(f"xb{k}") for k in range(DHASH_BANDS)],
    )
    y = (other if other is not None else bands).select(
        F.col("media_id").alias("media_b"),
        *[F.col(k).alias(f"{k}_b") for k in extra_key],
        *[F.col(f"band{k}").alias(f"yb{k}") for k in range(DHASH_BANDS)],
    )
    hamming = sum(
        F.bit_count(F.col(f"xb{k}").bitwiseXOR(F.col(f"yb{k}")))
        for k in range(DHASH_BANDS)
    ).cast("long")
    return (
        cand.join(x, key_a)
        .join(y, key_b)
        .select(*key_a, *key_b, hamming.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from sparkstreaming_rawdataingestion_spark.operators import multimodal
    from sparkstreaming_rawdataingestion_spark.queries import all_queries
    from sparkstreaming_rawdataingestion_spark.session import get_spark

    new_impl = multimodal.dhash_band_pairs
    spark = get_spark(app_name="ab-dhash-r14")
    registry = all_queries()

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        registry[name](spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    registry[args.names[0]](spark, args.sf).limit(1).count()  # warm IO

    for name in args.names:
        res: dict[str, list[float]] = {"legacy": [], "new": []}
        # one untimed warm-up per variant
        for variant, impl in (("legacy", legacy_dhash_band_pairs), ("new", new_impl)):
            multimodal.dhash_band_pairs = impl
            run_once(name)
        for _ in range(args.reps):
            for variant, impl in (
                ("legacy", legacy_dhash_band_pairs),
                ("new", new_impl),
            ):
                multimodal.dhash_band_pairs = impl
                spark.sparkContext.setJobDescription(f"ab:{name}:{variant}")
                res[variant].append(run_once(name))
                spark.sparkContext.setJobDescription(None)
        multimodal.dhash_band_pairs = new_impl
        print(
            f"{name}: legacy={[round(r, 2) for r in res['legacy']]} "
            f"med={statistics.median(res['legacy']):.2f} | "
            f"new={[round(r, 2) for r in res['new']]} "
            f"med={statistics.median(res['new']):.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
