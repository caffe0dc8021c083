"""Z-order layout: interleave correctness, quantize edge cases, and the
actual data-skipping payoff — a 2-D box predicate touches far fewer
z-ordered files than single-column-sorted ones."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from sparkstreaming_rawdataingestion_spark import catalog
from sparkstreaming_rawdataingestion_spark.operators import layout

SF01 = "/root/testdata/sf0.01"


def test_interleave_bits_known_values(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 3), (255, 0), (0, 255), (170, 85)],
        "x long, y long",
    )
    out = {
        (r.x, r.y): r.z
        for r in df.select(
            "x",
            "y",
            layout.interleave_bits([F.col("x"), F.col("y")], 8).alias("z"),
        ).collect()
    }

    def morton(x, y):
        return sum(
            ((x >> b & 1) << (2 * b)) | ((y >> b & 1) << (2 * b + 1))
            for b in range(8)
        )

    for (x, y), z in out.items():
        assert z == morton(x, y), (x, y)


def test_quantize_bounds_and_degenerate_span(spark):
    df = spark.createDataFrame([(0.0,), (50.0,), (100.0,)], "v double")
    q = df.select(
        layout.quantize(F.col("v"), F.lit(0.0), F.lit(100.0), bits=4).alias("b")
    ).collect()
    assert [r.b for r in q] == [0, 8, 15]  # max clamps to 2^bits - 1
    deg = df.select(
        layout.quantize(F.col("v"), F.lit(7.0), F.lit(7.0), bits=4).alias("b")
    ).collect()
    assert all(r.b == 0 for r in deg)


def test_zorder_layout_skips_files_on_2d_box(spark, tmp_path):
    """The point of z-order: a box predicate on (user_id, ts) hits a
    small fraction of z-ordered files but nearly all ts-sorted files,
    because single-column sort gives the second column no locality."""
    ev = catalog.load_table(spark, SF01, "events").select(
        "user_id", F.col("ts").cast("timestamp").cast("long").alias("t")
    )
    zdir, sdir = str(tmp_path / "z"), str(tmp_path / "s")
    layout.zorder_layout(ev, ["user_id", "t"], bits=8, n_files=32).write.parquet(zdir)
    ev.repartitionByRange(32, "t").sortWithinPartitions("t").write.parquet(sdir)

    lo_u, hi_u = ev.agg(F.min("user_id"), F.max("user_id")).first()
    lo_t, hi_t = ev.agg(F.min("t"), F.max("t")).first()
    # a box covering ~1/8 of each dimension
    box = (
        (F.col("user_id") >= lo_u)
        & (F.col("user_id") <= lo_u + (hi_u - lo_u) / 8)
        & (F.col("t") >= lo_t)
        & (F.col("t") <= lo_t + int((hi_t - lo_t) / 8))
    )

    def files_touched(path):
        return (
            spark.read.parquet(path)
            .where(box)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    z_files, s_files = files_touched(zdir), files_touched(sdir)
    # identical matched rows either way
    assert (
        spark.read.parquet(zdir).where(box).count()
        == spark.read.parquet(sdir).where(box).count()
    )
    assert z_files < s_files / 2, (z_files, s_files)
    shutil.rmtree(zdir, ignore_errors=True)
    shutil.rmtree(sdir, ignore_errors=True)


def test_zorder_query_registered(spark):
    rows = layout.QUERIES["layout_zorder_key"](spark, SF01)
    assert rows.count() == catalog.load_table(spark, SF01, "orders").count()


def test_compact_partitions_bounds_files_and_preserves_data(spark, tmp_path):
    """Streaming-sink small files → compaction bounds per-partition file
    count, preserves the exact row multiset, leaves untargeted partitions
    untouched, and re-runs idempotently."""
    import os

    from pyspark.sql import functions as F

    from sparkstreaming_rawdataingestion_spark.operators.layout import (
        compact_partitions,
    )

    path = str(tmp_path / "sink")
    df = spark.range(2000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 3).cast("string").alias("day"),
        (F.col("id") * 7 % 100).alias("value"),
    )
    # simulate many appends: 10 small files per partition per append
    for _ in range(2):
        df.repartition(10).write.partitionBy("day").mode("append").parquet(path)

    def files_in(day):
        d = os.path.join(path, f"day={day}")
        return [f for f in os.listdir(d) if f.endswith(".parquet")]

    assert len(files_in(0)) >= 10
    before = sorted(
        map(tuple, spark.read.parquet(path).collect()), key=repr
    )
    untouched_before = sorted(files_in(2))

    compact_partitions(spark, path, "day", target_files=2, partitions=["0", "1"])
    assert len(files_in(0)) <= 2 and len(files_in(1)) <= 2
    assert sorted(files_in(2)) == untouched_before
    after = sorted(map(tuple, spark.read.parquet(path).collect()), key=repr)
    assert after == before

    # idempotent: same data, still bounded
    compact_partitions(spark, path, "day", target_files=2, partitions=["0", "1"])
    assert len(files_in(0)) <= 2
    assert sorted(map(tuple, spark.read.parquet(path).collect()), key=repr) == before
