"""Hand-crafted-input invariants for the segmentation / concentration /
changepoint operators (operators/segments.py). Oracle parity runs via
tools/check_oracles.py; these pin semantics on inputs built to hit edges."""

from __future__ import annotations

import datetime
import math

from pyspark.sql import functions as F

D = datetime.datetime


def test_rfm_quintiles_partition_customers(spark, sf_dir):
    from sparkstreaming_rawdataingestion_spark.operators.segments import (
        q_rfm_segmentation,
    )

    rows = q_rfm_segmentation(spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    for col in ("r_q", "f_q", "m_q"):
        vals = [getattr(r, col) for r in rows]
        assert set(vals) <= {1, 2, 3, 4, 5}
        # NTILE balance: bucket sizes differ by at most one
        sizes = [vals.count(b) for b in sorted(set(vals))]
        assert max(sizes) - min(sizes) <= 1
    assert {r.segment for r in rows} <= {
        "champion", "new", "at_risk", "hibernating", "core"
    }


def test_pareto_cum_share_monotone_and_complete(spark, sf_dir):
    from sparkstreaming_rawdataingestion_spark.operators.segments import (
        q_pareto_revenue_share,
    )

    rows = sorted(
        q_pareto_revenue_share(spark, sf_dir).collect(), key=lambda r: r.rnk
    )
    assert rows[-1].cum_share == 1.0
    shares = [r.cum_share for r in rows]
    assert all(a <= b for a, b in zip(shares, shares[1:]))
    revs = [r.revenue for r in rows]
    assert all(a >= b for a, b in zip(revs, revs[1:]))
    # the 80% prefix is a prefix: flags are monotone True→False
    flags = [r.in_top80 for r in rows]
    assert flags == sorted(flags, reverse=True)


def test_allocation_sums_back_to_header(spark, sf_dir):
    """Allocated line amounts must reconstruct each order's total up to
    the per-line rounding (≤ 0.5e-4 per line)."""
    from sparkstreaming_rawdataingestion_spark.operators.segments import (
        q_allocation_proportional,
    )

    alloc = (
        q_allocation_proportional(spark, sf_dir)
        .groupBy("l_orderkey")
        .agg(F.sum("allocated").alias("s"), F.count("*").alias("k"))
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    joined = alloc.join(
        o, alloc.l_orderkey == o.o_orderkey
    ).select("s", "k", "o_totalprice").collect()
    assert joined
    for r in joined:
        assert abs(r.s - r.o_totalprice) <= r.k * 5e-5 + 1e-9


def test_concentration_metrics_known_distribution(spark):
    """Two segments: one perfectly equal (gini 0, max entropy), one
    fully concentrated in a single customer (hhi 1)."""
    from sparkstreaming_rawdataingestion_spark.operators import segments

    orders = spark.createDataFrame(
        [
            # equal segment: 4 customers, 100 each
            *[(i, i, "O", 100.0, D(2024, 1, 1), "1-URGENT") for i in range(1, 5)],
            # concentrated: customer 10 only
            (10, 10, "O", 500.0, D(2024, 1, 1), "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    cust = spark.createDataFrame(
        [
            *[(i, f"c{i}", 1, 0.0, "EQ") for i in range(1, 5)],
            (10, "c10", 1, 0.0, "ONE"),
        ],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    import sparkstreaming_rawdataingestion_spark.catalog as catalog

    orig = catalog.load_table
    try:
        catalog.load_table = lambda sp, sf, t: {
            "orders": orders, "customer": cust
        }[t]
        segments.catalog.load_table = catalog.load_table
        out = {
            r.c_mktsegment: r
            for r in segments.q_concentration_metrics(spark, "ignored").collect()
        }
    finally:
        catalog.load_table = orig
        segments.catalog.load_table = orig

    eq = out["EQ"]
    assert eq.gini == 0.0
    assert abs(eq.entropy - math.log(4)) < 1e-6
    assert abs(eq.hhi - 0.25) < 1e-9
    one = out["ONE"]
    assert one.hhi == 1.0
    assert one.entropy == 0.0


def test_mad_flags_only_injected_outlier(spark):
    from sparkstreaming_rawdataingestion_spark.operators import segments
    import sparkstreaming_rawdataingestion_spark.catalog as catalog

    base = [
        (i, D(2024, 1, 1, 0, 0, i % 60), 1, "view", 10.0 + (i % 5) * 0.1, "{}")
        for i in range(1, 41)
    ]
    rows = base + [(99, D(2024, 1, 2), 1, "view", 1000.0, "{}")]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    orig = catalog.load_table
    try:
        catalog.load_table = lambda sp, sf, t: ev
        segments.catalog.load_table = catalog.load_table
        out = segments.q_mad_outlier_flags(spark, "ignored").collect()
    finally:
        catalog.load_table = orig
        segments.catalog.load_table = orig
    assert [r.event_id for r in out] == [99]
    assert out[0].robust_z > 3.5


def test_cusum_alarm_fires_after_level_shift(spark):
    """Flat series then a sustained upward shift: the alarm must fire at
    some point AFTER the shift, never before."""
    from sparkstreaming_rawdataingestion_spark.operators import segments
    import sparkstreaming_rawdataingestion_spark.catalog as catalog

    rows = []
    for i in range(1, 41):
        # first 30 points ~N(0) flat-ish, last 10 at +10
        v = (i % 3) * 0.01 if i <= 30 else 10.0
        rows.append(
            (i, D(2024, 1, 1, 0, i // 60, i % 60), 7, "view", v, "{}")
        )
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    orig = catalog.load_table
    try:
        catalog.load_table = lambda sp, sf, t: ev
        segments.catalog.load_table = catalog.load_table
        out = segments.q_cusum_changepoint(spark, "ignored").collect()
    finally:
        catalog.load_table = orig
        segments.catalog.load_table = orig
    assert len(out) == 1
    r = out[0]
    assert r.n_alarm_points > 0
    assert r.first_alarm_event_id > 30
    assert r.max_cusum > 0


def test_cusum_constant_series_never_alarms(spark):
    from sparkstreaming_rawdataingestion_spark.operators import segments
    import sparkstreaming_rawdataingestion_spark.catalog as catalog

    ev = spark.createDataFrame(
        [
            (i, D(2024, 1, 1, 0, 0, i), 1, "view", 5.0, "{}")
            for i in range(1, 21)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    orig = catalog.load_table
    try:
        catalog.load_table = lambda sp, sf, t: ev
        segments.catalog.load_table = catalog.load_table
        out = segments.q_cusum_changepoint(spark, "ignored").collect()
    finally:
        catalog.load_table = orig
        segments.catalog.load_table = orig
    assert out[0].n_alarm_points == 0
    assert out[0].first_alarm_event_id is None
    assert out[0].max_cusum == 0.0
