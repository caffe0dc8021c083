"""Hand-crafted-input invariants for the trend/cohort operators
(operators/trends.py). Oracle parity runs via tools/check_oracles.py."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

import sparkstreaming_rawdataingestion_spark.catalog as catalog
from sparkstreaming_rawdataingestion_spark.operators import trends

D = datetime.datetime

_ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)
_CUST_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey int, "
    "c_acctbal double, c_mktsegment string"
)


def _with_tables(spark, tables, fn):
    orig = catalog.load_table
    try:
        catalog.load_table = lambda sp, sf, t: tables[t]
        trends.catalog.load_table = catalog.load_table
        return fn()
    finally:
        catalog.load_table = orig
        trends.catalog.load_table = orig


def test_period_over_period_gap_month_yields_null_mom(spark):
    """Jan and Mar present, Feb missing: Mar's MoM must be NULL (a lag
    window would wrongly compare Mar to Jan)."""
    orders = spark.createDataFrame(
        [
            (1, 1, "O", 100.0, D(2024, 1, 15), "1"),
            (2, 1, "O", 150.0, D(2024, 3, 15), "1"),
        ],
        _ORDERS_SCHEMA,
    )
    cust = spark.createDataFrame([(1, "c1", 1, 0.0, "SEG")], _CUST_SCHEMA)
    rows = _with_tables(
        spark,
        {"orders": orders, "customer": cust},
        lambda: q_sorted(trends.q_period_over_period(spark, "x")),
    )
    by_month = {str(r.month): r for r in rows}
    assert by_month["2024-01-01"].mom_pct is None
    assert by_month["2024-03-01"].mom_pct is None
    assert by_month["2024-03-01"].yoy_pct is None


def q_sorted(df):
    return df.collect()


def test_period_over_period_exact_growth(spark):
    orders = spark.createDataFrame(
        [
            (1, 1, "O", 100.0, D(2023, 5, 1), "1"),
            (2, 1, "O", 200.0, D(2024, 4, 1), "1"),
            (3, 1, "O", 300.0, D(2024, 5, 1), "1"),
        ],
        _ORDERS_SCHEMA,
    )
    cust = spark.createDataFrame([(1, "c1", 1, 0.0, "SEG")], _CUST_SCHEMA)
    rows = _with_tables(
        spark,
        {"orders": orders, "customer": cust},
        lambda: trends.q_period_over_period(spark, "x").collect(),
    )
    may24 = next(r for r in rows if str(r.month) == "2024-05-01")
    assert may24.mom_pct == 0.5      # 200 → 300
    assert may24.yoy_pct == 2.0      # 100 → 300


def test_topn_other_partitions_total(spark, sf_dir):
    """top-3 + OTHER must sum to total segment revenue (exact cents)."""
    out = trends.q_topn_plus_other(spark, sf_dir)
    seg_sum = out.groupBy("segment").agg(
        F.round(F.sum("revenue"), 2).alias("s")
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    total = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            (
                F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
                .cast("double")
                / 100.0
            ).alias("t")
        )
    )
    for r in seg_sum.join(total, "segment").collect():
        assert abs(r.s - r.t) < 1e-6
    per_seg = out.where(F.col("rnk") > 0).groupBy("segment").count().collect()
    assert all(r["count"] <= 3 for r in per_seg)


def test_interpurchase_single_order_customers_excluded(spark):
    orders = spark.createDataFrame(
        [
            (1, 1, "O", 10.0, D(2024, 1, 1), "1"),
            (2, 2, "O", 10.0, D(2024, 1, 1), "1"),
            (3, 2, "O", 10.0, D(2024, 1, 11), "1"),
            (4, 2, "O", 10.0, D(2024, 1, 31), "1"),
        ],
        _ORDERS_SCHEMA,
    )
    rows = _with_tables(
        spark,
        {"orders": orders},
        lambda: trends.q_interpurchase_intervals(spark, "x").collect(),
    )
    assert {r.o_custkey for r in rows} == {2}
    r = rows[0]
    assert r.n_orders == 3
    assert r.avg_gap_days == 15.0       # gaps 10, 20
    assert r.median_gap_days == 15.0
    assert r.max_gap_days == 20


def test_cohort_ltv_cumulative_and_sizes(spark):
    orders = spark.createDataFrame(
        [
            # cohort 2024-01: customers 1, 2
            (1, 1, "O", 100.0, D(2024, 1, 5), "1"),
            (2, 2, "O", 300.0, D(2024, 1, 20), "1"),
            (3, 1, "O", 100.0, D(2024, 2, 5), "1"),   # month_index 1
            # cohort 2024-02: customer 3
            (4, 3, "O", 50.0, D(2024, 2, 1), "1"),
        ],
        _ORDERS_SCHEMA,
    )
    rows = _with_tables(
        spark,
        {"orders": orders},
        lambda: trends.q_cohort_ltv_curve(spark, "x").collect(),
    )
    jan = {r.month_index: r for r in rows if str(r.cohort_month) == "2024-01-01"}
    assert jan[0].cohort_size == 2 and jan[0].n_active == 2
    assert jan[0].revenue == 400.0
    assert jan[0].cum_ltv_per_customer == 200.0
    assert jan[1].n_active == 1 and jan[1].revenue == 100.0
    assert jan[1].cum_ltv_per_customer == 250.0       # (400+100)/2
    feb = {r.month_index: r for r in rows if str(r.cohort_month) == "2024-02-01"}
    assert feb[0].cohort_size == 1 and feb[0].cum_ltv_per_customer == 50.0


def test_backlog_timeline_conserves_orders(spark, sf_dir):
    """Every order with line items opens once and closes once: the
    cumulative backlog is non-negative everywhere and returns to zero
    after the last close."""
    rows = sorted(
        trends.q_concurrent_intervals_timeline(spark, sf_dir).collect(),
        key=lambda r: r.month,
    )
    assert rows
    assert all(r.open_orders >= 0 for r in rows)
    assert rows[-1].open_orders == 0
    assert sum(r.net_change for r in rows) == 0
    # the peak backlog is positive (orders overlap in the fixture)
    assert max(r.open_orders for r in rows) > 0
