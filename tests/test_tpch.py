"""TPC-H analog pack — semantic spot checks + scale-critical plan pins.

Value correctness is covered by the DuckDB oracles (tools/check_oracles.py
/ the driver gate); these tests pin the *physical* properties that keep
the pack viable at 100 TB and a few semantics the oracles can't see.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_rawdataingestion_spark import plans
from sparkstreaming_rawdataingestion_spark.operators import tpch


def test_q3_topk_avoids_full_sort(spark, sf_dir):
    df = tpch.q3_shipping_priority(spark, sf_dir)
    assert "TakeOrderedAndProject" in plans.executed_plan(df)


def test_q6_predicates_push_to_scan(spark, sf_dir):
    df = tpch.q6_forecast_revenue(spark, sf_dir)
    for c in ("l_shipdate", "l_discount", "l_quantity"):
        assert plans.has_pushed_filter(df, c), f"{c} not pushed"
    # only the 4 referenced columns may be read from the 11-column table
    assert set(plans.read_schema_columns(df)) <= {
        "l_shipdate", "l_discount", "l_quantity", "l_extendedprice",
    }


def test_q4_exists_becomes_semi_join(spark, sf_dir):
    plan = plans.executed_plan(tpch.q4_order_priority(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_q21_decorrelates_without_cartesian(spark, sf_dir):
    plan = plans.executed_plan(tpch.q21_waiting_supplier(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q18_semi_join_broadcasts(spark, sf_dir):
    plan = plans.executed_plan(tpch.q18_large_orders(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_q15_keeps_ties(spark, sf_dir):
    """Max-equality must return every supplier at the max, not top-1."""
    df = tpch.q15_top_supplier(spark, sf_dir)
    rows = df.collect()
    assert len(rows) >= 1
    assert len({r.total_revenue for r in rows}) == 1


def test_q13_keeps_zero_order_customers(spark, sf_dir):
    """The left join must preserve customers with no qualifying orders."""
    from sparkstreaming_rawdataingestion_spark import catalog

    hist = {r.c_count: r.custdist
            for r in tpch.q13_customer_distribution(spark, sf_dir).collect()}
    n_cust = catalog.load_table(spark, sf_dir, "customer").count()
    assert sum(hist.values()) == n_cust  # every customer lands in a bucket


def test_q8_share_bounded(spark, sf_dir):
    for r in tpch.q8_market_share(spark, sf_dir).collect():
        assert 0.0 <= r.mkt_share <= 1.0


def test_pack_registered_with_oracles():
    assert set(tpch.ORACLES) == set(tpch.QUERIES)  # every query oracle-checked
    assert len(tpch.QUERIES) == 19


def test_q11_stages_aggregate_single_fact_scan(spark, sf_dir):
    """The staged per-part aggregate must feed both the detail rows and
    the scalar total — one lineitem scan, semi-join pushdown, no
    cartesian product (the 1-row scalar broadcast is the only BNLJ)."""
    df = tpch.q11_part_value_concentration(spark, sf_dir)
    plan = plans.executed_plan(df)
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    # both consumers (detail rows + scalar total) read the staged cache;
    # the parquet scan only appears inside the cached relation's lineage
    assert plan.count("InMemoryTableScan") >= 2
    assert df.count() > 0
