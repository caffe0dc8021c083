"""Semantic spot-checks for the relational pack (the exhaustive value
check is the DuckDB oracle gate — tools/check_oracles.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_rawdataingestion_spark import catalog
from sparkstreaming_rawdataingestion_spark.operators import asof, relational


def test_topk_per_group_bounded(spark, sf_dir):
    df = relational.q_window_topk_per_group(spark, sf_dir)
    per_group = df.groupBy("o_custkey").count()
    assert per_group.agg(F.max("count")).first()[0] <= 3


def test_rollup_includes_grand_total(spark, sf_dir):
    df = relational.q_agg_rollup(spark, sf_dir)
    li = catalog.load_table(spark, sf_dir, "lineitem")
    grand = df.where(
        F.col("l_returnflag").isNull() & F.col("l_linestatus").isNull()
    ).collect()
    assert len(grand) == 1
    assert grand[0]["n"] == li.count()


def test_semi_anti_partition_customers(spark, sf_dir):
    c = catalog.load_table(spark, sf_dir, "customer")
    with_orders = relational.q_join_semi(spark, sf_dir)  # totalprice>300k
    no_orders = relational.q_join_anti(spark, sf_dir)
    # anti + customers-with-any-order == all customers
    o = catalog.load_table(spark, sf_dir, "orders")
    any_order = c.join(o, c.c_custkey == o.o_custkey, "left_semi")
    assert no_orders.count() + any_order.count() == c.count()
    assert with_orders.count() <= any_order.count()


def test_asof_matches_are_latest_prior(spark, sf_dir):
    out = asof.q_asof_join(spark, sf_dir).collect()
    assert out, "expected at least one purchase with a prior click"
    for r in out:
        assert r["ts_right"] <= r["purchase_ts"]


def test_asof_left_keeps_unmatched(spark, sf_dir):
    ev = catalog.load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    left = asof.asof_join(
        purchases, clicks, on=["user_id"], left_ts="purchase_ts",
        right_ts="ts", right_cols=["value"], how="left",
    )
    assert left.count() == purchases.count()


def test_full_outer_keeps_both_unmatched_sides(spark, sf_dir):
    from sparkstreaming_rawdataingestion_spark.operators import relational

    rows = relational.QUERIES["join_full_outer_balance"](spark, sf_dir).collect()
    assert any(r.only_active for r in rows), "right-only rows must survive"
    assert any(r.only_high_balance for r in rows), "left-only rows must survive"
    assert all(
        (r.acctbal is None) == r.only_active
        and (r.n_orders_1996 is None) == r.only_high_balance
        for r in rows
    )


def test_nullsafe_join_matches_null_keys(spark, sf_dir):
    from sparkstreaming_rawdataingestion_spark.operators import relational

    rows = relational.QUERIES["join_nullsafe_keys"](spark, sf_dir).collect()
    null_rows = [r for r in rows if r.status_key is None]
    assert len(null_rows) == 1, "NULL key group must not be dropped"
    assert all(r.n_rows == r.group_size for r in rows)


def test_nearest_asof_prefers_closer_direction_and_bounds(spark):
    """Crafted streams: a purchase 10s after one click and 5s before
    another must match FORWARD; a purchase with only a stale click
    outside tolerance matches nothing; backward wins ties."""
    import datetime

    import sparkstreaming_rawdataingestion_spark.catalog as catalog
    from sparkstreaming_rawdataingestion_spark.operators import asof

    D = datetime.datetime
    rows = [
        # u1: click at t+0, purchase at t+10s, click at t+15s → forward (5s)
        (1, D(2024, 1, 1, 0, 0, 0), 1, "click", 0.0, "{}"),
        (2, D(2024, 1, 1, 0, 0, 10), 1, "purchase", 0.0, "{}"),
        (3, D(2024, 1, 1, 0, 0, 15), 1, "click", 0.0, "{}"),
        # u2: only a click 20 min before → outside 600s tolerance
        (4, D(2024, 1, 1, 0, 0, 0), 2, "click", 0.0, "{}"),
        (5, D(2024, 1, 1, 0, 20, 0), 2, "purchase", 0.0, "{}"),
        # u3: equidistant clicks 5s either side → backward tie-break
        (6, D(2024, 1, 1, 0, 0, 0), 3, "click", 0.0, "{}"),
        (7, D(2024, 1, 1, 0, 0, 5), 3, "purchase", 0.0, "{}"),
        (8, D(2024, 1, 1, 0, 0, 10), 3, "click", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    orig = catalog.load_table
    try:
        catalog.load_table = lambda sp, sf, t: ev
        asof.catalog.load_table = catalog.load_table
        out = {
            r.event_id: r
            for r in asof.q_asof_nearest_tolerance(spark, "x").collect()
        }
    finally:
        catalog.load_table = orig
        asof.catalog.load_table = orig
    assert out[2].nearest_click_id == 3 and out[2].gap_us == 5_000_000
    assert out[5].nearest_click_id is None and out[5].gap_us is None
    assert out[7].nearest_click_id == 6  # tie → backward
