"""Physical-plan assertions — would this plan survive 100×the data?

Each test pins a scale-critical property of a query's executed plan so a
regression that silently de-optimizes (drops a pushdown, breaks a
broadcast, adds a shuffle) fails here instead of on the cluster.
"""

from __future__ import annotations

from sparkstreaming_rawdataingestion_spark import plans
from sparkstreaming_rawdataingestion_spark.operators import relational


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = relational.q_filter_project_pushdown(spark, sf_dir)
    assert plans.has_pushed_filter(df, "l_discount"), "predicate not pushed"
    assert plans.has_pushed_filter(df, "l_returnflag")


def test_column_pruning(spark, sf_dir):
    df = relational.q_filter_project_pushdown(spark, sf_dir)
    cols = set(plans.read_schema_columns(df))
    # only the 4 projected + 3 filtered columns may be read — never the
    # full 11-column lineitem row
    assert cols <= {
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
        "l_shipdate", "l_discount",
    }, f"scan reads too much: {cols}"


def test_dim_join_broadcasts(spark, sf_dir):
    df = relational.q_join_broadcast_dims(spark, sf_dir)
    assert plans.has_broadcast_join(df), "dimension join must broadcast"


def test_global_topk_avoids_full_sort(spark, sf_dir):
    df = relational.q_topk_global(spark, sf_dir)
    plan = plans.executed_plan(df)
    assert "TakeOrderedAndProject" in plan, "LIMIT+ORDER BY must use top-k"


def test_single_agg_shuffle(spark, sf_dir):
    df = relational.q_agg_pricing_summary(spark, sf_dir)
    # one hash-partitioning exchange (partial → final agg), nothing more
    assert plans.count_exchanges(df) <= 1


def test_asof_join_single_shuffle(spark, sf_dir):
    """The union-merge as-of join must not expand into a range cross-join:
    its plan is bounded by shuffles for the two inputs' union + window."""
    from sparkstreaming_rawdataingestion_spark.operators import asof

    df = asof.q_asof_join(spark, sf_dir)
    plan = plans.executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
