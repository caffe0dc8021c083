"""Low-level pack invariants beyond the value oracles."""

from __future__ import annotations

from sparkstreaming_rawdataingestion_spark import plans
from sparkstreaming_rawdataingestion_spark.operators import lowlevel


def test_lateral_decorrelates_to_window_group_limit(spark, sf_dir):
    """The LATERAL per-group top-k must decorrelate into a ranked window
    with group-limit pushdown — not a per-outer-row re-execution or a
    nested-loop join."""
    plan = plans.executed_plan(lowlevel.q_lateral_topk_per_group(spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_try_ops_quarantine_not_fail(spark, sf_dir):
    """Under ANSI mode the try_ pack must yield NULLs, not exceptions."""
    rows = lowlevel.q_try_safe_arith_pack(spark, sf_dir).collect()
    assert any(r.safe_div is None for r in rows)       # divide-by-zero rows
    assert all(r.bad_cast is None for r in rows)       # event_type never int
    assert any(r.overflow_add is None for r in rows)   # MAX+1 overflows
    assert any(r.overflow_add is not None for r in rows)


def test_bitwise_shift_roundtrip(spark, sf_dir):
    from pyspark.sql import functions as F

    df = lowlevel.q_bitwise_pack(spark, sf_dir)
    bad = df.where(
        F.expr("shiftright(shl, 3) <> event_id % 1024")
        | F.expr("(band & ~event_id) <> 0")
    )
    assert bad.count() == 0
