"""Semantic invariants for the recommender operators
(operators/recsys.py) on crafted baskets; fixture parity is the DuckDB
oracle's job."""

from __future__ import annotations

import math
import os
import tempfile


LI_SCHEMA = "l_orderkey long, l_partkey long, l_quantity double"


def _write_lineitem(spark, tmp, rows):
    spark.createDataFrame(rows, LI_SCHEMA).write.parquet(
        os.path.join(tmp, "lineitem.parquet")
    )


def test_item_neighbors_cosine_and_ranking(spark):
    from sparkstreaming_rawdataingestion_spark.operators import recsys

    # orders: 1:{A,B}, 2:{A,B}, 3:{A,C}; a duplicate A line in order 1
    # must not inflate counts (distinct items per basket)
    rows = [
        (1, 10, 1.0), (1, 10, 2.0), (1, 20, 1.0),
        (2, 10, 1.0), (2, 20, 1.0),
        (3, 10, 1.0), (3, 30, 1.0),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write_lineitem(spark, tmp, rows)
        out = recsys.q_recsys_item_neighbors(spark, tmp).collect()
    by_item = {}
    for r in out:
        by_item.setdefault(r.item_id, []).append(r)
    # A(10): neighbors B(20) then C(30); cos(A,B)=2/sqrt(3*2), cos(A,C)=1/sqrt(3)
    a = sorted(by_item[10], key=lambda r: r.rk)
    assert [r.neighbor_id for r in a] == [20, 30]
    assert a[0].n_pair == 2 and a[1].n_pair == 1
    assert a[0].cosine == round(2 / math.sqrt(6), 6)
    assert a[1].cosine == round(1 / math.sqrt(3), 6)
    # symmetry: B's top neighbor is A with the same cosine
    b = sorted(by_item[20], key=lambda r: r.rk)
    assert b[0].neighbor_id == 10 and b[0].cosine == a[0].cosine
    # C has exactly one neighbor
    assert [r.neighbor_id for r in by_item[30]] == [10]


def test_item_neighbors_topk_is_window_group_limit(spark, sf_dir):
    from sparkstreaming_rawdataingestion_spark.operators import recsys

    plan = recsys.q_recsys_item_neighbors(
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
