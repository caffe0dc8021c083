"""Wedge-join skew escape hatch (round-5 verdict item 4): hub centers in
graph_common_neighbors enumerate at most WEDGE_NEIGHBOR_CAP neighbors —
d² fan-out per hub is bounded at scale — while the fixture graphs stay
far below the cap, so every oracle-checked result remains exact."""

from __future__ import annotations

import duckdb
import pytest

from sparkstreaming_rawdataingestion_spark.operators import graph


@pytest.mark.parametrize("sf", ["0.001", "0.01"])
def test_fixture_max_degree_far_below_cap(sf):
    """The cap is a no-op on every test scale (sf0.1 measured 106 at
    round 5); if a future fixture regeneration crosses ~cap/2 this
    trips BEFORE a silent oracle undercount would."""
    [(max_deg,)] = duckdb.sql(
        f"""
        WITH ps AS (
          SELECT DISTINCT l_partkey pk, l_suppkey s
          FROM '/root/testdata/sf{sf}/lineitem.parquet'
          WHERE l_quantity >= 48
        ),
        e AS (
          SELECT DISTINCT a.s u, b.s v
          FROM ps a JOIN ps b ON a.pk = b.pk AND a.s < b.s
        ),
        sym AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e)
        SELECT coalesce(max(cnt), 0)
        FROM (SELECT u, count(*) cnt FROM sym GROUP BY u)
        """
    ).fetchall()
    assert max_deg < graph.WEDGE_NEIGHBOR_CAP // 2


def _two_center_star(spark, tmp, n_leaves=40):
    """Co-supply graph shaped as a double star: hubs 0 and 100 each
    share one PRIVATE part with every leaf 1..n (a part supplied by
    exactly {hub, leaf} creates exactly that one edge — co-supplying a
    shared part would create a clique instead). Every leaf pair is then
    a non-adjacent distance-2 candidate with common = 2 (both hubs)."""
    import os

    rows = []
    for i in range(1, n_leaves + 1):
        rows += [(i, 0, 50.0), (i, i, 50.0)]                  # hub 0—leaf
        rows += [(1000 + i, 100, 50.0), (1000 + i, i, 50.0)]  # hub 100—leaf
    spark.createDataFrame(
        rows, "l_partkey long, l_suppkey long, l_quantity double"
    ).write.parquet(os.path.join(tmp, "lineitem.parquet"))


def test_cap_is_noop_below_threshold_and_bounds_hub_fanout(
    spark, monkeypatch, tmp_path
):
    """Uncapped (default cap ≫ degree 41): all C(40,2)=780 leaf pairs
    (common=2) plus the hub pair. Cap forced to 8: each hub enumerates
    only its 8 lowest-id neighbors, so surviving leaf pairs collapse to
    those inside BOTH capped neighbor lists — the d² hub fan-out is
    bounded by the enumeration itself, not by a post-filter."""
    tmp = str(tmp_path)
    _two_center_star(spark, tmp)

    full = graph.QUERIES["graph_common_neighbors"](spark, tmp).count()
    assert full == 780 + 1  # leaf pairs + the (0, 100) hub pair

    monkeypatch.setattr(graph, "WEDGE_NEIGHBOR_CAP", 8)
    capped = graph.QUERIES["graph_common_neighbors"](spark, tmp)
    rows = {(r.node_a, r.node_b): r.common for r in capped.collect()}
    # each hub's neighbors are exactly leaves 1..40 (the hubs are not
    # adjacent to each other), so both capped lists are leaves 1..8: a
    # leaf pair survives common>=2 only with both ends ≤ 8 — C(8,2)=28
    # of the original 780 — while (0,100) keeps common=40 because every
    # leaf center's 2-neighbor list is under the cap
    assert rows[(0, 100)] == 40
    leaf_pairs = {k for k in rows if k != (0, 100)}
    assert len(leaf_pairs) == 28
    assert all(1 <= a < b <= 8 for a, b in leaf_pairs)
