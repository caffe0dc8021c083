"""Hand-crafted-input invariants for the round-4 behavioral / retrieval /
graph operators (the DuckDB oracle checks fixture parity; these pin the
semantics on inputs built to hit the edges)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

D = datetime.datetime


def test_funnel_requires_strict_order(spark, sf_dir):
    """A user with purchase BEFORE click must not complete the funnel."""
    from sparkstreaming_rawdataingestion_spark.operators.behavior import (
        q_funnel_pattern_match,
    )

    out = {r.user_id for r in q_funnel_pattern_match(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # completion implies the user has all three event types
    typed = (
        ev.groupBy("user_id")
        .agg(F.collect_set("event_type").alias("t"))
        .collect()
    )
    for r in typed:
        if r.user_id in out:
            assert {"view", "click", "purchase"} <= set(r.t)


def test_funnel_greedy_on_crafted_sequence(spark):
    from sparkstreaming_rawdataingestion_spark.operators import behavior

    rows = [
        # u1 completes: view@1, click@2, purchase@3
        (1, 1, D(2024, 1, 1, 0, 0, 1), "view", 0.0, "{}"),
        (2, 1, D(2024, 1, 1, 0, 0, 2), "click", 0.0, "{}"),
        (3, 1, D(2024, 1, 1, 0, 0, 3), "purchase", 0.0, "{}"),
        # u2 out of order: purchase first
        (4, 2, D(2024, 1, 1, 0, 0, 1), "purchase", 0.0, "{}"),
        (5, 2, D(2024, 1, 1, 0, 0, 2), "view", 0.0, "{}"),
        (6, 2, D(2024, 1, 1, 0, 0, 3), "click", 0.0, "{}"),
        # u3 click ties view's timestamp → strict order fails
        (7, 3, D(2024, 1, 1, 0, 0, 1), "view", 0.0, "{}"),
        (8, 3, D(2024, 1, 1, 0, 0, 1), "click", 0.0, "{}"),
        (9, 3, D(2024, 1, 1, 0, 0, 2), "purchase", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp_ntz, "
        "event_type string, value double, props string",
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        ev.write.parquet(os.path.join(tmp, "events.parquet"))
        got = {
            r.user_id: r.funnel_sec
            for r in behavior.q_funnel_pattern_match(spark, tmp).collect()
        }
    assert got == {1: 2}


def test_lateness_audit_counts_out_of_order(spark):
    from sparkstreaming_rawdataingestion_spark.operators import behavior

    rows = [
        # arrival order (event_id) vs event time: third arrives 30s late
        (1, 1, D(2024, 1, 1, 0, 0, 0), "view", 0.0, "{}"),
        (2, 1, D(2024, 1, 1, 0, 1, 0), "view", 0.0, "{}"),
        (3, 1, D(2024, 1, 1, 0, 0, 30), "view", 0.0, "{}"),
        (4, 2, D(2024, 1, 1, 0, 0, 0), "view", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp_ntz, "
        "event_type string, value double, props string",
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        ev.write.parquet(os.path.join(tmp, "events.parquet"))
        got = {
            r.user_id: (r.n_late, r.max_lateness_sec)
            for r in behavior.q_event_lateness_audit(spark, tmp).collect()
        }
    assert got == {1: (1, 30), 2: (0, 0)}


def test_skyline_no_mutual_domination(spark, sf_dir):
    """No skyline row may dominate another skyline row of the same brand,
    and every non-skyline row must be dominated by some skyline row."""
    from sparkstreaming_rawdataingestion_spark.operators.misc import (
        q_skyline_pareto_brand,
    )

    sky = q_skyline_pareto_brand(spark, sf_dir).collect()
    by_brand: dict = {}
    for r in sky:
        by_brand.setdefault(r.p_brand, []).append((r.price, r.size))
    for pts in by_brand.values():
        for i, (pa, sa) in enumerate(pts):
            for j, (pb, sb) in enumerate(pts):
                if i != j:
                    assert not (
                        (pb < pa and sb >= sa) or (pb <= pa and sb > sa)
                    )


def test_triangle_count_known_graph(spark, tmp_path):
    """K4 minus one edge = 2 triangles, via a crafted co-supply table."""
    from sparkstreaming_rawdataingestion_spark.operators.graph import (
        q_graph_triangle_count,
    )

    # parts: suppliers sharing a part are linked. Build edges
    # 1-2,1-3,1-4,2-3,2-4 (K4 minus 3-4) as one part per edge.
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)]
    rows = []
    for pk, (a, b) in enumerate(edges):
        rows.append((pk, a, 50.0))
        rows.append((pk, b, 50.0))
    li = spark.createDataFrame(
        rows, "l_partkey long, l_suppkey long, l_quantity double"
    )
    li.write.parquet(str(tmp_path / "lineitem.parquet"))
    out = q_graph_triangle_count(spark, str(tmp_path)).collect()[0]
    assert out.n_triangles == 2
    assert out.n_edges == 5
    assert out.n_nodes == 4


def test_merge_apply_covers_all_actions(spark, sf_dir):
    from sparkstreaming_rawdataingestion_spark.operators.modern import (
        q_merge_upsert_apply,
    )

    out = q_merge_upsert_apply(spark, sf_dir)
    stat = {
        r.status: r.n
        for r in out.groupBy("status").agg(F.count("*").alias("n")).collect()
    }
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = {
        r.m: r.n
        for r in o.groupBy((F.col("o_orderkey") % 3).alias("m"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert stat["inserted"] == n[2]
    assert stat["updated"] == n[0]
    # kept = the %3==1 rows that were NOT deleted (even custkey)
    deleted = (
        o.where((F.col("o_orderkey") % 3 == 1) & (F.col("o_custkey") % 2 == 1))
        .count()
    )
    assert stat["kept"] == n[1] - deleted


def test_bm25_scores_monotone_in_tf(spark, sf_dir):
    """Top hit must contain at least one query term; scores descend."""
    from sparkstreaming_rawdataingestion_spark.operators.retrieval import (
        BM25_TERMS,
        q_bm25_keyword_search,
    )

    rows = q_bm25_keyword_search(spark, sf_dir).collect()
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    docs = dict(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    for r in rows:
        assert any(t in docs[r.doc_id].split() for t in BM25_TERMS)


def test_skyline_matches_bruteforce_on_random_data(spark, tmp_path):
    """Seeded random (price, size) clouds incl. duplicate points and
    price ties — window-based skyline == quadratic reference."""
    import random

    rng = random.Random(42)
    rows = []
    for pk in range(400):
        brand = f"B{rng.randrange(5)}"
        price = round(rng.uniform(1, 50), 2)
        size = rng.randrange(1, 20)
        rows.append((pk, f"part {pk}", brand, "t", size, price))
    # force exact duplicates and price ties
    rows.append((400, "dup a", "B0", "t", rows[0][4], rows[0][5]))
    rows.append((401, "tie", "B0", "t", rows[0][4] + 1, rows[0][5]))
    spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).write.parquet(str(tmp_path / "part.parquet"))

    from sparkstreaming_rawdataingestion_spark.operators.misc import (
        q_skyline_pareto_brand,
    )

    got = {
        (r.p_brand, r.p_partkey)
        for r in q_skyline_pareto_brand(spark, str(tmp_path)).collect()
    }
    want = set()
    for pk, _, brand, _, size, price in rows:
        dominated = any(
            b2 == brand
            and ((p2 < price and s2 >= size) or (p2 <= price and s2 > size))
            for _, _, b2, _, s2, p2 in rows
        )
        if not dominated:
            want.add((brand, pk))
    assert got == want


def test_merge_matches_reference_on_random_changeset(spark, tmp_path):
    """Seeded random orders → derived changeset; engine MERGE == dict
    reference."""
    import random

    rng = random.Random(7)
    rows = [
        (k, rng.randrange(1, 50), round(rng.uniform(10, 1000), 2))
        for k in range(1, 301)
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double"
    ).write.parquet(str(tmp_path / "orders.parquet"))

    from sparkstreaming_rawdataingestion_spark.operators.modern import (
        q_merge_upsert_apply,
    )

    got = {
        r.o_orderkey: (r.o_custkey, r.totalprice, r.status)
        for r in q_merge_upsert_apply(spark, str(tmp_path)).collect()
    }
    want = {}
    for k, c, p in rows:
        if k % 3 == 2:
            want[k] = (c, round(p + 10.0, 2), "inserted")
        elif k % 3 == 0:
            want[k] = (c, round(p + 10.0, 2), "updated")
        elif c % 2 == 0:  # %3==1, even custkey: kept
            want[k] = (c, round(p, 2), "kept")
        # %3==1 odd custkey: deleted
    assert got == want


def test_twap_equals_plain_mean_on_uniform_spacing(spark, tmp_path):
    """With evenly spaced samples the time-weighted mean of the
    non-terminal samples equals their arithmetic mean."""
    from sparkstreaming_rawdataingestion_spark.operators.behavior import (
        q_timeseries_twap,
    )

    rows = [
        (i, 1, D(2024, 1, 1, 0, 10 * i), "m", float(v), "{}")
        for i, v in enumerate([10.0, 20.0, 40.0, 90.0])
    ]
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp_ntz, "
        "event_type string, value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = q_timeseries_twap(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_intervals == 3
    assert r.covered_sec == 3 * 600
    assert abs(r.twap - (10.0 + 20.0 + 40.0) / 3) < 1e-6  # twap is 6dp


def test_interpolation_hits_samples_and_midpoints(spark, tmp_path):
    """A sample exactly on a grid line interpolates to itself; a grid
    point midway between two samples gets their midpoint value."""
    from sparkstreaming_rawdataingestion_spark.operators.behavior import (
        q_upsample_interpolate,
    )

    rows = [
        (1, 1, D(2024, 1, 1, 1, 0), "m", 10.0, "{}"),
        (2, 1, D(2024, 1, 1, 3, 0), "m", 30.0, "{}"),
        (3, 1, D(2024, 1, 1, 3, 30), "m", 50.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp_ntz, "
        "event_type string, value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r.grid_ts: r.value_interp
        for r in q_upsample_interpolate(spark, str(tmp_path)).collect()
    }
    assert got[D(2024, 1, 1, 1, 0)] == 10.0   # exact sample hit
    assert got[D(2024, 1, 1, 2, 0)] == 20.0   # midpoint of 10 → 30
    # 03:00 exact hit on the 30.0 sample
    assert got[D(2024, 1, 1, 3, 0)] == 30.0
    # grid stops at floor(hour(max)) = 03:00; nothing extrapolated
    assert max(got) == D(2024, 1, 1, 3, 0)


def test_attribution_window_and_tie_rules(spark):
    """Touch just inside the 7-day window attributes; outside → direct;
    same-timestamp competing touches pick the max-event_id one."""
    import os
    import tempfile

    from sparkstreaming_rawdataingestion_spark.operators import behavior

    rows = [
        # u1: click 2 days before purchase → attributed to click
        (1, 1, D(2024, 1, 10, 0, 0, 0), "click", 0.0, "{}"),
        (2, 1, D(2024, 1, 12, 0, 0, 0), "purchase", 0.0, "{}"),
        # u2: view 8 days before purchase → direct
        (3, 2, D(2024, 1, 1, 0, 0, 0), "view", 0.0, "{}"),
        (4, 2, D(2024, 1, 9, 0, 0, 1), "purchase", 0.0, "{}"),
        # u3: view and click at the SAME instant → higher event_id wins
        (5, 3, D(2024, 1, 10, 0, 0, 0), "view", 0.0, "{}"),
        (6, 3, D(2024, 1, 10, 0, 0, 0), "click", 0.0, "{}"),
        (7, 3, D(2024, 1, 10, 0, 0, 5), "purchase", 0.0, "{}"),
        # u4: no touch at all → direct
        (8, 4, D(2024, 1, 10, 0, 0, 0), "purchase", 0.0, "{}"),
        # u5: touch exactly AT the purchase timestamp → attributed
        (9, 5, D(2024, 1, 10, 0, 0, 0), "view", 0.0, "{}"),
        (10, 5, D(2024, 1, 10, 0, 0, 0), "purchase", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp_ntz, "
        "event_type string, value double, props string",
    )
    with tempfile.TemporaryDirectory() as tmp:
        ev.write.parquet(os.path.join(tmp, "events.parquet"))
        got = {
            r.user_id: (r.channel, r.touch_ts)
            for r in behavior.q_attribution_last_touch(spark, tmp).collect()
        }
    assert got[1] == ("click", D(2024, 1, 10))
    assert got[2] == ("direct", None)
    assert got[3][0] == "click"  # event_id 6 > 5 at the tied instant
    assert got[4] == ("direct", None)
    assert got[5] == ("view", D(2024, 1, 10))


def test_attribution_matches_python_reference_on_random_stream(spark):
    """Seeded random touch/purchase soup vs an independent pure-Python
    last-touch model (max (ts, event_id) touch at or before the
    purchase, 7-day window, direct fallback)."""
    import os
    import random
    import tempfile

    from sparkstreaming_rawdataingestion_spark.operators import behavior

    rng = random.Random(99)
    rows = []
    for eid in range(500):
        rows.append(
            (
                eid,
                rng.randrange(8),
                D(2024, 1, 1 + rng.randrange(25), rng.randrange(24),
                  rng.randrange(60), rng.randrange(60)),
                rng.choice(["view", "click", "purchase", "error"]),
                0.0,
                "{}",
            )
        )
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp_ntz, "
        "event_type string, value double, props string",
    )
    with tempfile.TemporaryDirectory() as tmp:
        ev.write.parquet(os.path.join(tmp, "events.parquet"))
        got = {
            r.event_id: (r.channel, r.touch_ts)
            for r in behavior.q_attribution_last_touch(spark, tmp).collect()
        }

    touches: dict = {}
    for eid, uid, ts, et, _v, _p in rows:
        if et in ("view", "click"):
            touches.setdefault(uid, []).append((ts, eid, et))
    expect: dict = {}
    window = behavior._ATTRIB_WINDOW_SEC
    for eid, uid, ts, et, _v, _p in rows:
        if et != "purchase":
            continue
        cand = [t for t in touches.get(uid, []) if t[0] <= ts]
        if not cand:
            expect[eid] = ("direct", None)
            continue
        tts, _teid, tet = max(cand)  # latest ts, max event_id on ties
        if (ts - tts).total_seconds() <= window:
            expect[eid] = (tet, tts)
        else:
            expect[eid] = ("direct", None)
    assert got == expect


def test_rrf_fusion_math_and_membership(spark, sf_dir):
    """RRF = 1/(60+lex_rk) + 1/(60+dense_rk) with absent-list ranks at
    -1 contributing zero; output sorted by fused score; the dense
    ranker's #1 is the query-by-example document itself (cosine 1)."""
    from sparkstreaming_rawdataingestion_spark.operators.retrieval import (
        RRF_QUERY_VEC,
        q_hybrid_rank_fusion,
    )

    rows = q_hybrid_rank_fusion(spark, sf_dir).collect()
    assert rows, "fusion returned no rows"
    for r in rows:
        expect = 0.0
        if r.lex_rk != -1:
            expect += 1.0 / (60 + r.lex_rk)
        if r.dense_rk != -1:
            expect += 1.0 / (60 + r.dense_rk)
        assert r.rrf == round(expect, 6)
        assert r.lex_rk != -1 or r.dense_rk != -1
    scores = [r.rrf for r in rows]
    assert scores == sorted(scores, reverse=True)
    dense_top = [r.doc_id for r in rows if r.dense_rk == 1]
    assert dense_top == [RRF_QUERY_VEC]
