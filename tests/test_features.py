"""Hand-computed invariants for the feature-engineering operators
(operators/features.py) and the path-trigram report (behavior.py)."""

from __future__ import annotations

import datetime
import math
import os
import tempfile

from sparkstreaming_rawdataingestion_spark.operators import behavior, features

D = datetime.datetime

EV_SCHEMA = (
    "event_id long, user_id long, ts timestamp_ntz, "
    "event_type string, value double, props string"
)


def _with_events(spark, rows, fn):
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(rows, EV_SCHEMA).write.parquet(
            os.path.join(tmp, "events.parquet")
        )
        return fn(tmp)


def test_lag_features_hand_computed(spark):
    xs = [10.0, 20.0, 30.0, 100.0]
    rows = [
        (i + 1, 1, D(2024, 1, 1, 0, i), "a", x, "{}")
        for i, x in enumerate(xs)
    ]
    got = _with_events(
        spark,
        rows,
        lambda tmp: {
            r.event_id: r
            for r in features.q_ml_lag_features(spark, tmp).collect()
        },
    )
    r1, r2, r4 = got[1], got[2], got[4]
    assert (r1.lag1, r1.lag2, r1.delta_sec) == (None, None, None)
    assert r1.roll_n == 1 and r1.roll_mean == 10.0 and r1.roll_std is None
    assert (r2.lag1, r2.delta_sec) == (10.0, 60)
    assert r2.roll_mean == 15.0
    # sample std of [10, 20]
    assert abs(r2.roll_std - math.sqrt(50.0)) < 1e-6
    assert (r4.lag1, r4.lag2) == (30.0, 20.0)
    assert r4.roll_n == 4 and r4.roll_mean == 40.0
    xs_m = sum(xs) / 4
    var = sum((x - xs_m) ** 2 for x in xs) / 3
    assert abs(r4.roll_std - math.sqrt(var)) < 1e-6


def test_target_encoding_is_leave_one_out(spark):
    rows = [
        (1, 1, D(2024, 1, 1), "a", 10.0, "{}"),
        (2, 1, D(2024, 1, 2), "a", 20.0, "{}"),
        (3, 1, D(2024, 1, 3), "a", 30.0, "{}"),
        (4, 1, D(2024, 1, 4), "b", 100.0, "{}"),  # singleton category
    ]
    got = _with_events(
        spark,
        rows,
        lambda tmp: {
            r.event_id: r.te
            for r in features.q_target_encode_loo(spark, tmp).collect()
        },
    )
    m = features._TE_SMOOTH
    prior = 160.0 / 4
    # row 1: other 'a' rows sum 50, n_cat-1 = 2
    assert got[1] == round((50.0 + prior * m) / (2 + m), 6)
    # rows of the same category with different targets encode differently
    assert got[1] != got[3]
    # singleton category: LOO leaves nothing → pure smoothed prior
    assert got[4] == round((0.0 + prior * m) / (0 + m), 6) == round(prior, 6)


def test_rank_normalize_bounds_and_ties(spark):
    rows = [
        (1, 1, D(2024, 1, 1), "a", 5.0, "{}"),
        (2, 1, D(2024, 1, 2), "a", 5.0, "{}"),   # tie
        (3, 1, D(2024, 1, 3), "a", 9.0, "{}"),
        (4, 1, D(2024, 1, 4), "a", 1.0, "{}"),
    ]
    got = _with_events(
        spark,
        rows,
        lambda tmp: {
            r.event_id: r.pr
            for r in features.q_rank_normalize(spark, tmp).collect()
        },
    )
    assert got[4] == 0.0 and got[3] == 1.0
    assert got[1] == got[2] == round(1 / 3, 6)  # ties share percent_rank


def test_path_trigrams_on_crafted_chain(spark):
    rows = [
        (i, 1, D(2024, 1, 1, 0, i), t, 0.0, "{}")
        for i, t in enumerate(["a", "b", "c", "a", "b"])
    ] + [(99, 2, D(2024, 1, 1), "z", 0.0, "{}")]  # too short — no trigram
    got = _with_events(
        spark,
        rows,
        lambda tmp: {
            r.path: r.n
            for r in behavior.q_event_path_trigrams(spark, tmp).collect()
        },
    )
    assert got == {"a>b>c": 1, "b>c>a": 1, "c>a>b": 1}
