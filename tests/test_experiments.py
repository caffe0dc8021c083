"""Hand-crafted-input invariants for the experimentation / survival /
streak operators (operators/experiments.py)."""

from __future__ import annotations

import datetime
import math

import sparkstreaming_rawdataingestion_spark.catalog as catalog
from sparkstreaming_rawdataingestion_spark.operators import experiments

D = datetime.datetime

_EV_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def _with_events(spark, rows, fn):
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    orig = catalog.load_table
    try:
        catalog.load_table = lambda sp, sf, t: ev
        experiments.catalog.load_table = catalog.load_table
        return fn()
    finally:
        catalog.load_table = orig
        experiments.catalog.load_table = orig


def test_cuped_runs_on_fixture_and_is_near_neutral_when_uncorrelated(
    spark, sf_dir
):
    """Fixture pre/post sums are ~independent → θ ≈ 0 and the adjustment
    is near-neutral (ratio close to 1; CUPED only guarantees reduction
    when the covariate correlates)."""
    rows = experiments.q_ab_cuped_adjusted(spark, sf_dir).collect()
    assert {r.arm for r in rows} == {0, 1}
    for r in rows:
        assert 0.0 < r.var_ratio < 1.2
        assert r.n_users > 0


def test_cuped_reduces_variance_on_correlated_covariate(spark):
    """Per-user level shared by pre and post periods: the adjustment
    must strictly reduce per-arm variance (the case CUPED exists for)."""
    rows = []
    eid = 0
    for u in range(1, 41):
        level = float(u * 3 % 17)  # per-user baseline level
        for j in range(3):  # pre-period events
            eid += 1
            rows.append(
                (eid, D(2024, 1, 10 + j), u, "view", level + j * 0.1, "{}")
            )
        for j in range(3):  # post-period events carry the same level
            eid += 1
            rows.append(
                (
                    eid,
                    D(2024, 1, 20 + j),
                    u,
                    "view",
                    level + 1.0 + (u % 2) * 0.5 + j * 0.1,
                    "{}",
                )
            )
    out = _with_events(
        spark, rows,
        lambda: experiments.q_ab_cuped_adjusted(spark, "x").collect(),
    )
    assert {r.arm for r in out} == {0, 1}
    for r in out:
        assert r.var_ratio < 0.2  # strong covariate → big reduction


def test_km_survival_monotone_and_bounded(spark, sf_dir):
    rows = sorted(
        experiments.q_survival_km_curve(spark, sf_dir).collect(),
        key=lambda r: r.t_hours,
    )
    assert rows
    s = [r.survival for r in rows]
    assert all(0.0 <= x <= 1.0 for x in s)
    assert all(a >= b for a, b in zip(s, s[1:]))
    # risk sets shrink over time
    n = [r.n_risk for r in rows]
    assert all(a >= b for a, b in zip(n, n[1:]))


def test_km_hand_computed_small_case(spark):
    """3 users: conversions at hours 1 and 2, one censored at hour 5.
    S(1) = 2/3, S(2) = 2/3 * 1/2 = 1/3."""
    rows = [
        # user 1: first event t0, purchase 1h later
        (1, D(2024, 1, 1, 0, 0), 1, "view", 0.0, "{}"),
        (2, D(2024, 1, 1, 1, 0), 1, "purchase", 0.0, "{}"),
        # user 2: purchase 2h after start
        (3, D(2024, 1, 1, 0, 0), 2, "view", 0.0, "{}"),
        (4, D(2024, 1, 1, 2, 0), 2, "purchase", 0.0, "{}"),
        # user 3: never purchases, last seen 5h after start
        (5, D(2024, 1, 1, 0, 0), 3, "view", 0.0, "{}"),
        (6, D(2024, 1, 1, 5, 0), 3, "click", 0.0, "{}"),
    ]
    out = _with_events(
        spark, rows,
        lambda: sorted(
            experiments.q_survival_km_curve(spark, "x").collect(),
            key=lambda r: r.t_hours,
        ),
    )
    assert [(r.t_hours, r.n_risk, r.d) for r in out] == [(1, 3, 1), (2, 2, 1)]
    assert abs(out[0].survival - 2 / 3) < 1e-6
    assert abs(out[1].survival - 1 / 3) < 1e-6


def test_km_all_convert_hits_zero(spark):
    rows = [
        (1, D(2024, 1, 1, 0, 0), 1, "view", 0.0, "{}"),
        (2, D(2024, 1, 1, 1, 0), 1, "purchase", 0.0, "{}"),
        (3, D(2024, 1, 1, 0, 0), 2, "view", 0.0, "{}"),
        (4, D(2024, 1, 1, 1, 30), 2, "purchase", 0.0, "{}"),
    ]
    out = _with_events(
        spark, rows,
        lambda: experiments.q_survival_km_curve(spark, "x").collect(),
    )
    assert len(out) == 1  # both convert in hour bucket 1
    assert out[0].survival == 0.0


def test_streaks_islands_hand_case(spark):
    """User active Jan 1-3 and Jan 10 (streak 3, 2 islands); second user
    one day only."""
    rows = [
        (1, D(2024, 1, 1, 5), 1, "view", 0.0, "{}"),
        (2, D(2024, 1, 1, 9), 1, "click", 0.0, "{}"),   # same day dup
        (3, D(2024, 1, 2, 5), 1, "view", 0.0, "{}"),
        (4, D(2024, 1, 3, 5), 1, "view", 0.0, "{}"),
        (5, D(2024, 1, 10, 5), 1, "view", 0.0, "{}"),
        (6, D(2024, 1, 7, 5), 2, "view", 0.0, "{}"),
    ]
    out = _with_events(
        spark, rows,
        lambda: {
            r.user_id: r
            for r in experiments.q_gaps_islands_streaks(spark, "x").collect()
        },
    )
    assert out[1].n_active_days == 4
    assert out[1].longest_streak == 3
    assert out[1].n_islands == 2
    assert out[2].n_active_days == 1
    assert out[2].longest_streak == 1
    assert out[2].n_islands == 1


def test_welch_t_zero_when_arms_identical(spark):
    """Identical value multisets in both arms (arm = user_id % 2) must
    give t = 0 and equal means."""
    rows = [
        (1, D(2024, 1, 1), 2, "view", 1.0, "{}"),   # arm 0
        (2, D(2024, 1, 1), 4, "view", 2.0, "{}"),   # arm 0
        (3, D(2024, 1, 1), 1, "view", 1.0, "{}"),   # arm 1
        (4, D(2024, 1, 1), 3, "view", 2.0, "{}"),   # arm 1
    ]
    out = _with_events(
        spark, rows,
        lambda: experiments.q_welch_ttest_report(spark, "x").collect(),
    )[0]
    assert out.t_stat == 0.0
    assert out.mean0 == out.mean1 == 1.5
    assert (out.n0, out.n1) == (2, 2)


def test_chisq_zero_for_perfectly_balanced_table(spark):
    """Identical type distribution in both arms → χ² = 0; dof =
    (types−1)(arms−1)."""
    rows = []
    eid = 0
    for arm_user in (2, 3):  # arm 0 and arm 1
        for t in ("view", "click"):
            for _ in range(5):
                eid += 1
                rows.append(
                    (eid, D(2024, 1, 1, 0, eid), arm_user, t, 0.0, "{}")
                )
    out = _with_events(
        spark, rows,
        lambda: experiments.q_chisq_independence_test(spark, "x").collect(),
    )[0]
    assert out.chi2 == 0.0
    assert out.dof == 1
