"""Property-based checks (hypothesis) for the round-6 formula
operators — mathematical guarantees that hold for ALL inputs, checked
against independent pure-Python models (the defense the Wilson
transcription bug showed we need: the oracle shares the formula, a
property does not)."""

from __future__ import annotations

import datetime
import math

from hypothesis import HealthCheck, given, settings, strategies as st

D = datetime.datetime

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# wilson_cols — interval guarantees for all (s, n)
# ---------------------------------------------------------------------------


@settings(**_SETTINGS)
@given(
    cases=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10_000_000),
            st.floats(min_value=0.0, max_value=1.0),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_wilson_interval_guarantees(spark, cases):
    """For every (n, s): 0 ≤ lo ≤ p̂ ≤ hi ≤ 1, lo = 0 iff s = 0 was the
    only mass below, hi = 1 at s = n — the defining properties of the
    Wilson score interval, independent of any formula transcription."""
    from sparkstreaming_rawdataingestion_spark.operators.evaluation import (
        wilson_cols,
    )

    rows = [
        (i, n, min(n, int(round(frac * n))))
        for i, (n, frac) in enumerate(cases)
    ]
    df = spark.createDataFrame(
        rows, "i long, n_trials long, n_success long"
    ).select("i", "n_trials", "n_success", *wilson_cols())
    for r in df.collect():
        assert 0.0 <= r.wilson_lo <= r.p_hat + 1e-9
        assert r.p_hat - 1e-9 <= r.wilson_hi <= 1.0
        if r.n_success == 0:
            assert r.wilson_lo == 0.0
        if r.n_success == r.n_trials:
            assert r.wilson_hi == 1.0


def test_wilson_lower_bound_monotone_in_successes(spark):
    """For fixed n, the lower bound is nondecreasing in s — the property
    ranking-by-lower-bound relies on."""
    from sparkstreaming_rawdataingestion_spark.operators.evaluation import (
        wilson_cols,
    )

    n = 40
    df = spark.createDataFrame(
        [(s, n, s) for s in range(n + 1)],
        "i long, n_trials long, n_success long",
    ).select("i", *wilson_cols())
    los = [r.wilson_lo for r in df.orderBy("i").collect()]
    assert all(a <= b + 1e-12 for a, b in zip(los, los[1:]))


# ---------------------------------------------------------------------------
# ndcg_ranking_quality — vs an independent definitional model
# ---------------------------------------------------------------------------


def _py_ndcg(items):
    """NDCG@10 from the definition (sort, discount, ideal) — floats and
    libm log2, deliberately NOT the engine's decimal-literal path."""
    ranked = sorted(items, key=lambda t: (-t[0], t[2]))[:10]
    dcg = sum(y / math.log2(i + 2) for i, (_, y, _e) in enumerate(ranked))
    npos = sum(y for _, y, _e in items)
    idcg = sum(1 / math.log2(i + 2) for i in range(min(npos, 10)))
    return round(dcg / idcg, 6) if npos else None


@settings(**_SETTINGS)
@given(
    users=st.lists(
        st.lists(
            st.tuples(
                st.floats(
                    min_value=-1e6,
                    max_value=1e6,
                    allow_nan=False,
                    allow_infinity=False,
                ),
                st.booleans(),
            ),
            min_size=1,
            max_size=25,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_ndcg_matches_definitional_model(spark, users):
    from sparkstreaming_rawdataingestion_spark.operators import evaluation

    rows, eid = [], 0
    per_user = []
    for u, items in enumerate(users):
        tagged = []
        for value, pos in items:
            eid += 1
            rows.append(
                (
                    eid,
                    u,
                    D(2024, 1, 1),
                    "purchase" if pos else "view",
                    value,
                    "{}",
                )
            )
            tagged.append((value, 1 if pos else 0, eid))
        per_user.append(tagged)

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows,
            "event_id long, user_id long, ts timestamp_ntz, "
            "event_type string, value double, props string",
        ).write.parquet(tmp + "/events.parquet")
        got = evaluation.q_ndcg_ranking_quality(spark, tmp).collect()[0]

    ndcgs = [n for n in (_py_ndcg(t) for t in per_user) if n is not None]
    if not ndcgs:
        assert got.n_users == 0 and got.mean_ndcg is None
        return
    assert got.n_users == len(ndcgs)
    assert abs(got.mean_ndcg - sum(ndcgs) / len(ndcgs)) < 1e-5
    assert got.n_perfect == sum(1 for n in ndcgs if n == 1.0)


# ---------------------------------------------------------------------------
# user_burstiness_profile — bounds and scale invariance
# ---------------------------------------------------------------------------


@settings(**_SETTINGS)
@given(
    gaps=st.lists(
        st.integers(min_value=1, max_value=10_000_000), min_size=2, max_size=20
    ),
    scale=st.integers(min_value=2, max_value=10),
)
def test_burstiness_bounds_and_scale_invariance(spark, gaps, scale):
    """B ∈ [−1, 1) for positive gaps, equals −1 iff all gaps are equal,
    and is invariant under rescaling every gap by a constant (σ and μ
    scale together) — checked by running the original and the rescaled
    user through the kernel side by side."""
    from sparkstreaming_rawdataingestion_spark.operators import behavior

    def events_for(uid, gs, base_eid):
        ts, rows = D(2024, 1, 1), [
            (base_eid, uid, D(2024, 1, 1), "m", 0.0, "{}")
        ]
        for j, g in enumerate(gs):
            ts = ts + datetime.timedelta(milliseconds=g)
            rows.append((base_eid + j + 1, uid, ts, "m", 0.0, "{}"))
        return rows

    rows = events_for(1, gaps, 0) + events_for(
        2, [g * scale for g in gaps], 1000
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows,
            "event_id long, user_id long, ts timestamp_ntz, "
            "event_type string, value double, props string",
        ).write.parquet(tmp + "/events.parquet")
        out = behavior.q_user_burstiness_profile(spark, tmp).collect()

    # both users land in the same bucket with the same (rounded) B
    total_users = sum(r.n_users for r in out)
    assert total_users == 2
    assert len(out) == 1, f"scale invariance broken: {out}"
    b = out[0].mean_burstiness
    assert -1.0 <= b < 1.0
    if len(set(gaps)) == 1:
        assert b == -1.0
    else:
        assert b > -1.0


# ---------------------------------------------------------------------------
# bootstrap weights — the deterministic hash really is Poisson(1)-ish
# ---------------------------------------------------------------------------


def test_bootstrap_weights_match_poisson_marginals(spark):
    """Over 2000 units × 200 replicas, the weight histogram must sit on
    the Poisson(1) pmf (±1.5% absolute per class) and the mean weight on
    1 (±1%) — the resampling-validity condition of the scheme."""
    from pyspark.sql import functions as F

    from sparkstreaming_rawdataingestion_spark.operators.experiments import (
        BOOT_B,
        boot_weighted_replicas,
    )

    u = spark.range(1, 2001).select(
        F.col("id").alias("event_id"), F.lit(1.0).alias("value")
    )
    w = boot_weighted_replicas(u)
    n = 2000 * BOOT_B
    hist = {r.w: r.c for r in w.groupBy("w").agg(F.count("*").alias("c")).collect()}
    assert sum(hist.values()) == n
    pmf = [math.exp(-1) / math.factorial(k) for k in range(5)]
    for k in range(5):
        assert abs(hist.get(k, 0) / n - pmf[k]) < 0.015, (k, hist)
    mean_w = sum(k * c for k, c in hist.items()) / n
    assert abs(mean_w - 1.0) < 0.01
