"""Closed-form fixture tests for the round-6 queue operators
(bootstrap CI, NDCG@10, Wilson bounds, Cohen kappa, burstiness) — the
DuckDB oracles pin engine parity; these pin the SEMANTICS on inputs
whose correct answers are computed by hand."""

from __future__ import annotations

import datetime
import math

D = datetime.datetime

_EV_SCHEMA = (
    "event_id long, user_id long, ts timestamp_ntz, "
    "event_type string, value double, props string"
)

_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(rows, _EV_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


# ---------------------------------------------------------------------------
# ndcg_ranking_quality
# ---------------------------------------------------------------------------


def test_ndcg_perfect_and_worst_rank(spark, tmp_path):
    """u1 ranks its purchase first (NDCG=1, perfect); u2 ranks its
    purchase third of three (NDCG = 1/log2(4) = 0.5); u3 has no
    positives and is excluded."""
    from sparkstreaming_rawdataingestion_spark.operators.evaluation import (
        q_ndcg_ranking_quality,
    )

    rows = [
        # u1: purchase has the highest score
        (1, 1, D(2024, 1, 1, 0, 0, 1), "purchase", 9.0, "{}"),
        (2, 1, D(2024, 1, 1, 0, 0, 2), "view", 5.0, "{}"),
        (3, 1, D(2024, 1, 1, 0, 0, 3), "click", 1.0, "{}"),
        # u2: purchase has the lowest score of three
        (4, 2, D(2024, 1, 1, 0, 0, 4), "view", 9.0, "{}"),
        (5, 2, D(2024, 1, 1, 0, 0, 5), "click", 5.0, "{}"),
        (6, 2, D(2024, 1, 1, 0, 0, 6), "purchase", 1.0, "{}"),
        # u3: no positive → excluded from the report
        (7, 3, D(2024, 1, 1, 0, 0, 7), "view", 9.0, "{}"),
    ]
    r = q_ndcg_ranking_quality(
        spark, _write_events(spark, tmp_path, rows)
    ).collect()[0]
    assert r.n_users == 2
    assert r.n_perfect == 1
    assert abs(r.mean_ndcg - (1.0 + 0.5) / 2) < 1e-9


def test_ndcg_ties_break_on_event_id(spark, tmp_path):
    """Two events with identical scores: the lower event_id ranks first,
    so a purchase at the smaller id under a tie is rank 1 → NDCG 1."""
    from sparkstreaming_rawdataingestion_spark.operators.evaluation import (
        q_ndcg_ranking_quality,
    )

    rows = [
        (1, 1, D(2024, 1, 1), "purchase", 5.0, "{}"),
        (2, 1, D(2024, 1, 1), "view", 5.0, "{}"),
    ]
    r = q_ndcg_ranking_quality(
        spark, _write_events(spark, tmp_path, rows)
    ).collect()[0]
    assert r.n_perfect == 1 and r.mean_ndcg == 1.0


# ---------------------------------------------------------------------------
# ctr_wilson_bounds
# ---------------------------------------------------------------------------


def _wilson(s: int, n: int):
    z, z2 = 1.96, 3.8416
    phat = s / n
    center = phat + z2 / (2 * n)
    margin = z * math.sqrt((phat * (1 - phat) + z2 / (4 * float(n))) / n)
    denom = 1 + z2 / n
    return (center - margin) / denom, (center + margin) / denom


def test_wilson_bounds_match_closed_form_and_order(spark, tmp_path):
    """Day 1: 1 purchase / 5 trials → bounds equal the hand formula;
    day 2: 0 purchases → the lower bound is exactly 0 and the upper is
    positive. Views never count as trials."""
    from sparkstreaming_rawdataingestion_spark.operators.evaluation import (
        q_ctr_wilson_bounds,
    )

    rows = [
        (1, 1, D(2024, 1, 1, 1), "purchase", 0.0, "{}"),
        (2, 1, D(2024, 1, 1, 2), "click", 0.0, "{}"),
        (3, 1, D(2024, 1, 1, 3), "click", 0.0, "{}"),
        (4, 2, D(2024, 1, 1, 4), "click", 0.0, "{}"),
        (5, 2, D(2024, 1, 1, 5), "click", 0.0, "{}"),
        (6, 2, D(2024, 1, 1, 6), "view", 0.0, "{}"),  # not a trial
        (7, 3, D(2024, 1, 2, 1), "click", 0.0, "{}"),
        (8, 3, D(2024, 1, 2, 2), "click", 0.0, "{}"),
    ]
    got = {
        str(r.day): r
        for r in q_ctr_wilson_bounds(
            spark, _write_events(spark, tmp_path, rows)
        ).collect()
    }
    d1 = got["2024-01-01"]
    assert (d1.n_trials, d1.n_success) == (5, 1)
    lo, hi = _wilson(1, 5)
    assert abs(d1.wilson_lo - round(lo, 6)) < 1e-9
    assert abs(d1.wilson_hi - round(hi, 6)) < 1e-9
    assert 0 < d1.wilson_lo < d1.p_hat < d1.wilson_hi < 1
    d2 = got["2024-01-02"]
    assert (d2.n_trials, d2.n_success) == (2, 0)
    assert d2.wilson_lo == 0.0 and d2.wilson_hi > 0.0


# ---------------------------------------------------------------------------
# label_agreement_kappa
# ---------------------------------------------------------------------------


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, _DOC_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_kappa_perfect_agreement_is_one(spark, tmp_path):
    from sparkstreaming_rawdataingestion_spark.operators.evaluation import (
        q_label_agreement_kappa,
    )

    rows = [
        (1, "the a of cat", "en", "web", 12),
        (2, "the and is dog", "en", "web", 14),
        (3, "der die das haus", "de", "web", 16),
        (4, "der und ist hund", "de", "web", 16),
    ]
    r = q_label_agreement_kappa(
        spark, _write_docs(spark, tmp_path, rows)
    ).collect()[0]
    assert r.n_docs == 4
    assert r.observed_agreement == 1.0
    assert abs(r.expected_agreement - 0.5) < 1e-9
    assert r.kappa == 1.0


def test_kappa_hand_computed_confusion(spark, tmp_path):
    """Truth marginals (en2, de1, es1), prediction marginals (en3, de1,
    es0): po = 3/4, pe = 7/16 → kappa = 5/9."""
    from sparkstreaming_rawdataingestion_spark.operators.evaluation import (
        q_label_agreement_kappa,
    )

    rows = [
        (1, "the a of cat", "en", "web", 12),
        (2, "the and is dog", "en", "web", 14),
        (3, "der die das haus", "de", "web", 16),
        # labeled es but written with en markers → predicted en
        (4, "the a of perro", "es", "web", 14),
    ]
    r = q_label_agreement_kappa(
        spark, _write_docs(spark, tmp_path, rows)
    ).collect()[0]
    assert r.n_docs == 4
    assert abs(r.observed_agreement - 0.75) < 1e-9
    assert abs(r.expected_agreement - 7 / 16) < 1e-9
    assert abs(r.kappa - round(5 / 9, 6)) < 1e-9


# ---------------------------------------------------------------------------
# user_burstiness_profile
# ---------------------------------------------------------------------------


def test_burstiness_metronome_is_minus_one(spark, tmp_path):
    """Perfectly regular cadence → σ = 0 → B = −1 (bucket −10); a user
    with a single gap is excluded (needs ≥ 2 gaps); all-simultaneous
    events → μ = σ = 0 → B undefined (NULL bucket)."""
    from sparkstreaming_rawdataingestion_spark.operators.behavior import (
        q_user_burstiness_profile,
    )

    rows = (
        # u1: 5 events exactly 60 s apart → 4 equal gaps
        [(i, 1, D(2024, 1, 1, 0, i, 0), "m", 0.0, "{}") for i in range(5)]
        # u2: only 2 events (1 gap) → excluded
        + [
            (10, 2, D(2024, 1, 1, 0, 0, 0), "m", 0.0, "{}"),
            (11, 2, D(2024, 1, 1, 0, 1, 0), "m", 0.0, "{}"),
        ]
        # u3: 3 events at the SAME instant → gaps 0,0 → B undefined
        + [(20 + i, 3, D(2024, 1, 1, 12, 0, 0), "m", 0.0, "{}") for i in range(3)]
    )
    got = {
        r.bucket: r
        for r in q_user_burstiness_profile(
            spark, _write_events(spark, tmp_path, rows)
        ).collect()
    }
    assert set(got) == {-10, None}
    assert got[-10].n_users == 1 and got[-10].mean_burstiness == -1.0
    assert got[-10].n_gaps == 4
    assert got[None].n_users == 1


def test_burstiness_matches_hand_formula(spark, tmp_path):
    """Gaps of 10 s and 50 s: μ = 30 000 ms, σ = 20 000 ms →
    B = (20−30)/(20+30) = −0.2 → bucket −2."""
    from sparkstreaming_rawdataingestion_spark.operators.behavior import (
        q_user_burstiness_profile,
    )

    rows = [
        (1, 1, D(2024, 1, 1, 0, 0, 0), "m", 0.0, "{}"),
        (2, 1, D(2024, 1, 1, 0, 0, 10), "m", 0.0, "{}"),
        (3, 1, D(2024, 1, 1, 0, 1, 0), "m", 0.0, "{}"),
    ]
    out = q_user_burstiness_profile(
        spark, _write_events(spark, tmp_path, rows)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.bucket == -2 and abs(r.mean_burstiness + 0.2) < 1e-9


# ---------------------------------------------------------------------------
# bootstrap_mean_ci
# ---------------------------------------------------------------------------


def test_bootstrap_constant_value_degenerates_to_point(spark, tmp_path):
    """Every unit worth exactly 5.0 → every replica mean is 5.0, so the
    95% CI collapses onto the point estimate."""
    from sparkstreaming_rawdataingestion_spark.operators.experiments import (
        BOOT_B,
        q_bootstrap_mean_ci,
    )

    rows = [
        (i, 1, D(2024, 1, 1, 0, 0, i % 60), "m", 5.0, "{}")
        for i in range(100)
    ]
    r = q_bootstrap_mean_ci(
        spark, _write_events(spark, tmp_path, rows)
    ).collect()[0]
    assert r.n_replicas == BOOT_B
    assert r.boot_mean == 5.0
    assert r.ci_lo == 5.0 and r.ci_hi == 5.0


def test_bootstrap_ci_brackets_mean_on_real_data(spark, sf_dir):
    """On the sf0.001 corpus the CI must bracket the plain mean and have
    positive width."""
    from pyspark.sql import functions as F

    from sparkstreaming_rawdataingestion_spark import catalog
    from sparkstreaming_rawdataingestion_spark.operators.experiments import (
        q_bootstrap_mean_ci,
    )

    r = q_bootstrap_mean_ci(spark, sf_dir).collect()[0]
    mean = (
        catalog.load_table(spark, sf_dir, "events")
        .agg(F.avg("value"))
        .first()[0]
    )
    assert r.ci_lo < mean < r.ci_hi
    assert r.ci_hi - r.ci_lo > 0
