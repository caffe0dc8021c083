"""Hand-crafted-input invariants for the model-evaluation operators
(operators/evaluation.py) — metrics cross-checked against sklearn-style
hand computations on tiny inputs."""

from __future__ import annotations

import datetime

import sparkstreaming_rawdataingestion_spark.catalog as catalog
from sparkstreaming_rawdataingestion_spark.operators import evaluation

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
        evaluation.catalog.load_table = catalog.load_table
        return fn()
    finally:
        catalog.load_table = orig
        evaluation.catalog.load_table = orig


def test_confusion_matrix_shares_sum_to_one(spark, sf_dir):
    rows = evaluation.q_langid_confusion_matrix(spark, sf_dir).collect()
    assert rows
    totals = {}
    for r in rows:
        totals[r.labeled_lang] = totals.get(r.labeled_lang, 0.0) + (
            r.share_of_truth
        )
    for lang, s in totals.items():
        assert abs(s - 1.0) < 1e-4, lang
    assert sum(r.n for r in rows) == 500  # every doc classified once


def test_eval_metrics_hand_case(spark):
    """4 events, median 2.5 → yhat = value ≥ 2.5.
    y:    purchase at values 3 and 1; others at 4 and 2.
    tp=1 (v=3), fp=1 (v=4), fn=1 (v=1), tn=1 (v=2)."""
    rows = [
        (1, D(2024, 1, 1), 1, "purchase", 3.0, "{}"),
        (2, D(2024, 1, 1), 1, "purchase", 1.0, "{}"),
        (3, D(2024, 1, 1), 1, "view", 4.0, "{}"),
        (4, D(2024, 1, 1), 1, "view", 2.0, "{}"),
    ]
    out = _with_events(
        spark, rows,
        lambda: evaluation.q_classifier_eval_metrics(spark, "x").collect(),
    )[0]
    assert (out.tp, out.fp, out.fn, out.tn) == (1, 1, 1, 1)
    assert out.precision_ == 0.5
    assert out.recall_ == 0.5
    assert out.f1 == 0.5
    assert out.accuracy == 0.5


def test_auc_perfect_and_random_separation(spark):
    """Positives strictly above negatives → AUC 1; all-tied scores →
    AUC 0.5 exactly (midrank tie handling)."""
    perfect = [
        (1, D(2024, 1, 1), 1, "purchase", 10.0, "{}"),
        (2, D(2024, 1, 1), 1, "purchase", 9.0, "{}"),
        (3, D(2024, 1, 1), 1, "view", 2.0, "{}"),
        (4, D(2024, 1, 1), 1, "view", 1.0, "{}"),
    ]
    out = _with_events(
        spark, perfect,
        lambda: evaluation.q_ranking_auc_report(spark, "x").collect(),
    )[0]
    assert (out.n_pos, out.n_neg, out.auc) == (2, 2, 1.0)

    tied = [
        (1, D(2024, 1, 1), 1, "purchase", 5.0, "{}"),
        (2, D(2024, 1, 1), 1, "view", 5.0, "{}"),
        (3, D(2024, 1, 1), 1, "purchase", 5.0, "{}"),
        (4, D(2024, 1, 1), 1, "view", 5.0, "{}"),
    ]
    out = _with_events(
        spark, tied,
        lambda: evaluation.q_ranking_auc_report(spark, "x").collect(),
    )[0]
    assert out.auc == 0.5


def test_calibration_bins_cover_unit_interval(spark, sf_dir):
    rows = evaluation.q_score_calibration_bins(spark, sf_dir).collect()
    assert {r.bin for r in rows} <= set(range(10))
    for r in rows:
        assert 0.0 <= r.mean_score <= 1.0
        assert 0.0 <= r.positive_rate <= 1.0
        assert r.n > 0
