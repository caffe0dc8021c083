"""ANSI-mode degenerate-input guards (round-5 advice items).

The session runs Spark 4's default ANSI mode, where x/0 raises
DIVIDE_BY_ZERO. Each statistical operator whose denominator is a
data-dependent variance/count must emit NULL (or a documented fallback)
on degenerate slices instead of crashing — these inputs are unreachable
on the TPC-H-style fixtures but entirely reachable on real filtered
data, and for the streaming monitor a crash poisons the checkpoint."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

D = datetime.datetime
_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, "
    "event_type string, value double, props string"
)


def _events_dir(spark, tmp_path, rows):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_mad_zero_group_emits_no_flags_and_does_not_crash(spark, tmp_path):
    """≥50% identical values → MAD = 0: the group must contribute no
    flags (try_divide convention), not raise DIVIDE_BY_ZERO."""
    from sparkstreaming_rawdataingestion_spark.operators import segments

    rows = [
        # 'flat' group: median 5, MAD 0 — even the wild 1e9 value has no
        # defined robust z
        (i, D(2024, 1, 1, 0, 0, i), 1, "flat", 5.0, "{}")
        for i in range(1, 7)
    ] + [(7, D(2024, 1, 1, 0, 1, 0), 1, "flat", 1e9, "{}")]
    sf = _events_dir(spark, tmp_path, rows)
    out = segments.QUERIES["mad_outlier_flags"](spark, sf).collect()
    assert out == []


def test_eval_stream_empty_class_window_emits_null_metrics(spark, tmp_path):
    """A quiet window with zero actual positives: recall is NULL, the
    query does not die (its transformation is pure windowed algebra, so
    the batch run exercises the exact streaming expressions)."""
    from sparkstreaming_rawdataingestion_spark.streaming import eval_stream

    rows = [
        (1, D(2024, 1, 1, 1, 0, 0), 1, "view", 9.0, "{}"),
        (2, D(2024, 1, 1, 2, 0, 0), 2, "click", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(rows, _SCHEMA)
    [r] = eval_stream.eval_stream(ev, threshold=5.0).collect()
    assert (r.tp, r.fp, r.fn) == (0, 1, 0)
    assert r.precision_ == 0.0
    assert r.recall_ is None  # tp+fn = 0 → NULL, not DIVIDE_BY_ZERO


def test_cuped_constant_covariate_degenerates_to_unadjusted(
    spark, tmp_path
):
    """Every event after the cutoff → x ≡ 0, var_pop(x) = 0: θ falls
    back to 0 and the readout equals the unadjusted means."""
    from sparkstreaming_rawdataingestion_spark.operators import experiments

    rows = [
        (i, D(2024, 3, 1, 0, 0, i), i, "purchase", float(i), "{}")
        for i in range(1, 9)
    ]
    sf = _events_dir(spark, tmp_path, rows)
    out = {
        r.arm: r
        for r in experiments.QUERIES["ab_cuped_adjusted"](
            spark, sf
        ).collect()
    }
    assert set(out) == {0, 1}
    for r in out.values():
        assert r.mean_y_adj == r.mean_y


def test_welch_single_row_arms_emit_null_not_crash(spark, tmp_path):
    """One event per arm: var_samp is NULL, n−1 = 0 — t and df must be
    NULL."""
    from sparkstreaming_rawdataingestion_spark.operators import experiments

    rows = [
        (1, D(2024, 1, 1), 2, "view", 1.0, "{}"),   # arm 0
        (2, D(2024, 1, 2), 3, "view", 2.0, "{}"),   # arm 1
    ]
    sf = _events_dir(spark, tmp_path, rows)
    [r] = experiments.QUERIES["welch_ttest_report"](spark, sf).collect()
    assert (r.n0, r.n1) == (1, 1)
    assert r.t_stat is None and r.welch_df is None


def test_welch_zero_variance_arms_emit_null_not_crash(spark, tmp_path):
    """Constant values in both arms: se2 = 0 → NULL t (not ±inf, not a
    DIVIDE_BY_ZERO)."""
    from sparkstreaming_rawdataingestion_spark.operators import experiments

    rows = [
        (i, D(2024, 1, 1, 0, 0, i), i % 4, "view", 7.0, "{}")
        for i in range(1, 13)
    ]
    sf = _events_dir(spark, tmp_path, rows)
    [r] = experiments.QUERIES["welch_ttest_report"](spark, sf).collect()
    assert r.t_stat is None and r.welch_df is None


def test_round6_ops_survive_empty_events(spark, tmp_path):
    """Empty events table: the aggregating round-6 ops must emit their
    1-row NULL report (or an empty frame), never DIVIDE_BY_ZERO — the
    exact slice a filtered backfill produces."""
    from sparkstreaming_rawdataingestion_spark.operators import (
        behavior,
        evaluation,
        experiments,
    )

    sf = _events_dir(spark, tmp_path, [])

    r = experiments.q_bootstrap_mean_ci(spark, sf).collect()
    assert len(r) == 1 and r[0].n_replicas == 0
    assert r[0].boot_mean is None

    r = evaluation.q_ndcg_ranking_quality(spark, sf).collect()
    assert len(r) == 1 and r[0].n_users == 0
    assert r[0].mean_ndcg is None

    assert evaluation.q_ctr_wilson_bounds(spark, sf).collect() == []
    assert behavior.q_user_burstiness_profile(spark, sf).collect() == []


def test_kappa_single_class_corpus_emits_null_kappa(spark, tmp_path):
    """A corpus where every document is the same class on both sides:
    pe = 1 so kappa is 0/0 — must emit NULL, not DIVIDE_BY_ZERO (the
    standard undefined-kappa convention for degenerate marginals)."""
    from sparkstreaming_rawdataingestion_spark.operators import evaluation

    rows = [
        (1, "the a of cat", "en", "web", 12),
        (2, "the and is dog", "en", "web", 14),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    r = evaluation.q_label_agreement_kappa(spark, str(tmp_path)).collect()
    assert len(r) == 1
    assert r[0].observed_agreement == 1.0
    assert r[0].expected_agreement == 1.0
    assert r[0].kappa is None
