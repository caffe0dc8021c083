"""Error pins for the approximate scale twins (VERDICT r5 item 5).

Discipline as with the LSH/IVF/PQ recall pins: the exact kernel is the
verification oracle, the approximate form — the one you would actually
run at 100 TB — gets a quantified tolerance against it.
"""

from __future__ import annotations


def test_quantile_normalize_approx_error_bound(spark, sf_dir):
    from sparkstreaming_rawdataingestion_spark.operators.signals import (
        q_quantile_normalize_approx,
        q_quantile_normalize_sources,
    )

    exact = {
        r["doc_id"]: r["norm_score"]
        for r in q_quantile_normalize_sources(spark, sf_dir).collect()
    }
    approx = {
        r["doc_id"]: r["norm_score"]
        for r in q_quantile_normalize_approx(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    lo, hi = min(exact.values()), max(exact.values())
    span = hi - lo
    errs = sorted(abs(approx[k] - exact[k]) / span for k in exact)
    # grid resolution 1/1000 in rank space + sketch accuracy: the bulk
    # of documents must land essentially on the exact value, the tail
    # within a few percent of the score span
    assert errs[int(0.95 * len(errs))] < 0.02, errs[int(0.95 * len(errs))]
    assert errs[-1] < 0.10, errs[-1]


def test_ranking_auc_histogram_error_bound(spark, sf_dir):
    from sparkstreaming_rawdataingestion_spark.operators.evaluation import (
        q_ranking_auc_histogram,
        q_ranking_auc_report,
    )

    exact = q_ranking_auc_report(spark, sf_dir).collect()[0]
    est = q_ranking_auc_histogram(spark, sf_dir).collect()[0]
    assert (est["n_pos"], est["n_neg"]) == (exact["n_pos"], exact["n_neg"])
    # within-bin discordance bound: O(1/bins), asserted with headroom
    assert abs(est["auc_est"] - exact["auc"]) < 0.01, (
        est["auc_est"],
        exact["auc"],
    )


def test_theil_sen_sampled_tracks_exact(spark, sf_dir):
    """The O(k·h) sampled Theil–Sen must track the exact O(k²) kernel:
    per-user slope estimates land well inside the cross-user slope
    spread (h=8 partners per point on short fixture series — the
    sampling error shrinks as k·h grows at real scale)."""
    import numpy as np

    from sparkstreaming_rawdataingestion_spark.operators import segments

    exact = {
        r["user_id"]: r["sen_slope"]
        for r in segments.q_theil_sen_trend(spark, sf_dir).collect()
    }
    est = {
        r["user_id"]: r["sen_slope_est"]
        for r in segments.q_theil_sen_sampled(spark, sf_dir).collect()
    }
    assert set(exact) == set(est)
    spread = float(
        np.percentile(list(exact.values()), 90)
        - np.percentile(list(exact.values()), 10)
    )
    diffs = sorted(abs(est[u] - exact[u]) for u in exact)
    assert diffs[len(diffs) // 2] < 0.5 * spread  # median well inside
    assert diffs[int(0.9 * (len(diffs) - 1))] < spread  # p90 inside


def test_bootstrap_ci_width_shrinks_as_root_n(spark):
    """Statistical soundness of the Poisson bootstrap: the CI width must
    scale ~1/√n — at 10× the data (sf0.001 → sf0.01) the width ratio
    sits near √10, well inside [2.0, 5.0] even with B = 200 replica
    noise. A broken resampler (weights not ~Poisson(1), replica
    correlation) breaks this immediately."""
    from sparkstreaming_rawdataingestion_spark.operators.experiments import (
        q_bootstrap_mean_ci,
    )

    small = q_bootstrap_mean_ci(spark, "/root/testdata/sf0.001").collect()[0]
    big = q_bootstrap_mean_ci(spark, "/root/testdata/sf0.01").collect()[0]
    w_small = small.ci_hi - small.ci_lo
    w_big = big.ci_hi - big.ci_lo
    assert w_small > 0 and w_big > 0
    ratio = w_small / w_big
    assert 2.0 < ratio < 5.0, f"CI width ratio {ratio} not ~sqrt(10)"
