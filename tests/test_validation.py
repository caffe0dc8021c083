"""Invariants and plan pins for the validation/guardrail operators
(data-quality suite, SCD2 history, anomaly detection, skew report)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_rawdataingestion_spark import plans
from sparkstreaming_rawdataingestion_spark.operators import validation


# ---------------------------------------------------------------------------
# data_quality_checks
# ---------------------------------------------------------------------------


def test_quality_suite_one_row_per_check(spark, sf_dir):
    rows = validation.q_data_quality_checks(spark, sf_dir).collect()
    names = {r.check_name for r in rows}
    assert len(rows) == len(names) == len(validation._ORDER_CHECKS) + 2
    n_rows = {r.n_rows for r in rows}
    assert len(n_rows) == 1  # every check audited the same table
    for r in rows:
        assert r.passed == (r.n_violations == 0)
        assert 0 <= r.n_violations <= r.n_rows


def test_quality_suite_detects_seeded_violations(spark):
    """The suite must actually fire on bad data, not just report clean."""
    bad = spark.createDataFrame(
        [
            (1, 10, "F", 5.0, "1995-01-01"),
            (1, None, "X", -2.0, "1999-06-01"),  # dup key, null, bad status,
            # negative price, date outside window
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp_ntz"))
    out = {
        r.check_name: r.n_violations
        for r in validation.check_suite(
            bad, validation._ORDER_CHECKS, unique_key="o_orderkey"
        ).collect()
    }
    assert out["unique_o_orderkey"] == 1
    assert out["complete_custkey"] == 1
    assert out["positive_totalprice"] == 1
    assert out["accepted_status"] == 1
    assert out["date_in_window"] == 1


def test_quality_suite_single_scan(spark, sf_dir):
    """All single-table constraints fold into one aggregation: exactly one
    exchange below the suite branch (the single reduce), however many
    rules are declared."""
    from sparkstreaming_rawdataingestion_spark import catalog

    orders = catalog.load_table(spark, sf_dir, "orders")
    suite = validation.check_suite(
        orders, validation._ORDER_CHECKS, unique_key="o_orderkey"
    )
    # count_distinct adds an expand+partial pair; the point is that the
    # scan count is 1 — profiling never re-reads the table per rule.
    plan = plans.executed_plan(suite)
    assert plan.count("Scan parquet") == 1


def test_quality_ri_join_broadcasts(spark, sf_dir):
    df = validation.q_data_quality_checks(spark, sf_dir)
    assert plans.has_broadcast_join(df)


# ---------------------------------------------------------------------------
# scd2_dimension_history
# ---------------------------------------------------------------------------


def test_scd2_intervals_are_contiguous_and_single_current(spark, sf_dir):
    rows = validation.q_scd2_dimension_history(spark, sf_dir).collect()
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r.user_id, []).append(r)
    for key, versions in by_key.items():
        versions.sort(key=lambda r: r.effective_from)
        # exactly one open (current) version per key, and it's the last
        currents = [r for r in versions if r.is_current]
        assert len(currents) == 1 and currents[0] is versions[-1]
        for a, b in zip(versions, versions[1:]):
            assert a.effective_to == b.effective_from  # no gaps, no overlap
        # no-op changes collapsed: consecutive versions differ in value
        for a, b in zip(versions, versions[1:]):
            assert a.value != b.value


def test_scd2_single_shuffle(spark, sf_dir):
    """Both window passes share the (user_id × time) sort — Catalyst must
    reuse one exchange, not shuffle twice."""
    df = validation.q_scd2_dimension_history(spark, sf_dir)
    assert plans.count_exchanges(df) == 1


def test_scd2_matches_cdc_latest(spark, sf_dir):
    """The open SCD2 version per key is exactly what cdc_latest_per_key
    returns (same changelog, two views of it)."""
    from sparkstreaming_rawdataingestion_spark.operators import analytics

    scd2 = validation.q_scd2_dimension_history(spark, sf_dir)
    current = {
        r.user_id: r.value for r in scd2.where("is_current").collect()
    }
    latest = {
        r.user_id: r.latest_value
        for r in analytics.QUERIES["cdc_latest_per_key"](spark, sf_dir)
        .select("user_id", "latest_value")
        .collect()
    }
    assert current == latest


# ---------------------------------------------------------------------------
# timeseries_anomaly_zscore
# ---------------------------------------------------------------------------


def test_anomaly_zscores_exceed_threshold(spark, sf_dir):
    rows = validation.q_timeseries_anomaly_zscore(spark, sf_dir).collect()
    assert rows, "fixture tail must produce some outliers"
    assert all(abs(r.z) > 2.5 for r in rows)
    # one-sided data (value >= 0, right-skewed): outliers are the big values
    assert all(r.z > 0 for r in rows)


def test_anomaly_stats_join_broadcasts(spark, sf_dir):
    df = validation.q_timeseries_anomaly_zscore(spark, sf_dir)
    assert plans.has_broadcast_join(df)


# ---------------------------------------------------------------------------
# key_skew_report
# ---------------------------------------------------------------------------


def test_skew_report_topk_and_shares(spark, sf_dir):
    rows = validation.q_key_skew_report(spark, sf_dir).collect()
    assert len(rows) == 20
    counts = [r.n_rows for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(0 < r.share < 1 for r in rows)


def test_skew_report_no_global_sort(spark, sf_dir):
    df = validation.q_key_skew_report(spark, sf_dir)
    assert "TakeOrderedAndProject" in plans.executed_plan(df)


def test_ks_drift_separates_shifted_from_identical(spark):
    """KS sanity on synthetic cohorts: an identical distribution split in
    half scores near 0; a mean-shifted cohort scores near 1."""
    from pyspark.sql import functions as F

    from sparkstreaming_rawdataingestion_spark.operators import validation

    rows = []
    for i in range(1000):
        rows.append((i, "same", float(i % 100)))           # both halves alike
        rows.append((i, "shifted", float(i % 100 + (1000 if i % 2 == 0 else 0))))
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")

    import sparkstreaming_rawdataingestion_spark.catalog as cat

    orig = cat.load_table
    cat.load_table = lambda s, d, n: df
    try:
        out = {
            r.event_type: r.ks_stat
            for r in validation.QUERIES["distribution_drift_ks"](spark, "x").collect()
        }
    finally:
        cat.load_table = orig
    assert out["same"] < 0.05
    assert out["shifted"] > 0.9


def test_ks_drift_plan_is_one_partitioned_shuffle(spark):
    """Both CDFs and the partition totals must ride ONE hash exchange on
    the drift key — no global sort, no second shuffle of the raw rows
    (the property that keeps per-key drift viable at 100 TB)."""
    from sparkstreaming_rawdataingestion_spark import plans
    from sparkstreaming_rawdataingestion_spark.operators import validation

    df = validation.QUERIES["distribution_drift_ks"](
        spark, "/root/testdata/sf0.01"
    )
    plan = plans.executed_plan(df)
    assert "rangepartitioning" not in plan  # no global sort anywhere
    # one shuffle for the windows over event_type + the final tiny
    # aggregation exchange at most
    assert plans.count_exchanges(df) <= 2


def test_snapshot_diff_classifies_all_four_ways(spark):
    """Crafted windows: a user only in the old window is removed, only in
    the new added, overlapping-but-different changed (with the column
    mask), overlapping-identical unchanged."""
    import datetime
    import os
    import tempfile

    from pyspark.sql import functions as F

    from sparkstreaming_rawdataingestion_spark.operators import validation

    D = datetime.datetime
    rows = [
        # u1: events only before Jan 11 → removed (old-only)
        (1, 1, D(2024, 1, 5), "view", 1.0, "{}"),
        # u2: events only after Jan 21 → added (new-only)
        (2, 2, D(2024, 1, 25), "view", 1.0, "{}"),
        # u3: identical single event inside the overlap → unchanged
        (3, 3, D(2024, 1, 15), "view", 2.5, "{}"),
        # u4: one event in overlap + one extra in the new tail →
        # changed, both n_events and total move
        (4, 4, D(2024, 1, 15), "view", 1.0, "{}"),
        (5, 4, D(2024, 1, 25), "view", 9.0, "{}"),
        # u5: same count, different totals (one event in each exclusive
        # region) → changed, total only
        (6, 5, D(2024, 1, 5), "view", 1.0, "{}"),
        (7, 5, D(2024, 1, 25), "view", 2.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp_ntz, "
        "event_type string, value double, props string",
    )
    with tempfile.TemporaryDirectory() as tmp:
        ev.write.parquet(os.path.join(tmp, "events.parquet"))
        got = {
            r.user_id: (r.change_type, r.changed_cols)
            for r in validation.q_snapshot_diff(spark, tmp).collect()
        }
    assert got[1] == ("removed", None)
    assert got[2] == ("added", None)
    assert got[3] == ("unchanged", None)
    assert got[4] == ("changed", "n_events,total")
    assert got[5] == ("changed", "total")


def test_snapshot_diff_matches_python_reference_on_random_events(spark):
    """Seeded random events vs a pure-Python diff with exact Decimal
    totals (mirrors the operator's DECIMAL accumulation)."""
    import datetime
    import os
    import random
    import tempfile
    from decimal import Decimal

    from sparkstreaming_rawdataingestion_spark.operators import validation

    D = datetime.datetime
    rng = random.Random(2024)
    rows = []
    for eid in range(600):
        rows.append(
            (
                eid,
                rng.randrange(40),
                D(2024, 1, 1 + rng.randrange(29), rng.randrange(24)),
                "view",
                round(rng.uniform(-50, 50), 2),
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
            r.user_id: (r.change_type, r.changed_cols)
            for r in validation.q_snapshot_diff(spark, tmp).collect()
        }

    def snap(lo, hi):
        out: dict = {}
        for _eid, uid, ts, _et, val, _p in rows:
            if lo <= ts < hi:
                n, tot = out.get(uid, (0, Decimal(0)))
                out[uid] = (n + 1, tot + Decimal(str(val)).quantize(
                    Decimal("0.000001")))
        return out

    old = snap(D(2024, 1, 1), D(2024, 1, 21))
    new = snap(D(2024, 1, 11), D(2024, 1, 31))
    expect: dict = {}
    for uid in set(old) | set(new):
        if uid not in new:
            expect[uid] = ("removed", None)
        elif uid not in old:
            expect[uid] = ("added", None)
        else:
            no, to = old[uid]
            nn, tn = new[uid]
            if no == nn and float(to) == float(tn):
                expect[uid] = ("unchanged", None)
            else:
                mask = ",".join(
                    c
                    for c, diff in (
                        ("n_events", no != nn),
                        ("total", float(to) != float(tn)),
                    )
                    if diff
                )
                expect[uid] = ("changed", mask)
    assert got == expect


# ---------------------------------------------------------------------------
# seasonal_baseline_anomaly / benford_digit_audit
# ---------------------------------------------------------------------------


def test_seasonal_anomaly_catches_what_global_zscore_misses(spark, tmp_path):
    """A value normal for the daily peak hour but absurd for its own
    hour slot must flag under the seasonal model and stay invisible to
    the global per-type z-score."""
    import datetime

    D = datetime.datetime
    rows = []
    eid = 0
    # hour 1: tight around 100; hour 2: tight around 1
    for day in range(1, 11):
        for v in (99.0, 101.0):
            eid += 1
            rows.append((eid, 7, D(2024, 1, day, 1, 0), "sensor", v, "{}"))
        for v in (0.5, 1.5):
            eid += 1
            rows.append((eid, 7, D(2024, 1, day, 2, 0), "sensor", v, "{}"))
    # the planted outlier: 40 at hour 2 (normal-ish globally, wild for 2am)
    rows.append((9999, 7, D(2024, 1, 12, 2, 0), "sensor", 40.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp_ntz, "
        "event_type string, value double, props string",
    )
    ev.write.parquet(str(tmp_path / "events.parquet"))
    sf = str(tmp_path)
    flagged = {
        r.event_id
        for r in validation.q_seasonal_baseline_anomaly(spark, sf).collect()
    }
    global_flagged = {
        r.event_id
        for r in validation.q_timeseries_anomaly_zscore(spark, sf).collect()
    }
    assert 9999 in flagged
    assert 9999 not in global_flagged


def test_benford_shares_and_chi2(spark, sf_dir):
    rows = validation.q_benford_digit_audit(spark, sf_dir).collect()
    assert {r.digit for r in rows} == {str(d) for d in range(1, 10)}
    assert abs(sum(r.obs_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.exp_share for r in rows) - 1.0) < 1e-4
    assert all(r.chi2_term >= 0 for r in rows)
    # Benford expectation is monotone decreasing in the digit
    by_digit = sorted(rows, key=lambda r: int(r.digit))
    exp = [r.exp_share for r in by_digit]
    assert exp == sorted(exp, reverse=True)


def test_benford_flags_fabricated_uniform_amounts(spark, tmp_path):
    """Uniform-first-digit (fabricated) amounts must produce a large
    chi-square; amounts drawn ~log-uniform must produce a small one."""
    import math
    import random

    rng = random.Random(42)
    fab = [(i, float(rng.randint(1, 9)) * 1000 + 17) for i in range(2000)]
    nat = [
        (i, math.exp(rng.uniform(0, math.log(10 ** 6))))
        for i in range(2000)
    ]
    for name, data in (("fab", fab), ("nat", nat)):
        spark.createDataFrame(
            data, "o_orderkey long, o_totalprice double"
        ).write.parquet(str(tmp_path / name / "orders.parquet"))
    chi_fab = sum(
        r.chi2_term
        for r in validation.q_benford_digit_audit(
            spark, str(tmp_path / "fab")
        ).collect()
    )
    chi_nat = sum(
        r.chi2_term
        for r in validation.q_benford_digit_audit(
            spark, str(tmp_path / "nat")
        ).collect()
    )
    # 8 dof: > 20 is p < 0.01 territory; uniform-vs-benford is enormous
    assert chi_fab > 100
    assert chi_nat < 30
    assert chi_fab > 10 * chi_nat
