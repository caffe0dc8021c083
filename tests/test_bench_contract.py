"""The driver parses bench.py's FINAL stdout line from a ~2000-byte tail
capture (BENCH_r04 recorded ``parsed: null`` when the line outgrew it).
Pin the output contract so the headline set can't silently regrow past
the window."""

import json
import sys


def test_headline_names_resolve_and_set_is_bounded():
    sys.path.insert(0, ".")
    import bench
    from sparkstreaming_rawdataingestion_spark.queries import all_queries

    registry = all_queries()
    missing = [n for n in bench.HEADLINE if n not in registry]
    assert missing == []
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
    # Round 10 retired six flat sub-0.3 s re-checks (documented in
    # bench.RETIRED_FROM_HEADLINE) to open byte headroom for the
    # round-10 operators. The REAL bound stays the 1900-byte
    # worst-case payload test below; this count is a growth tripwire.
    assert len(bench.HEADLINE) <= 48
    assert set(bench.RETIRED_FROM_HEADLINE).isdisjoint(bench.HEADLINE)


def test_final_line_fits_driver_tail_at_worst_case_timings():
    sys.path.insert(0, ".")
    import bench

    # worst realistic case: every query three digits of seconds
    payload = {
        "metric": "headline_queries_total_sec",
        "value": 9999.999,
        "unit": "sec",
        "cal": [999.999, 999.999],
        "load": [99.99, 99.99],
        "cpus": 32,
        "queries": {n: 999.999 for n in bench.HEADLINE},
        "sf": 0.1,
    }
    assert len(json.dumps(payload)) <= 1900


def test_skew_verdict_flags_drift_and_preload():
    """The self-diagnosis contract (VERDICT r7 item 2): a run whose
    fixed-work calibration probe got >1.3x SLOWER start-to-end, or that
    started with loadavg above the core count, must self-report as
    skewed; a clean run must not. The drift check is directional — an
    end probe FASTER than start is deep-JIT warmup (measured on a
    verified-solo panel), not contention."""
    sys.path.insert(0, ".")
    sys.path.insert(0, "tools")
    from bench_compare import _skew_verdict

    clean = {"cal": [1.0, 1.1], "load": [3.0, 20.0], "cpus": 32}
    assert _skew_verdict(clean) is None
    drifted = {"cal": [1.0, 1.5], "load": [3.0, 20.0], "cpus": 32}
    assert "drifted" in _skew_verdict(drifted)
    jit_warmup = {"cal": [1.5, 1.0], "load": [3.0, 20.0], "cpus": 32}
    assert _skew_verdict(jit_warmup) is None
    preloaded = {"cal": [1.0, 1.1], "load": [40.0, 41.0], "cpus": 32}
    assert "loadavg" in _skew_verdict(preloaded)
    legacy = {"queries": {}}  # pre-round-8 artifacts lack the fields
    assert _skew_verdict(legacy) is None


def test_headline_keeps_round3_comparable_panel():
    """The 40-query BENCH_r03 panel is the longitudinal baseline; it must
    stay a subset — minus EXACTLY the documented retirements
    (bench.RETIRED_FROM_HEADLINE, round 10's byte-budget pruning of
    flat sub-0.3 s entries) — so per-query times remain comparable
    across rounds and retirements can never happen silently."""
    sys.path.insert(0, ".")
    import os

    import bench

    path = os.path.join(os.path.dirname(__file__), "..", "BENCH_r03.json")
    r3 = json.load(open(path))["parsed"]["queries"]
    assert set(r3) - set(bench.RETIRED_FROM_HEADLINE) <= set(bench.HEADLINE)
    # every retiree must actually come from a recorded panel (no
    # retiring a name that was never benched)
    benched_ever = set(r3) | set(bench.HEADLINE)
    for f in sorted(
        os.listdir(os.path.join(os.path.dirname(__file__), ".."))
    ):
        if f.startswith("BENCH_r") and f.endswith(".json"):
            parsed = json.load(
                open(os.path.join(os.path.dirname(__file__), "..", f))
            ).get("parsed")
            if parsed:
                benched_ever |= set(parsed.get("queries", {}))
    assert set(bench.RETIRED_FROM_HEADLINE) <= benched_ever
