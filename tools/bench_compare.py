"""Round-over-round bench comparison — diff the latest run's per-query
timings (BENCH_DETAIL.json, written by bench.py) against any prior
driver artifact (BENCH_r{N}.json) or detail file.

Usage: python tools/bench_compare.py [baseline.json] [--threshold 1.3]

Prints shared-panel totals, the per-query regressions above the
threshold (ignoring sub-0.3 s noise), and the biggest improvements —
the exact check the round verdicts run by hand.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_payload(path: str) -> dict:
    d = json.load(open(path))
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    if d is None or "queries" not in d:
        raise SystemExit(f"{path}: no parsed per-query map")
    return d


def _skew_verdict(payload: dict) -> str | None:
    """Reason string if the run self-reports contention, else None.

    A run is untrustworthy for regression-flagging when its fixed-work
    calibration probe got >1.3x SLOWER between panel start and end
    (contention arriving mid-panel), or the 1-min loadavg already
    exceeded the core count before the panel even started (another
    Spark session running — BENCH_r07's failure mode). The check is
    directional: an END probe FASTER than the start probe is benign —
    deep JIT/code-cache warmup keeps improving fixed-work times well
    into a session (measured 0.295 s -> 0.207 s on a verified-solo
    panel) and says nothing about load during the panel."""
    cal = payload.get("cal")
    if cal and cal[0] > 0 and cal[1] / cal[0] > 1.3:
        return f"calibration probe drifted {cal[1] / cal[0]:.2f}x ({cal})"
    load = payload.get("load")
    cpus = payload.get("cpus")
    if load and cpus and load[0] > cpus:
        return f"loadavg {load[0]} > {cpus} cpus at panel start"
    return None


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    threshold = 1.3
    if "--threshold" in sys.argv:
        threshold = float(sys.argv[sys.argv.index("--threshold") + 1])
    baseline_path = args[0] if args else os.path.join(REPO, "BENCH_r03.json")
    current_path = (
        args[1] if len(args) > 1 else os.path.join(REPO, "BENCH_DETAIL.json")
    )
    base_payload = _load_payload(baseline_path)
    cur_payload = _load_payload(current_path)
    base, cur = base_payload["queries"], cur_payload["queries"]

    shared = sorted(set(base) & set(cur))
    tb = sum(base[k] for k in shared)
    tc = sum(cur[k] for k in shared)
    print(
        f"shared panel ({len(shared)} queries): "
        f"{tb:.1f}s -> {tc:.1f}s ({tc / tb:.2f}x)"
    )
    regressions = [
        (cur[k] / base[k], k)
        for k in shared
        if cur[k] > base[k] * threshold and cur[k] > 0.3
    ]
    skew = _skew_verdict(cur_payload)
    if skew is None and base_payload.get("cal") and cur_payload.get("cal"):
        # cross-run environment drift: same fixed work, different machine
        # state — per-query ratios inherit the probe's ratio, not code.
        b, c = min(base_payload["cal"]), min(cur_payload["cal"])
        if b > 0 and c / b > 1.3:
            skew = f"calibration probe {b:.2f}s -> {c:.2f}s across runs"
    if skew is not None:
        print(f"  SKEWED RUN ({skew}) — regressions suppressed; re-run solo:")
        for r, k in sorted(regressions, reverse=True):
            print(f"    (contention?) {k}: {base[k]} -> {cur[k]} ({r:.2f}x)")
        regressions = []
    else:
        for r, k in sorted(regressions, reverse=True):
            print(f"  REGRESSION {k}: {base[k]} -> {cur[k]} ({r:.2f}x)")
    if not regressions and skew is None:
        print(f"  no regressions > {threshold}x (and > 0.3s)")
    improvements = sorted(
        ((cur[k] / base[k], k) for k in shared if base[k] > 0.5)
    )[:5]
    for r, k in improvements:
        print(f"  best {k}: {base[k]} -> {cur[k]} ({r:.2f}x)")
    print(f"only in baseline: {sorted(set(base) - set(cur))}")
    print(f"only in current:  {sorted(set(cur) - set(base))}")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
