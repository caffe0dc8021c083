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


def _load_queries(path: str) -> dict[str, float]:
    d = json.load(open(path))
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    if d is None or "queries" not in d:
        raise SystemExit(f"{path}: no parsed per-query map")
    return d["queries"]


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    threshold = 1.3
    if "--threshold" in sys.argv:
        threshold = float(sys.argv[sys.argv.index("--threshold") + 1])
    baseline_path = args[0] if args else os.path.join(REPO, "BENCH_r03.json")
    current_path = (
        args[1] if len(args) > 1 else os.path.join(REPO, "BENCH_DETAIL.json")
    )
    base = _load_queries(baseline_path)
    cur = _load_queries(current_path)

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
    for r, k in sorted(regressions, reverse=True):
        print(f"  REGRESSION {k}: {base[k]} -> {cur[k]} ({r:.2f}x)")
    if not regressions:
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
