"""Round-15 py4j plan-construction sweep (VERDICT r14 next-round #4).

Times, for every registry query (or the named subset), ONLY the Python-
side DataFrame construction — ``registry[name](spark, sf_dir)`` — i.e.
py4j Column-call round trips + Catalyst analysis, with no job executed.
The round-14 pq fix found 9-11 s of pure plan construction inside one
query; this sweep hunts the same pathology across the extended registry.

Usage:
  python tools/planbuild_sweep_r15.py [--reps 2] [--top 25] [--sf DIR] [name ...]

Prints per-query build seconds (median of reps) sorted descending, plus
a calibration probe before/after so host throttle episodes are visible.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from sparkstreaming_rawdataingestion_spark import session as S
    from sparkstreaming_rawdataingestion_spark.queries import all_queries
    from sparkstreaming_rawdataingestion_spark.session import get_spark

    spark = get_spark(app_name="planbuild-sweep-r15")
    registry = all_queries()
    names = args.names or list(registry)
    missing = [n for n in names if n not in registry]
    if missing:
        sys.exit(f"unknown queries: {missing}")

    def probe() -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            spark.range(0, 600_000_000, 1, 64).selectExpr(
                "sum(id % 7) AS s"
            ).collect()
            best = min(best, time.perf_counter() - t0)
        return best

    # warm the IO path + catalog caches once so the first query doesn't
    # absorb session setup
    registry[names[0]](spark, args.sf)
    S.release_staged()
    cal_start = probe()

    results: dict[str, float] = {}
    for name in names:
        reps = []
        for _ in range(args.reps):
            S.release_staged()
            t0 = time.perf_counter()
            try:
                df = registry[name](spark, args.sf)
                df.schema  # force analysis, still no job
            except Exception as exc:  # noqa: BLE001
                print(f"ERR {name}: {exc}")
                reps = []
                break
            reps.append(time.perf_counter() - t0)
        if reps:
            reps.sort()
            results[name] = reps[len(reps) // 2]
    S.release_staged()
    cal_end = probe()

    print(f"\ncal [{cal_start:.3f}, {cal_end:.3f}]  n={len(results)}")
    for name, sec in sorted(results.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{sec:8.3f}  {name}")
    total = sum(results.values())
    print(f"total build time across {len(results)} queries: {total:.1f}s")


if __name__ == "__main__":
    main()
