"""Round-14 optimization probe — per-query timing reps + plan capture.

Usage:
  python tools/opt_probe_r14.py [--reps N] [--warm N] [--plans DIR] \
      [--sf SF_DIR] name [name ...]

For each named registry query: run ``--warm`` untimed warm-ups then
``--reps`` timed runs against the noop sink (guide §1.4 — computes every
column, discards output), print per-rep seconds and the min/median, and
(when ``--plans`` is given) write ``<dir>/<name>_<tag>.txt`` holding
``explain('formatted')``. Jobs are labelled (guide §1.5). A fixed
CPU-bound calibration probe runs before and after so contention shows up
in the record (bench.py's methodology).
"""

from __future__ import annotations

import argparse
import io
import os
import statistics
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--warm", type=int, default=1)
    ap.add_argument("--plans", default=None, help="directory for explain dumps")
    ap.add_argument("--tag", default="before", help="suffix for plan files")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from sparkstreaming_rawdataingestion_spark.queries import all_queries
    from sparkstreaming_rawdataingestion_spark.session import get_spark

    spark = get_spark(app_name="opt-probe-r14")
    registry = all_queries()
    missing = [n for n in args.names if n not in registry]
    if missing:
        sys.exit(f"unknown queries: {missing}")

    def probe() -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            spark.range(0, 600_000_000, 1, 64).selectExpr("sum(id % 7) AS s").collect()
            best = min(best, time.perf_counter() - t0)
        return best

    def run_once(name: str) -> float:
        spark.sparkContext.setJobDescription(f"opt-r14:{name}")
        t0 = time.perf_counter()
        df = registry[name](spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        return dt

    # warm the session IO/codegen path once, then calibrate
    registry[args.names[0]](spark, args.sf).limit(1).count()
    probe()  # probe codegen warm-up, untimed
    cal_start = probe()
    print(f"cal_start={cal_start:.3f} load={os.getloadavg()[0]:.2f}", flush=True)

    for name in args.names:
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = registry[name](spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plans, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        for _ in range(args.warm):
            run_once(name)
        reps = [run_once(name) for _ in range(args.reps)]
        print(
            f"{name}: reps={[round(r, 3) for r in reps]} "
            f"min={min(reps):.3f} med={statistics.median(reps):.3f}",
            flush=True,
        )

    cal_end = probe()
    print(f"cal_end={cal_end:.3f} load={os.getloadavg()[0]:.2f}", flush=True)


if __name__ == "__main__":
    main()
