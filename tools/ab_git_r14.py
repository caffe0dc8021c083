"""Generic interleaved A/B: time a registry query as implemented at a
git ref (default HEAD) against the working tree, alternating within ONE
session so shared-host speed swings hit both variants equally.

The ref'd operator module is loaded under a throwaway module name with
the real package as its package context (relative imports resolve
against the installed package — only the module under test is swapped).

Usage:
  python tools/ab_git_r14.py --module operators.similarity \
      [--ref HEAD] [--reps 4] name [name ...]
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PKG = "sparkstreaming_rawdataingestion_spark"


def load_ref_module(module: str, ref: str):
    rel = f"{PKG}/{module.replace('.', '/')}.py"
    src = subprocess.check_output(["git", "show", f"{ref}:{rel}"], text=True)
    name = f"{PKG}.{module}_abref"
    spec = importlib.util.spec_from_loader(name, loader=None, origin=f"{ref}:{rel}")
    mod = importlib.util.module_from_spec(spec)
    mod.__package__ = f"{PKG}.{module.rsplit('.', 1)[0]}" if "." in module else PKG
    sys.modules[name] = mod
    exec(compile(src, f"{ref}:{rel}", "exec"), mod.__dict__)
    return mod


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--module", required=True, help="e.g. operators.similarity")
    ap.add_argument("--ref", default="HEAD")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from sparkstreaming_rawdataingestion_spark import session
    from sparkstreaming_rawdataingestion_spark.queries import all_queries
    from sparkstreaming_rawdataingestion_spark.session import get_spark

    spark = get_spark(app_name="ab-git-r14")
    registry = all_queries()
    legacy_mod = load_ref_module(args.module, args.ref)
    legacy_q = legacy_mod.QUERIES

    def run_once(fn) -> float:
        session.release_staged()
        t0 = time.perf_counter()
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    registry[args.names[0]](spark, args.sf).limit(1).count()  # warm IO

    for name in args.names:
        variants = (("legacy", legacy_q[name]), ("new", registry[name]))
        res: dict[str, list[float]] = {"legacy": [], "new": []}
        for label, fn in variants:  # one untimed warm-up each
            run_once(fn)
        for _ in range(args.reps):
            for label, fn in variants:
                spark.sparkContext.setJobDescription(f"ab:{name}:{label}")
                res[label].append(run_once(fn))
                spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: legacy={[round(r, 2) for r in res['legacy']]} "
            f"med={statistics.median(res['legacy']):.2f} | "
            f"new={[round(r, 2) for r in res['new']]} "
            f"med={statistics.median(res['new']):.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
