"""Local emulation of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at the given sf dir, comparing row count, column names and an
order-insensitive value multiset (columns sorted by name, rows sorted).

Usage: python tools/check_oracles.py [--plain] [sf_dir] [query ...]

``--plain`` runs against a bare SparkSession (no UTC pin, no
nanosAsLong, default shuffle partitions) — the worst-case driver
environment; queries must pass BOTH ways before entering CORE_ORDER.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def normalize(v):
    import datetime
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # tolerate last-ulp float noise between engines
        return f"{v:.10g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(normalize(x) for x in v)
    return v


def main() -> int:
    import duckdb

    import __spark_entry__ as e

    args = [a for a in sys.argv[1:] if a != "--plain"]
    plain = "--plain" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    if plain:
        # worst-case driver simulation: a bare session; queries() still
        # applies tune_for_session, catalog handles the nanos fallback
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[16]")
            .appName("check-oracles-plain")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
    else:
        from sparkstreaming_rawdataingestion_spark.session import get_spark

        spark = get_spark()
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    from sparkstreaming_rawdataingestion_spark.queries import CORE_ORDER

    # the driver hash-checks the first 50 registry entries; its pandas
    # canonicalizer dies on list/map/struct cells (round-1
    # udf_approx_sketches, round-3 array packs) — so a complex-typed
    # top-level column inside the window is a FAILURE here even when the
    # value multiset matches (normalize() below is more lenient than the
    # driver: it tuples lists).
    window = set(CORE_ORDER[:50])

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            complex_cols = [
                f.name
                for f in sdf.schema.fields
                if f.dataType.typeName() in ("array", "map", "struct")
            ]
            if complex_cols and name in window:
                print(
                    f"FAIL {name}: driver-window query returns complex-typed "
                    f"columns {complex_cols} (driver canonicalizer cannot "
                    f"hash them) — serialize with array_join/to_json"
                )
                failures += 1
                continue
            srows = sdf.collect()
            scols = sorted(sdf.columns)
            sset = sorted(
                (tuple(normalize(r[c]) for c in scols) for r in srows),
                key=repr,
            )
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"PASS {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols_raw = [d[0] for d in cur.description]
            drows = cur.fetchall()
            order = sorted(range(len(dcols_raw)), key=lambda i: dcols_raw[i])
            dcols = sorted(dcols_raw)
            dset = sorted(
                (tuple(normalize(r[i]) for i in order) for r in drows),
                key=repr,
            )
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failures += 1
            continue
        problems = []
        if scols != dcols:
            problems.append(f"columns {scols} != {dcols}")
        if len(sset) != len(dset):
            problems.append(f"rowcount {len(sset)} != {len(dset)}")
        if not problems and sset != dset:
            diff = [(a, b) for a, b in zip(sset, dset) if a != b][:3]
            problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"PASS {name}: {len(sset)} rows match "
                  f"({time.time()-t0:.1f}s)")
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
