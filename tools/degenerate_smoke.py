"""Degenerate-input smoke over the ENTIRE query registry.

Builds a small adversarial dataset — constant scores, one-class label
slices, single-event users, identical timestamps, 40-day gaps, ids past
the int64×multiplier overflow line, empty/1-token/2-token documents,
all-universal-term documents, zero and constant embedding vectors,
FK-miss TPC-H samples — and runs every registered query against it,
asserting only "no crash". The oracle gate proves VALUE parity on
well-formed fixtures; this proves the engine cannot be killed by the
input classes those fixtures never contain (ANSI DIVIDE_BY_ZERO,
ARITHMETIC_OVERFLOW, INVALID_PARAMETER_VALUE — the round-6 review's
entire bug inventory).

Usage: python tools/degenerate_smoke.py [query ...]
Exit 0 = every query ran; nonzero = crashers listed on stdout.
"""

from __future__ import annotations

import datetime
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

D = datetime.datetime
SRC = "/root/testdata/sf0.001"


def build_fixture(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    # --- TPC-H side: tiny FK-lossy samples (joins may come up empty —
    # the point is they must not crash) ---
    for t in (
        "region nation customer supplier part orders lineitem".split()
    ):
        spark.read.parquet(f"{SRC}/{t}.parquet").limit(25).coalesce(
            1
        ).write.parquet(f"{out_dir}/{t}.parquet")

    # --- events: every degenerate slice at once ---
    ev_rows = []
    # constant-score, alternating class
    ev_rows += [
        (i, 1, D(2024, 1, 1, 0, 0, i), "purchase" if i % 2 else "view", 7.0, "{}")
        for i in range(8)
    ]
    # one-class user (all purchases), huge ids past the overflow line
    ev_rows += [
        (5_000_000_000 + i, 6_000_000_000, D(2024, 1, 2, 0, 0, i), "purchase", float(i), "{}")
        for i in range(6)
    ]
    # single-event user; same-instant burst; 40-day gap pair
    ev_rows += [(100, 3, D(2024, 1, 3), "click", 1.0, "{}")]
    ev_rows += [(200 + i, 4, D(2024, 1, 4, 12), "view", 2.0, "{}") for i in range(3)]
    ev_rows += [
        (300, 5, D(2024, 1, 1), "error", 0.0, "{}"),
        (301, 5, D(2024, 2, 10), "signup", 0.0, "{}"),
    ]
    spark.createDataFrame(
        ev_rows,
        "event_id long, user_id long, ts timestamp_ntz, "
        "event_type string, value double, props string",
    ).coalesce(1).write.parquet(f"{out_dir}/events.parquet")

    # --- documents: short/empty/universal-term docs on BOTH sides of
    # the contamination bench boundary ---
    from sparkstreaming_rawdataingestion_spark.operators.filters import (
        BENCH_MAX_DOC_ID,
    )

    # all ids ABOVE the contamination bench block and mutually unique
    # (duplicate doc_ids are a different failure mode, covered by the
    # try_divide guards, not this fixture)
    b = BENCH_MAX_DOC_ID
    doc_rows = [
        (1, "alpha beta gamma delta epsilon zeta", "en", "web", 35),
        (b + 11, "", "en", "web", 0),
        (b + 12, "one", "en", "web", 3),
        (b + 13, "two words", "de", "web", 9),
        (b + 14, "common words here", "es", "books", 17),
        (b + 15, "common words here", "en", "web", 17),
        (b + 16, "the quick brown fox jumps over the lazy dog", "en", "web", 44),
        (b + 17, "the quick brown fox jumps over the lazy dog", "en", "books", 44),
        (b + 18, "hi", "en", "web", 2),
    ]
    spark.createDataFrame(
        doc_rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{out_dir}/documents.parquet")

    # --- embeddings: a ZERO vector, two constant vectors, two normal ---
    dim = 64
    emb_rows = [
        (1, [0.0] * dim, 0),                       # zero norm
        (2, [1.0] * dim, 0),                       # constant
        (3, [1.0] * dim, 1),                       # duplicate of 2
        (4, [float(i % 7) - 3.0 for i in range(dim)], 1),
        (5, [float((i * 3) % 11) - 5.0 for i in range(dim)], 2),
    ]
    spark.createDataFrame(
        emb_rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(f"{out_dir}/embeddings.parquet")


def main() -> int:
    from sparkstreaming_rawdataingestion_spark.queries import all_queries
    from sparkstreaming_rawdataingestion_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    only = set(sys.argv[1:])
    qs = all_queries()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}

    tmp = tempfile.mkdtemp(prefix="degenerate_smoke_")
    try:
        build_fixture(spark, tmp)
        crashed: list[tuple[str, str]] = []
        import time

        for name, fn in qs.items():
            t0 = time.time()
            try:
                fn(spark, tmp).collect()
                status = "ok"
            except Exception as e:  # noqa: BLE001 — report, don't die
                crashed.append((name, f"{type(e).__name__}: {e}"))
                status = "CRASH"
            print(f"{status} {name} ({time.time() - t0:.1f}s)", flush=True)
        if crashed:
            print(f"\n{len(crashed)} CRASHED:")
            for name, err in crashed:
                print(f"  {name}: {err.splitlines()[0][:200]}")
            return 1
        print(f"\nALL {len(qs)} SURVIVED")
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
