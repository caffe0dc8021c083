"""Round-11 greedy-encoder A/B: Arrow mapInPandas fold (the shipped
path, five consumers) vs the pure-JVM nested-aggregate fold
(tokenizer_greedy_subword_jvm) — on the standing 10x adversarial
corpus (documents 10x by doc_id*10+i, the r9/r10 recipe), interleaved
same-session reps.

Full-result checksums (sum of every count column + row count) are
asserted equal across arms each rep before any timing is trusted.

Run: nohup python tools/encoder_ab_r11.py > /tmp/enc_ab_r11.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ADV_DIR = "/tmp/adv10x_r11"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 3  # per arm, interleaved


def build_corpus() -> None:
    import duckdb

    os.makedirs(ADV_DIR, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
        COPY (
          SELECT d.doc_id * 10 + c.i AS doc_id,
                 CASE WHEN c.i = 0 THEN d.text
                      ELSE 'v' || c.i || ' ' || d.text END AS text,
                 d.lang, d.source, d.n_chars
          FROM '{SF_DIR}/documents.parquet' d,
               (SELECT unnest(range(10)) AS i) c
        ) TO '{ADV_DIR}/documents.parquet' (FORMAT PARQUET)
    """)
    n = con.execute(
        f"SELECT count(*) FROM '{ADV_DIR}/documents.parquet'"
    ).fetchone()[0]
    print(f"10x corpus: {n} docs at {ADV_DIR}", flush=True)


def main() -> None:
    from pyspark.sql import functions as F

    from sparkstreaming_rawdataingestion_spark import catalog, session
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        tokenizer_greedy_subword,
        tokenizer_greedy_subword_jvm,
    )

    build_corpus()
    spark = session.get_spark()
    d = catalog.load_table(spark, ADV_DIR, "documents")

    def run(arm: str):
        fn = (
            tokenizer_greedy_subword
            if arm == "arrow"
            else tokenizer_greedy_subword_jvm
        )
        t0 = time.monotonic()
        row = (
            fn(d)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("n_words").alias("w"),
                F.sum("n_tokens").alias("t"),
                F.sum("n_unk").alias("u"),
            )
            .collect()[0]
        )
        return time.monotonic() - t0, (row.n, row.w, row.t, row.u)

    expected = None
    for rep in range(REPS):
        for arm in ("arrow", "jvm"):
            secs, sums = run(arm)
            if expected is None:
                expected = sums
            assert sums == expected, f"{arm} checksums diverged: {sums}"
            print(f"{arm:6s} rep{rep} {secs:6.2f}s  checksum={sums}", flush=True)
    print(f"checksums identical across arms: {expected}")


if __name__ == "__main__":
    main()
