"""Round-9 adversarial 10x scale measurement for the round-8 pair
generators (VERDICT r8 item 2): dedup_line_level, source_overlap_matrix
and semantic_cluster_pairs (K sweep) on the 10-near-dup-copies corpus.

Corpus recipe (the round-5/6/7 protocol, ARCHITECTURE.md): every doc
becomes 10 — copy i>0 prefixes 'v<i> ' to the text, so the 9 copies
share every shifted line segment with EACH OTHER (line dfs explode to
9+) while cross-doc pair candidates grow ~100x. For the OVERLAP matrix
the copies rotate across sources (source = src<(orig + i) % 20>), so
every line family straddles up to 10 sources and the sources^2 pair
space saturates. For the SEMANTIC sweep, embeddings get 10 near-copies
(component 0 perturbed by 5e-4*i — cosine stays ~1), so within-cluster
pair counts grow ~100x and the (n/K)^2 bound is what's on trial.

Run: nohup python tools/adversarial_scale_r9.py > /tmp/adv_r9.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ADV_DIR = "/tmp/adv10x_r9"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_corpora() -> None:
    import duckdb

    os.makedirs(ADV_DIR, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
        COPY (
          SELECT d.doc_id * 10 + c.i AS doc_id,
                 CASE WHEN c.i = 0 THEN d.text
                      ELSE 'v' || c.i || ' ' || d.text END AS text,
                 d.lang,
                 'src' || ((CAST(substr(d.source, 4) AS BIGINT) + c.i) % 20)
                   AS source,
                 d.n_chars
          FROM '{SF_DIR}/documents.parquet' d,
               (SELECT unnest(range(10)) AS i) c
        ) TO '{ADV_DIR}/documents.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT e.vec_id * 10 + c.i AS vec_id,
                 list_transform(e.embedding, (x, j) ->
                   CASE WHEN j = 1 THEN x + 0.0005 * c.i ELSE x END)
                   AS embedding,
                 e.label
          FROM '{SF_DIR}/embeddings.parquet' e,
               (SELECT unnest(range(10)) AS i) c
        ) TO '{ADV_DIR}/embeddings.parquet' (FORMAT PARQUET)
    """)
    n_d = con.execute(
        f"SELECT count(*) FROM '{ADV_DIR}/documents.parquet'"
    ).fetchone()[0]
    n_e = con.execute(
        f"SELECT count(*) FROM '{ADV_DIR}/embeddings.parquet'"
    ).fetchone()[0]
    print(f"corpus built: {n_d} docs, {n_e} embeddings", flush=True)


def timed(label: str, fn) -> None:
    t0 = time.monotonic()
    n = fn().count()
    dt = time.monotonic() - t0
    per = f"  ({dt / n * 1e3:.3f} ms/row)" if n else ""
    print(f"{label}: {n} rows in {dt:.1f} s{per}", flush=True)


def main() -> None:
    build_corpora()

    from sparkstreaming_rawdataingestion_spark import catalog, session
    from sparkstreaming_rawdataingestion_spark.operators import dedup

    spark = session.get_spark()

    # warmup: one small pass so JIT/codegen init is off the books
    dedup.q_dedup_line_level(spark, "/root/testdata/sf0.001").count()
    session.release_staged()

    for sf, tag in ((SF_DIR, "1x"), (ADV_DIR, "10x")):
        timed(
            f"dedup_line_level {tag}",
            lambda sf=sf: dedup.q_dedup_line_level(spark, sf),
        )
        session.release_staged()
        timed(
            f"source_overlap_matrix {tag}",
            lambda sf=sf: dedup.q_source_overlap_matrix(spark, sf),
        )
        session.release_staged()

    for sf, tag in ((SF_DIR, "1x"), (ADV_DIR, "10x")):
        e = catalog.load_table(spark, sf, "embeddings")
        for k in (8, 32, 128):
            timed(
                f"semantic_cluster_pairs {tag} K={k}",
                lambda e=e, k=k: dedup.semantic_cluster_pairs(e, k=k),
            )
            session.release_staged()

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
