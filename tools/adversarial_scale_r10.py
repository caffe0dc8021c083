"""Round-10 adversarial 10x scale measurement for the round-9 pair
generators (VERDICT r9 item 4) plus the round-10 audio generator:
multimodal_image_dhash_pairs, decontamination_semantic_pairs /
_multiprobe, and multimodal_audio_fingerprint_pairs.

Corpus recipe (the standing protocol, ARCHITECTURE.md / tools/
adversarial_scale_r9.py): documents 10x by doc_id*10+i — for the
media generators this multiplies the FAMILY count 10x (media families
are doc_id//4 blocks, so the adversarial axis is band-bucket
occupancy: 16-bit band values collide across 10x more families and
the candidate join's bucket products are what is on trial, while
within-family structure stays the fixture's). Embeddings 10x by
near-copies (component 1 perturbed 5e-4*i, cosine ~1), so the decon
probes face ~10x hotter clusters on BOTH legs and emitted pairs grow
~100x — wall-per-emitted-pair is the honest metric when output is
the product.

Run: nohup python tools/adversarial_scale_r10.py > /tmp/adv_r10.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ADV_DIR = "/tmp/adv10x_r10"
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
                 d.lang, d.source, d.n_chars
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
    per = f"  ({dt / n * 1e3:.3f} ms/pair)" if n else ""
    print(f"{label}: {n} rows in {dt:.1f} s{per}", flush=True)


def main() -> None:
    build_corpora()

    from sparkstreaming_rawdataingestion_spark import session
    from sparkstreaming_rawdataingestion_spark.operators import (
        dedup,
        multimodal,
    )

    spark = session.get_spark()

    # warmup: one small pass so JIT/codegen init is off the books
    multimodal.q_multimodal_image_dhash_pairs(
        spark, "/root/testdata/sf0.001"
    ).count()
    session.release_staged()

    for sf, tag in ((SF_DIR, "1x"), (ADV_DIR, "10x")):
        timed(
            f"image_dhash_pairs {tag}",
            lambda sf=sf: multimodal.q_multimodal_image_dhash_pairs(
                spark, sf
            ),
        )
        session.release_staged()
        timed(
            f"audio_fingerprint_pairs {tag}",
            lambda sf=sf: multimodal.q_multimodal_audio_fingerprint_pairs(
                spark, sf
            ),
        )
        session.release_staged()
        timed(
            f"decon_semantic exact {tag}",
            lambda sf=sf: dedup.q_decontamination_semantic_pairs(spark, sf),
        )
        session.release_staged()
        timed(
            f"decon_semantic multiprobe {tag}",
            lambda sf=sf: dedup.q_decontamination_semantic_multiprobe(
                spark, sf
            ),
        )
        session.release_staged()

    print("DONE", flush=True)


if __name__ == "__main__":
    main()