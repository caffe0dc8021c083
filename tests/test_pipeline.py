"""Curation-pipeline invariants the DuckDB oracle can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_rawdataingestion_spark import plans
from sparkstreaming_rawdataingestion_spark.operators import pipeline


def test_funnel_monotonically_shrinks(spark, sf_dir):
    rows = sorted(
        pipeline.q_pipeline_curation_funnel(spark, sf_dir).collect(),
        key=lambda r: r.stage_no,
    )
    counts = [r.n_docs for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert counts[-1] > 0  # pipeline keeps something


def test_final_set_properties(spark, sf_dir):
    out = pipeline.q_pipeline_curation(spark, sf_dir)
    rows = out.collect()
    assert all(r.predicted_lang == "en" for r in rows)
    assert all(r.quality_score >= pipeline.QUALITY_MIN for r in rows)
    # exact dedup happened: doc_ids unique
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))


def test_curation_is_idempotent(spark, sf_dir):
    """Running the pipeline's dedup stages over an already-curated set
    must be a no-op (the property that makes incremental re-curation of a
    growing corpus safe)."""
    final = pipeline._stages(spark, sf_dir)["near_dedup"]
    again = final.join(pipeline._near_dropped(final), "doc_id", "left_anti")
    assert again.count() == final.count()


def test_no_python_udf_in_plan(spark, sf_dir):
    """The whole funnel stays JVM-side: no BatchEvalPython / ArrowEval
    stages (UDFs would break whole-stage codegen in the hot path)."""
    plan = plans.executed_plan(pipeline.q_pipeline_curation(spark, sf_dir))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_exact_dedup_partitions_by_digest_not_text(spark, sf_dir):
    """Plan pin for the exact-dedup stage: the window's shuffle key must
    be sha2(text) — a fixed 64-char digest — never the raw document body
    (partitioning 100 TB of rows by full text is the payload-heavy
    shuffle dedup_exact_hash exists to avoid)."""
    import re

    staged = pipeline._exact_kept(pipeline._scored(spark, sf_dir))
    plan = plans.executed_plan(staged)
    # the digest is projected (as _w0) before the exchange...
    assert re.search(r"sha2\(cast\(text#\d+ as binary\), 256\)", plan)
    # ...and no exchange partitions directly on the raw text column
    for m in re.finditer(r"hashpartitioning\(([^)]*)\)", plan):
        assert not re.search(r"\btext#\d+", m.group(1))


def test_training_build_composes_stages_consistently(spark, sf_dir):
    """The manifest must be a subset of the curated set, carry each kept
    doc exactly once with contiguous per-bucket positions, and its keep
    decisions must equal temperature-mix algebra applied to the curated
    survivors' source counts."""
    import math

    from pyspark.sql import functions as F

    from sparkstreaming_rawdataingestion_spark.operators import pipeline
    from sparkstreaming_rawdataingestion_spark.operators.mining import _MMH2

    manifest = pipeline.q_pipeline_training_build(spark, sf_dir).collect()
    curated = {
        r.doc_id
        for r in pipeline.q_pipeline_curation(spark, sf_dir).collect()
    }
    ids = [r.doc_id for r in manifest]
    assert len(ids) == len(set(ids))
    assert set(ids) <= curated

    # contiguous positions inside each bucket
    by_bucket: dict = {}
    for r in manifest:
        by_bucket.setdefault(r.bucket, []).append(r.pos)
    for poss in by_bucket.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))

    # python replay of the mix decision on the curated survivors
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    src_of = {r.doc_id: r.source for r in docs}
    n_s: dict = {}
    for d in curated:
        n_s[src_of[d]] = n_s.get(src_of[d], 0) + 1
    w = {s: round(math.sqrt(n), 9) for s, n in n_s.items()}
    sum_w = sum(w.values())
    rate = {
        s: min(1.0, (pipeline._BUILD_TARGET * w[s] / sum_w) / n_s[s])
        for s in n_s
    }
    expect = {
        d
        for d in curated
        if ((d % 4294967296) * _MMH2 % 4294967296 + 0.5) / 4294967296.0
        < rate[src_of[d]]
    }
    assert set(ids) == expect
