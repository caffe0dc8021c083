"""Property-based checks (hypothesis) for the round-8 formula
operators — guarantees that hold for ALL inputs, verified against
independent pure-Python models (the round-6 lesson: an oracle that
shares the formula cannot catch a shared transcription bug; an
independent model can)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings, strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# eval_pass_at_k — vs the exact combinatorial definition
# ---------------------------------------------------------------------------


@settings(**_SETTINGS)
@given(
    tasks=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=500),   # n
            st.floats(min_value=0.0, max_value=1.0),   # correct fraction
        ),
        min_size=1,
        max_size=12,
    ),
    k=st.integers(min_value=1, max_value=8),
)
def test_pass_at_k_matches_combinatorial_definition(spark, tasks, k):
    """The fold must agree with the DEFINITION 1 - C(n-c,k)/C(n,k)
    (exact rationals via math.comb) to float precision, stay in [0,1],
    hit exactly 1 when n-c < k, and equal c/n at k=1."""
    from sparkstreaming_rawdataingestion_spark.operators.evaluation import (
        eval_pass_at_k,
    )

    rows = []
    for t, (n, frac) in enumerate(tasks):
        c = min(n, int(round(frac * n)))
        rows += [(t, "purchase")] * c + [(t, "view")] * (n - c)
    ev = spark.createDataFrame(rows, "user_id long, event_type string")
    got = {
        r.task_id: (r.n_samples, r.n_correct, r[f"pass_at_{k}"], r.pass_at_1)
        for r in eval_pass_at_k(ev, ks=(k, 1), min_samples=1).collect()
    }
    for t, (n, frac) in enumerate(tasks):
        c = min(n, int(round(frac * n)))
        if n < max(k, 1):
            assert t not in got
            continue
        ns, nc, pk, p1 = got[t]
        assert (ns, nc) == (n, c)
        exact = 1.0 - math.comb(n - c, k) / math.comb(n, k) if n - c >= k else 1.0
        assert 0.0 <= pk <= 1.0
        assert abs(pk - exact) <= 2e-6
        if n - c < k:
            assert pk == 1.0
        assert abs(p1 - c / n) <= 2e-6


# ---------------------------------------------------------------------------
# dedup_incremental_census — vs a pure-python dict model
# ---------------------------------------------------------------------------


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2", "s3"]),
            st.one_of(st.none(), st.sampled_from(["A", "B", "C", "D"])),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_incremental_census_matches_python_model(spark, docs):
    """Independent model: first source per text (None included as its
    own equality class) decides novelty; conservation law holds; the
    global novel total equals the number of distinct texts."""
    from sparkstreaming_rawdataingestion_spark.operators.dedup import (
        incremental_census,
    )

    df = spark.createDataFrame(
        [(i, t, s) for i, (s, t) in enumerate(docs)],
        "doc_id long, text string, source string",
    )
    first: dict = {}
    for s, t in sorted(docs, key=lambda p: p[0]):  # ingest order
        first.setdefault(t, s)
    model: dict = {}
    seen_first_copy: set = set()
    for s, t in docs:
        m = model.setdefault(s, [0, 0, 0, 0])  # docs, earlier, novel, within
        m[0] += 1
        if first[t] < s:
            m[1] += 1
        elif t not in seen_first_copy:
            seen_first_copy.add(t)
            m[2] += 1
        else:
            m[3] += 1
    got = {
        r.source: [
            r.n_docs, r.n_dup_of_earlier, r.n_novel_unique, r.n_dup_within
        ]
        for r in incremental_census(df).collect()
    }
    assert got == model
    for n, de, nu, dw in got.values():
        assert n == de + nu + dw
    assert sum(v[2] for v in got.values()) == len({t for _, t in docs})


# ---------------------------------------------------------------------------
# embedding int8 — code range, reconstruction bound, report consistency
# ---------------------------------------------------------------------------


@settings(**_SETTINGS)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-100.0,
                max_value=100.0,
                allow_nan=False,
                width=32,
            ),
            min_size=1,
            max_size=16,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_int8_quantize_bounds_and_report(spark, vecs):
    """For EVERY vector: codes stay in [-127, 127]; per-dimension
    reconstruction error is bounded by half a quantization step
    (amax/254, plus float slack); zero vectors emit zero codes; and
    the report's worst-dim error agrees with the codes' own
    reconstruction."""
    from sparkstreaming_rawdataingestion_spark.operators.similarity import (
        embedding_int8_quantize,
        embedding_int8_report,
    )

    e = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id long, embedding array<float>"
    )
    codes = {r.vec_id: (r.codes, r.amax) for r in
             embedding_int8_quantize(e).collect()}
    report = {r.vec_id: r for r in embedding_int8_report(e).collect()}
    for vid, vec in enumerate(vecs):
        cs, amax = codes[vid]
        f32 = [float(x) for x in
               spark.createDataFrame([(vec,)], "v array<float>")
               .selectExpr("transform(v, x -> CAST(x AS DOUBLE)) v")
               .collect()[0].v]
        assert amax == max((abs(x) for x in f32), default=0.0)
        assert all(-127 <= c <= 127 for c in cs)
        if amax == 0.0:
            assert cs == [0] * len(vec)
            assert report[vid].mse_ppm == 0.0
            continue
        step = amax / 127.0
        worst = max(
            abs(x - c * step) for x, c in zip(f32, cs)
        )
        assert worst <= step / 2 + 1e-12
        # report's worst-dim error (ppm) matches the codes' own
        # reconstruction to rounding
        assert abs(report[vid].max_abs_err_ppm - worst * 1e6) <= 1e-3


# ---------------------------------------------------------------------------
# ccnet buckets — ordering invariant within every language
# ---------------------------------------------------------------------------


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["en", "fr"]),
            st.lists(
                st.sampled_from(["a", "b", "c", "d", "e"]),
                min_size=1,
                max_size=6,
            ),
        ),
        min_size=1,
        max_size=15,
    )
)
def test_ccnet_bucket_ordering_invariant(spark, docs):
    """With the full population as the sample, buckets are totally
    ordered by score within every language: min(head) > max(middle)
    > ... (ties break UPWARD by construction, so bucket score ranges
    never interleave), and at least one doc per language is head."""
    from sparkstreaming_rawdataingestion_spark.operators.mining import (
        ccnet_perplexity_buckets,
    )

    df = spark.createDataFrame(
        [(i, " ".join(toks), lang) for i, (lang, toks) in enumerate(docs)],
        "doc_id long, text string, lang string",
    )
    rows = ccnet_perplexity_buckets(df, sample_pct=100).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, {}).setdefault(r.bucket, []).append(
            r.avg_logprob
        )
    for lang, buckets in by_lang.items():
        assert "head" in buckets
        if "head" in buckets and "middle" in buckets:
            assert min(buckets["head"]) > max(buckets["middle"])
        if "middle" in buckets and "tail" in buckets:
            assert min(buckets["middle"]) > max(buckets["tail"])
        if "head" in buckets and "tail" in buckets:
            assert min(buckets["head"]) > max(buckets["tail"])
