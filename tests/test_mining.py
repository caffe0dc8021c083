"""Semantic invariants for the mining / dataset-prep operators
(operators/mining.py). Fixture parity is the DuckDB oracle's job; these
pin the math on crafted inputs built to hit the edges."""

from __future__ import annotations

import datetime
import os
import tempfile

from pyspark.sql import functions as F

D = datetime.datetime

EV_SCHEMA = (
    "event_id long, user_id long, ts timestamp_ntz, "
    "event_type string, value double, props string"
)

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write(df, tmp, name):
    df.write.parquet(os.path.join(tmp, f"{name}.parquet"))


def test_basket_pairs_counts_and_lift(spark):
    from sparkstreaming_rawdataingestion_spark.operators import mining

    rows = [
        # basket (1, day1): {a, b}; basket (2, day1): {a, b}; (3, day1): {a}
        (1, 1, D(2024, 1, 1, 1), "a", 0.0, "{}"),
        (2, 1, D(2024, 1, 1, 2), "b", 0.0, "{}"),
        (3, 1, D(2024, 1, 1, 3), "b", 0.0, "{}"),  # dup item, same basket
        (4, 2, D(2024, 1, 1, 1), "a", 0.0, "{}"),
        (5, 2, D(2024, 1, 1, 2), "b", 0.0, "{}"),
        (6, 3, D(2024, 1, 1, 1), "a", 0.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write(spark.createDataFrame(rows, EV_SCHEMA), tmp, "events")
        out = mining.q_market_basket_pairs(spark, tmp).collect()
    assert len(out) == 1
    r = out[0]
    # 3 baskets; a in 3, b in 2, {a,b} in 2
    assert (r.item_a, r.item_b) == ("a", "b")
    assert (r.n_pair, r.n_a, r.n_b) == (2, 3, 2)
    assert r.support == round(2 / 3, 6)
    assert r.lift == round(2 * 3 / (3 * 2), 6) == 1.0


def test_markov_rows_normalize_per_state(spark, sf_dir):
    from sparkstreaming_rawdataingestion_spark.operators import mining

    out = mining.q_markov_transitions(spark, sf_dir)
    sums = (
        out.groupBy("cur_state")
        .agg(F.round(F.sum("prob"), 4).alias("s"))
        .collect()
    )
    assert sums, "no transitions found"
    for r in sums:
        assert abs(r.s - 1.0) < 1e-3, (r.cur_state, r.s)


def test_markov_on_crafted_chain(spark):
    from sparkstreaming_rawdataingestion_spark.operators import mining

    # one user: a→b, b→a, a→b  (cross-user boundaries must NOT count)
    rows = [
        (1, 1, D(2024, 1, 1, 0, 0, 1), "a", 0.0, "{}"),
        (2, 1, D(2024, 1, 1, 0, 0, 2), "b", 0.0, "{}"),
        (3, 1, D(2024, 1, 1, 0, 0, 3), "a", 0.0, "{}"),
        (4, 1, D(2024, 1, 1, 0, 0, 4), "b", 0.0, "{}"),
        (5, 2, D(2024, 1, 1, 0, 0, 9), "c", 0.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write(spark.createDataFrame(rows, EV_SCHEMA), tmp, "events")
        got = {
            (r.cur_state, r.next_state): (r.n_trans, r.prob)
            for r in mining.q_markov_transitions(spark, tmp).collect()
        }
    assert got == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}


def test_psi_zero_on_identical_cohorts_and_flags_shift(spark):
    from sparkstreaming_rawdataingestion_spark.operators import mining

    stable, shifted = [], []
    eid = 0
    for cohort, base_day in ((0, 2), (1, 20)):
        for i in range(200):
            eid += 1
            # stable: same uniform ramp in both cohorts
            stable.append(
                (eid, 1, D(2024, 1, base_day, i % 24), "s", float(i % 100), "{}")
            )
            eid += 1
            # shifted: current cohort moves up by 80
            v = float(i % 100) + (80.0 if cohort else 0.0)
            shifted.append(
                (eid, 1, D(2024, 1, base_day, i % 24), "t", v, "{}")
            )
    with tempfile.TemporaryDirectory() as tmp:
        _write(
            spark.createDataFrame(stable + shifted, EV_SCHEMA), tmp, "events"
        )
        got = {
            r.event_type: (r.psi, r.drifted)
            for r in mining.q_psi_drift(spark, tmp).collect()
        }
    assert got["s"][0] < 0.01 and got["s"][1] is False
    assert got["t"][0] > 0.1 and got["t"][1] is True


def test_weighted_sample_favors_heavy_docs_and_is_deterministic(
    spark, sf_dir
):
    from sparkstreaming_rawdataingestion_spark.operators import mining

    sel = mining.q_weighted_sample_poisson(spark, sf_dir)
    a = sorted(r.doc_id for r in sel.collect())
    b = sorted(r.doc_id for r in sel.collect())
    assert a == b and len(a) == len(set(a))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mean_all = docs.agg(F.avg("n_chars")).first()[0]
    mean_sel = sel.agg(F.avg("weight")).first()[0]
    # inclusion probability ∝ length ⇒ the sample skews long
    assert mean_sel > mean_all


def test_training_shuffle_covers_each_epoch_once(spark, sf_dir):
    from sparkstreaming_rawdataingestion_spark.operators import mining

    out = mining.q_training_shuffle_order(spark, sf_dir)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    per_epoch = out.groupBy("epoch").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("doc_id").alias("nd"),
    ).collect()
    assert {r.epoch for r in per_epoch} == {0, 1}
    for r in per_epoch:
        assert r.n == n_docs and r.nd == n_docs
    # pos is 1..count contiguous inside each (epoch, bucket)
    bad = (
        out.groupBy("epoch", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("pos").alias("lo"),
            F.max("pos").alias("hi"),
            F.countDistinct("pos").alias("np"),
        )
        .where(
            (F.col("lo") != 1)
            | (F.col("hi") != F.col("n"))
            | (F.col("np") != F.col("n"))
        )
        .count()
    )
    assert bad == 0


def test_training_shuffle_epochs_decorrelate(spark, sf_dir):
    from sparkstreaming_rawdataingestion_spark.operators import mining

    out = mining.q_training_shuffle_order(spark, sf_dir)
    e0 = out.where("epoch = 0").select(
        "doc_id", F.col("bucket").alias("b0"), F.col("pos").alias("p0")
    )
    e1 = out.where("epoch = 1").select(
        "doc_id", F.col("bucket").alias("b1"), F.col("pos").alias("p1")
    )
    same = (
        e0.join(e1, "doc_id")
        .where("b0 = b1 AND p0 = p1")
        .count()
    )
    total = e0.count()
    assert same < total * 0.05  # <5% of docs land in the same slot


def test_unigram_logprob_ranks_rare_below_common(spark):
    from sparkstreaming_rawdataingestion_spark.operators import mining

    docs = [
        (1, "the the the the", "en", "s", 15),
        (2, "zqx vbn wky jfp", "en", "s", 15),  # all-rare tokens
    ] + [(10 + i, "the and of to", "en", "s", 13) for i in range(8)]
    with tempfile.TemporaryDirectory() as tmp:
        _write(spark.createDataFrame(docs, DOC_SCHEMA), tmp, "documents")
        got = {
            r.doc_id: r.avg_logprob
            for r in mining.q_unigram_logprob_quality(spark, tmp).collect()
        }
    assert got[2] < got[1] < 0.0
    assert all(r <= 0.0 for r in got.values())


def test_ewma_matches_hand_recurrence(spark):
    from sparkstreaming_rawdataingestion_spark.operators import mining
    from sparkstreaming_rawdataingestion_spark.operators.mining import (
        _EWMA_ALPHA as A,
    )

    xs = [10.0, 20.0, 0.0, 40.0]
    rows = [
        (i + 1, 1, D(2024, 1, 1, 0, 0, i + 1), "a", x, "{}")
        for i, x in enumerate(xs)
    ]
    # out-of-order arrival: recurrence must follow ts order, not event_id
    rows.append((99, 2, D(2024, 1, 1, 0, 0, 2), "a", 7.0, "{}"))
    rows.append((98, 2, D(2024, 1, 1, 0, 0, 1), "a", 1.0, "{}"))
    with tempfile.TemporaryDirectory() as tmp:
        _write(spark.createDataFrame(rows, EV_SCHEMA), tmp, "events")
        got = {
            r.event_id: r.ewma
            for r in mining.q_ewma_smoothing(spark, tmp).collect()
        }
    acc = xs[0]
    expect = [acc]
    for x in xs[1:]:
        acc = A * x + (1 - A) * acc
        expect.append(acc)
    for i, e in enumerate(expect):
        assert abs(got[i + 1] - e) < 1e-6
    assert got[98] == 1.0
    assert abs(got[99] - (A * 7.0 + (1 - A) * 1.0)) < 1e-6


def test_markov_and_ewma_match_python_reference_on_random_stream(spark):
    """Seeded random event soup: transition counts/probs and the EWMA
    fold must match independent pure-Python references exactly."""
    import random

    from sparkstreaming_rawdataingestion_spark.operators import mining

    rng = random.Random(1234)
    rows = []
    for eid in range(400):
        rows.append(
            (
                eid,
                rng.randrange(6),
                D(2024, 1, 1 + rng.randrange(20), rng.randrange(24),
                  rng.randrange(60), rng.randrange(60)),
                rng.choice("abcd"),
                round(rng.uniform(0, 100), 2),
                "{}",
            )
        )
    with tempfile.TemporaryDirectory() as tmp:
        _write(spark.createDataFrame(rows, EV_SCHEMA), tmp, "events")
        markov = {
            (r.cur_state, r.next_state): (r.n_trans, r.prob)
            for r in mining.q_markov_transitions(spark, tmp).collect()
        }
        ewma = {
            r.event_id: r.ewma
            for r in mining.q_ewma_smoothing(spark, tmp).collect()
        }

    # python reference: per-user (ts, event_id)-ordered sequences
    by_user: dict = {}
    for eid, uid, ts, et, val, _ in rows:
        by_user.setdefault(uid, []).append((ts, eid, et, val))
    trans: dict = {}
    expect_ewma: dict = {}
    a = mining._EWMA_ALPHA
    import math

    for seq in by_user.values():
        seq.sort()
        for (_, _, et1, _), (_, _, et2, _) in zip(seq, seq[1:]):
            trans[(et1, et2)] = trans.get((et1, et2), 0) + 1
        acc = None
        for _, eid, _, val in seq:
            acc = val if acc is None else a * val + (1 - a) * acc
            expect_ewma[eid] = math.floor(acc * 1e6 + 0.5) / 1e6
    totals: dict = {}
    for (c, _), n in trans.items():
        totals[c] = totals.get(c, 0) + n
    expect_markov = {
        k: (n, round(n / totals[k[0]], 6)) for k, n in trans.items()
    }
    assert markov == expect_markov
    assert ewma == expect_ewma


def test_temperature_mix_upweights_small_domains(spark, sf_dir):
    """τ=0.5 mixing: smaller domains get strictly higher keep rates,
    rates never exceed 1, and the selection is deterministic."""
    from sparkstreaming_rawdataingestion_spark.operators import mining

    out = mining.q_temperature_mix_sample(spark, sf_dir)
    rows = out.collect()
    again = {r.doc_id for r in out.collect()}
    assert {r.doc_id for r in rows} == again

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_by_lang = {
        r.lang: r.c
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    rate_by_lang = {}
    for r in rows:
        rate_by_lang.setdefault(r.lang, r.rate)
        assert 0.0 < r.rate <= 1.0
    langs = sorted(n_by_lang, key=n_by_lang.get)
    present = [l for l in langs if l in rate_by_lang]
    for small, big in zip(present, present[1:]):
        if n_by_lang[small] < n_by_lang[big]:
            assert rate_by_lang[small] >= rate_by_lang[big]


def test_exact_k_sampler_counts_and_stability(spark, sf_dir):
    from sparkstreaming_rawdataingestion_spark.operators import mining

    out = mining.q_sample_exact_k_per_group(spark, sf_dir)
    a = sorted((r.lang, r.doc_id) for r in out.collect())
    b = sorted((r.lang, r.doc_id) for r in out.collect())
    assert a == b
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sizes = {
        r.lang: r.c
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    got = {}
    for lang, _ in a:
        got[lang] = got.get(lang, 0) + 1
    for lang, n in sizes.items():
        assert got.get(lang, 0) == min(mining._EXACT_K, n)


def test_exact_k_sampler_uses_window_group_limit(spark, sf_dir):
    from sparkstreaming_rawdataingestion_spark import plans
    from sparkstreaming_rawdataingestion_spark.operators import mining

    df = mining.q_sample_exact_k_per_group(spark, sf_dir)
    assert "WindowGroupLimit" in plans.executed_plan(df)


def test_bigram_logprob_matches_hand_model(spark):
    """Crafted corpus: 'a b' (doc 1) and 'a b a c' (doc 2). Bigram
    counts: (a,b)=2, (b,a)=1, (a,c)=1 → ctx(a)=3, ctx(b)=1; V=3.
    α=1/2 smoothing → P(b|a)=(2+.5)/(3+1.5)=5/9, P(a|b)=(1+.5)/(1+1.5)=3/5,
    P(c|a)=(1+.5)/(3+1.5)=1/3."""
    import math

    from sparkstreaming_rawdataingestion_spark.operators import mining

    docs = [
        (1, "a b", "en", "s", 3),
        (2, "a b a c", "en", "s", 7),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write(spark.createDataFrame(docs, DOC_SCHEMA), tmp, "documents")
        out = {
            r.doc_id: r
            for r in mining.q_bigram_logprob_quality(spark, tmp).collect()
        }
    lp = {
        ("a", "b"): round(math.log((2 * 2 + 1) / (2 * 3 + 3)), 9),
        ("b", "a"): round(math.log((2 * 1 + 1) / (2 * 1 + 3)), 9),
        ("a", "c"): round(math.log((2 * 1 + 1) / (2 * 3 + 3)), 9),
    }
    assert out[1].n_bigrams == 1
    assert out[1].avg_logprob == round(lp[("a", "b")], 6)
    assert out[2].n_bigrams == 3
    expected = (lp[("a", "b")] + lp[("b", "a")] + lp[("a", "c")]) / 3
    assert out[2].avg_logprob == round(expected, 6)


def test_bigram_penalizes_shuffled_tokens_vs_unigram(spark):
    """The discriminating property over the unigram score: a document
    whose tokens are a corpus-typical multiset but in a never-seen
    order scores LOWER on the bigram model than the same tokens in the
    dominant order, while the unigram model cannot tell them apart."""
    from sparkstreaming_rawdataingestion_spark.operators import mining

    fluent = "the cat sat on the mat"
    # 20 fluent docs + 1 shuffled doc with the identical token multiset
    docs = [(i, fluent, "en", "s", 0) for i in range(20)]
    docs.append((99, "mat the on sat cat the", "en", "s", 0))
    with tempfile.TemporaryDirectory() as tmp:
        _write(spark.createDataFrame(docs, DOC_SCHEMA), tmp, "documents")
        bi = {
            r.doc_id: r.avg_logprob
            for r in mining.q_bigram_logprob_quality(spark, tmp).collect()
        }
        uni = {
            r.doc_id: r.avg_logprob
            for r in mining.q_unigram_logprob_quality(spark, tmp).collect()
        }
    assert bi[99] < bi[0], "shuffled doc must score below fluent docs"
    assert uni[99] == uni[0], "unigram model is order-blind by design"
