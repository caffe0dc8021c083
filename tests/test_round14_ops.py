"""Round-14 operator tests.

* sketch_mg_portable_heavyhitters — the deterministic mergeable
  Misra-Gries twin: closed-form hand fixture (expectations derived by
  pencil, neither engine involved), the MG guarantee pins at registry
  scale, and a pure-python replay of the full hashed pipeline.
* multimodal_audio_rational_containment — the 4/3 ZOH-resampled rung:
  per-family closed-form offset pins, a pure-Python replay on the
  round-13 hand corpus resampled 4/3, and the guard contracts.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


# ---------------------------------------------------------------------------
# Closed-form hand fixture: k=2 counters, 2 shards.
#
# Shard 0: item 1 x5, item 2 x3, item 3 x2, item 4 x1
#   ranked counts desc: 5, 3, 2, 1 -> t0 = 3rd largest = 2
#   partials: item1 -> 3, item2 -> 1 (items 3,4 pruned to <= 0)
# Shard 1: item 2 x4, item 3 x4, item 1 x1
#   ranked: 4, 4, 1 -> t1 = 3rd largest = 1
#   partials: item2 -> 3, item3 -> 3 (item1 pruned)
# Merge: g = {item1: 3, item2: 4, item3: 3}
#   ranked desc by (g, item): (2,4), (1,3), (3,3) -> t2 = 3rd = 3
#   summary: item2 -> 1 (items 1,3 pruned to 0)
# Stats: n = 20; sum_t = 2 + 1 = 3; deficit_budget = 3 + 3 = 6
#   (k+1) * budget = 18 <= 20  (the mergeable-summaries inequality)
# Exact: item1=6, item2=7, item3=6, item4=1
#   deficit(item2) = 7 - 1 = 6 <= 6  (tight at this fixture!)
#   heavies (count*3 > 20): item2 only (21) -> retained in summary.
# ---------------------------------------------------------------------------

def test_mg_portable_hand_fixture(spark):
    from sparkstreaming_rawdataingestion_spark.operators.stats import (
        mg_portable_summary,
    )

    rows = []
    rows += [(1, 0)] * 5 + [(2, 0)] * 3 + [(3, 0)] * 2 + [(4, 0)] * 1
    rows += [(2, 1)] * 4 + [(3, 1)] * 4 + [(1, 1)] * 1
    df = spark.createDataFrame(rows, "item long, shard int")

    summary, stats = mg_portable_summary(df, k=2)
    got = {r["item"]: r["mg_estimate"] for r in summary.collect()}
    assert got == {2: 1}
    st = stats.collect()[0]
    assert st["n_rows"] == 20
    assert st["deficit_budget"] == 6
    # the mergeable-summaries inequality, pencil-checked above
    assert (2 + 1) * st["deficit_budget"] <= st["n_rows"]


def test_mg_portable_no_prune_passthrough(spark):
    """Fewer distinct items than counters at every level: both prune
    subtrahends are 0 and the summary must equal the exact counts —
    the degenerate case where MG is lossless."""
    from sparkstreaming_rawdataingestion_spark.operators.stats import (
        mg_portable_summary,
    )

    rows = [(1, 0)] * 4 + [(2, 0)] * 2 + [(1, 1)] * 3 + [(2, 1)] * 1
    df = spark.createDataFrame(rows, "item long, shard int")
    summary, stats = mg_portable_summary(df, k=5)
    got = {r["item"]: r["mg_estimate"] for r in summary.collect()}
    assert got == {1: 7, 2: 3}
    st = stats.collect()[0]
    assert st["deficit_budget"] == 0


def test_mg_portable_registry_guarantees(spark, sf_dir):
    """The MG guarantees at registry scale, checked from the output
    columns themselves: underestimate per row, deficit within the
    in-row budget, the (K+1)*budget <= n structural inequality, every
    true heavy hitter retained, and the summary bounded by K rows."""
    from sparkstreaming_rawdataingestion_spark.operators.stats import (
        MGP_K,
        q_sketch_mg_portable_heavyhitters,
    )

    out = q_sketch_mg_portable_heavyhitters(spark, sf_dir).collect()
    assert 0 < len(out) <= MGP_K
    first = out[0]
    assert first["n_true_heavy"] == first["n_true_heavy_retained"]
    assert first["n_true_heavy"] >= 1  # the Zipf head IS heavy
    assert (MGP_K + 1) * first["deficit_budget"] <= first["n_rows"]
    for r in out:
        assert r["mg_estimate"] > 0
        assert 0 <= r["deficit"] <= r["deficit_budget"]
        assert r["mg_estimate"] <= r["exact_count"]
    # the Zipf head (item 1 draws ~half the stream) must dominate
    top = max(out, key=lambda r: r["mg_estimate"])
    assert top["item"] == 1
    assert top["exact_count"] * 3 > first["n_rows"]


def test_mg_portable_pure_python_replay(spark, sf_dir):
    """Replay the ENTIRE hashed pipeline (lowbias item/shard map,
    per-shard prune, merge, final prune) in plain Python over the
    parquet file and require bit-identical summary rows — the
    cross-engine certificate that does not rely on DuckDB either."""
    import duckdb

    from sparkstreaming_rawdataingestion_spark.operators.stats import (
        _HLLP_FOLD,
        _HLLP_M32,
        _HLLP_MUL,
        _HLLP_ROUNDS,
        _MGP_SALT,
        MGP_K,
        MGP_S,
        MGP_ZIPF_C,
        q_sketch_mg_portable_heavyhitters,
    )

    def lowbias(x: int) -> int:
        h = x % _HLLP_M32
        for _ in range(_HLLP_ROUNDS):
            h = (h ^ (h >> _HLLP_FOLD)) * _HLLP_MUL % _HLLP_M32
        return h ^ (h >> _HLLP_FOLD)

    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT event_id FROM '{sf_dir}/events.parquet'"
        ).fetchall()
    ]
    from collections import Counter

    shard_counts: dict[int, Counter] = {}
    exact: Counter = Counter()
    for e in ids:
        item = MGP_ZIPF_C // (1 + lowbias(e) % MGP_ZIPF_C)
        shard = lowbias(e + 1 * _MGP_SALT) % MGP_S
        shard_counts.setdefault(shard, Counter())[item] += 1
        exact[item] += 1

    def prune(c: Counter, k: int) -> tuple[Counter, int]:
        vals = sorted(c.values(), reverse=True)
        t = vals[k] if len(vals) > k else 0
        kept = Counter({i: v - t for i, v in c.items() if v - t > 0})
        return kept, t

    merged: Counter = Counter()
    sum_t = 0
    for s in shard_counts:
        kept, t = prune(shard_counts[s], MGP_K)
        sum_t += t
        merged.update(kept)
    summary, t2 = prune(merged, MGP_K)

    out = q_sketch_mg_portable_heavyhitters(spark, sf_dir).collect()
    got = {r["item"]: r["mg_estimate"] for r in out}
    assert got == dict(summary)
    first = out[0]
    assert first["deficit_budget"] == sum_t + t2
    assert first["n_rows"] == len(ids)
    for r in out:
        assert r["exact_count"] == exact[r["item"]]


# ---------------------------------------------------------------------------
# multimodal_audio_rational_containment
# ---------------------------------------------------------------------------

def _rational_expected_offset(S: int) -> int:
    """Closed form derived in the operator docstring: exactly one
    window-residue class is phase-pure per S mod 4, voting
    S - (1 if S % 4 == 1 else 0)."""
    return S - (1 if S % 4 == 1 else 0)


def test_rational_registry_fixture_offsets(spark, sf_dir):
    """Registry-scale pin: every 4/3-ZOH-resampled excerpt reports its
    own original at the derived ZOH grid point with n_exact = 2
    (archive windows 128 and 256) and hamming 0."""
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        _afps_off_samples,
        q_multimodal_audio_rational_containment,
    )

    rows = q_multimodal_audio_rational_containment(
        spark, sf_dir
    ).collect()
    true_rows = {
        r.media_q: r for r in rows if r.media_r == r.media_q - 1
    }
    n_docs = max(r.media_q for r in rows) + 1
    assert len(true_rows) >= n_docs // 2 - 1
    for mq, r in true_rows.items():
        S = _afps_off_samples(mq // 2)
        assert r.offset_samples == _rational_expected_offset(S)
        assert r.n_exact == 2
        assert r.n_aligned >= 2
        assert r.min_hamming == 0


def test_rational_hand_fixture_replay(spark):
    """Pure-Python replay of the rational pipeline on the round-13
    hand corpus: ZOH-resample the sample-43 excerpt at 4/3
    (probe[t] = excerpt[(4*t)//3]), fingerprint with 6-sample
    analysis frames at sample hop 1, run the pair algebra with the
    rational offset mapping ur - (4*uq)//3 — the engine must agree
    exactly, and the true pair lands at offset 43 (43 % 4 == 3: the
    pure class is exact at S itself) with n_exact = 2, hamming 0."""
    from test_round13_ops import _sub_prints, _subframe_samples

    from sparkstreaming_rawdataingestion_spark.operators import (
        media_codecs,
    )
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        audio_subframe_alignment,
        audio_subframe_fingerprint_bands,
    )

    orig, excerpt, control, s0 = _subframe_samples()
    zoh = [excerpt[(4 * t) // 3] for t in range((784 * 3) // 4)]

    probe = {(1, u): v for u, v in _sub_prints(zoh, 1, fs=6).items()}
    archive = {
        (m, u): v
        for m, smp in ((0, orig), (2, control))
        for u, v in _sub_prints(smp, 128).items()
    }
    from collections import defaultdict

    votes: dict = defaultdict(lambda: defaultdict(list))
    for (mq, uq), (pb, ph, ps) in probe.items():
        for (mr, ur), (ab, ah, asum) in archive.items():
            if mq == mr or not any(x == y for x, y in zip(pb, ab)):
                continue
            ham = sum(bin(x ^ y).count("1") for x, y in zip(pb, ab))
            if ham > 3:
                continue
            exact = 1 if ph * asum == ps * ah else 0
            votes[(mq, mr)][ur - (4 * uq) // 3].append((ham, exact))
    expected = {}
    for pair, offs in votes.items():
        ne, na, mh, o = sorted(
            (
                -sum(e for _, e in hs),
                -len(hs),
                min(h for h, _ in hs),
                o,
            )
            for o, hs in offs.items()
        )[0]
        expected[pair] = (o, -na, -ne, mh)

    media = spark.createDataFrame(
        [
            (0, "audio/wav", media_codecs.wav_encode(orig)),
            (1, "audio/wav", media_codecs.wav_encode(zoh)),
            (2, "audio/wav", media_codecs.wav_encode(control)),
        ],
        "media_id long, mime string, payload binary",
    )
    got = {
        (r.media_q, r.media_r): (
            r.offset_samples,
            r.n_aligned,
            r.n_exact,
            r.min_hamming,
        )
        for r in audio_subframe_alignment(
            audio_subframe_fingerprint_bands(
                media.where("media_id = 1"),
                frame_size=6,
                rate_num=4,
                rate_den=3,
            ),
            audio_subframe_fingerprint_bands(
                media.where("media_id != 1"), sample_hop=128
            ),
            probe_rate=4,
            probe_rate_den=3,
        ).collect()
    }
    assert got == expected
    exp = expected[(1, 0)]
    assert exp[0] == _rational_expected_offset(s0) == 43
    assert exp[2] == 2  # n_exact
    assert exp[3] == 0  # min_hamming


def test_rational_frame_span_guard():
    """The generalized guard: frame_size * rate_num must equal
    8 * rate_den; the integer-decimation divisibility guard is
    unchanged when no ratio is declared."""
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        audio_subframe_fingerprint_bands,
    )

    with pytest.raises(Exception, match="must divide"):
        audio_subframe_fingerprint_bands(None, frame_size=3)
    with pytest.raises(Exception, match="span exactly one original"):
        audio_subframe_fingerprint_bands(
            None, frame_size=5, rate_num=4, rate_den=3
        )
    with pytest.raises(Exception, match="rate/rate_den"):
        from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
            _afps_ctes,
        )

        _afps_ctes(rate=5, rate_den=3)


def test_interpolating_resample_boundary_adjudication():
    """The adjudicated boundary of the audio ladder (ARCHITECTURE.md
    round 14), MEASURED on the hand corpus: a LINEAR-interpolation 4/3
    resampler (probe time 4t/3 mixes adjacent samples, rounded to int
    as a real resampler quantizes to PCM) still matches the archive at
    the SIGN tier — band candidates survive, best hamming 0 at the
    true windows — but the exact-scale BIGINT invariant is destroyed:
    n_exact == 0 (division by the interpolation denominator plus
    rounding leaves exact-integer territory, so no rational scale
    relates probe and archive energies). ZOH at the same ratio keeps
    n_exact == 2. Interpolated probes therefore degrade to the
    blend-luck-prone sign-vote tier and CANNOT be hash-certified —
    the reason the rational rung is ZOH-only."""
    from test_round13_ops import _sub_prints, _subframe_samples

    orig, excerpt, control, s0 = _subframe_samples()
    zoh = [excerpt[(4 * t) // 3] for t in range((784 * 3) // 4)]
    lin = []
    for t in range((784 * 3) // 4):
        i, a = divmod(4 * t, 3)
        if a == 0:
            lin.append(excerpt[i])
        else:
            lin.append(
                int(round(((3 - a) * excerpt[i] + a * excerpt[i + 1]) / 3))
            )

    archive = _sub_prints(orig, 128)

    def pair_stats(probe_samples):
        probe = _sub_prints(probe_samples, 1, fs=6)
        n_ham0 = n_exact = 0
        for (pb, ph, ps) in probe.values():
            for (ab, ah, asum) in archive.values():
                if not any(x == y for x, y in zip(pb, ab)):
                    continue
                ham = sum(bin(x ^ y).count("1") for x, y in zip(pb, ab))
                if ham > 3:
                    continue
                if ham == 0:
                    n_ham0 += 1
                if ph * asum == ps * ah:
                    n_exact += 1
        return n_ham0, n_exact

    assert pair_stats(zoh) == (2, 2)  # supported class: exact tier
    assert pair_stats(lin) == (2, 0)  # boundary: sign tier only
