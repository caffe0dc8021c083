"""Property-based checks (hypothesis) for the simulated broker's pure
planning functions — the guarantees every engine call path relies on,
for ALL inputs: minPartitions splits exactly cover the original ranges,
and offsets resolution always lands inside the log bounds."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from sparkstreaming_rawdataingestion_spark.sources.kafka_sim import (
    _resolve_offsets_option,
    _Slice,
    _split_to_min_partitions,
)

_SETTINGS = dict(max_examples=200, deadline=None)


@settings(**_SETTINGS)
@given(
    ranges=st.lists(
        st.tuples(
            st.integers(0, 3),  # partition
            st.integers(0, 50),  # start
            st.integers(1, 200),  # width
        ),
        min_size=1,
        max_size=6,
        unique_by=lambda t: t[0],
    ),
    min_parts=st.integers(1, 64),
)
def test_min_partitions_split_is_an_exact_cover(ranges, min_parts):
    """For ANY slice set and ANY requested count: the split (a) covers
    exactly the same (topic, partition, offset) points — no loss, no
    overlap, no invention; (b) reaches the requested count unless every
    remaining slice is already width 1; (c) never emits an empty slice."""
    slices = [_Slice("t", p, f"/log/t/p{p}.jsonl", s, s + w) for p, s, w in ranges]
    out = _split_to_min_partitions(list(slices), min_parts)

    def points(ss):
        pts = []
        for s in ss:
            pts.extend((s.part, o) for o in range(s.start, s.end))
        return sorted(pts)

    assert points(out) == points(slices)  # exact, non-overlapping cover
    assert len(points(out)) == sum(s.end - s.start for s in out)
    assert all(s.end > s.start for s in out)
    total_width = sum(w for _, _, w in ranges)
    assert len(out) >= min(min_parts, total_width)


@settings(**_SETTINGS)
@given(
    counts=st.dictionaries(
        st.sampled_from(["a:0", "a:1", "b:0"]),
        st.integers(0, 100),
        min_size=1,
    ),
    requested=st.dictionaries(
        st.sampled_from(["a:0", "a:1", "b:0"]),
        st.integers(-2, 150),
        min_size=0,
    ),
)
def test_offsets_resolution_always_inside_log_bounds(counts, requested):
    """For ANY log state and ANY per-partition request (sentinels
    included): every resolved offset is within [0, count], earliest and
    latest resolve exactly, and requests past the end clamp to it."""
    import json

    spec: dict = {}
    for tp, off in requested.items():
        if tp not in counts:
            continue  # unknown keys are a separate (raising) contract
        topic, _, part = tp.rpartition(":")
        spec.setdefault(topic, {})[part] = off
    resolved = _resolve_offsets_option(json.dumps(spec), counts, -2)
    for tp, off in resolved.items():
        assert 0 <= off <= counts[tp]
        topic, _, part = tp.rpartition(":")
        req = spec.get(topic, {}).get(part)
        if req is not None and req >= 0:
            assert off == min(req, counts[tp])
        elif req == -1:
            assert off == counts[tp]
        elif req == -2 or req is None:
            assert off == 0
    assert _resolve_offsets_option("earliest", counts, -2) == {
        tp: 0 for tp in counts
    }
    assert _resolve_offsets_option("latest", counts, -1) == dict(counts)
