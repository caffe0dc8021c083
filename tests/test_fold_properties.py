"""Property tests for the keyed-state recurrence folds (EWMA / CUSUM /
debounce): for ANY event sequence — INCLUDING same-microsecond ties —
and ANY in-order micro-batch slicing (ties may straddle a batch
boundary, the case the round-5 (ts, event_id) frontier fix exists for),
folding batch-by-batch must equal a plain-Python replay of the batch
twin's recurrence over the (ts, event_id) order. The folds are pure —
no Spark session needed."""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import given, settings, strategies as st

from sparkstreaming_rawdataingestion_spark.operators.mining import _EWMA_ALPHA
from sparkstreaming_rawdataingestion_spark.streaming import (
    cusum_stream,
    debounce_stream,
    ewma_stream,
)
from sparkstreaming_rawdataingestion_spark.streaming.debounce_stream import (
    _GAP_US,
)


class _FakeState:
    def __init__(self):
        self._value = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = tuple(v)


def _slices(data, events):
    """Split the (ts, event_id)-ordered event list into consecutive
    micro-batches at drawn cut points (1..n batches)."""
    cuts = sorted(
        data.draw(
            st.sets(
                st.integers(min_value=1, max_value=max(1, len(events) - 1)),
                max_size=5,
            )
        )
    )
    out, prev = [], 0
    for c in cuts + [len(events)]:
        if c > prev:
            out.append(events[prev:c])
            prev = c
    return out


_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),  # µs — dense, many ties
        st.floats(
            min_value=-100, max_value=100, allow_nan=False, width=32
        ),
    ),
    min_size=1,
    max_size=30,
)


def _ordered(raw):
    """(ts, value) pairs → [(eid, t_us, value)] in the batch twin's
    (ts, event_id) order, ids assigned in that order."""
    ordered = sorted(raw, key=lambda p: p[0])
    return [(i + 1, t, v) for i, (t, v) in enumerate(ordered)]


def _pdf(batch, cols):
    return pd.DataFrame(
        {
            "event_id": pd.Series([e[0] for e in batch], dtype="int64"),
            "ts": pd.to_datetime(
                pd.Series([e[1] for e in batch], dtype="int64"), unit="us"
            ),
            **cols(batch),
        }
    )


@settings(max_examples=200, deadline=None)
@given(raw=_EVENTS, data=st.data())
def test_ewma_fold_under_any_slicing_with_ties(raw, data):
    events = _ordered(raw)
    state = _FakeState()
    got = {}
    for batch in _slices(data, events):
        pdf = _pdf(batch, lambda b: {"value": [e[2] for e in b]})
        for out in ewma_stream._fold((7,), iter([pdf]), state):
            got.update(dict(zip(out["event_id"], out["ewma"])))
    acc, want = None, {}
    for eid, _t, v in events:
        acc = v if acc is None else _EWMA_ALPHA * v + (1 - _EWMA_ALPHA) * acc
        want[eid] = math.floor(acc * 1e6 + 0.5) / 1e6
    assert got == want


@settings(max_examples=200, deadline=None)
@given(raw=_EVENTS, data=st.data())
def test_cusum_fold_under_any_slicing_with_ties(raw, data):
    mu, sd = 1.5, 2.0
    events = _ordered(raw)
    state = _FakeState()
    got = {}
    for batch in _slices(data, events):
        pdf = _pdf(
            batch,
            lambda b: {
                "value": [e[2] for e in b],
                "mu": [mu] * len(b),
                "sd": [sd] * len(b),
            },
        )
        for out in cusum_stream._fold((7,), iter([pdf]), state):
            got.update(
                dict(zip(out["event_id"], zip(out["cusum"], out["alarm"])))
            )
    s, want = 0.0, {}
    for eid, _t, v in events:
        s = max(0.0, s + (v - mu - 0.5 * sd))
        want[eid] = (math.floor(s * 1e6 + 0.5) / 1e6, s > 4.0 * sd)
    assert got == want


@settings(max_examples=200, deadline=None)
@given(
    raw=st.lists(
        st.integers(min_value=0, max_value=4 * _GAP_US),
        min_size=1,
        max_size=30,
    ),
    data=st.data(),
)
def test_debounce_fold_under_any_slicing_with_ties(raw, data):
    events = [(i + 1, t, 0.0) for i, t in enumerate(sorted(raw))]
    state = _FakeState()
    got = set()
    for batch in _slices(data, events):
        pdf = _pdf(batch, lambda b: {})
        for out in debounce_stream._fold((7, "click"), iter([pdf]), state):
            got |= set(out["event_id"])
    want, last = set(), None
    for eid, t, _v in events:
        if last is None or t - last > _GAP_US:
            want.add(eid)
        last = t
    assert got == want
