"""Property test for the streaming sessionizer's state fold: for ANY
event-time sequence and ANY micro-batch slicing, the sessions emitted by
folding batch-by-batch (plus the final open session left in state) must
equal the batch gap computation — no Spark needed, the fold is pure."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings, strategies as st

from sparkstreaming_rawdataingestion_spark.streaming.sessionize_stream import (
    SESSION_GAP_US,
    _sessionize,
)


class _FakeState:
    """Minimal GroupState stand-in for driving the fold directly."""

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

    def remove(self):
        self._value = None

    def getCurrentWatermarkMs(self):
        return 0

    def setTimeoutTimestamp(self, ts):
        self.timeout_ts = ts


def _batch_reference(times_us):
    """Plain-Python gap computation: list of (start, end, n) sessions."""
    sessions = []
    start = last = None
    n = 0
    for t in sorted(times_us):
        if last is not None and t - last > SESSION_GAP_US:
            sessions.append((start, last, n))
            start, n = t, 0
        if start is None:
            start = t
        last = t
        n += 1
    if start is not None:
        sessions.append((start, last, n))
    return sessions


def _fold_stream(batches):
    """Run the applyInPandasWithState fold over consecutive batches;
    returns (emitted sessions, final open-session state)."""
    state = _FakeState()
    emitted = []
    for batch in batches:
        pdf = pd.DataFrame(
            {"ts": pd.to_datetime(pd.Series(batch, dtype="int64"), unit="us")}
        )
        for out in _sessionize((7,), iter([pdf]), state):
            emitted.append(
                (
                    int(out["session_start"].iloc[0].value // 1000),
                    int(out["session_end"].iloc[0].value // 1000),
                    int(out["n_events"].iloc[0]),
                )
            )
    return emitted, state._value


@settings(max_examples=200, deadline=None)
@given(
    times=st.lists(
        st.integers(min_value=0, max_value=10 * SESSION_GAP_US),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    data=st.data(),
)
def test_fold_matches_batch_reference_under_any_slicing(times, data):
    # slice the TIME-ORDERED stream into consecutive micro-batches at
    # arbitrary cut points (an in-order source, e.g. Kafka per key)
    ordered = sorted(times)
    n_cuts = data.draw(st.integers(min_value=0, max_value=len(ordered) - 1))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=1, max_value=len(ordered) - 1)
                if len(ordered) > 1
                else st.nothing(),
                min_size=n_cuts if len(ordered) > 1 else 0,
                max_size=n_cuts if len(ordered) > 1 else 0,
                unique=True,
            )
        )
    )
    batches, prev = [], 0
    for c in cuts + [len(ordered)]:
        if ordered[prev:c]:
            batches.append(ordered[prev:c])
        prev = c

    emitted, open_state = _fold_stream(batches)
    want = _batch_reference(times)
    # the final session is still open in state; everything else emitted
    assert open_state is not None
    start_us, last_us, n = open_state
    assert emitted + [(start_us, last_us, n)] == want
