"""Round-8 additions: ADVICE r7 regressions (drain_progress ring-buffer
accounting) and closed-form fixtures for the round's new operators."""

from __future__ import annotations


class _RingBufferQuery:
    """Stub StreamingQuery whose recentProgress mimics Spark's ~100-event
    ring buffer: the data-bearing early batches are EVICTED by a flood of
    empty-batch progress events, so any naive sum over the live buffer
    permanently undercounts."""

    def __init__(self):
        self.polls = 0

    @property
    def recentProgress(self):
        self.polls += 1
        if self.polls == 1:
            # first poll: the two data-bearing batches are still visible
            return [
                {"batchId": 0, "numInputRows": 600},
                {"batchId": 1, "numInputRows": 400},
            ]
        # afterwards: ring buffer holds only empty keep-alive batches
        return [
            {"batchId": i, "numInputRows": 0} for i in range(2, 102)
        ]


def test_drain_progress_survives_ring_buffer_eviction():
    """ADVICE r7: cumulative consumed rows must accumulate ACROSS polls
    (each batchId counted once), not be re-summed over the live ring
    buffer — otherwise eviction of early data-bearing events makes the
    helper spin to timeout and return an incomplete event list."""
    from sparkstreaming_rawdataingestion_spark.streaming.ingest_stream import (
        drain_progress,
    )

    q = _RingBufferQuery()
    events = drain_progress(q, n_messages=1000, timeout_s=10.0)
    # both data-bearing batches retained even after eviction, in order
    assert [e["batchId"] for e in events] == [0, 1]
    assert sum(e["numInputRows"] for e in events) == 1000
    # and it did NOT spin to the timeout: the second poll already sees
    # the cumulative 1000 (first poll folds both batches in)
    assert q.polls <= 3


def test_drain_progress_counts_each_batch_once():
    """A batch reappearing across polls (normal: the buffer is a window)
    must not double-count its rows."""
    from sparkstreaming_rawdataingestion_spark.streaming.ingest_stream import (
        drain_progress,
    )

    class _StableQuery:
        polls = 0

        @property
        def recentProgress(self):
            type(self).polls += 1
            return [
                {"batchId": 0, "numInputRows": 300},
                {"batchId": 1, "numInputRows": 300},
            ]

    # 600 total available; asking for 700 must time out (not reach it by
    # double-counting batch 0/1 on the second poll)
    events = drain_progress(_StableQuery(), n_messages=700, timeout_s=2.0)
    assert sum(e["numInputRows"] for e in events) == 600
