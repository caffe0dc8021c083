"""Property-based parity tests (hypothesis): the ingest scalar pipeline
against an independent pure-Python model of the reference semantics
(Gson long→Date, SimpleDateFormat yyyyMMdd in UTC, Java int division)."""

from __future__ import annotations

import datetime as dt
import json

from hypothesis import HealthCheck, given, settings, strategies as st

from sparkstreaming_rawdataingestion_spark.operators import ingest

# stay within Spark's timestamp range (year 1-9999), around interesting edges
MS = st.one_of(
    st.integers(min_value=-62135596800000, max_value=253402300799999),
    st.integers(min_value=-86400001, max_value=86400001),  # epoch edges
)
OFFSET = st.integers(min_value=-(2**31), max_value=2**31 - 1)


def _python_model(ms: int, offset_ms: int) -> tuple[str, int]:
    """Reference semantics in pure Python: UTC yyyyMMdd bucket + Java
    truncating int division (RawDataIngestion.java:137-139)."""
    days = ms // 86400000  # floor division matches calendar-day bucketing
    d = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(days=days)
    day = f"{d.year:04d}{d.month:02d}{d.day:02d}"
    q = abs(offset_ms) // 60000
    return day, q if offset_ms >= 0 else -q


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(cases=st.lists(st.tuples(MS, OFFSET), min_size=1, max_size=20))
def test_ingest_scalar_properties(spark, cases):
    msgs = [
        (
            json.dumps(
                {
                    "datastream_id": 1,
                    "data": [{"dateTime": ms, "offset": off, "sample": 1}],
                }
            ),
        )
        for ms, off in cases
    ]
    out = (
        ingest.ingest_normalize(spark.createDataFrame(msgs, "value string"))
        .select("day", "offset")
        .collect()
    )
    got = [(r["day"], r["offset"]) for r in out]
    want = [_python_model(ms, off) for ms, off in cases]
    assert got == want
