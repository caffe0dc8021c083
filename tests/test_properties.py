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


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    xs=st.lists(
        st.floats(
            min_value=-1e9,
            max_value=1e9,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_cents_quantization_cross_engine(spark, xs):
    """floor(x*100 + 0.5) — the money primitive every trend/segment
    operator sums — must produce identical BIGINTs in Spark and DuckDB
    for arbitrary doubles (identical IEEE ops on identical inputs)."""
    import duckdb
    from pyspark.sql import functions as F

    sp = [
        r.c
        for r in spark.createDataFrame([(x,) for x in xs], "x double")
        .select(F.floor(F.col("x") * 100 + 0.5).cast("long").alias("c"))
        .collect()
    ]
    con = duckdb.connect()
    dk = [
        con.execute(
            "SELECT CAST(floor(CAST(? AS DOUBLE) * 100 + 0.5) AS BIGINT)",
            [x],
        ).fetchone()[0]
        for x in xs
    ]
    assert sp == dk


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    toks=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=15,
    )
)
def test_portable_token_hash_cross_engine(spark, toks):
    """The polynomial rolling token hash + 32-bit multiplicative mixes
    behind dedup_simhash_portable_pairs must agree with DuckDB for
    arbitrary printable-ASCII tokens."""
    import duckdb
    from pyspark.sql import functions as F

    h0 = F.aggregate(
        F.split(F.col("tok"), ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c) % 256) % 1000000007,
    )
    m1 = (h0 * 2654435761) % 4294967296
    m2 = (m1 * 1540483477) % 4294967296
    sp = [
        (r.m1, r.m2)
        for r in spark.createDataFrame([(t,) for t in toks], "tok string")
        .select(m1.alias("m1"), m2.alias("m2"))
        .collect()
    ]
    con = duckdb.connect()
    dk = [
        con.execute(
            """
            SELECT ((h0 * 2654435761) % 4294967296),
                   ((((h0 * 2654435761) % 4294967296) * 1540483477)
                    % 4294967296)
            FROM (SELECT list_reduce(
                    [0::BIGINT] ||
                    [ascii(c)::BIGINT % 256 FOR c IN string_split(?, '')],
                    (acc, x) -> (acc * 31 + x) % 1000000007) AS h0)
            """,
            [t],
        ).fetchone()
        for t in toks
    ]
    assert sp == dk
