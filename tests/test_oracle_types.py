"""Full-registry oracle TYPE pin (round-6, VERDICT r5 item 2).

The round-5 red (``debounce_events``) was a *type* bug: DuckDB
``sum(INTEGER)`` returns HUGEINT, which pandas — and therefore the
driver's value hasher — renders as float64, so the driver hashed 1.0
against Spark's bigint 1 while rows and schema matched. The local gate
masked it by collapsing int-valued floats onto ints.

This pin closes the class for the WHOLE registry: for every
oracle-backed query, the oracle runs on DuckDB at sf0.001 and its
pandas dtype kinds are compared against the Spark plan's schema (built
lazily — no Spark execution). Any int-vs-float / bool-vs-int /
timestamp-vs-object drift fails here before it can ship "validated".
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from check_oracles import dtype_drift  # noqa: E402


def _registry():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    return [(name, qs[name], oracles[name]) for name in qs if name in oracles]


@pytest.fixture(scope="module")
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def test_no_oracle_type_drift(spark, sf_dir, duck):
    """Every oracle's pandas dtypes are hash-compatible with the Spark
    schema. Spark side is schema-only (lazy plan), DuckDB side executes
    at sf0.001 — cheap enough to pin the full registry every run."""
    drifted: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    for name, fn, sql in _registry():
        try:
            sdf = fn(spark, sf_dir)  # lazy — schema analysis only
            ddf = duck.execute(sql).df()
        except Exception as ex:  # surface, don't abort the sweep
            errors[name] = f"{type(ex).__name__}: {ex}"[:200]
            continue
        drift = dtype_drift(sdf, ddf)
        if drift:
            drifted[name] = drift
    assert not errors, f"oracle sweep errors: {errors}"
    assert not drifted, (
        "oracle type drift (driver hash would fail; CAST the oracle "
        f"projection): {drifted}"
    )
