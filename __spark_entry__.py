"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship ingest-normalize pipeline (SURVEY §7.0)
at sf0.001; ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY §2 with DuckDB-checkable oracles where expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sparkstreaming_rawdataingestion_spark import queries as _q
from sparkstreaming_rawdataingestion_spark.session import tune_for_session

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_for_session(spark)
    return _q.q_ingest_normalize(spark, SMOKE_SF_DIR)


def _wrap(fn: _q.QueryFn) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        tune_for_session(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(fn) for name, fn in _q.all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return _q.all_oracles()
