"""Python UDF surface — the engine's version of the reference's four
anonymous Function/FlatMapFunction closures (SURVEY §2.1 ops 3-5, 12).

The reference's closures were row-at-a-time Java; the engine's rule is:
built-in expressions first (everything in the ingest path), and when
Python is genuinely needed, **Arrow-vectorized** pandas UDFs /
``applyInPandas`` — never row-at-a-time Python in a hot path (10-100×
slower; SURVEY §4 / pyspark guide).

These queries exist to *prove the UDF machinery* with oracle-checkable
semantics; their bodies are deliberately simple arithmetic.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.functions import pandas_udf

from .. import catalog

QUERIES: dict = {}
ORACLES: dict = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


@pandas_udf(T.DoubleType())
def discounted_price(price: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
    """Vectorized scalar pandas UDF: whole Arrow batches, numpy arithmetic."""
    return price * (1.0 - discount) * (1.0 + tax)


@_register(
    "udf_vectorized_scalar",
    """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax), 6)
         AS final_price
FROM lineitem
WHERE l_orderkey % 19 = 0
""",
)
def q_udf_vectorized_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = catalog.load_table(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey") % 19 == 0
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            discounted_price("l_extendedprice", "l_discount", "l_tax"), 6
        ).alias("final_price"),
    )


_SLOPE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("slope_per_day", T.DoubleType()),
    ]
)


def _user_trend(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map UDAF (applyInPandas): least-squares slope of value over
    time per user — classic per-entity model fit. Closed-form OLS in
    float64, matching DuckDB's regr_slope formula."""
    x = pdf["ts"].astype("int64") / 8.64e13  # ns → days
    y = pdf["value"]
    n = len(pdf)
    denom = ((x - x.mean()) ** 2).sum()
    slope = float(((x - x.mean()) * (y - y.mean())).sum() / denom) if denom else None
    return pd.DataFrame(
        {"user_id": [pdf["user_id"].iloc[0]], "n": [n], "slope_per_day": [slope]}
    )


@_register(
    "udf_grouped_map_trend",
    """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n,
       round(regr_slope(value, epoch_ns(ts) / 8.64e13), 6) AS slope_per_day
FROM events
GROUP BY user_id
""",
)
def q_udf_grouped_map_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas: one pandas frame per user (the shuffle is the groupBy
    key; group sizes are bounded by per-user event counts, so no group
    outgrows an executor at scale)."""
    ev = catalog.load_table(spark, sf_dir, "events")
    out = ev.select("user_id", "ts", "value").groupBy("user_id").applyInPandas(
        _user_trend, schema=_SLOPE_SCHEMA
    )
    return out.select(
        "user_id", "n", F.round("slope_per_day", 6).alias("slope_per_day")
    )


@_register("udf_approx_sketches")  # approximate → rows-only; bounds in tests
def q_udf_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates for 100 TB profiling: HLL distinct counts and
    quantile sketches — constant memory per group where exact distinct /
    exact percentile would need the full key set per group.

    Quantiles are emitted as scalar p50/p95/p99 columns (never an
    array<double> — the driver's canonicalizer requires atomic columns)."""
    o = catalog.load_table(spark, sf_dir, "orders")
    q = F.percentile_approx("o_totalprice", [0.5, 0.95, 0.99], 10000)
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers"),
        F.count_distinct("o_custkey").alias("exact_customers"),
        F.element_at(q, 1).alias("price_p50"),
        F.element_at(q, 2).alias("price_p95"),
        F.element_at(q, 3).alias("price_p99"),
    )


@_register(
    "udf_exact_percentiles",
    """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 4)  AS p50,
       round(quantile_cont(o_totalprice, 0.95), 4) AS p95
FROM orders
GROUP BY o_orderstatus
""",
)
def q_udf_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (the small-group path; sketches above
    are the at-scale variant)."""
    o = catalog.load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.95)), 4).alias("p95"),
    )


@_register(
    "udtf_sentence_split",
    r"""
WITH sent AS (
  -- fixture text has no punctuation: synthesize sentence boundaries by
  -- replacing a frequent word with '.' (identically in both engines)
  SELECT doc_id, replace(text, ' table ', ' . ') AS t FROM documents
),
cleaned AS (
  SELECT doc_id,
         string_split(replace(replace(t, '!', '.'), '?', '.'), '.') AS parts
  FROM sent
),
raw AS (
  SELECT doc_id,
         x.s.i AS i,
         trim(x.s.p, ' ' || chr(9) || chr(10) || chr(13)) AS sentence
  FROM cleaned,
       unnest([{'i': i, 'p': parts[i]}
               FOR i IN range(1, len(parts) + 1)]) AS x(s)
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1
            AS INTEGER) AS pos,
       sentence,
       CAST(len(regexp_split_to_array(sentence, '\s+')) AS INTEGER) AS n_words
FROM raw
WHERE sentence <> ''
""",
)
def q_udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 native Python UDTF (table function): one document row →
    N sentence rows, consumed through SQL's LATERAL correlation — the
    user-defined generator surface beyond built-in explode/posexplode
    (operators/extras.py). The UDTF itself is stateless per row, so it
    parallelizes as a pure map over input splits; the oracle re-derives
    the identical split/trim/count semantics in SQL."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, sentence string, n_words int")
    class SplitSentences:
        def eval(self, text):
            import re

            if text is None:
                return
            pos = 0
            for part in text.replace("!", ".").replace("?", ".").split("."):
                part = part.strip(" \t\n\r")
                if part:
                    yield pos, part, len(re.findall(r"\S+", part))
                    pos += 1

    spark.udtf.register("split_sentences", SplitSentences)
    d = catalog.load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.doc_id, s.pos, s.sentence, s.n_words
        FROM documents d,
             LATERAL split_sentences(replace(d.text, ' table ', ' . ')) s
        """
    )
