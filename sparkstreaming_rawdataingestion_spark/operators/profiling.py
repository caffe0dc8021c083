"""Dataset profiling, hierarchical rollup, and training-mix sampling —
the operational layer a large-scale training-data pipeline runs around
curation (BASELINE.json north star; generalizes the reference's per-batch
debug inspection, RawDataIngestion.java:155-165, into real dataset
observability).

Scale design:

- **table_profile**: ONE wide aggregation over one scan computes every
  per-column metric (nulls, exact distincts, min/max), then a map-side
  melt reshapes to one row per column. Profiling a 100 TB table costs a
  single reduce — never one pass per column.
- **rollup_time_hierarchy**: hour buckets aggregate the raw scan once;
  day re-aggregates the hour output; month re-aggregates day. Each
  coarser level reads the previous level's (tiny) result — the
  hypertable/continuous-aggregate cascade — so raw data is scanned
  exactly once no matter how many resolutions are served.
- **stratified_sample**: per-stratum Bernoulli rates off a Knuth
  multiplicative key hash — deterministic, re-runnable, join-free (the
  mixing weights of a training-data recipe as a pure filter).
- **quality_quantile_buckets**: curriculum binning via ntile over a
  deterministic ordering; one shuffle on the stratum key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .. import catalog
from ..session import stage

QUERIES: dict = {}
ORACLES: dict = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# table_profile — per-column dataset profile in one pass
# ---------------------------------------------------------------------------

_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderpriority",
)


def profile_table(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """One wide aggregation (single scan, single reduce) computing row
    count, null count, exact distinct count, and min/max per column; the
    result row is melted map-side into one row per column."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nn"),
            F.count_distinct(F.col(c)).alias(f"{c}__nd"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"{c}__nn").cast("long").alias("n_null"),
                F.col(f"{c}__nd").cast("long").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")


@_register(
    "table_profile",
    "\nUNION ALL\n".join(
        f"""
SELECT '{c}'                         AS column_name,
       CAST(count(*) AS BIGINT)      AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                                     AS n_null,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(min({c}) AS VARCHAR)     AS min_value,
       CAST(max({c}) AS VARCHAR)     AS max_value
FROM orders"""
        for c in _PROFILE_COLS
    ),
)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset observability primitive: the per-column profile every
    ingestion run logs before training jobs consume a table."""
    o = catalog.load_table(spark, sf_dir, "orders")
    return profile_table(o, _PROFILE_COLS)


# ---------------------------------------------------------------------------
# rollup_time_hierarchy — continuous-aggregate cascade hour → day → month
# ---------------------------------------------------------------------------


@_register(
    "rollup_time_hierarchy",
    """
WITH hour AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
         count(*) AS n_events,
         SUM(CAST(value AS DECIMAL(18,4))) AS sv
  FROM events GROUP BY 1
), day AS (
  SELECT time_bucket(INTERVAL '1 day', bucket_start) AS bucket_start,
         CAST(sum(n_events) AS BIGINT) AS n_events, sum(sv) AS sv
  FROM hour GROUP BY 1
), month AS (
  SELECT CAST(date_trunc('month', bucket_start) AS TIMESTAMP) AS bucket_start,
         CAST(sum(n_events) AS BIGINT) AS n_events, sum(sv) AS sv
  FROM day GROUP BY 1
)
SELECT 'hour' AS resolution, bucket_start,
       CAST(n_events AS BIGINT) AS n_events, CAST(sv AS DOUBLE) AS sum_value
FROM hour
UNION ALL
SELECT 'day', bucket_start, n_events, CAST(sv AS DOUBLE) FROM day
UNION ALL
SELECT 'month', bucket_start, n_events, CAST(sv AS DOUBLE) FROM month
""",
)
def q_rollup_time_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: hour buckets aggregate the
    raw scan ONCE; day aggregates hour's output; month aggregates day's.
    At 100 TB the coarser levels cost ~nothing (they read thousands of
    rows, not billions) and the decimal partials re-aggregate exactly."""
    ev = catalog.load_table(spark, sf_dir, "events")
    # Each level is staged: without materialization Spark would expand the
    # union into three independent subtrees and scan the raw table three
    # times (verified via executedPlan). Persisting hour/day is exactly
    # what a continuous-aggregate store does with its materialized levels.
    hour = stage(
        ev.groupBy(
            F.window("ts", "1 hour")["start"].alias("bucket_start")
        ).agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("sv"),
        )
    )
    day = stage(
        hour.groupBy(
            F.window("bucket_start", "1 day")["start"].alias("bucket_start")
        ).agg(F.sum("n_events").alias("n_events"), F.sum("sv").alias("sv"))
    )
    month = day.groupBy(
        F.date_trunc("month", "bucket_start").cast("timestamp_ntz").alias(
            "bucket_start"
        )
    ).agg(F.sum("n_events").alias("n_events"), F.sum("sv").alias("sv"))

    def tag(df: DataFrame, res: str) -> DataFrame:
        return df.select(
            F.lit(res).alias("resolution"),
            "bucket_start",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("sv").cast("double").alias("sum_value"),
        )

    return tag(hour, "hour").unionByName(tag(day, "day")).unionByName(
        tag(month, "month")
    )


# ---------------------------------------------------------------------------
# stratified_sample — per-stratum deterministic training-mix rates
# ---------------------------------------------------------------------------

# lang → percent kept (a training-data mixing recipe)
_MIX_RATES = {"en": 50, "de": 100, "es": 25}

# Multiplicative key hash, overflow-safe at 100 TB id ranges: the key is
# reduced mod 2^32 BEFORE multiplying, and the multiplier (MurmurHash2's
# 0x5BD1E995 = 1540483477 < 2^31) keeps the product < 2^63, so int64
# arithmetic never wraps in either engine (a Knuth 2654435761 multiplier on
# a raw int64 key overflows for keys ≳ 3.5e9 — ANSI mode errors, non-ANSI
# wraps differently from DuckDB's int128).
_MMH2 = 1540483477


def _bucket_sql(key: str) -> str:
    return f"(({key} % 4294967296) * {_MMH2} % 4294967296) % 100"


def _bucket_col(key):
    return (key % F.lit(4294967296)) * F.lit(_MMH2) % F.lit(4294967296) % 100


def _mix_case_sql() -> str:
    whens = "\n         ".join(
        f"WHEN lang = '{lang}' THEN {rate}" for lang, rate in _MIX_RATES.items()
    )
    return f"CASE {whens} ELSE 0 END"


@_register(
    "stratified_sample",
    f"""
SELECT doc_id, lang
FROM documents
WHERE {_bucket_sql("doc_id")} < {_mix_case_sql()}
""",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix sampling: each language stratum keeps its own
    deterministic Bernoulli rate off a multiplicative key hash —
    reproducible, join-free, and embarrassingly parallel (a pure filter
    on the scan)."""
    d = catalog.load_table(spark, sf_dir, "documents")
    bucket = _bucket_col(F.col("doc_id"))
    rate = F.lit(0)
    for lang, pct in _MIX_RATES.items():
        rate = F.when(F.col("lang") == lang, pct).otherwise(rate)
    return d.where(bucket < rate).select("doc_id", "lang")


# ---------------------------------------------------------------------------
# upsample_mix — deterministic FRACTIONAL epoch mixing (weights > 1 allowed)
# ---------------------------------------------------------------------------

# lang → mix weight in percent: en 1.5 epochs, de 2.0, es 0.25 (a real
# training recipe mixes strata at fractional epoch counts, not just
# keep/drop rates — stratified_sample is the ≤ 1.0 special case)
_UPSAMPLE_RATES = {"en": 150, "de": 200, "es": 25}


def _upsample_case_sql() -> str:
    whens = " ".join(
        f"WHEN lang = '{lang}' THEN {rate}"
        for lang, rate in _UPSAMPLE_RATES.items()
    )
    return f"CASE {whens} ELSE 100 END"


@_register(
    "upsample_mix",
    f"""
WITH d AS (
  SELECT doc_id, lang,
         {_upsample_case_sql()}     AS rate,
         {_bucket_sql("doc_id")}    AS b
  FROM documents
),
n AS (
  SELECT doc_id, lang,
         rate // 100 + CASE WHEN b < rate % 100 THEN 1 ELSE 0 END AS n_copies
  FROM d
)
SELECT doc_id, lang, CAST(t.copy AS BIGINT) AS copy
FROM n, UNNEST(range(1, n_copies + 1)) AS t(copy)
""",
)
def q_upsample_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fractional upsampling: stratum weight w emits each
    doc ``floor(w)`` times plus one more for the key-hash fraction of
    docs selected by ``frac(w)`` — so a 1.5-epoch stratum repeats exactly
    the same half of its documents on every run (reproducible epoch
    mixing, the general form of ``stratified_sample``). Map-only
    sequence+explode: no shuffle, no join; output carries the copy
    ordinal so downstream packing can interleave epochs."""
    d = catalog.load_table(spark, sf_dir, "documents")
    rate = F.lit(100)
    for lang, pct in _UPSAMPLE_RATES.items():
        rate = F.when(F.col("lang") == lang, pct).otherwise(rate)
    bucket = _bucket_col(F.col("doc_id"))
    n_copies = F.floor(rate / 100).cast("long") + F.when(
        bucket < rate % 100, 1
    ).otherwise(0)
    copies = F.when(n_copies > 0, F.sequence(F.lit(1), n_copies)).otherwise(
        F.array()
    )
    return d.select("doc_id", "lang", F.explode(copies).alias("copy")).select(
        "doc_id", "lang", F.col("copy").cast("long").alias("copy")
    )


# ---------------------------------------------------------------------------
# quality_quantile_buckets — curriculum binning by quality score
# ---------------------------------------------------------------------------


@_register(
    "quality_quantile_buckets",
    """
SELECT doc_id, lang,
       CAST(ntile(4) OVER (PARTITION BY lang
                           ORDER BY n_chars DESC, doc_id) AS BIGINT)
         AS quality_quartile
FROM documents
""",
)
def q_quality_quantile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning: per-language quality quartiles (n_chars as the
    stored quality proxy; the computed score variant is
    text_quality_score) with a unique tiebreak so bucket assignment is
    deterministic under any partitioning."""
    d = catalog.load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return d.select(
        "doc_id",
        "lang",
        F.ntile(4).over(w).cast("long").alias("quality_quartile"),
    )


# ---------------------------------------------------------------------------
# leakage_safe_split — train/valid/test assignment by near-dup CLUSTER
# ---------------------------------------------------------------------------

_SPLIT_CASE = (
    "CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid' "
    "ELSE 'test' END"
)


def _leakage_split_oracle() -> str:
    from .dedup import _NGRAM_PAIRS_ORACLE, components_ctes

    return f"""
WITH RECURSIVE pairs AS ({_NGRAM_PAIRS_ORACLE}),
{components_ctes()},
clusters AS (SELECT node AS doc_id, min(dest) AS cluster_rep FROM reach GROUP BY node)
SELECT doc_id, group_id, {_SPLIT_CASE} AS split
FROM (
  SELECT d.doc_id,
         COALESCE(c.cluster_rep, d.doc_id)                        AS group_id,
         {_bucket_sql("COALESCE(c.cluster_rep, d.doc_id)")}       AS b
  FROM documents d LEFT JOIN clusters c USING (doc_id))
"""


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/valid/test split keyed on the near-dup CLUSTER representative,
    not the document id: a deterministic Knuth-hash bucket of the cluster
    rep puts every member of a duplicate cluster in the same split, so
    near-identical text can never sit on both sides of an eval boundary —
    the leakage-prevention contract a training pipeline needs from its
    dedup stage. Singleton docs are their own group. 80/10/10 rates."""
    from .dedup import q_dedup_clusters

    d = catalog.load_table(spark, sf_dir, "documents").select("doc_id")
    clusters = q_dedup_clusters(spark, sf_dir).select("doc_id", "cluster_rep")
    gid = F.coalesce(F.col("cluster_rep"), F.col("doc_id"))
    bucket = _bucket_col(gid)
    return d.join(clusters, "doc_id", "left").select(
        "doc_id",
        gid.alias("group_id"),
        F.when(bucket < 80, "train")
        .when(bucket < 90, "valid")
        .otherwise("test")
        .alias("split"),
    )


QUERIES["leakage_safe_split"] = q_leakage_safe_split
ORACLES["leakage_safe_split"] = _leakage_split_oracle()


# ---------------------------------------------------------------------------
# dedup_keep_best — quality-aware canonicalization of near-dup clusters
# ---------------------------------------------------------------------------


def _keep_best_oracle() -> str:
    from .dedup import _NGRAM_PAIRS_ORACLE, components_ctes
    from .text import ORACLES as _TEXT_ORACLES

    quality_sql = _TEXT_ORACLES["text_quality_score"]
    return f"""
WITH RECURSIVE pairs AS ({_NGRAM_PAIRS_ORACLE}),
{components_ctes()},
clusters AS (SELECT node AS doc_id, min(dest) AS cluster_rep FROM reach GROUP BY node),
q AS ({quality_sql}),
member AS (
  SELECT d.doc_id,
         COALESCE(c.cluster_rep, d.doc_id) AS group_id,
         q.quality_score
  FROM documents d
  LEFT JOIN clusters c USING (doc_id)
  JOIN q USING (doc_id)),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY group_id
                            ORDER BY quality_score DESC, doc_id) AS rk,
         count(*) OVER (PARTITION BY group_id) AS n_members
  FROM member)
SELECT group_id,
       doc_id AS kept_doc_id,
       quality_score AS kept_quality,
       CAST(n_members AS BIGINT) AS n_members
FROM ranked WHERE rk = 1
"""


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonicalization: within each near-dup cluster keep
    the HIGHEST-quality member (doc_id tiebreak), not the lowest id —
    the selection rule a curation pipeline actually wants from its dedup
    stage (drop the boilerplate copy, keep the clean one). Composes the
    cluster labels with the quality scores, then one window rank per
    group; the per-group state is (group_id, score) pairs, so the
    shuffle is key-sized regardless of document length."""
    from .dedup import q_dedup_clusters
    from .text import q_text_quality_score

    d = catalog.load_table(spark, sf_dir, "documents").select("doc_id")
    clusters = q_dedup_clusters(spark, sf_dir).select("doc_id", "cluster_rep")
    quality = q_text_quality_score(spark, sf_dir).select("doc_id", "quality_score")
    member = (
        d.join(clusters, "doc_id", "left")
        .join(quality, "doc_id")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_rep"), F.col("doc_id")).alias("group_id"),
            "quality_score",
        )
    )
    w = Window.partitionBy("group_id").orderBy(
        F.col("quality_score").desc(), F.col("doc_id")
    )
    wc = Window.partitionBy("group_id")
    return (
        member.select(
            "group_id",
            "doc_id",
            "quality_score",
            F.row_number().over(w).alias("rk"),
            F.count("*").over(wc).alias("n_members"),
        )
        .where(F.col("rk") == 1)
        .select(
            "group_id",
            F.col("doc_id").alias("kept_doc_id"),
            F.col("quality_score").alias("kept_quality"),
            F.col("n_members").cast("long").alias("n_members"),
        )
    )


QUERIES["dedup_keep_best"] = q_dedup_keep_best
ORACLES["dedup_keep_best"] = _keep_best_oracle()


# ---------------------------------------------------------------------------
# numeric_histogram — equi-width value distribution per key
# ---------------------------------------------------------------------------

HISTOGRAM_BINS = 10

_HISTOGRAM_ORACLE = f"""
WITH bounds AS (
  SELECT min(value) AS lo, max(value) AS hi FROM events
)
SELECT event_type,
       CAST(LEAST(CAST(floor((value - lo) * {HISTOGRAM_BINS}e0 / (hi - lo))
                       AS INTEGER), {HISTOGRAM_BINS - 1}) AS INTEGER) AS bin,
       CAST(count(*) AS BIGINT)  AS n,
       round(min(value), 6)      AS bin_min,
       round(max(value), 6)      AS bin_max
FROM events, bounds
GROUP BY 1, 2
"""


@_register("numeric_histogram", _HISTOGRAM_ORACLE)
def q_numeric_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of ``value`` per event_type over the GLOBAL
    [min, max] range (shared bin edges make per-key distributions
    comparable — the profiling shape quality dashboards plot).

    The bounds are a 1-row aggregate broadcast back over the scan; bin
    assignment is pure map-side arithmetic (floor((v−lo)·B/(hi−lo)),
    top edge clamped into the last bin) — identical float algebra on
    the oracle, so bin ids match exactly. One aggregation shuffle on
    (key, bin): at 100 TB this is the cheapest possible distribution
    profile — contrast ntile/percent_rank, which sort every key group
    (quality_quantile_buckets exists for when exact quantile EDGES are
    the requirement)."""
    ev = catalog.load_table(spark, sf_dir, "events")
    bounds = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    bin_id = F.least(
        F.floor(
            (F.col("value") - F.col("lo"))
            * F.lit(float(HISTOGRAM_BINS))
            / (F.col("hi") - F.col("lo"))
        ).cast("int"),
        F.lit(HISTOGRAM_BINS - 1),
    )
    return (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("event_type", bin_id.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("bin_min"),
            F.round(F.max("value"), 6).alias("bin_max"),
        )
    )


# ---------------------------------------------------------------------------
# skew_key_report — hot-key diagnostics for the warehouse join keys
# ---------------------------------------------------------------------------

_SKEW_FAMILIES = (
    ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"),
    ("orders", "o_custkey"),
    ("events", "user_id"),
)
_SKEW_TOP_K = 3

_SKEW_ORACLE = " UNION ALL ".join(
    f"""
SELECT family, rk, hot_key, cnt,
       round(CAST(cnt AS DOUBLE) * n_keys / n_rows, 6) AS skew_x_avg,
       round(CAST(cnt AS DOUBLE) / n_rows, 6)          AS share
FROM (
  SELECT '{t}.{k}' AS family, CAST({k} AS BIGINT) AS hot_key,
         CAST(count(*) AS BIGINT) AS cnt,
         row_number() OVER (ORDER BY count(*) DESC, {k}) AS rk,
         sum(count(*)) OVER () AS n_rows,
         count(*)      OVER () AS n_keys
  FROM {t} GROUP BY {k}
) WHERE rk <= {_SKEW_TOP_K}
"""
    for t, k in _SKEW_FAMILIES
)


@_register("skew_key_report", _SKEW_ORACLE)
def q_skew_key_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key observability for every fact join key: the top-3
    heaviest keys per family with their multiple-of-average skew factor
    and row share — the number that tells an operator whether a join on
    that key needs salting or an AQE skew split BEFORE the 100× run,
    pairing the skew-handling operators (join_strategies_pack's salted
    join) with the report that says when to reach for them.

    Plan per family: one grouped count (map-side partial combine),
    STAGED because it feeds two consumers — (a) a 1-row totals
    aggregate that broadcasts back, (b) the top-k. The top-k is
    ``orderBy().limit(k)`` → TakeOrderedAndProject (per-partition
    k-row heaps, driver merges k·p rows) — a billion user_ids never
    funnel through a single-partition sort; the rank number is then a
    window over the k surviving rows only. Families union after
    reduction: each fact table is scanned once."""
    from ..session import stage

    parts = []
    for t, k in _SKEW_FAMILIES:
        counts = stage(
            catalog.load_table(spark, sf_dir, t)
            .groupBy(k)
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        tot = counts.agg(
            F.sum("cnt").alias("n_rows"), F.count(F.lit(1)).alias("n_keys")
        )
        order = [F.col("cnt").desc(), F.col(k)]
        ranked = (
            counts.orderBy(*order)
            .limit(_SKEW_TOP_K)
            .select(
                F.col(k).cast("long").alias("hot_key"),
                F.col("cnt").cast("long").alias("cnt"),
                F.row_number().over(Window.orderBy(*order)).alias("rk"),
            )
        )
        parts.append(
            ranked.crossJoin(F.broadcast(tot)).select(
                F.lit(f"{t}.{k}").alias("family"),
                "rk",
                "hot_key",
                "cnt",
                F.round(
                    F.col("cnt").cast("double")
                    * F.col("n_keys")
                    / F.col("n_rows"),
                    6,
                ).alias("skew_x_avg"),
                F.round(
                    F.col("cnt").cast("double") / F.col("n_rows"), 6
                ).alias("share"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
