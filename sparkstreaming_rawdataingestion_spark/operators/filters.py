"""Corpus filtering & decontamination — the quality gates a training-data
pipeline runs between raw ingest and dedup/export (cf. the Gopher /
MassiveText filtering rules and GPT-3/Llama n-gram decontamination;
PAPERS.md corpus-curation entries).

Three operators over ``documents`` plus reusable column builders:

- **repetition filters** — per-document repetition statistics (distinct
  word ratio, top-word fraction, duplicate-bigram fraction). All metrics
  are *map-only column algebra* over the token array — no explode, no
  shuffle, no UDF — so at 100 TB this is a pure scan stage that fuses
  into whatever reads the corpus next (verified: plan has zero Exchange).
- **benchmark contamination** — n-gram overlap between every corpus doc
  and a small benchmark/eval set. The benchmark shingle set is tiny by
  construction (eval suites are KBs, corpora are TBs), so it broadcasts;
  the corpus side is one explode + broadcast-join + count — shuffle
  payload is (doc_id, int) pairs only, never shingle arrays.
- **PII redaction** — regex scrubbing (emails / phones / IPv4) with
  per-category match counts. Deterministic PII is injected first so the
  operator is exercised on every row (the fixture corpus contains none);
  patterns are RE2-safe so Spark (Java regex) and DuckDB (RE2) agree.

Reference parity: the reference job's value-projection + lenient-parse
stage (RawDataIngestion.java:117-131) is the moral ancestor — scrub and
normalize records in the stream before they reach storage. These filters
are that stage for LLM corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from .. import catalog
from .dedup import SHINGLE_N, _shingles

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
# Repetition filters (Gopher-style, adapted to single-line docs)
# ---------------------------------------------------------------------------

# Flag thresholds sit inside the fixture's observed metric ranges
# (distinct ratio 0.28-1.0, top-word fraction 0.05-0.30) so both classes
# are populated; on a real corpus they'd come from held-out calibration.
REP_MIN_DISTINCT_RATIO = 0.35
REP_MAX_TOP_WORD_FRAC = 0.20


def _words(text_col: str = "text") -> Column:
    return F.split(F.col(text_col), " ")


def _bigrams(ws: Column) -> Column:
    from ..functions import seq1

    # seq1: a 1-word doc must yield NO bigrams (sequence(1, 0) would
    # descend into slice(ws, 0, 2) and crash)
    idx = seq1(F.size(ws) - 1)
    return F.transform(
        idx, lambda i: F.array_join(F.slice(ws, i, 2), " ")
    )


@_register(
    "text_repetition_filters",
    f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
m AS (
  SELECT doc_id,
         CAST(len(ws) AS BIGINT) AS n_words,
         round(len(list_distinct(ws)) * 1.0 / len(ws), 6) AS distinct_word_ratio,
         round(list_max([len(list_filter(ws, x -> x = u))
                         FOR u IN list_distinct(ws)]) * 1.0 / len(ws), 6)
           AS top_word_frac,
         -- nullif: a 1-word doc has NO bigrams → NULL fraction
         round(1.0 - len(list_distinct(bg)) * 1.0 / nullif(len(bg), 0), 6)
           AS dup_bigram_frac
  FROM (SELECT doc_id, ws,
               [ws[i] || ' ' || ws[i+1] FOR i IN range(1, len(ws))] AS bg
        FROM w))
SELECT doc_id, n_words, distinct_word_ratio, top_word_frac, dup_bigram_frac,
       (distinct_word_ratio < {REP_MIN_DISTINCT_RATIO}
        OR top_word_frac > {REP_MAX_TOP_WORD_FRAC}) AS repetitive
FROM m
""",
)
def q_text_repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition metrics: distinct-word ratio, most-frequent
    word fraction, and duplicate-bigram fraction, plus a boolean gate.
    Everything is higher-order-function algebra on the token array (the
    top-word count is ``array_max`` over per-distinct-word ``filter``
    counts — O(n·distinct) per row, bounded by doc length) — a map-only
    stage with no Exchange, the shape you want for a 100 TB scan gate."""
    d = catalog.load_table(spark, sf_dir, "documents")
    ws = _words()
    bg = _bigrams(ws)
    n = F.size(ws)
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(ws),
            lambda u: F.size(F.filter(ws, lambda x: x == u)),
        )
    )
    distinct_ratio = F.round(
        F.size(F.array_distinct(ws)) / n.cast("double"), 6
    )
    top_frac = F.round(top_cnt / n.cast("double"), 6)
    dup_bg = F.round(
        # try_divide: a 1-word doc has no bigrams → NULL fraction,
        # never DIVIDE_BY_ZERO under ANSI
        F.lit(1.0)
        - F.try_divide(
            F.size(F.array_distinct(bg)), F.size(bg).cast("double")
        ),
        6,
    )
    return d.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        distinct_ratio.alias("distinct_word_ratio"),
        top_frac.alias("top_word_frac"),
        dup_bg.alias("dup_bigram_frac"),
        (
            (distinct_ratio < REP_MIN_DISTINCT_RATIO)
            | (top_frac > REP_MAX_TOP_WORD_FRAC)
        ).alias("repetitive"),
    )


# ---------------------------------------------------------------------------
# Benchmark contamination (n-gram decontamination)
# ---------------------------------------------------------------------------

BENCH_MAX_DOC_ID = 5  # fixture benchmark set: doc_id < 5
CONTAMINATION_TAU = 0.15


@_register(
    "contamination_check",
    f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(toks[i:i+{SHINGLE_N - 1}], ' ')
                        FOR i IN range(1, len(toks) - {SHINGLE_N - 2})]) AS s
  FROM t),
bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id < {BENCH_MAX_DOC_ID}),
scored AS (
  SELECT d.doc_id,
         CAST(len(d.s) AS BIGINT) AS n_shingles,
         CAST((SELECT count(*) FROM unnest(d.s) AS u(g)
               WHERE g IN (SELECT g FROM bench)) AS BIGINT) AS shared_shingles
  FROM sh d WHERE d.doc_id >= {BENCH_MAX_DOC_ID})
SELECT doc_id, n_shingles, shared_shingles,
       -- nullif: a sub-3-token doc has an EMPTY shingle set → NULL ratio
       round(shared_shingles * 1.0 / nullif(n_shingles, 0), 6)
         AS contamination_ratio,
       shared_shingles * 1.0 / nullif(n_shingles, 0) >= {CONTAMINATION_TAU}
         AS contaminated
FROM scored
""",
)
def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3/Llama-style decontamination: for every corpus document,
    count distinct {SHINGLE_N}-gram shingles shared with the benchmark
    set (fixture: doc_id < {BENCH_MAX_DOC_ID}) and flag docs whose
    overlap ratio crosses CONTAMINATION_TAU. The benchmark shingle set
    broadcasts (eval suites are tiny next to a 100 TB corpus); the
    corpus side is one explode + broadcast inner join + count, so the
    only shuffle is (doc_id, count) pairs for the final aggregate —
    shingle strings never leave the map stage."""
    d = catalog.load_table(spark, sf_dir, "documents")
    sets = d.select("doc_id", _shingles().alias("s"))
    bench = (
        sets.where(F.col("doc_id") < BENCH_MAX_DOC_ID)
        .select(F.explode("s").alias("g"))
        .distinct()
    )
    corpus = sets.where(F.col("doc_id") >= BENCH_MAX_DOC_ID)
    shared = (
        corpus.select("doc_id", F.explode("s").alias("g"))
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("shared_shingles"))
    )
    # try_divide: an empty-shingle (sub-3-token) doc → NULL ratio,
    # never DIVIDE_BY_ZERO (reachable since the seq1 short-doc fix)
    ratio = F.try_divide(
        F.col("shared_shingles"), F.col("n_shingles").cast("double")
    )
    return (
        corpus.select("doc_id", F.size("s").cast("long").alias("n_shingles"))
        .join(shared, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce(F.col("shared_shingles"), F.lit(0))
            .cast("long")
            .alias("shared_shingles"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "shared_shingles",
            F.round(ratio, 6).alias("contamination_ratio"),
            (ratio >= CONTAMINATION_TAU).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# RE2-safe patterns (no lookaround/backrefs) so Spark and DuckDB agree.
PII_EMAIL = r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_PHONE = r"\+1-555-[0-9]{4}"
PII_IP = r"10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


@_register(
    "pii_redaction",
    f"""
WITH injected AS (
  SELECT doc_id,
         'contact user' || doc_id || '@example.com or +1-555-' ||
         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
         ' from 10.' || doc_id % 256 || '.0.' || (doc_id * 7) % 256 ||
         ' ' || text AS t
  FROM documents),
red AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(t, '{PII_EMAIL}')) AS BIGINT) AS n_emails,
         CAST(len(regexp_extract_all(t, '{PII_PHONE}')) AS BIGINT) AS n_phones,
         regexp_replace(
           regexp_replace(
             regexp_replace(t, '{PII_EMAIL}', '<EMAIL>', 'g'),
             '{PII_PHONE}', '<PHONE>', 'g'),
           '{PII_IP}', '<IP>', 'g') AS redacted
  FROM injected)
SELECT doc_id, n_emails, n_phones,
       CAST(len(regexp_extract_all(redacted, '<IP>')) AS BIGINT) AS n_ips,
       sha256(redacted) AS redacted_sha
FROM red
""",
)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII scrubbing: inject deterministic synthetic PII (the
    fixture corpus contains none), then redact emails / +1-555 phones /
    10.x.x.x IPs to typed placeholders and count matches per category.
    Map-only ``regexp_replace``/``regexp_count`` — whole-stage codegen,
    no shuffle; at 100 TB this fuses into the ingest scan exactly like
    the reference's value-normalization stage. Output carries
    sha256(redacted) so the oracle hash covers the full redacted text
    without shipping it."""
    d = catalog.load_table(spark, sf_dir, "documents")
    injected = F.concat(
        F.lit("contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
        F.lit(" "),
        F.col("text"),
    )
    t = d.select("doc_id", injected.alias("t"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), PII_EMAIL, "<EMAIL>"),
            PII_PHONE,
            "<PHONE>",
        ),
        PII_IP,
        "<IP>",
    )
    return t.select(
        "doc_id",
        F.regexp_count(F.col("t"), F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(F.col("t"), F.lit(PII_PHONE)).cast("long").alias("n_phones"),
        redacted.alias("redacted"),
    ).select(
        "doc_id",
        "n_emails",
        "n_phones",
        F.regexp_count(F.col("redacted"), F.lit("<IP>")).cast("long").alias("n_ips"),
        F.sha2(F.col("redacted"), 256).alias("redacted_sha"),
    )


# ---------------------------------------------------------------------------
# curation_filters_pack — one core-window slot executing all four filter
# operators (packs.py merging rules: union-tagged, atomic columns only).
# ---------------------------------------------------------------------------

_PACK_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
rep AS (
  SELECT doc_id,
         round(len(list_distinct(ws)) * 1.0 / len(ws), 6) AS distinct_ratio,
         round(list_max([len(list_filter(ws, x -> x = u))
                         FOR u IN list_distinct(ws)]) * 1.0 / len(ws), 6) AS top_frac,
         round(1.0 - len(list_distinct(bg)) * 1.0 / nullif(len(bg), 0), 6)
           AS dup_bg
  FROM (SELECT doc_id, ws,
               [ws[i] || ' ' || ws[i+1] FOR i IN range(1, len(ws))] AS bg FROM w)),
sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(toks[i:i+{SHINGLE_N - 1}], ' ')
                        FOR i IN range(1, len(toks) - {SHINGLE_N - 2})]) AS s
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id < {BENCH_MAX_DOC_ID}),
con AS (
  SELECT d.doc_id, len(d.s) AS total,
         (SELECT count(*) FROM unnest(d.s) AS u(g)
          WHERE g IN (SELECT g FROM bench)) AS shared
  FROM sh d WHERE d.doc_id >= {BENCH_MAX_DOC_ID}),
inj AS (
  SELECT doc_id,
         'contact user' || doc_id || '@example.com or +1-555-' ||
         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
         ' from 10.' || doc_id % 256 || '.0.' || (doc_id * 7) % 256 ||
         ' ' || text AS t
  FROM documents),
red AS (
  SELECT doc_id,
         len(regexp_extract_all(t, '{PII_EMAIL}')) AS ne,
         len(regexp_extract_all(t, '{PII_PHONE}')) AS np,
         regexp_replace(regexp_replace(regexp_replace(
           t, '{PII_EMAIL}', '<EMAIL>', 'g'),
           '{PII_PHONE}', '<PHONE>', 'g'),
           '{PII_IP}', '<IP>', 'g') AS redacted
  FROM inj),
qv AS (
  SELECT vec_id, a, list_max(list_transform(a, x -> abs(x))) / 127.0 AS scale
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS a FROM embeddings)),
qd AS (
  SELECT vec_id, a, scale,
         list_transform(a, x -> greatest(least(floor(x / scale + 0.5),
                                               127.0), -127.0) * scale) AS d
  FROM qv)
SELECT 'repetition' AS component, doc_id AS id,
       distinct_ratio AS v1, top_frac AS v2, dup_bg AS v3,
       CAST(distinct_ratio < {REP_MIN_DISTINCT_RATIO}
            OR top_frac > {REP_MAX_TOP_WORD_FRAC} AS VARCHAR) AS s1
FROM rep
UNION ALL
SELECT 'contamination', doc_id, CAST(total AS DOUBLE), CAST(shared AS DOUBLE),
       round(shared * 1.0 / total, 6),
       CAST(shared * 1.0 / total >= {CONTAMINATION_TAU} AS VARCHAR)
FROM con
UNION ALL
SELECT 'pii', doc_id, CAST(ne AS DOUBLE), CAST(np AS DOUBLE),
       CAST(len(regexp_extract_all(redacted, '<IP>')) AS DOUBLE),
       sha256(redacted)
FROM red
UNION ALL
SELECT 'quantization', vec_id, round(scale, 9),
       round(list_max(list_transform(list_zip(a, d),
                                     p -> abs(p[1] - p[2]))), 9),
       round(list_cosine_similarity(a, d), 6), NULL
FROM qd
"""


@_register("curation_filters_pack", _PACK_ORACLE)
def q_curation_filters_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidated filter surface for the driver's core window: executes
    repetition metrics, benchmark decontamination, PII redaction, and
    int8 quantization in one union-tagged plan (see packs.py merging
    rules). Each branch is the registered operator's own DataFrame,
    projected to the shared (component, id, v1, v2, v3, s1) schema."""
    from .similarity import q_embedding_quantization

    D = "double"
    rep = q_text_repetition_filters(spark, sf_dir).select(
        F.lit("repetition").alias("component"),
        F.col("doc_id").alias("id"),
        F.col("distinct_word_ratio").alias("v1"),
        F.col("top_word_frac").alias("v2"),
        F.col("dup_bigram_frac").alias("v3"),
        F.col("repetitive").cast("string").alias("s1"),
    )
    con = q_contamination_check(spark, sf_dir).select(
        F.lit("contamination").alias("component"),
        F.col("doc_id").alias("id"),
        F.col("n_shingles").cast(D).alias("v1"),
        F.col("shared_shingles").cast(D).alias("v2"),
        F.col("contamination_ratio").alias("v3"),
        F.col("contaminated").cast("string").alias("s1"),
    )
    pii = q_pii_redaction(spark, sf_dir).select(
        F.lit("pii").alias("component"),
        F.col("doc_id").alias("id"),
        F.col("n_emails").cast(D).alias("v1"),
        F.col("n_phones").cast(D).alias("v2"),
        F.col("n_ips").cast(D).alias("v3"),
        F.col("redacted_sha").alias("s1"),
    )
    qz = q_embedding_quantization(spark, sf_dir).select(
        F.lit("quantization").alias("component"),
        F.col("vec_id").alias("id"),
        F.col("scale").alias("v1"),
        F.col("max_abs_err").alias("v2"),
        F.col("cos_preserved").alias("v3"),
        F.lit(None).cast("string").alias("s1"),
    )
    return rep.unionAll(con).unionAll(pii).unionAll(qz)
