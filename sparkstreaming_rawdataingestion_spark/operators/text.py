"""Text-analysis operators over the ``documents`` table — the quality /
filtering layer of an LLM training-data pipeline (BASELINE.json north star).

Everything here is built-in ``pyspark.sql.functions`` column algebra — no
Python UDFs — so the whole pack rides whole-stage codegen and scales as a
pure map over document shards (zero shuffles; embarrassingly parallel at
100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

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


# Tiny per-language marker lists for the n-gram/stopword language heuristic.
# (The fixture corpus is synthetic word soup, so the *interesting* property
# is determinism, not linguistic accuracy.)
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "de", "y", "es"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})

# BPE-ish tokenizer: runs of letters, runs of digits, or single other
# non-space symbols — the standard pre-tokenization regex shape.
BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def _toks(col: str = "text") -> Column:
    return F.split(F.col(col), " ")


def _sql_list(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def _marker_score(lang: str) -> Column:
    markers = LANG_MARKERS[lang]
    return F.size(
        F.filter(_toks(), lambda t: t.isin(markers))
    ).alias(f"score_{lang}")


@_register(
    "text_token_stats",
    f"""
SELECT doc_id,
       CAST(length(text) AS INTEGER)                          AS n_chars_measured,
       CAST(len(string_split(text, ' ')) AS INTEGER)          AS n_tokens,
       CAST(length(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS INTEGER)
                                                              AS n_bpe_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER)
                                                              AS n_unique_tokens,
       round(length(replace(text, ' ', '')) * 1.0
             / len(string_split(text, ' ')), 6)               AS avg_token_len
FROM documents
""",
)
def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, BPE-ish regex tokens, uniques,
    average token length."""
    d = catalog.load_table(spark, sf_dir, "documents")
    toks = _toks()
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_measured"),
        F.size(toks).alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_ISH_PATTERN), F.lit(0))).alias(
            "n_bpe_tokens"
        ),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            * F.lit(1.0)
            / F.size(toks),
            6,
        ).alias("avg_token_len"),
    )


@_register(
    "text_quality_score",
    f"""
SELECT doc_id,
       n_tokens,
       round(stop_ratio, 6) AS stopword_ratio,
       round(uniq_ratio, 6) AS unique_ratio,
       round(punct_ratio, 6) AS punct_ratio,
       round(0.25 * CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END
           + 0.25 * CASE WHEN stop_ratio >= 0.01 THEN 1.0 ELSE 0.0 END
           + 0.25 * uniq_ratio
           + 0.25 * (1.0 - punct_ratio), 6) AS quality_score
FROM (
  SELECT doc_id,
         CAST(len(toks) AS INTEGER) AS n_tokens,
         len(list_filter(toks, t -> t IN ({_sql_list(STOPWORDS)}))) * 1.0
           / len(toks)                                        AS stop_ratio,
         len(list_distinct(toks)) * 1.0 / len(toks)           AS uniq_ratio,
         coalesce(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
                  * 1.0 / nullif(length(text), 0), 0.0e0)                                     AS punct_ratio
  FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents))
""",
)
def q_text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document-quality scoring: length band, stopword presence,
    lexical diversity, punctuation density → weighted 0-1 score (the
    Gopher/C4-style filter-feature pattern)."""
    d = catalog.load_table(spark, sf_dir, "documents")
    toks = _toks()
    n_tokens = F.size(toks)
    stop_ratio = (
        F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))) * F.lit(1.0) / n_tokens
    )
    uniq_ratio = F.size(F.array_distinct(toks)) * F.lit(1.0) / n_tokens
    # coalesce(try_divide): empty text → punct ratio 0 (oracle mirrors)
    punct_ratio = F.coalesce(
        F.try_divide(
            F.length(F.regexp_replace(F.col("text"), "[a-zA-Z0-9 ]", ""))
            * F.lit(1.0),
            F.length("text"),
        ),
        F.lit(0.0),
    )
    quality = (
        F.lit(0.25) * F.when((n_tokens >= 20) & (n_tokens <= 1000), 1.0).otherwise(0.0)
        + F.lit(0.25) * F.when(stop_ratio >= 0.01, 1.0).otherwise(0.0)
        + F.lit(0.25) * uniq_ratio
        + F.lit(0.25) * (F.lit(1.0) - punct_ratio)
    )
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(uniq_ratio, 6).alias("unique_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(quality, 6).alias("quality_score"),
    )


@_register(
    "text_langid",
    f"""
SELECT doc_id, lang AS labeled_lang,
       CASE
         WHEN s_en = 0 AND s_de = 0 AND s_es = 0 THEN 'und'
         WHEN s_en >= s_de AND s_en >= s_es THEN 'en'
         WHEN s_de >= s_es THEN 'de'
         ELSE 'es'
       END AS predicted_lang
FROM (
  SELECT doc_id, lang,
         len(list_filter(toks, t -> t IN ({_sql_list(LANG_MARKERS["en"])}))) AS s_en,
         len(list_filter(toks, t -> t IN ({_sql_list(LANG_MARKERS["de"])}))) AS s_de,
         len(list_filter(toks, t -> t IN ({_sql_list(LANG_MARKERS["es"])}))) AS s_es
  FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents))
""",
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language ID with a fixed priority tie-break (en>de>es)
    and 'und' when no marker fires. A real deployment swaps the marker
    lists for per-language n-gram profiles; the dataflow is identical."""
    d = catalog.load_table(spark, sf_dir, "documents")
    s = {lang: _marker_score(lang) for lang in ("en", "de", "es")}
    d2 = d.select("doc_id", F.col("lang").alias("labeled_lang"), *s.values())
    predicted = (
        F.when(
            (F.col("score_en") == 0)
            & (F.col("score_de") == 0)
            & (F.col("score_es") == 0),
            "und",
        )
        .when(
            (F.col("score_en") >= F.col("score_de"))
            & (F.col("score_en") >= F.col("score_es")),
            "en",
        )
        .when(F.col("score_de") >= F.col("score_es"), "de")
        .otherwise("es")
    )
    return d2.select("doc_id", "labeled_lang", predicted.alias("predicted_lang"))


@_register(
    "text_fingerprint",
    """
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
         AS content_fingerprint,
       list_reduce([0::BIGINT] || [ascii(c)::BIGINT % 256 FOR c IN string_split(text, '')],
                   (acc, x) -> (acc * 31 + x) % 1000000007)
         AS rolling_hash
FROM documents
""",
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: an order-insensitive content fingerprint
    (sorted unique tokens → md5 — the OpenRefine 'fingerprint' method) and
    an order-sensitive polynomial rolling hash over characters."""
    d = catalog.load_table(spark, sf_dir, "documents")
    toks = _toks()
    content_fp = F.md5(
        F.array_join(F.array_sort(F.array_distinct(toks)), " ")
    )
    chars = F.split(F.col("text"), "")
    rolling = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c) % 256) % 1000000007,
    )
    return d.select(
        "doc_id",
        content_fp.alias("content_fingerprint"),
        rolling.alias("rolling_hash"),
    )


# ---------------------------------------------------------------------------
# TF-IDF — the corpus-level statistic (term frequency × inverse document
# frequency) behind keyword extraction and sparse retrieval. Unlike the
# per-document packs above, this one is inherently distributed: document
# frequency is a corpus aggregation.
# ---------------------------------------------------------------------------


@_register(
    "text_tfidf_topterms",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tok GROUP BY doc_id, term),
df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n)
SELECT doc_id, term, tf, round(tfidf, 6) AS tfidf
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY round(tfidf, 9) DESC, term) AS rk
      FROM scored)
WHERE rk <= 3
""",
)
def q_text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smoothed idf = ln((N+1)/(df+1))+1,
    the scikit-learn convention). Two corpus aggregations (term counts,
    document frequencies) + a broadcast of the tiny df/N side back onto
    the tf stream; ranking rides a WindowGroupLimit. Ties rank by
    9-decimal-rounded score then term, so the result is engine-portable."""
    d = catalog.load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tok.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    tfidf = F.col("tf") * (
        F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.round(F.col("tfidf"), 9).desc(), F.col("term")
    )
    return (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "term", "tf", tfidf.alias("tfidf"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", F.round("tfidf", 6).alias("tfidf"))
    )


# ---------------------------------------------------------------------------
# feature_hash_embedding — hashing-trick document vectors, long format
# ---------------------------------------------------------------------------

_FHASH_DIMS = 16
_FHASH_MOD = 4294967296  # 2^32 — keeps the 31-polynomial fold in int64

_FHASH_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
hashed AS (
  SELECT doc_id,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split(tok, ''),
                            c -> CAST(ascii(c) AS BIGINT))),
           (acc, x) -> (acc * 31 + x) % {_FHASH_MOD}) AS h
  FROM toks
)
SELECT doc_id,
       CAST(h % {_FHASH_DIMS} AS BIGINT) AS dim,
       CAST(sum(CASE WHEN (h // {_FHASH_DIMS}) % 2 = 0
                     THEN 1 ELSE -1 END) AS BIGINT) AS weight
FROM hashed
GROUP BY 1, 2
"""


@_register("feature_hash_embedding", _FHASH_ORACLE)
def q_feature_hash_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick document embeddings (Weinberger et al.'s feature
    hashing): every token folds through an explicit 31-polynomial char
    hash, its hash picks a dimension and a ±1 sign, and the document
    vector is the signed count per dimension — the model-free embedding
    that bridges raw documents into the vector operators (cosine
    near-dup, IVF/PQ search) with no trained encoder and no vocabulary
    table at all.

    Emitted in LONG format (doc_id, dim, weight) — the sparse
    representation a 100 TB corpus wants (dense arrays materialize
    |docs|×dims even for empty dimensions, and the driver-side
    canonicalizer can't hash array cells anyway). Plan: one explode
    pass, the char fold runs entirely in codegen (aggregate over the
    char-code array — no Python, no join, no vocabulary shuffle; THE
    point of the hashing trick), one (doc, dim) aggregation. The hash
    is explicit integer algebra — mod 2³² each step, so it never leaves
    int64 — making the oracle bit-identical rather than
    engine-hash-dependent."""
    return feature_hash_long(catalog.load_table(spark, sf_dir, "documents"))


def feature_hash_long(d: DataFrame) -> DataFrame:
    """The hashing-trick kernel behind ``feature_hash_embedding`` —
    (doc_id, dim, weight) sparse vectors; shared with the quality
    classifier (its feature extractor)."""
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    codes = F.transform(
        F.split(F.col("tok"), ""), lambda c: F.ascii(c).cast("long")
    )
    h = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % F.lit(_FHASH_MOD),
    )
    hashed = toks.select("doc_id", h.alias("h"))
    sign = F.when(
        (F.col("h") / F.lit(_FHASH_DIMS)).cast("long") % 2 == 0, 1
    ).otherwise(-1)
    return hashed.groupBy(
        "doc_id", (F.col("h") % F.lit(_FHASH_DIMS)).alias("dim")
    ).agg(F.sum(sign).alias("weight"))


# ---------------------------------------------------------------------------
# quality_classifier_score — broadcast-weight linear (logistic) scorer
# ---------------------------------------------------------------------------

# Fixed model: one weight per hashed dimension + a bias, as decimal
# strings so BOTH engines parse exact DECIMAL literals (a bare 0.08
# would be DECIMAL in SQL but float in Python). Stands in for trained
# fasttext-style quality-classifier coefficients.
QUALITY_WEIGHTS: tuple[str, ...] = (
    "0.08", "-0.05", "0.11", "-0.02", "0.07", "-0.09", "0.04", "0.01",
    "-0.06", "0.10", "-0.03", "0.05", "-0.08", "0.02", "0.06", "-0.04",
)
QUALITY_BIAS = "-0.10"
# keep iff logit >= 0  ⟺  sigmoid(logit) >= 0.5: sigmoid is monotone,
# so thresholding the LINEAR score is the same decision rule with zero
# cross-engine libm (exp) risk.
QUALITY_LOGIT_THRESHOLD = "0.0"

# DECIMAL(20,18) weights x DECIMAL(10,0) counts keep the product at
# scale 18 EXACTLY on both engines (precision 31 in Spark, 30 in
# DuckDB — under the 38 cap). The wider (32,18) x BIGINT spelling
# silently widens past 38 and Spark REDUCES the product scale to 6,
# rounding every term (the same trap dsir_importance_weights fixes by
# casting tf to DECIMAL(10,0)). Contract: |weight| < 100 with <= 18 dp,
# per-doc feature counts < 1e10 — both comfortably true of
# fasttext-style coefficients and document term counts.
_QUALITY_ORACLE = f"""
WITH feats AS ({_FHASH_ORACLE}),
w(dim, wt) AS (VALUES {", ".join(
    f"({i}, CAST({w} AS DECIMAL(20, 18)))"
    for i, w in enumerate(QUALITY_WEIGHTS)
)})
SELECT doc_id,
       round(CAST(sum(wt * CAST(weight AS DECIMAL(10, 0)))
                  + CAST({QUALITY_BIAS} AS DECIMAL(20, 18)) AS DOUBLE), 6)
         AS logit,
       CAST(sum(wt * CAST(weight AS DECIMAL(10, 0)))
            + CAST({QUALITY_BIAS} AS DECIMAL(20, 18)) AS DOUBLE)
         >= CAST({QUALITY_LOGIT_THRESHOLD} AS DOUBLE) AS keep
FROM feats JOIN w USING (dim)
GROUP BY doc_id
"""


@_register("quality_classifier_score", _QUALITY_ORACLE)
def q_quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier inference — the fasttext-style model-based
    scoring stage production curation pipelines run in front of the
    heuristic (Gopher) rules: a linear scorer over the hashing-trick
    sparse features, weights broadcast as a model table.

    The score emitted is the LOGIT (w·x + b). The logistic probability
    is sigmoid(logit) — strictly monotone — so "prob >= 0.5" is exactly
    "logit >= 0", and the decision rule needs no exp() on either
    engine (cross-engine libm ulp drift is the round-6 lesson; here it
    is designed out rather than tolerated). Weights and bias are exact
    DECIMAL literals, the sparse dot product accumulates wt*count in
    DECIMAL — the sum is reduction-order-exact, so the hash matches the
    oracle under any partitioning.

    Scale shape: features are one explode + one (doc, dim) aggregation
    (the hashing trick's no-vocabulary contract), the weight table is a
    broadcast model table (fasttext's 2M-bucket table is ~30 MB — still
    broadcast territory), and the scoring is one doc-keyed aggregation.
    Nothing in the plan grows super-linearly with the corpus."""
    return quality_classifier_score(
        catalog.load_table(spark, sf_dir, "documents")
    )


def quality_classifier_score(
    d: DataFrame,
    weights: tuple[str, ...] = QUALITY_WEIGHTS,
    bias: str = QUALITY_BIAS,
) -> DataFrame:
    """The parameterized kernel — ``weights[i]``/``bias`` are decimal
    strings (exact literals on both engines). ``weights`` must cover
    every hash dim: the feature→weight join is an inner join on dim, so
    an uncovered dim would silently drop feature rows (and a document
    whose features ALL hash to uncovered dims would vanish from the
    output instead of receiving a bias-only score)."""
    from decimal import Decimal

    if len(weights) != _FHASH_DIMS:
        raise ValueError(
            f"weights must cover all {_FHASH_DIMS} hash dims, "
            f"got {len(weights)}"
        )

    spark = d.sparkSession
    dec = "decimal(20,18)"
    wdf = spark.createDataFrame(
        [(i, Decimal(w)) for i, w in enumerate(weights)],
        f"dim long, wt {dec}",
    )
    # counts as DECIMAL(10,0): (20,18)x(10,0) -> (31,18), scale-exact;
    # wt * BIGINT would widen past precision 38 and Spark would REDUCE
    # the product scale to 6 (the dsir tf lesson)
    logit_dec = F.sum(
        F.col("wt") * F.col("weight").cast("decimal(10,0)")
    ) + F.lit(Decimal(bias)).cast(dec)
    logit = logit_dec.cast("double")
    thresh = F.lit(float(QUALITY_LOGIT_THRESHOLD))
    return (
        feature_hash_long(d)
        .join(F.broadcast(wdf), "dim")
        .groupBy("doc_id")
        .agg(
            F.round(logit, 6).alias("logit"),
            (logit >= thresh).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# tokenizer_vocab_coverage — per-doc OOV rate against the corpus top-K
# ---------------------------------------------------------------------------

VOCAB_TOP_K = 500

_VOCAB_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
vocab AS (
  SELECT tok FROM (
    SELECT tok, count(*) AS n,
           row_number() OVER (ORDER BY count(*) DESC, tok) AS rnk
    FROM tok GROUP BY tok)
  WHERE rnk <= {VOCAB_TOP_K}
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(*) FILTER (v.tok IS NULL) AS BIGINT) AS n_oov,
       round(CAST(count(*) FILTER (v.tok IS NULL) AS DOUBLE)
             / count(*), 6) AS oov_rate
FROM tok t LEFT JOIN vocab v ON v.tok = t.tok
GROUP BY t.doc_id
"""


@_register("tokenizer_vocab_coverage", _VOCAB_ORACLE)
def q_tokenizer_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage audit: build the corpus top-{VOCAB_TOP_K}
    token vocabulary (frequency-ranked, token tie-break) and report each
    document's out-of-vocabulary token rate — the go/no-go check before
    freezing a tokenizer's vocab size, and the per-doc signal that flags
    transliterated/corrupted text.

    Plan: one token frequency aggregation → top-K via
    TakeOrderedAndProject-able rank → BROADCAST vocab membership onto
    the token stream (the corpus side never shuffles for the check) →
    per-doc aggregate."""
    d = catalog.load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_toks()).alias("tok"))
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    vocab = (
        freq.select(
            "tok",
            F.row_number()
            .over(Window.orderBy(F.col("n").desc(), "tok"))
            .alias("rnk"),
        )
        .where(F.col("rnk") <= VOCAB_TOP_K)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    joined = tok.join(F.broadcast(vocab), "tok", "left")
    oov = F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(oov).cast("long").alias("n_oov"),
        F.round(
            F.sum(oov).cast("double") / F.count(F.lit(1)), 6
        ).alias("oov_rate"),
    )


# ---------------------------------------------------------------------------
# tokenizer_greedy_subword — token counts under a frozen subword vocab
# ---------------------------------------------------------------------------

# A frozen WordPiece-style vocabulary: every single letter (the char
# fallback, so alphabetic words never hit UNK) plus multi-char merges.
# Several corpus words are deliberately NOT in the vocab as whole pieces
# (table→tab+le, value→val+ue, stream→str+eam, window→win+dow,
# order→or+der, column→col+um+n, customer→cust+om+er, query→qu+er+y,
# merge→mer+ge, batch→ba+tch, filter→fil+ter, vector→vec+tor,
# dup→d+u+p) so the greedy fold does real segmentation work; the rest
# encode as one piece. Production budgets count THESE tokens, not
# whitespace words — tokens_budget_allocation/tokens_zipf_fit budget in
# words and this operator is the subword upgrade path.
VOCAB_GREEDY_PIECES: tuple[str, ...] = tuple(
    "abcdefghijklmnopqrstuvwxyz"
) + (
    "agg", "ba", "big", "col", "cust", "data", "der", "dow", "eam",
    "er", "fast", "fil", "ge", "group", "hash", "join", "key", "le",
    "line", "mer", "om", "or", "part", "qu", "row", "scan", "slow",
    "small", "sort", "spark", "str", "tab", "tch", "ter", "the",
    "tor", "ue", "um", "val", "vec", "win",
)


def _vocab_values_sql(pieces: tuple[str, ...]) -> str:
    # SQL-escape single quotes so a future piece like "don't" cannot
    # break the oracle at module import
    return ", ".join("('{}')".format(p.replace("'", "''")) for p in pieces)


# The oracle replays the SAME greedy longest-prefix fold as a recursive
# CTE: one step per emitted token, all distinct words advance in
# parallel; the scalar subquery picks max(length(piece)) among vocab
# pieces prefixing the unconsumed suffix — exactly "longest match
# first". No match → advance one char and count an UNK token (the char
# fallback every production tokenizer ends in).


def greedy_fold_ctes(
    with_pieces: bool = False,
    vocab_sql: str | None = None,
    include_words: bool = True,
) -> str:
    """THE greedy-fold CTE chain (words → dw → vocab → step → fin) —
    shared by the tokenizer oracle and every downstream consumer oracle
    (the segment_lines discipline: one fold definition, all oracles
    move together). Callers prepend ``WITH RECURSIVE`` and aggregate
    ``words JOIN fin USING (w)`` however they need.

    ``with_pieces=True`` additionally accumulates the emitted piece
    TEXTS as a list column (an UNK step appends its single unknown
    char): the matched piece is by construction ``substr(w, pos+1,
    len)``, so the accumulation needs no NEW matching logic — it
    repeats the same correlated longest-match probe expression a third
    time (whether DuckDB CSEs the copies is its business; the cost is
    oracle-side only, and a LATERAL that would name the length once
    silently drops rows inside a recursive member in this DuckDB, so
    the repeated-scalar form is the one that is actually correct).

    ``vocab_sql``: SELECT body overriding the frozen
    VOCAB_GREEDY_PIECES VALUES list — the BPE roundtrip oracle feeds
    the LEARNED vocab in (it must exclude '' pieces: a zero-length
    match would stall the fold's position advance). ``include_words=
    False`` omits the words prelude for callers whose CTE chain
    already defines it (same column shape: (doc_id, w)).

    Two probe forms for the longest-match length, same semantics:
    the frozen-VALUES vocab keeps the driver-certified correlated
    scalar subquery; a ``vocab_sql`` vocab is first collapsed into a
    one-row LIST scalar (``vl``, materialized) cross-joined into the
    recursive member and probed with a list comprehension — this
    DuckDB evaluates correlated subqueries over CTE-derived vocabs
    INCORRECTLY inside recursive members (plain: wrong lengths;
    MATERIALIZED: empty), so the list form is the one that is
    actually correct there (measured on the BPE fixture: the
    subquery form misses 'newest' at pos 0 yet finds 'ewest' at
    pos 1)."""
    if vocab_sql is None:
        probe = (
            "(SELECT max(length(piece)) FROM vocab WHERE piece ="
            " substr(step.w, step.pos + 1, length(piece)))"
        )
        vl_cte = ""
        step_from = "FROM step WHERE pos < length(w)"
    else:
        probe = (
            "list_max([length(p) FOR p IN vl.ps IF p ="
            " substr(step.w, step.pos + 1, length(p))])"
        )
        vl_cte = (
            "vl AS MATERIALIZED (SELECT list(piece) AS ps FROM vocab),\n"
        )
        step_from = "FROM step, vl WHERE pos < length(w)"
    pieces_init = ", CAST([] AS VARCHAR[])" if with_pieces else ""
    pieces_step = (
        f",\n         list_append(pieces, substr(step.w, step.pos + 1,"
        f"\n             coalesce({probe}, 1)))"
        if with_pieces
        else ""
    )
    pieces_col = ", pieces" if with_pieces else ""
    words_prelude = (
        """words AS (SELECT doc_id,
                 unnest(string_split(coalesce(text, ''), ' ')) AS w
          FROM documents),
"""
        if include_words
        else ""
    )
    vocab_body = (
        vocab_sql
        if vocab_sql is not None
        else f"VALUES {_vocab_values_sql(VOCAB_GREEDY_PIECES)}"
    )
    return f"""{words_prelude}dw AS (SELECT DISTINCT w FROM words),
vocab(piece) AS ({vocab_body}),
{vl_cte}step(w, pos, n_tok, n_unk{pieces_col}) AS (
  SELECT w, 0, 0, 0{pieces_init} FROM dw
  UNION ALL
  SELECT w,
         pos + coalesce({probe}, 1),
         n_tok + 1,
         n_unk + CASE WHEN {probe} IS NULL
                      THEN 1 ELSE 0 END{pieces_step}
  {step_from}
),
fin AS (SELECT w, n_tok, n_unk{pieces_col} FROM step
        WHERE pos >= length(w))"""


_GREEDY_ORACLE = f"""
WITH RECURSIVE
{greedy_fold_ctes()}
SELECT doc_id,
       CAST(count(*) AS BIGINT)   AS n_words,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       CAST(sum(n_unk) AS BIGINT) AS n_unk
FROM words JOIN fin USING (w)
GROUP BY doc_id
"""


@_register("tokenizer_greedy_subword", _GREEDY_ORACLE)
def q_tokenizer_greedy_subword(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic greedy longest-match subword encoding (the
    WordPiece inference rule: repeatedly take the LONGEST vocab piece
    prefixing the unconsumed suffix; no match → one UNK char step) over
    the frozen VOCAB_GREEDY_PIECES table, reported as per-document
    token counts — the BPE-token budget every production data mix is
    actually planned in.

    Greedy variable-length matching over a per-position suffix is the
    genuinely non-relational case: each step's advance depends on the
    previous match length, so it runs as an Arrow-batched mapInPandas
    fold (the house rule: pandas-batched, never row-at-a-time) with the
    vocab as a broadcast-by-closure frozen set and a per-batch word
    memo — the fixture corpus has ~31 distinct words, so each batch
    tokenizes each word once. Plan shape: PURE MAP — the corpus never
    shuffles, there is no explode, no join, no aggregation; at 100 TB
    the cost is one scan with per-split Python batches. The DuckDB
    oracle replays the identical fold as a recursive CTE (one step per
    token, distinct words advance in parallel), so the hash check
    certifies the greedy semantics end to end."""
    return tokenizer_greedy_subword(
        catalog.load_table(spark, sf_dir, "documents")
    )


def make_greedy_encoder(pieces: tuple[str, ...]):
    """THE single Python implementation of the greedy longest-match
    rule — returns ``(enc, vocab)`` where ``enc(word)`` yields the
    memoized tuple of emitted piece texts (an UNK step emits its
    single unknown char). Both tokenizer kernels (counts and census)
    derive their outputs from this one fold, mirroring the oracle
    side's single ``greedy_fold_ctes`` definition: a future matching
    fix (tie-break, UNK rule) moves every consumer at once. Call
    INSIDE the mapInPandas closure so the memo is per-task."""
    vocab = frozenset(pieces)
    max_len = max(len(p) for p in pieces)
    memo: dict = {}

    def enc(word: str) -> tuple[str, ...]:
        hit = memo.get(word)
        if hit is None:
            out, pos, n = [], 0, len(word)
            while pos < n:
                for plen in range(min(max_len, n - pos), 0, -1):
                    if word[pos : pos + plen] in vocab:
                        out.append(word[pos : pos + plen])
                        pos += plen
                        break
                else:
                    out.append(word[pos])  # UNK: the unknown char
                    pos += 1
            hit = memo[word] = tuple(out)
        return hit

    return enc, vocab


def tokenizer_greedy_subword(
    d: DataFrame,
    pieces: tuple[str, ...] = VOCAB_GREEDY_PIECES,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Parameterized kernel behind ``tokenizer_greedy_subword`` —
    ``d`` needs (doc_id, text); ``pieces`` is the frozen vocab.
    ``carry``: extra input columns passed through the batch unchanged
    (the decode_image_meta pattern — downstream consumers keep their
    payload columns without a re-join, so the pure-map plan shape
    survives composition)."""
    from collections.abc import Iterator

    import pyspark.sql.types as T

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_words", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("n_unk", T.LongType()),
        ]
        + [d.schema[c] for c in carry]
    )

    def tokenize_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        enc, vocab = make_greedy_encoder(pieces)

        for pdf in batches:
            recs = []
            # positional zip over named columns, NOT itertuples: pandas
            # renames keyword/invalid-identifier columns to _N in
            # namedtuples, which would break a generic carry column
            for doc_id, text, *extras in zip(
                pdf["doc_id"], pdf["text"], *(pdf[c] for c in carry)
            ):
                words = (text or "").split(" ")
                n_tok = n_unk = 0
                for w in words:
                    ps = enc(w)
                    n_tok += len(ps)
                    n_unk += sum(1 for p in ps if p not in vocab)
                rec = {
                    "doc_id": doc_id,
                    "n_words": len(words),
                    "n_tokens": n_tok,
                    "n_unk": n_unk,
                }
                rec.update(zip(carry, extras))
                recs.append(rec)
            yield pd.DataFrame.from_records(recs)

    return d.select("doc_id", "text", *carry).mapInPandas(
        tokenize_batches, schema=out_schema
    )


def tokenizer_greedy_subword_jvm(
    d: DataFrame,
    pieces: tuple[str, ...] = VOCAB_GREEDY_PIECES,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Pure-JVM alternative to ``tokenizer_greedy_subword`` — the
    round-10 verdict's measure-the-alternative task: the same greedy
    longest-match fold expressed as Catalyst expressions so no Python
    worker ever runs. Shape: distinct words (the Arrow path's memo,
    made relational) → per-word fold via nested F.aggregate — outer
    fold over char positions carrying (next_pos, n_tok, n_unk), inner
    argmax-length probe over a descending length literal with
    array_contains against the vocab literal — → broadcast join back
    to word occurrences → per-doc aggregation.

    ADJUDICATION (measured, tools/encoder_ab_r11.py — interleaved
    3-rep A/B on the 50k-doc 10x corpus, identical checksums): this
    JVM path WINS the small-scale wall clock — 1.39-1.58 s warm vs the
    Arrow fold's 2.04-2.11 s (~1.4x) — because Python worker startup +
    Arrow transfer dominate a 2-second query. The Arrow fold STAYS the
    production path for all five consumers anyway, on the scale
    argument: this path's word-distinct stats table must reach every
    occurrence by BROADCAST join, and web-scale corpora have hundreds
    of millions of distinct words (broadcast infeasible; demoting to a
    shuffle join forfeits exactly the shuffle-freedom that makes the
    Arrow map scale), while its per-char probe is O(max_len · |vocab|)
    linear scans of the vocab literal — fine at |vocab| ~= 50, wrong at
    a production 30-50k vocab where the Python frozenset probe is O(1).
    Kept exported for the regime where it wins: bounded vocab AND a
    corpus whose distinct-word table broadcasts (ARCHITECTURE.md
    round 11 has the table)."""
    max_len = max(len(p) for p in pieces)
    vocab_arr = F.array(*[F.lit(p) for p in pieces])
    lens_desc = F.array(
        *[F.lit(k) for k in range(max_len, 0, -1)]
    )

    n = F.length("w")
    # 0-based char positions; sequence() descends for negative spans,
    # so the empty word guards to an empty array explicitly
    idx = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.expr("CAST(array() AS array<int>)")
    )
    zero = F.struct(
        F.lit(0).alias("nxt"),
        F.lit(0).cast("long").alias("ntok"),
        F.lit(0).cast("long").alias("nunk"),
    )

    def probe(i):
        # longest vocab piece prefixing w[i:] (1-based substr)
        return F.aggregate(
            lens_desc,
            F.lit(0),
            lambda a, ln: F.when(
                (a == 0)
                & (ln <= n - i)
                & F.array_contains(
                    vocab_arr, F.col("w").substr(i + 1, ln)
                ),
                ln,
            ).otherwise(a),
        )

    def step(acc, i):
        mlen = probe(i)
        return F.when(i < acc["nxt"], acc).otherwise(
            F.when(
                mlen == 0,
                F.struct(
                    (i + 1).alias("nxt"),
                    (acc["ntok"] + 1).alias("ntok"),
                    (acc["nunk"] + 1).alias("nunk"),
                ),
            ).otherwise(
                F.struct(
                    (i + mlen).alias("nxt"),
                    (acc["ntok"] + 1).alias("ntok"),
                    acc["nunk"].alias("nunk"),
                )
            )
        )

    fold = F.aggregate(
        idx,
        zero,
        step,
        lambda acc: F.struct(
            acc["ntok"].alias("ntok"), acc["nunk"].alias("nunk")
        ),
    )

    words = d.select(
        "doc_id",
        *carry,
        F.explode(
            F.split(F.coalesce(F.col("text"), F.lit("")), " ")
        ).alias("w"),
    )
    w_stats = words.select("w").distinct().select("w", fold.alias("s"))
    return (
        words.join(F.broadcast(w_stats), "w")
        .groupBy("doc_id", *carry)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("s.ntok").cast("long").alias("n_tokens"),
            F.sum("s.nunk").cast("long").alias("n_unk"),
        )
        .select("doc_id", "n_words", "n_tokens", "n_unk", *carry)
    )


# ---------------------------------------------------------------------------
# tokenizer_piece_frequencies — corpus vocab-usage census
# ---------------------------------------------------------------------------

_PIECE_FREQ_ORACLE = f"""
WITH RECURSIVE
{greedy_fold_ctes(with_pieces=True)},
tok AS (SELECT doc_id, unnest(f.pieces) AS piece
        FROM words JOIN fin f USING (w))
SELECT piece,
       CAST(count(*) AS BIGINT)             AS n_occurrences,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM tok GROUP BY piece
"""


@_register("tokenizer_piece_frequencies", _PIECE_FREQ_ORACLE)
def q_tokenizer_piece_frequencies(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Vocab-USAGE census under the frozen greedy encoder: for every
    emitted piece (UNK steps emit their single unknown char), its
    corpus occurrence count and document frequency — the audit a
    tokenizer team runs before retiring dead vocab entries or merging
    hot piece sequences, and the per-piece denominator behind
    compression-ratio dashboards.

    Plan: the encoder is the same Arrow-batched pure map as
    tokenizer_greedy_subword but emits per-(doc, piece) counts
    (pre-aggregated inside the batch via a Counter, so the shuffle
    carries at most |vocab| rows per doc, not per-token rows); the
    ONLY exchange is the final piece-keyed aggregation over a key
    space bounded by |vocab| + |unknown chars|. The oracle extends the
    SHARED greedy-fold CTE chain with a pieces list accumulated from
    the existing longest-match length — one fold definition, now
    certified at the piece-sequence level, not just the counts."""
    return tokenizer_piece_frequencies(
        catalog.load_table(spark, sf_dir, "documents")
    )


def tokenizer_piece_frequencies(
    d: DataFrame, pieces: tuple[str, ...] = VOCAB_GREEDY_PIECES
) -> DataFrame:
    """Parameterized kernel behind ``tokenizer_piece_frequencies`` —
    derives its piece stream from the SAME ``make_greedy_encoder``
    fold as the counts kernel (one matching implementation, every
    consumer moves together).

    Precondition: ``doc_id`` must be unique in ``d`` (true for the
    documents table, whose key it is). The final aggregation counts
    ``n_docs`` as ``count(*)`` because the per-doc Counter emits each
    piece at most once per document — duplicate ``doc_id`` rows would
    silently inflate ``n_docs`` relative to ``count(DISTINCT doc_id)``.
    Callers with possibly-duplicated inputs must
    ``dropDuplicates(["doc_id"])`` first."""
    from collections.abc import Iterator

    import pyspark.sql.types as T

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("piece", T.StringType()),
            T.StructField("cnt", T.LongType()),
        ]
    )

    def count_batches(batches: Iterator) -> Iterator:
        from collections import Counter

        import pandas as pd

        enc, _ = make_greedy_encoder(pieces)

        for pdf in batches:
            recs = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                c: Counter = Counter()
                for w in (text or "").split(" "):
                    c.update(enc(w))
                recs.extend(
                    {"doc_id": doc_id, "piece": p, "cnt": n}
                    for p, n in c.items()
                )
            yield pd.DataFrame.from_records(
                recs, columns=["doc_id", "piece", "cnt"]
            )

    per_doc = d.select("doc_id", "text").mapInPandas(
        count_batches, schema=out_schema
    )
    # count(*) == count(DISTINCT doc_id) here BY CONSTRUCTION: the
    # per-doc Counter emits each piece at most once per document (and
    # doc_id is the documents table's key), so the distinct machinery —
    # and its second (piece, doc_id) exchange — would be pure overhead
    return per_doc.groupBy("piece").agg(
        F.sum("cnt").cast("long").alias("n_occurrences"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# tokenizer_bpe_train — learn a merge-pair vocabulary from the corpus
# ---------------------------------------------------------------------------

# Number of merge steps the registry query learns. Bounded and FIXED so
# the oracle (one chained CTE block per step) and the engine always run
# the same number of iterations; the hand fixture corpus (the classic
# low/lower/newest/widest example from Sennrich et al. 2016, "Neural
# Machine Translation of Rare Words with Subword Units") exhausts to
# whole words in exactly this many merges.
BPE_MERGE_STEPS = 12


def _bpe_step_ctes(k: int) -> str:
    """One BPE merge step as a CTE block: count adjacent piece pairs
    over the previous step's sequences (weighted by word frequency),
    pick the argmax pair (lexicographic (lhs, rhs) tie-break), apply it
    everywhere. Sequences are encoded as ``@tok@@tok@...@tok@`` strings
    — every token wrapped in ``@`` sentinels — so a single ``replace``
    of ``@l@@r@`` with ``@lr@`` IS the left-to-right non-overlapping
    merge (the consumed trailing sentinel makes adjacent occurrences
    like ``a a a`` merge as ``(aa) a``, exactly the Spark fold's rule).
    Safe because '@' cannot appear inside a token: the corpus alphabet
    is the documents table's a-z + space (the engine side never uses a
    separator at all, so any future corpus that violated this would
    fail the hash gate loudly, not silently)."""
    prev = f"seq{k - 1}"
    # AS MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and
    # seq{k}/best{k} are each referenced twice per step — inlined, the
    # N-step chain expands 2^N-fold and never finishes
    return f"""toks{k} AS (SELECT cnt, string_split(trim(seq, '@'), '@@') AS t
           FROM {prev}),
pairs{k} AS (SELECT l, r, sum(cnt) AS c FROM (
    SELECT cnt,
           unnest([t[i] FOR i IN range(1, len(t))]) AS l,
           unnest([t[i + 1] FOR i IN range(1, len(t))]) AS r
    FROM toks{k}) GROUP BY l, r),
best{k} AS MATERIALIZED (SELECT l, r, c FROM pairs{k}
                         ORDER BY c DESC, l, r LIMIT 1),
seq{k} AS MATERIALIZED (SELECT w.cnt,
                  replace(w.seq, '@' || b.l || '@@' || b.r || '@',
                          '@' || b.l || b.r || '@') AS seq
           FROM {prev} w, best{k} b)"""


def _bpe_train_ctes(n_merges: int = BPE_MERGE_STEPS) -> str:
    """The full trainer chain (wc → seq0 → toks/pairs/best/seq 1..N) —
    shared by the trainer oracle and the roundtrip oracle (the
    greedy_fold_ctes discipline: one definition, all consumers move
    together). Expects a ``words(doc_id, w)`` CTE upstream."""
    steps = ",\n".join(_bpe_step_ctes(k) for k in range(1, n_merges + 1))
    return f"""wc AS (SELECT w, count(*) AS cnt FROM words
          WHERE w <> '' GROUP BY w),
seq0 AS (SELECT cnt,
                -- (?s): '.' must match newline chars too — the engine's
                -- F.split(w, '') keeps them, and a silent drop here
                -- would diverge the merge tables on any corpus with a
                -- newline inside a space-delimited word
                '@' || array_to_string(regexp_extract_all(w, '(?s).'), '@@')
                    || '@' AS seq
         FROM wc),
{steps}"""


def _bpe_merges_select(n_merges: int = BPE_MERGE_STEPS) -> str:
    """SELECT over the trainer chain producing the merge table."""
    return " UNION ALL ".join(
        f"SELECT {k} AS step, l AS lhs, r AS rhs, l || r AS merged,"
        f" CAST(c AS BIGINT) AS pair_count FROM best{k}"
        for k in range(1, n_merges + 1)
    )


_BPE_TRAIN_ORACLE = f"""
WITH words AS (SELECT doc_id,
                      unnest(string_split(coalesce(text, ''), ' ')) AS w
               FROM documents),
{_bpe_train_ctes()}
{_bpe_merges_select()}
"""


@_register("tokenizer_bpe_train", _BPE_TRAIN_ORACLE)
def q_tokenizer_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-pair vocabulary TRAINER (Sennrich et al. 2016) — the
    frozen-vocab encoder's missing half: learn BPE_MERGE_STEPS merges
    from the corpus by iterating (count adjacent piece pairs corpus-
    wide weighted by word frequency → pick the argmax pair, ties broken
    lexicographically on (lhs, rhs) → merge it everywhere, left-to-
    right non-overlapping). Output: the ordered merge table — the
    artifact a tokenizer team ships.

    Plan shape per step: ONE map-side pair explode over the DISTINCT-
    word working set + one pair-keyed partial/final aggregation; the
    merge application is a pure-JVM F.aggregate fold (no UDF anywhere).
    The corpus itself is scanned exactly once (the word-frequency
    groupBy); all N iterations run on the vocab-scale word table —
    the standard trainer decomposition, which is why BPE training is
    tractable at 100 TB: the loop state is |distinct words|, not
    corpus rows. Each step collects exactly ONE row (the argmax pair)
    to drive the next broadcast merge — the pagerank-style bounded
    per-iteration driver scalar, not a data collect. The oracle replays
    the identical N steps as chained CTEs, merging via sentinel-
    delimited string replace (see _bpe_step_ctes)."""
    return bpe_train_merges(
        catalog.load_table(spark, sf_dir, "documents")
    )


def _bpe_word_pieces(d: DataFrame) -> DataFrame:
    """Trainer working set: the DISTINCT-word frequency table with each
    word split to its character list (no empty words, no empty pieces).
    This is the ONLY corpus-scale scan the trainer ever runs — all N
    iterations operate on this vocab-scale table."""
    return (
        d.select(
            F.explode(
                F.split(F.coalesce(F.col("text"), F.lit("")), " ")
            ).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # split on the empty pattern = the character list
        .select("cnt", F.split("w", "").alias("pieces"))
    )


def _bpe_pair_counts(pieces: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-pair counts, map-side: zip the piece
    array with its own tail via a struct-typed transform over the
    0-based lambda index (no posexplode self-join — the explode feeds
    the pair-keyed partial/final aggregation directly)."""
    return (
        pieces.select(
            "cnt",
            F.explode(
                F.expr(
                    "transform(slice(pieces, 1, size(pieces) - 1),"
                    " (x, i) -> struct(x AS lhs, pieces[i + 1] AS rhs))"
                )
            ).alias("pr"),
        )
        .groupBy("pr.lhs", "pr.rhs")
        .agg(F.sum("cnt").alias("c"))
    )


def _bpe_merge_fold(l: str, r: str):
    """The merge-(l, r) fold as a COLUMN over ``pieces``: left-to-right
    non-overlapping, pure JVM (F.aggregate — no UDF). acc.prev holds
    the last uncommitted token; (prev=l, x=r) fuses into l||r which
    STAYS pending (strictly longer than l, so it can never left-match
    again this step) — exactly the oracle's sentinel-replace
    semantics. Shared by the recount path's full application and the
    delta path's affected-only application."""
    merged = l + r
    zero = F.struct(
        F.expr("CAST(array() AS array<string>)").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )

    def flush(acc):
        return F.when(acc["prev"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["prev"]))
        )

    return F.aggregate(
        "pieces",
        zero,
        lambda acc, x: F.when(
            (acc["prev"] == F.lit(l)) & (x == F.lit(r)),
            F.struct(acc["out"].alias("out"), F.lit(merged).alias("prev")),
        ).otherwise(F.struct(flush(acc).alias("out"), x.alias("prev"))),
        flush,
    )


def _bpe_apply_merge(pieces: DataFrame, l: str, r: str) -> DataFrame:
    """Apply merge (l, r) everywhere — the recount path's full pass."""
    return pieces.select("cnt", _bpe_merge_fold(l, r).alias("pieces"))


def bpe_train_merges(
    d: DataFrame,
    n_merges: int = BPE_MERGE_STEPS,
    _round_log: list | None = None,
) -> DataFrame:
    """Parameterized trainer kernel — ``d`` needs (doc_id, text).
    Returns the merge table (step, lhs, rhs, merged, pair_count).
    Stops early (fewer rows) only if the corpus exhausts to whole
    words before ``n_merges`` — the registry corpora never do.
    Rides the BATCHED non-interacting merge loop (round 12) — output
    bit-identical to the sequential K=1 schedule, jobs sublinear in
    ``n_merges``. ``_round_log``: measurement hook — one
    (n_merges_applied, wall_seconds) tuple per cluster round
    (tools/bpe_batch_ab_r12.py)."""
    from .. import session

    return _bpe_train_from_pieces_batched(
        d.sparkSession,
        session.stage(_bpe_word_pieces(d)),
        n_merges,
        _round_log=_round_log,
    )


def _adjacent_pair_pred(l: str, r: str):
    """True iff the word's piece list contains (l, r) ADJACENT — the
    affected-word predicate of the delta trainer. Built with the lambda
    API (not an expr string) so arbitrary corpus pieces — quotes,
    backslashes — never need SQL escaping."""
    pairs = F.expr(
        "transform(slice(pieces, 1, size(pieces) - 1),"
        " (x, i) -> struct(x AS lhs, pieces[i + 1] AS rhs))"
    )
    return F.exists(
        pairs, lambda p: (p["lhs"] == F.lit(l)) & (p["rhs"] == F.lit(r))
    )


def _bpe_pair_deltas(col, sign: int):
    """Adjacent-pair delta structs for one word: array<struct<lhs, rhs,
    c>> where c = sign * cnt — the raw (unaggregated) pair-count
    contributions the delta trainer feeds straight into its single
    pair-keyed aggregation. ``col`` is the piece-array column (the
    stored array for the negative leg, the merge fold's output for the
    positive leg)."""
    head = F.slice(col, F.lit(1), F.size(col) - 1)
    return F.transform(
        head,
        lambda x, i: F.struct(
            x.alias("lhs"),
            F.get(col, i + 1).alias("rhs"),
            (F.lit(sign) * F.col("cnt")).cast("long").alias("c"),
        ),
    )


def _bpe_train_from_pieces(
    spark: SparkSession,
    pieces: DataFrame,
    n_merges: int,
    _step_seconds: list | None = None,
) -> DataFrame:
    """The merge loop over an already-STAGED (cnt, pieces) word table —
    split out so the roundtrip can share one corpus scan between the
    trainer and its alphabet derivation.

    INCREMENTAL PAIR-DELTA maintenance (the standard trainer scale
    fix): a staged pair-count table rides along with the word table,
    so each step's argmax is a read of that table, NOT a fresh
    corpus-wide pair recount. After choosing merge (l, r), only words
    whose piece list contains (l, r) adjacent can change any pair
    count — so each step does exactly two narrow things plus ONE
    shuffle: (1) affected words emit ±pair delta rows in a single pass
    (old pairs at -cnt, post-merge pairs at +cnt — _bpe_pair_deltas);
    (2) the carried pair table unions those rows through one pair-
    keyed aggregation; (3) the word table is rewritten by a
    conditional in-place fold (unaffected rows short-circuit).
    Unaffected words' counts carry forward untouched. Identity with
    the full-recount path (kept below as
    ``_bpe_train_from_pieces_recount``) is exact — counts(after) =
    counts(before) - counts(affected_before) + counts(affected_after)
    because unaffected words are unchanged — and is pinned by tests on
    the Sennrich fixture and both registry scales. Per-step shuffled
    bytes drop from O(all pairs of all words) to O(pairs of affected
    words): at production merge counts (N≈30k-50k) the affected
    fraction collapses as the vocab converges, which is what makes
    the loop tractable (measured table in ARCHITECTURE.md, round 11).

    Both loop frames are truncated to plan LEAVES per step with lazy
    ``localCheckpoint`` (the pipeline.py:553 precedent): a persist
    chain keeps the full logical tree, so N-step lineage makes every
    later persist re-stringify O(N) nested plans — a treeString OOM
    well before any data cost. The GraphX/MLlib iterative-lineage
    trade, accepted here for the same reason — and with the same
    FAULT-TOLERANCE cost: localCheckpoint blocks are executor-local,
    so losing an executor mid-loop kills the job (lineage is gone; the
    restarted job re-trains from the corpus). Checkpoint storage holds
    O(vocab) blocks per step until ContextCleaner GC; a production run
    that needs executor-loss survival swaps in reliable checkpoint()
    to the cluster FS at the documented ~2x step-latency cost."""
    import time

    merges: list[tuple[int, str, str, str, int]] = []
    pc = _bpe_pair_counts(pieces).localCheckpoint(eager=False)
    for step in range(1, n_merges + 1):
        t0 = time.monotonic()
        # argmax over the MAINTAINED pair table — the only action per
        # step (the pagerank-style bounded driver scalar)
        top = (
            pc.where(F.col("c") > 0)
            .orderBy(F.desc("c"), "lhs", "rhs")
            .first()
        )
        if top is None:
            break
        l, r, c = top["lhs"], top["rhs"], int(top["c"])
        merges.append((step, l, r, l + r, c))
        pred = _adjacent_pair_pred(l, r)
        fold = _bpe_merge_fold(l, r)
        # ±pair delta rows from the AFFECTED words only, in one narrow
        # pass: each affected word emits its old adjacent pairs at
        # -cnt and its post-merge pairs at +cnt; the single pair-keyed
        # aggregation below folds them into the carried counts. Counts
        # stay ≥ 0 (the negations are a subset of what pc already
        # holds); the != 0 filter drops fully-consumed pairs so the
        # argmax table tracks the LIVE pair vocabulary.
        delta = (
            pieces.where(pred)
            .select(
                F.explode(
                    F.concat(
                        _bpe_pair_deltas(F.col("pieces"), -1),
                        _bpe_pair_deltas(fold, +1),
                    )
                ).alias("pr")
            )
            .select("pr.lhs", "pr.rhs", F.col("pr.c").alias("c"))
        )
        pc = (
            pc.unionAll(delta)
            .groupBy("lhs", "rhs")
            .agg(F.sum("c").alias("c"))
            .where(F.col("c") != 0)
            .localCheckpoint(eager=False)
        )
        # in-place conditional merge: unaffected rows short-circuit the
        # CaseWhen, so the fold only runs on affected words; a SINGLE
        # reference to the prior frame keeps both the logical tree and
        # the partitioning flat across all N steps (no union — a
        # two-reference split here measurably doubled partitions per
        # step: 32768 tasks in one stage by merge 12 at sf0.01)
        pieces = pieces.select(
            "cnt", F.when(pred, fold).otherwise(F.col("pieces")).alias("pieces")
        ).localCheckpoint(eager=False)
        if step % BPE_EAGER_EVERY == 0:
            # hard-truncate the physical graph (BPE_EAGER_EVERY note:
            # lazy checkpoints alone accumulate task-closure depth —
            # measured StackOverflowError at ~122 steps without this)
            pieces = pieces.localCheckpoint(eager=True)
            pc = pc.localCheckpoint(eager=True)
        if _step_seconds is not None:
            _step_seconds.append(time.monotonic() - t0)

    return spark.createDataFrame(
        merges,
        schema="step INT, lhs STRING, rhs STRING, merged STRING,"
        " pair_count BIGINT",
    )


BPE_BATCH_TOP_M = 64  # pair-table rows collected per batched round

# Force an EAGER localCheckpoint on both loop frames every this many
# rounds: lazy checkpoints truncate the logical plan, but the physical
# RDD graph shipped inside task closures still accumulates depth across
# rounds (measured: a tie-heavy corpus driving pure K=1 rounds dies
# with a task-deserialization StackOverflowError at ~122 rounds without
# this; with it, 400+ rounds run flat). One extra job per
# BPE_EAGER_EVERY rounds — amortized noise.
BPE_EAGER_EVERY = 24


def _bpe_merge_rule_map(pairs: list[tuple[str, str]]):
    """lhs -> struct(rhs, merged) literal map for a NON-INTERACTING
    merge batch (distinct lhs is guaranteed: two rules sharing a lhs
    share a token and can never be batched together)."""
    return F.create_map(
        *[
            x
            for l, r in pairs
            for x in (
                F.lit(l),
                F.struct(
                    F.lit(r).alias("rhs"), F.lit(l + r).alias("merged")
                ),
            )
        ]
    )


def _bpe_multi_merge_fold(pairs: list[tuple[str, str]]):
    """ONE left-to-right non-overlapping pass applying a whole batch of
    mutually NON-INTERACTING merges (no two rules share a lhs/rhs/
    merged string): at most one rule can fire at any position, a fused
    token can never left-match again (no rule's lhs equals any merged
    string), so the single pass is exactly the composition of the K
    per-rule folds in any order — the property the batched trainer's
    equality proof leans on. K=1 degenerates to _bpe_merge_fold's
    semantics (pinned by the equality tests)."""
    m = _bpe_merge_rule_map(pairs)
    zero = F.struct(
        F.expr("CAST(array() AS array<string>)").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )

    def flush(acc):
        return F.when(acc["prev"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["prev"]))
        )

    def step(acc, x):
        # "" is a safe null sentinel: pieces are never empty strings
        ent = F.element_at(m, F.coalesce(acc["prev"], F.lit("")))
        return F.when(
            ent.isNotNull() & (x == ent["rhs"]),
            F.struct(acc["out"].alias("out"), ent["merged"].alias("prev")),
        ).otherwise(F.struct(flush(acc).alias("out"), x.alias("prev")))

    return F.aggregate("pieces", zero, step, flush)


def _bpe_multi_pair_pred(pairs: list[tuple[str, str]]):
    """True iff the word's piece list contains ANY batch rule's (lhs,
    rhs) adjacent — the batched affected-word predicate (lambda API,
    no SQL escaping; one map lookup per adjacency)."""
    m = _bpe_merge_rule_map(pairs)
    prs = F.expr(
        "transform(slice(pieces, 1, size(pieces) - 1),"
        " (x, i) -> struct(x AS lhs, pieces[i + 1] AS rhs))"
    )
    return F.exists(
        prs,
        lambda p: F.coalesce(
            F.element_at(m, p["lhs"])["rhs"] == p["rhs"], F.lit(False)
        ),
    )


def _bpe_batch_schedule(
    rows: list, token_set: set, remaining: int, top_m: int
) -> list[tuple[str, str, int]]:
    """Driver-side batch selection over the collected top-``top_m``
    pair rows (sorted by the argmax order: c DESC, lhs, rhs) — returns
    the longest prefix PROVABLY equal to running the sequential K=1
    argmax loop, by this argument:

    - Walk the prefix; STOP at the first row that interacts with an
      already-chosen rule (shares a lhs/rhs/merged string) or whose
      merged string collides with an existing token (``token_set`` =
      corpus alphabet + all merges so far — exact and driver-known, so
      the check is free). Call the stop row's count c_q; if the list
      was exhausted at full ``top_m`` length, c_q = the last row's
      count (unseen rows below can't exceed it).
    - TRIM the chosen prefix to rows with count STRICTLY > c_q.

    Why the trimmed prefix replays the sequential loop exactly: within
    the prefix no rule changes any other prefix rule's count (non-
    interaction, and collisions — the one way a merge can INCREASE an
    existing pair's count — are excluded), so each chosen count is the
    true count at its sub-step, and the prefix order is the argmax
    tie-break order. Every pair the sequential loop could prefer
    instead is (a) a skipped/unseen pair — count <= c_q by sort order,
    (b) a pair whose count only DECREASED (loses to its own stale
    rank), or (c) a pair CREATED by an earlier prefix merge — every
    created pair (x, l+r) / (l+r, y) / (l+r, l+r) contains an
    adjacency ((x, l), (r, y), (r, l) respectively) that SHARES a
    token with the chosen rule, so its count is bounded by the stale
    count of an interacting pair — skipped or unseen, hence <= c_q —
    UNLESS that interacting pair is the chosen rule itself, which
    happens exactly when l == r (a run [t,t,t] folds to [tt,t],
    creating (tt, t) at up to the rule's own count). SELF-PAIRS are
    therefore treated like collisions: exact as a K=1 singleton, never
    inside a batch. The strict > c_q trim makes (a)-(c) lose outright
    (no tie-break exposure: created pairs carry fresh token strings
    that could win a lexicographic tie). If trimming empties the
    batch, the single argmax row is returned (K=1 is trivially exact,
    collisions and self-pairs included — the delta maintenance is
    string-keyed).

    TIE SPLITTING (round 13 — the strict trim rejected the WHOLE tie
    level, degrading tie-heavy vocabularies to near-K=1 rounds): a
    chosen member AT count c_q is still provably safe unless a pair
    created by an EARLIER chosen rule can tie it at exactly c_q and
    win the lexicographic tie-break. Creation counts are bounded by
    the stale count of an adjacency pair that INTERACTS with the
    creating rule, and every in-list interacting pair sits at or
    after the stop row (it would otherwise have stopped the walk
    sooner), so the bound reaches c_q only through (i) an in-list
    row at count == c_q at/after the stop that shares a token with
    the creating rule, or (ii) an unseen pair, possible at c_q only
    when the page is full and its tail still sits at c_q (unseen
    counts are <= the last row's). Unseen NON-created pairs can also
    tie c_q, but they sort lexicographically after every in-list row
    at that count, so they lose the tie to any chosen member. Hence:
    keep the tie prefix up to (and including) the first DANGEROUS
    rule — one with an interacting tie-level row after the stop —
    and drop tie members after it; with a full page still tied at
    its tail, every rule is dangerous and only a leading tie member
    survives. Equality pins: tie-splitting unit corpus + the
    tie-heavy A/B in ARCHITECTURE.md (round 13)."""
    chosen: list[tuple[str, str, int]] = []
    chosen_tokens: set = set()
    c_q = None
    for l, r, c in rows:
        merged = l + r
        if chosen and ({l, r, merged} & chosen_tokens):
            c_q = c
            break
        if merged in token_set or l == r:
            if not chosen:
                return [(l, r, c)]
            c_q = c
            break
        chosen.append((l, r, c))
        chosen_tokens |= {l, r, merged}
    else:
        if len(rows) == top_m:
            c_q = rows[-1][2]
    if c_q is not None:
        full_tail_tied = len(rows) == top_m and rows[-1][2] == c_q
        cut = len(chosen)
        if full_tail_tied:
            # unseen pairs can tie c_q and interact with ANY rule:
            # every rule is dangerous -> keep at most one tie member
            # (nothing precedes the first chosen rule)
            danger = 0
        else:
            tie_after = [
                {al, ar, al + ar}
                for al, ar, ac in rows[len(chosen):]
                if ac == c_q
            ]
            danger = None
            for j, (l, r, _) in enumerate(chosen):
                toks = {l, r, l + r}
                if any(toks & t for t in tie_after):
                    danger = j
                    break
        for i, t in enumerate(chosen):
            if t[2] == c_q and danger is not None and i > danger:
                cut = i
                break
        chosen = chosen[:cut]
    if not chosen:
        l, r, c = rows[0]
        return [(l, r, c)]
    return chosen[:remaining]


#: driver-local switchover bound for the HYBRID trainer: when the
#: DISTINCT-WORD table has at most this many rows, pull it once and
#: finish every merge in memory (the HF-tokenizers / SentencePiece
#: production shape — the distributed part of real BPE training is the
#: word-COUNT aggregation, which compresses any corpus to its distinct
#: words; even TB-scale web corpora land at ~1e7-1e8 rows, and below
#: this bound the local loop is exact, bit-identical and free of
#: per-merge scheduler latency). Above the bound the distributed
#: batched loop below takes over — the overflow regime for
#: vocabularies that genuinely don't fit one machine.
BPE_LOCAL_MAX_WORDS = 100_000


def _bpe_apply_merge_local(pieces: list, l: str, r: str) -> list:
    """Pure-Python twin of _bpe_merge_fold: left-to-right
    non-overlapping, the fused token stays pending and can never
    left-match again this step (merged != l — r is non-empty)."""
    out: list = []
    prev = None
    for x in pieces:
        if prev == l and x == r:
            prev = l + r
        else:
            if prev is not None:
                out.append(prev)
            prev = x
    if prev is not None:
        out.append(prev)
    return out


def _bpe_train_local(
    words: list, n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """Driver-local exact trainer over the collected (cnt, pieces)
    word table: same argmax (count DESC, then lexicographic (lhs,
    rhs) — Python code-point order == Spark UTF8 binary order ==
    DuckDB binary collation for valid UTF-8), same left-to-right
    fold, so the merge table is bit-identical to the distributed
    loops (equality pinned on every fixture and the registry corpus).
    Naive full recount per step — O(words x pieces) per merge is
    microseconds at the bound; a production local trainer would use
    the same pair-delta trick in memory."""
    from collections import Counter

    words = [(int(cnt), list(pieces)) for cnt, pieces in words]
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, n_merges + 1):
        counts: Counter = Counter()
        for cnt, pieces in words:
            for a, b in zip(pieces, pieces[1:]):
                counts[(a, b)] += cnt
        if not counts:
            break
        (l, r), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((step, l, r, l + r, c))
        words = [
            (cnt, _bpe_apply_merge_local(pieces, l, r))
            for cnt, pieces in words
        ]
    return merges


def _bpe_train_from_pieces_batched(
    spark: SparkSession,
    pieces: DataFrame,
    n_merges: int,
    top_m: int = BPE_BATCH_TOP_M,
    local_max_words: int = BPE_LOCAL_MAX_WORDS,
    _round_log: list | None = None,
) -> DataFrame:
    """The PRODUCTION trainer loop: the round-11 incremental pair-delta
    maintenance (see _bpe_train_from_pieces — identical carried pair
    table, ±delta pass over affected words, single-reference
    conditional fold, lazy localCheckpoint leaves; the fault-tolerance
    caveat there applies verbatim) with the round-12 fix for the LAST
    scale wall: jobs-per-merge. The K=1 loop pays one driver round
    trip per merge — flat ~0.45 s/step means a production N≈30-50k
    vocabulary is hours of pure scheduler latency. Here each round
    collects the top-``top_m`` rows of the maintained pair table in
    ONE action, selects the longest batch of merges PROVABLY equal to
    the sequential argmax schedule (_bpe_batch_schedule — the parallel
    -BPE non-interaction condition hardened with a collision check and
    a strict count cutoff so equality is exact, not approximate), and
    applies the whole batch in one delta pass + one fold pass. Output
    is bit-identical to the K=1 loop (equality pinned on the Sennrich
    fixture, adversarial corner corpora and both registry scales);
    jobs drop from N to the round count — measured sublinear wall
    growth in N (jobs-vs-N table in ARCHITECTURE.md, round 12).

    ``_round_log``: measurement hook — receives one (n_merges_applied,
    wall_seconds) tuple per round.

    HYBRID switch (round 12, closing the jobs-per-merge wall for the
    realistic regime): when the staged distinct-word table is at most
    ``local_max_words`` rows, it is pulled ONCE and the whole merge
    schedule runs driver-local (_bpe_train_local — bit-identical
    semantics), so training costs exactly one distributed word-count
    aggregation + one bounded collect, zero per-merge jobs. This is
    the production BPE shape: the corpus-scale work IS the word-count
    scan; the merge loop runs over a table that fits one machine for
    any real vocabulary. The distributed batched loop below remains
    the exact overflow regime."""
    import time

    merges: list[tuple[int, str, str, str, int]] = []
    # Bounded probe (r12 advice): the switch decision only needs to
    # know whether the table EXCEEDS the bound — limit(bound+1).count()
    # stops the scan after O(bound) rows instead of counting the whole
    # distinct-word table in the overflow regime.
    if (
        local_max_words
        and pieces.limit(local_max_words + 1).count() <= local_max_words
    ):
        t0 = time.monotonic()
        rows = pieces.collect()  # bounded by local_max_words
        local = _bpe_train_local(
            [(r["cnt"], r["pieces"]) for r in rows], n_merges
        )
        if _round_log is not None:
            _round_log.append((len(local), time.monotonic() - t0))
        return spark.createDataFrame(
            local,
            schema="step INT, lhs STRING, rhs STRING, merged STRING,"
            " pair_count BIGINT",
        )
    # the exact token vocabulary is driver-known: corpus alphabet (one
    # bounded collect — distinct chars of distinct words) + merges so
    # far. The collision check needs nothing from the cluster.
    token_set = {
        r["ch"]
        for r in pieces.select(F.explode("pieces").alias("ch"))
        .distinct()
        .collect()
    }
    pc = _bpe_pair_counts(pieces).localCheckpoint(eager=False)
    rounds = 0
    while len(merges) < n_merges:
        t0 = time.monotonic()
        rows = [
            (r["lhs"], r["rhs"], int(r["c"]))
            for r in pc.where(F.col("c") > 0)
            .orderBy(F.desc("c"), "lhs", "rhs")
            .limit(top_m)
            .collect()
        ]
        if not rows:
            break
        batch = _bpe_batch_schedule(
            rows, token_set, n_merges - len(merges), top_m
        )
        for l, r, c in batch:
            merges.append((len(merges) + 1, l, r, l + r, c))
            token_set.add(l + r)
        rules = [(l, r) for l, r, _ in batch]
        if len(rules) == 1:
            # K=1 rounds (tie-heavy stretches) keep the scalar kernels:
            # two literal comparisons per element beat a map lookup
            pred = _adjacent_pair_pred(*rules[0])
            fold = _bpe_merge_fold(*rules[0])
        else:
            pred = _bpe_multi_pair_pred(rules)
            fold = _bpe_multi_merge_fold(rules)
        delta = (
            pieces.where(pred)
            .select(
                F.explode(
                    F.concat(
                        _bpe_pair_deltas(F.col("pieces"), -1),
                        _bpe_pair_deltas(fold, +1),
                    )
                ).alias("pr")
            )
            .select("pr.lhs", "pr.rhs", F.col("pr.c").alias("c"))
        )
        pc = (
            pc.unionAll(delta)
            .groupBy("lhs", "rhs")
            .agg(F.sum("c").alias("c"))
            .where(F.col("c") != 0)
            .localCheckpoint(eager=False)
        )
        pieces = pieces.select(
            "cnt", F.when(pred, fold).otherwise(F.col("pieces")).alias("pieces")
        ).localCheckpoint(eager=False)
        rounds += 1
        if rounds % BPE_EAGER_EVERY == 0:
            # hard-truncate the physical graph (BPE_EAGER_EVERY note)
            pieces = pieces.localCheckpoint(eager=True)
            pc = pc.localCheckpoint(eager=True)
        if _round_log is not None:
            _round_log.append((len(batch), time.monotonic() - t0))

    return spark.createDataFrame(
        merges,
        schema="step INT, lhs STRING, rhs STRING, merged STRING,"
        " pair_count BIGINT",
    )


def _bpe_train_from_pieces_recount(
    spark: SparkSession,
    pieces: DataFrame,
    n_merges: int,
    _step_seconds: list | None = None,
) -> DataFrame:
    """Round-10's full-recount loop, kept as the REFERENCE path: every
    step recounts all pairs over the whole word table. Semantically
    identical to the delta loop above (equality pinned in
    tests/test_round11_ops.py); used by the equality tests and the
    recount-vs-delta step-time measurement (ARCHITECTURE.md)."""
    import time

    from .. import session

    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, n_merges + 1):
        t0 = time.monotonic()
        top = (
            _bpe_pair_counts(pieces)
            .orderBy(F.desc("c"), "lhs", "rhs")
            .first()
        )
        if top is None:
            break
        l, r, c = top["lhs"], top["rhs"], int(top["c"])
        merges.append((step, l, r, l + r, c))
        # re-stage per step: the .first() above just materialized the
        # previous stage, so each fold runs ONCE from cache (linear
        # total work), not k times from lineage (quadratic)
        pieces = session.stage(_bpe_apply_merge(pieces, l, r))
        if _step_seconds is not None:
            _step_seconds.append(time.monotonic() - t0)

    return spark.createDataFrame(
        merges,
        schema="step INT, lhs STRING, rhs STRING, merged STRING,"
        " pair_count BIGINT",
    )


# ---------------------------------------------------------------------------
# tokenizer_bpe_roundtrip — encode the corpus under the LEARNED vocab
# ---------------------------------------------------------------------------

_BPE_ROUNDTRIP_VOCAB_SQL = (
    "SELECT DISTINCT unnest(regexp_extract_all(w, '(?s).')) FROM dw "
    + " ".join(
        f"UNION SELECT l || r FROM best{k}"
        for k in range(1, BPE_MERGE_STEPS + 1)
    )
)

_BPE_RT_CHAIN = f"""
WITH RECURSIVE
words AS (SELECT doc_id,
                 unnest(string_split(coalesce(text, ''), ' ')) AS w
          FROM documents),
{_bpe_train_ctes()},
{greedy_fold_ctes(vocab_sql=_BPE_ROUNDTRIP_VOCAB_SQL, include_words=False)},
perdoc AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT)   AS n_words,
         CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         CAST(sum(n_unk) AS BIGINT) AS n_unk
  FROM words JOIN fin USING (w)
  GROUP BY doc_id)
"""

_BPE_ROUNDTRIP_ORACLE = (
    _BPE_RT_CHAIN + "SELECT doc_id, n_words, n_tokens, n_unk FROM perdoc"
)


@_register("tokenizer_bpe_roundtrip", _BPE_ROUNDTRIP_ORACLE)
def q_tokenizer_bpe_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN → ENCODE composition: learn BPE_MERGE_STEPS merges from
    the corpus (bpe_train_merges), then encode the SAME corpus under
    the learned vocabulary — corpus alphabet (char fallback) plus the
    merged pieces — via the house greedy longest-match encoder
    (make_greedy_encoder, WordPiece inference rule), reporting per-doc
    token counts. This is the number a data-mix planner actually wants
    from a trainer: how many tokens the corpus costs under the vocab
    it just learned. n_unk is structurally 0 (the alphabet comes from
    the corpus itself) — the hash gate certifies that too.

    Plan: the trainer loop (vocab-scale, see q_tokenizer_bpe_train)
    collects the N-row merge table + the bounded corpus alphabet —
    BOTH derived from the one staged distinct-word table, so the
    corpus is scanned exactly once end to end; the encode pass is the
    SAME zero-shuffle Arrow map as tokenizer_greedy_subword with the
    learned pieces broadcast by closure. The oracle chains the trainer
    CTEs into greedy_fold_ctes via vocab_sql — one fold definition,
    one trainer definition, the composition certified end to end."""
    d = catalog.load_table(spark, sf_dir, "documents")
    return tokenizer_greedy_subword(d, pieces=_bpe_learned_pieces(spark, d))


def _bpe_learned_pieces(spark: SparkSession, d: DataFrame) -> tuple[str, ...]:
    """Train the merges and derive the learned vocab (corpus alphabet +
    merged pieces) from ONE staged distinct-word scan — shared by the
    roundtrip and compression-report queries."""
    from .. import session

    pieces0 = session.stage(_bpe_word_pieces(d))
    merge_rows = _bpe_train_from_pieces_batched(
        spark, pieces0, BPE_MERGE_STEPS
    ).collect()  # N rows, bounded
    # corpus alphabet = the char-fallback tier of the learned vocab,
    # from the staged VOCAB-SCALE word table (distinct chars of
    # distinct words — bounded by the charset, not a data collect)
    alphabet = [
        r["ch"]
        for r in (
            pieces0.select(F.explode("pieces").alias("ch"))
            .distinct()
            .collect()
        )
    ]
    return tuple(sorted(alphabet)) + tuple(r["merged"] for r in merge_rows)


# ---------------------------------------------------------------------------
# tokenizer_compression_report — per-source cost under the learned vocab
# ---------------------------------------------------------------------------

_BPE_COMPRESSION_ORACLE = (
    _BPE_RT_CHAIN
    + """
SELECT d.source,
       CAST(count(*) AS BIGINT)        AS n_docs,
       CAST(sum(p.n_tokens) AS BIGINT) AS n_tokens,
       CAST(sum(d.n_chars) AS BIGINT)  AS n_chars,
       round(sum(d.n_chars) * 1.0 / nullif(sum(p.n_tokens), 0), 6)
         AS chars_per_token
FROM perdoc p JOIN documents d USING (doc_id)
GROUP BY d.source
"""
)


@_register("tokenizer_compression_report", _BPE_COMPRESSION_ORACLE)
def q_tokenizer_compression_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source compression under the LEARNED BPE vocab — chars per
    token by source, the number a data-mix planner actually budgets
    with (a token-expensive source costs more training compute per
    byte; Gopher/Chinchilla mixes are tuned on exactly this ratio).
    Composes the trainer (one vocab-scale loop), the greedy encoder
    (carry pattern: source and n_chars ride the encode batch, so there
    is NO re-join against documents) and a source-keyed aggregation —
    one corpus scan for training, one for encoding, ONE exchange
    total (the per-source agg; sums are exact BIGINTs, the ratio a
    deterministic double rounded at 6).

    The oracle extends the roundtrip chain's per-doc CTE with the
    source join + aggregation — one trainer definition, one fold
    definition, third certified composition."""
    d = catalog.load_table(spark, sf_dir, "documents")
    enc = tokenizer_greedy_subword(
        d,
        pieces=_bpe_learned_pieces(spark, d),
        carry=("source", "n_chars"),
    )
    return enc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        # try_divide (NULL on zero, mirrored by nullif in the oracle):
        # a source whose delivered docs are all empty has 0 tokens
        F.round(
            F.try_divide(F.sum("n_chars").cast("double"), F.sum("n_tokens")),
            6,
        ).alias("chars_per_token"),
    )


# ---------------------------------------------------------------------------
# ngram_novelty_score — share of bigrams unique to the document
# ---------------------------------------------------------------------------

_NOVELTY_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
bigrams AS (
  -- scalar range() list comprehension: DuckDB's generate_series table
  -- function cannot lateral-reference the token array
  SELECT DISTINCT doc_id,
         unnest([t[i] || ' ' || t[i + 1] FOR i IN range(1, len(t))]) AS bg
  FROM toks
),
df AS (
  SELECT bg, count(*) AS docs FROM bigrams GROUP BY bg
)
SELECT b.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(CAST(count(*) FILTER (d.docs = 1) AS DOUBLE)
             / count(*), 6) AS novelty
FROM bigrams b JOIN df d USING (bg)
GROUP BY b.doc_id
"""


@_register("ngram_novelty_score", _NOVELTY_ORACLE)
def q_ngram_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document novelty: the share of a document's distinct
    bigrams that appear in NO other document (document frequency 1) —
    high novelty marks original content, low novelty marks boilerplate
    and near-duplicates; the complementary signal to the Jaccard
    near-dup family, scored per document instead of per pair.

    Plan: the same inverted-index algebra as dedup — distinct (doc,
    bigram) pairs, a bigram document-frequency aggregation, one join
    back — never any doc×doc comparison."""
    d = catalog.load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", _toks().alias("t"))
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.slice(F.col("t"), 1, F.size("t") - 1),
                lambda x, i: F.concat_ws(
                    " ", x, F.element_at(F.col("t"), i + 2)
                ),
            )
        ).alias("bg"),
    ).distinct()
    df_ = bigrams.groupBy("bg").agg(F.count(F.lit(1)).alias("docs"))
    joined = bigrams.join(df_, "bg")
    uniq = F.when(F.col("docs") == 1, 1).otherwise(0)
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.sum(uniq).cast("double") / F.count(F.lit(1)), 6)
        .alias("novelty"),
    )


# ---------------------------------------------------------------------------
# text_readability_ari — Automated Readability Index
# ---------------------------------------------------------------------------

_ARI_ORACLE = """
WITH c AS (
  SELECT doc_id,
         greatest(1, length(regexp_replace(text, '[^.!?]', '', 'g')))
           AS n_sentences,
         len(string_split(text, ' '))      AS n_words,
         length(replace(text, ' ', ''))    AS n_letter_chars
  FROM documents
)
SELECT doc_id,
       CAST(n_sentences AS BIGINT)    AS n_sentences,
       CAST(n_words AS BIGINT)        AS n_words,
       CAST(n_letter_chars AS BIGINT) AS n_letter_chars,
       CAST(471 * n_letter_chars * n_sentences
            + 50 * n_words * n_words
            - 2143 * n_words * n_sentences AS DOUBLE)
         / CAST(100 * n_words * n_sentences AS DOUBLE) AS ari
FROM c
"""


@_register("text_readability_ari", _ARI_ORACLE)
def q_text_readability_ari(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability scoring for the quality-filter ladder: the Automated
    Readability Index 4.71·(chars/words) + 0.5·(words/sentences) −
    21.43 (Senter & Smith, "Automated Readability Index", AMRL-TR-66-220,
    1967) — chosen over Flesch because every input is an exact integer
    COUNT (no syllable estimation), so the score is bit-comparable
    across engines. Sentences count terminal punctuation with a floor
    of 1 (fixture docs are unpunctuated single sentences; real corpora
    spread). The score is spelled as ONE exact-integer ratio
    (471·c·s + 50·w² − 2143·w·s) / (100·w·s), UNROUNDED: one division
    of exact integers is correctly rounded, hence bit-identical on both
    engines, whereas rounding the quotient to 6 dp ties exactly at the
    .5 boundary on real inputs (w·s | 10⁷ cases) and the engines break
    that tie differently. Pure map over
    the scan — zero shuffles; words ≥ 1 by construction of the space
    split, so the division is total."""
    d = catalog.load_table(spark, sf_dir, "documents")
    n_sent = F.greatest(
        F.lit(1),
        F.length(F.regexp_replace(F.col("text"), r"[^.!?]", "")),
    ).cast("long")
    n_words = F.size(F.split(F.col("text"), " ")).cast("long")
    n_chars = F.length(
        F.replace(F.col("text"), F.lit(" "), F.lit(""))
    ).cast("long")
    return d.select(
        "doc_id",
        n_sent.alias("n_sentences"),
        n_words.alias("n_words"),
        n_chars.alias("n_letter_chars"),
        (
            (
                F.lit(471) * n_chars * n_sent
                + F.lit(50) * n_words * n_words
                - F.lit(2143) * n_words * n_sent
            ).cast("double")
            / (F.lit(100) * n_words * n_sent).cast("double")
        ).alias("ari"),
    )


# ---------------------------------------------------------------------------
# token_entropy_filter — Shannon-entropy repetitiveness filter
# ---------------------------------------------------------------------------

ENTROPY_FLOOR = 3.0  # bits; a doc whose token distribution carries less
# information than this is template/boilerplate-like

_ENTROPY_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
tc AS (
  SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok
),
per_doc AS (
  -- same sufficient-statistics formula as the Spark side, term for
  -- term: H = log2(n) - sum(c*log2 c)/n, with the c*log2(c) terms
  -- accumulated in DECIMAL(32,18) so the float sum is reduction-order-
  -- exact (a parallel hash aggregate is free to reassociate a raw
  -- double sum, which can flip the 6th decimal on boundary values)
  SELECT doc_id,
         CAST(sum(c) AS BIGINT)   AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_distinct,
         log2(sum(c))
           - CAST(sum(CAST(c * log2(c) AS DECIMAL(32,18))) AS DOUBLE)
             / sum(c) AS h
  FROM tc GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_distinct,
       round(h, 6) AS entropy_bits,
       round(h, 6) < {ENTROPY_FLOOR} AS low_entropy
FROM per_doc
"""


@_register("token_entropy_filter", _ENTROPY_ORACLE)
def q_token_entropy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution Shannon entropy per document — the standard
    repetitiveness/boilerplate filter (low-entropy docs are template
    spam, keyword stuffing, or degenerate generations; Rae et al. 2021
    'Gopher' uses exactly this family of repetition filters).

    Shape: explode → (doc, token) count → one per-doc aggregation. Both
    shuffles key on doc_id and the second input is pre-reduced to
    distinct tokens per doc — nothing global, scales linearly. Entropy
    is rounded to 6 before the threshold compare so the flag is
    engine-exact."""
    d = catalog.load_table(spark, sf_dir, "documents")
    tc = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # entropy from sufficient statistics: H = log2(n) - sum(c*log2 c)/n
    per_doc = tc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        # DECIMAL accumulation: reduction-order-exact (see oracle note)
        F.sum(
            (F.col("c") * F.log2("c")).cast("decimal(32,18)")
        ).alias("clog"),
    )
    h = F.log2(F.col("n_tokens")) - F.col("clog").cast("double") / F.col(
        "n_tokens"
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.round(h, 6).alias("entropy_bits"),
        (F.round(h, 6) < ENTROPY_FLOOR).alias("low_entropy"),
    )


# ---------------------------------------------------------------------------
# gopher_repetition_filter — duplicate-token / top-bigram repetition rules
# ---------------------------------------------------------------------------

# Token-adapted versions of the Gopher repetition rules (Rae et al. 2021,
# appendix A1 filters "fraction of duplicate lines/characters in the most
# frequent n-gram"): per doc, (1) the fraction of tokens that are repeats
# of an earlier token and (2) the fraction of tokens covered by the single
# most frequent bigram. Thresholds are tuned so the synthetic fixture
# exercises both keep and drop branches (the published char-based cuts
# target web text); production uses the same plan with retuned constants.
DUP_TOKEN_MAX = 0.6
TOP_BIGRAM_MAX = 0.125

_REPETITION_ORACLE = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id, len(toks) AS n, len(list_distinct(toks)) AS nd FROM t
),
bg AS (
  SELECT doc_id,
         unnest([array_to_string(toks[i:i+1], ' ')
                 FOR i IN range(1, len(toks))]) AS g
  FROM t
),
top AS (
  SELECT doc_id, max(c) AS top_c
  FROM (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2)
  GROUP BY 1
)
SELECT s.doc_id,
       round(1.0 - s.nd * 1.0 / s.n, 6)                  AS dup_token_frac,
       round(coalesce(top.top_c, 0) * 2.0 / s.n, 6)      AS top_bigram_frac,
       (1.0 - s.nd * 1.0 / s.n) <= {DUP_TOKEN_MAX}
         AND coalesce(top.top_c, 0) * 2.0 / s.n <= {TOP_BIGRAM_MAX} AS keep
FROM s LEFT JOIN top USING (doc_id)
"""


@_register("gopher_repetition_filter", _REPETITION_ORACLE)
def q_gopher_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filter (token-adapted Gopher rules): a
    doc is kept iff its duplicate-token fraction and its most-frequent-
    bigram coverage both sit under threshold. The duplicate fraction is
    a per-row expression (size vs array_distinct size — no shuffle at
    all); the top-bigram count is one (doc_id, bigram) aggregation
    followed by a doc_id max — both keyed on the document, so the
    reduction is embarrassingly parallel and skew-free at any corpus
    size (no corpus-global state anywhere)."""
    from ..functions import seq1

    d = catalog.load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", F.split("text", " ").alias("toks"))
    sizes = base.select(
        "doc_id",
        F.size("toks").alias("n"),
        F.size(F.array_distinct("toks")).alias("nd"),
    )
    bigrams = F.transform(
        # seq1: a 1-token doc yields the EMPTY bigram list (sequence(1,0)
        # would descend and crash slice) — the standard shingle guard
        seq1(F.size("toks") - 1),
        lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i, 2)),
    )
    top = (
        base.select("doc_id", F.explode(bigrams).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"))
    )
    dup_frac = F.lit(1.0) - F.try_divide(
        F.col("nd") * F.lit(1.0), F.col("n")
    )
    top_frac = F.try_divide(
        F.coalesce(F.col("top_c"), F.lit(0)) * F.lit(2.0), F.col("n")
    )
    return sizes.join(top, "doc_id", "left").select(
        "doc_id",
        F.round(dup_frac, 6).alias("dup_token_frac"),
        F.round(top_frac, 6).alias("top_bigram_frac"),
        (
            (dup_frac <= DUP_TOKEN_MAX) & (top_frac <= TOP_BIGRAM_MAX)
        ).alias("keep"),
    )
